package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local(app = "graft-bench")
    // Optional comma-separated allowlist for A/B experiments
    // (SPARK_GRAFT_BENCH_ONLY=q60_full_etl,q74_incremental_etl).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    // Execution order is PINNED, not Map-iteration order: adding a query
    // used to reshuffle the whole run, which made per-round per-query
    // history diff-noise (round 8's q60/q74 "regression" was exactly
    // this — the ETL family drifting to the end of the map, timed after
    // 190+ queries' worth of accumulated JVM state). The ETL end-to-end
    // family runs FIRST — each builds its own fresh tmpfs warehouse, so
    // fresh-JVM placement is the deterministic seeding that makes their
    // numbers measure the pipeline, not whatever heap/GC state the
    // preceding families left behind. Everything else runs in sorted-key
    // order.
    val etlFirst = Seq("q60_full_etl", "q74_incremental_etl")
    val ordered: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)] = {
      val all = SparkEntry.queries
      val rest = all.keySet.diff(etlFirst.toSet).toSeq.sorted
      (etlFirst.filter(all.contains) ++ rest).map(k => k -> all(k))
    }
    val selected = only match {
      case Some(names) =>
        // a typo'd name must not silently select nothing and report a
        // valid-looking 0.000 s total
        val unknown = names.diff(ordered.map(_._1).toSet)
        require(unknown.isEmpty,
          s"SPARK_GRAFT_BENCH_ONLY names not in SparkEntry.queries: ${unknown.mkString(",")}")
        ordered.filter { case (n, _) => names.contains(n) }
      case None => ordered
    }
    // Warm the JVM (JIT, codegen compilation, parquet reader init) with one
    // pass at the smallest scale factor so timed numbers measure the
    // engine, not first-call compilation. Standard steady-state practice.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      selected.foreach { case (_, fn) =>
        try fn(spark, warmDir).count() catch { case _: Throwable => () }
      }
    // Drop the warmup pass's cached model state: the sf0.001 cache keys
    // would otherwise pin their localCheckpointed models in the block
    // manager for the entire timed run (the between-family housekeeping
    // hook QueryCaches documents). Timed families rebuild at bench scale
    // on first touch exactly as before — cache keys include the sf dir.
    graft.operators.QueryCaches.evictSession(spark)
    // One heavy shuffle at the BENCH scale: heap growth and shuffle-path
    // JIT otherwise get charged to whichever timed query runs first.
    try {
      import org.apache.spark.sql.functions._
      graft.sources.Tables.lineitem(spark, sfDir)
        .groupBy(col("l_partkey")).agg(sum(col("l_quantity"))).count(): Unit
    } catch { case _: Throwable => () }
    // Shared-model training as NAMED, separately-timed steps (see
    // ModelWarm): every per-query number below is a serving-path
    // number, and each model's training cost is its own warm_* row in
    // the ledger — still inside the headline total, because it is real
    // work a user pays once per corpus. Round 9's q160/q104/q207
    // ">2× regressions" were exactly this cost silently changing
    // hands when the pinned sort made them first touchers. A/B runs
    // (BENCH_ONLY) default to COLD — they measure what they name —
    // unless SPARK_GRAFT_BENCH_WARM=1 asks for warmed serving paths.
    val warmModels = sys.env.get("SPARK_GRAFT_BENCH_WARM") match {
      case Some(v) => v == "1"
      case None => only.isEmpty
    }
    val warmResults: Seq[(String, Double)] =
      if (!warmModels) Nil
      else graft.operators.ModelWarm.steps.map { case (name, fn) =>
        val t0 = System.nanoTime()
        val t = try { fn(spark, sfDir); (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0 }
        name -> t
      }
    val diag = sys.env.get("SPARK_GRAFT_BENCH_DIAG").contains("1")
    val results = warmResults.toMap ++ selected.map { case (name, fn) =>
      if (diag) {
        val rt = Runtime.getRuntime
        System.err.println(f"[bench-diag] before $name: heapUsed=${(rt.totalMemory - rt.freeMemory) / (1 << 20)}%d MiB, cachedRdds=${spark.sparkContext.getRDDStorageInfo.length}%d")
      }
      val t0 = System.nanoTime()
      // a failed query reports -1, not a fast-looking elapsed time
      val t = try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1.0 }
      name -> t
    }.toMap
    // 3-decimal timings, locale-fixed: ms resolution is all a
    // seconds-scale bench can claim anyway.
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // sorted keys → byte-stable detail JSON across rounds (diffable history)
    val qs = results.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    // failures carry the -1 sentinel in the per-query map but must not
    // SUBTRACT from the headline total — a failed query would otherwise
    // read as a phantom speed-up in the round-over-round history
    val total = results.values.filter(_ >= 0).sum
    // escape env-controlled strings landing inside the JSON line —
    // a quote in a path would otherwise make the evidence unparseable
    def jesc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir)
      .map(_.group(1)).getOrElse("\"" + jesc(sfDir) + "\"")
    // The full per-query map makes the JSON line ~2.6 KB — longer than
    // line-capped log capture allows, which destroyed the committed perf
    // evidence three rounds running. Stdout gets a SHORT total-only line
    // the capture can hold whole; the full per-query map goes to a file.
    val detail = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/tmp/bench_" + new java.io.File(sfDir).getName + ".json")
    val full =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":$sf}"""
    val short =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":{"q60_full_etl":${f3(
        results.getOrElse("q60_full_etl", -1.0))}},"sf":$sf,"n":${results.size},"detail":"${jesc(detail)}"}"""
    println(short)
    // Persist the full map; a read-only /tmp must not fail a bench that
    // already ran every query — warn and keep the stdout evidence.
    try {
      java.nio.file.Files.writeString(java.nio.file.Paths.get(detail), full): Unit
      // legacy path some tooling reads; same warn-only contract
      java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/bench.json"), full): Unit
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] detail write failed (stdout line stands): ${e.getMessage}")
    }
    // /tmp is overwritten per run, so per-query history dies with the round
    // (round 6's regression is unattributable for exactly this reason).
    // Also persist the map into the repo's bench/ dir, named by the round
    // currently being built: max committed CORRECTNESS_r{N} + 1 — but
    // ONLY for full runs: a BENCH_ONLY A/B run (now a routine
    // attribution workflow) would otherwise overwrite the driver's
    // round-start detail with a partial ledger, which is exactly what
    // happened to detail_r10.json twice before this guard.
    if (only.isEmpty) try {
      var dir = new java.io.File(".").getCanonicalFile
      while (dir != null && !new java.io.File(dir, "build.sbt").isFile)
        dir = dir.getParentFile
      if (dir != null) {
        val round = Option(dir.listFiles()).getOrElse(Array.empty)
          .flatMap(f => "CORRECTNESS_r(\\d+)\\.json".r
            .findFirstMatchIn(f.getName).map(_.group(1).toInt))
          .foldLeft(0)(math.max) + 1
        val hist = new java.io.File(dir, "bench")
        hist.mkdirs()
        // The driver's round-start run creates detail_r{N}.json; any
        // LATER full run this round (local iteration) must not clobber
        // that committed evidence — divert to a _local name instead.
        val primary = new java.io.File(hist, f"detail_r$round%02d.json")
        // and successive local runs get fresh _local/_local2/... names —
        // the second local run must not eat the first's ledger either
        val target =
          if (!primary.isFile) primary
          else Iterator.from(0).map(k => new java.io.File(hist,
              f"detail_r$round%02d_local" + (if (k == 0) "" else k.toString) + ".json"))
            .find(!_.isFile).get
        java.nio.file.Files.writeString(target.toPath, full): Unit
      }
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] history write failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
