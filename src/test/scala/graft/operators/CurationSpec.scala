package graft.operators

import graft.SparkSpec
import graft.operators.Curation._
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii scrubs emails and phones, leaves clean text alone") {
    val df = Seq(
      ("mail me at bob.smith+x@sub.example.org today", 1L),
      ("call +1-555-0134 or +44-202-7946", 2L),
      ("no pii here", 3L)
    ).toDF("t", "id")
    val out = df.select($"id", redactPii($"t").as("c"),
      emailCount($"t").as("ne"), phoneCount($"t").as("np"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3)))
      .sortBy(_._1)
    assert(out(0) == ((1L, "mail me at <EMAIL> today", 1, 0)))
    assert(out(1) == ((2L, "call <PHONE> or <PHONE>", 0, 2)))
    assert(out(2) == ((3L, "no pii here", 0, 0)))
  }

  test("chunksOfTokens: empty, short, exact-multiple, ragged") {
    val df = Seq(
      (0L, Seq.empty[String]),
      (1L, Seq("a", "b")),
      (2L, Seq("a", "b", "c", "d")),
      (3L, Seq("a", "b", "c", "d", "e"))
    ).toDF("id", "ts")
    val got = df.select($"id", chunksOfTokens($"ts", 2).as("cs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(0L) == Seq())
    assert(got(1L) == Seq("a b"))
    assert(got(2L) == Seq("a b", "c d"))
    assert(got(3L) == Seq("a b", "c d", "e"))
  }

  test("chunk dedup keeps the first corpus-wide occurrence only") {
    // doc 1 owns both chunks; doc 2 repeats doc 1's first chunk then
    // adds a fresh one; doc 3 is entirely doc 1 — it must vanish.
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "a b c d")
    ).toDF("doc_id", "text")
    val kept = firstOccurrenceChunks(docs, "text", "doc_id", 2)
      .select($"doc_id", $"n_kept", $"clean_text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(kept == Map(1L -> ((2L, "a b c d")), 2L -> ((1L, "x y"))))
  }

  test("removeFrequentChunks drops ALL copies of a hot chunk, first included") {
    // chunk "a b" appears 3× (docs 1, 2, 3) → every copy goes, incl.
    // doc 1's first occurrence (the C4 rule; firstOccurrenceChunks
    // would keep it). "c d" (2×) and "x y" (1×) stay put.
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "a b c d")
    ).toDF("doc_id", "text")
    val out = removeFrequentChunks(docs, "text", "doc_id", n = 2, maxFreq = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out == Map(
      1L -> ((2L, 1L, "c d")),
      2L -> ((2L, 1L, "x y")),
      3L -> ((2L, 1L, "c d"))))
    // tighten the threshold: "c d" (2 copies) now falls too; doc 2
    // keeps its unique tail, docs 1/3 reassemble to empty — not absent
    val strict = removeFrequentChunks(docs, "text", "doc_id", n = 2, maxFreq = 1)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(strict == Map(1L -> "", 2L -> "x y", 3L -> ""))
  }

  test("removeFrequentChunks ordering: surviving chunks reassemble in position order") {
    val docs = Seq((7L, "u v w x y z"), (8L, "w x q r")).toDF("doc_id", "text")
    // 2-token chunks: doc 7 = [u v][w x][y z], doc 8 = [w x][q r];
    // "w x" occurs twice → removed at maxFreq=1; survivors keep order.
    val out = removeFrequentChunks(docs, "text", "doc_id", 2, 1)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out == Map(7L -> "u v y z", 8L -> "q r"))
  }

  test("hashU16 is deterministic, in range, and salt-sensitive") {
    val ids = spark.range(0, 2000).toDF("id")
    val a = ids.select(hashU16($"id", "s1-").as("u")).as[Int].collect()
    val b = ids.select(hashU16($"id", "s1-").as("u")).as[Int].collect()
    val c = ids.select(hashU16($"id", "s2-").as("u")).as[Int].collect()
    assert(a.sameElements(b))                       // re-runnable to the byte
    assert(a.forall(u => u >= 0 && u < 65536))
    assert(!a.sameElements(c))                      // independent draw per salt
    // md5 uniforms: quartile counts of 2000 draws stay near 500 each
    val q = a.groupBy(_ / 16384).view.mapValues(_.length).toMap
    assert((0 to 3).forall(i => math.abs(q.getOrElse(i, 0) - 500) < 150))
  }

  test("temperature mixing: integer quotas, α-upweighted tail, stateless filter") {
    import graft.operators.Curation
    // 64/16/4 docs → isq 8/4/2, budget 42, quotas 24/12/6,
    // rates 24576/49152/65536 (tail capped at keep-everything)
    val docs = (0L until 64L).map(i => (i, "big")) ++
      (100L until 116L).map(i => (i, "mid")) ++ (200L until 204L).map(i => (i, "small"))
    val df = docs.toDF("doc_id", "source")
    val q = Curation.temperatureQuotas(df, "source")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(q == Map("big" -> ((64L, 24L, 24576L)), "mid" -> ((16L, 12L, 49152L)),
      "small" -> ((4L, 6L, 65536L))))
    // α < 1 up-weights the tail: keep RATE rises as source size falls
    assert(q("big")._3 < q("mid")._3 && q("mid")._3 <= q("small")._3)
    // quota never exceeds the budget in total
    assert(q.values.map(_._2).sum <= 84 / 2)
    val mix = Curation.temperatureMix(df, "source", "doc_id", "t-")
    val sel = mix.select($"doc_id").as[Long].collect().toSet
    assert(sel.subsetOf(docs.map(_._1).toSet))
    // rate 65536 keeps the whole tail source; filter is deterministic
    assert((200L until 204L).forall(sel.contains))
    val again = Curation.temperatureMix(df, "source", "doc_id", "t-")
      .select($"doc_id").as[Long].collect().toSet
    assert(sel == again)
  }

  test("temperatureMix plan: stateless filter — broadcast join only, no Window, no sort-merge") {
    import graft.operators.Curation
    val df = (0L until 1000L).map(i => (i, s"s${i % 7}")).toDF("doc_id", "source")
    val plan = Curation.temperatureMix(df, "source", "doc_id", "p-")
      .queryExecution.executedPlan.toString
    // the 100 TB claim: the doc-side path is scan → broadcast-join →
    // filter; a Window or a shuffled join would mean a per-source
    // funnel that cannot scale
    assert(!plan.contains("Window"), s"mix plan has a window:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"mix plan shuffle-joins the corpus:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"quota relation is not broadcast:\n$plan")
  }

  test("zValue interleaves bits and bounds 2-D boxes per key range") {
    val pts = Seq((3, 0), (0, 3), (255, 255), (0, 0), (1, 1)).toDF("x", "y")
    val zs = pts.select(zValue($"x", $"y", 8).as("z")).as[Long].collect()
    assert(zs.sameElements(Array(5L, 10L, 65535L, 0L, 3L)))
    // The layout property q91 sells: fixing the top 4 z bits (top 2 of
    // each dimension) confines BOTH x and y to a 64-wide range, so any
    // file holding one z range carries tight min/max stats on both
    // columns — that is what makes 2-D predicate pruning work.
    val grid = spark.range(0, 4096).toDF("i")
      .select((($"i" % 256) % 256).cast("int").as("x"),
        (($"i" * 37) % 256).cast("int").as("y"))
    val boxes = grid.select(zValue($"x", $"y", 8).as("z"), $"x", $"y")
      .groupBy(shiftright($"z", 12).as("cell"))
      .agg((max($"x") - min($"x")).as("dx"), (max($"y") - min($"y")).as("dy"))
      .select(max($"dx"), max($"dy")).as[(Int, Int)].head()
    assert(boxes._1 <= 63 && boxes._2 <= 63)
  }

  test("q165 stratified split: exactly ceil(10%) of EVERY stratum, deterministic") {
    val out = CurationQueries.queries("q165_stratified_split")(spark, sf)
      .select($"lang", $"split").as[(String, String)].collect()
    val perLang = out.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(perLang.nonEmpty)
    perLang.foreach { case (lang, splits) =>
      val n = splits.length
      val vals = splits.count(_ == "val")
      assert(vals == (n + 9) / 10, s"$lang: $vals val of $n")
    }
    // byte-deterministic across runs
    val again = CurationQueries.queries("q165_stratified_split")(spark, sf)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val first = CurationQueries.queries("q165_stratified_split")(spark, sf)
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(again == first)
  }

  test("waterfillQuotas: max-min fair integer allocation against hand computation") {
    // sources 10/20/40/80 docs, budget = 150/2 = 75:
    // k=1 feasible (10·4 = 40 ≤ 75), k=2 feasible (20·3 + 10 = 70 ≤ 75),
    // k=3 infeasible (40·2 + 30 = 110 > 75) ⇒ k* = 2, S = 30,
    // cap = (75 − 30) div 2 = 22 → quotas 10, 20, 22, 22 (Σ = 74 ≤ 75)
    val docs = Seq(("a", 10), ("b", 20), ("c", 40), ("d", 80)).flatMap {
      case (src, n) => (1 to n).map(i => (src, s"$src-$i"))
    }.toDF("source", "doc_id")
    val got = Curation.waterfillQuotas(docs, "source", budgetDenom = 2)
      .select($"source", $"n_docs", $"quota", $"capped")
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("a") == ((10L, 10L, false)))
    assert(got("b") == ((20L, 20L, false)))
    assert(got("c") == ((40L, 22L, true)))
    assert(got("d") == ((80L, 22L, true)))
    // whole corpus inside the budget ⇒ nothing capped
    val loose = Curation.waterfillQuotas(docs, "source", budgetDenom = 1)
      .select($"quota", $"capped").as[(Long, Boolean)].collect()
    assert(loose.forall(!_._2) && loose.map(_._1).sum == 150L)
  }

  test("zValueN interleaves n dimensions and bounds 3-D boxes per key range") {
    // bit i of dim j lands at i*n + j: known 3-D values first
    val pts = Seq((1, 0, 0), (0, 1, 0), (0, 0, 1), (3, 0, 0), (7, 7, 7))
      .toDF("x", "y", "w")
    val zs = pts.select(zValueN(Seq($"x", $"y", $"w"), 8).as("z")).as[Long].collect()
    assert(zs.sameElements(Array(1L, 2L, 4L, 9L, 511L)))
    // 2-D zValue is exactly zValueN over two dims — one interleave law
    val two = Seq((3, 0), (0, 3), (255, 255)).toDF("x", "y")
    assert(two.select(zValue($"x", $"y", 8).as("a"),
        zValueN(Seq($"x", $"y"), 8).as("b"))
      .where($"a" =!= $"b").isEmpty)
    // The layout property q125 sells: fixing the top 2 bits of EACH of
    // three dimensions (z >> 18) confines all three to 64-wide ranges —
    // per-file min/max stats stay tight on every key column at once.
    val grid = spark.range(0, 8192).toDF("i")
      .select(($"i" % 256).cast("int").as("x"),
        (($"i" * 37) % 256).cast("int").as("y"),
        (($"i" * 101) % 256).cast("int").as("w"))
    val boxes = grid.select(zValueN(Seq($"x", $"y", $"w"), 8).as("z"), $"x", $"y", $"w")
      .groupBy(shiftright($"z", 18).as("cell"))
      .agg((max($"x") - min($"x")).as("dx"), (max($"y") - min($"y")).as("dy"),
        (max($"w") - min($"w")).as("dw"))
      .select(max($"dx"), max($"dy"), max($"dw")).as[(Int, Int, Int)].head()
    assert(boxes._1 <= 63 && boxes._2 <= 63 && boxes._3 <= 63)
    // guard rails: a 1-D "interleave" and a key wider than 63 bits are
    // construction errors, not silent truncations
    intercept[IllegalArgumentException](zValueN(Seq($"x"), 8))
    intercept[IllegalArgumentException](zValueN(Seq($"x", $"y", $"w"), 22))
  }

  test("z-sorted layout PAYS: a 2-D box predicate reads fewer row groups and fewer rows than unsorted") {
    // The claim q91/q125 make — "files written sorted by the z-key
    // carry tight min/max on BOTH columns, so 2-D predicates prune" —
    // measured: same rows, two physical layouts, one box predicate.
    val n = 1 << 14
    val pts = spark.range(n).select($"id",
      pmod(xxhash64($"id"), lit(256)).cast("int").as("x"),
      pmod(xxhash64($"id" + 1234567), lit(256)).cast("int").as("y"))
      .withColumn("z", zValue($"x", $"y", 8))
    val base = java.nio.file.Files.createTempDirectory("graft-zlay").toString
    val zDir = s"$base/zsorted"; val uDir = s"$base/unsorted"
    pts.repartitionByRange(16, $"z").sortWithinPartitions($"z")
      .drop("z").write.parquet(zDir)
    pts.repartition(16).drop("z").write.parquet(uDir)
    val (xLo, xHi, yLo, yHi) = (10, 25, 40, 55) // a 16×16 box
    // (a) STATS-LEVEL: count row groups whose parquet footer min/max
    // box overlaps the predicate box — what any stats-pruning reader
    // (Spark's parquet pushdown, a table format's file skipping) reads
    def overlappingRowGroups(dir: String): (Int, Int) = {
      import scala.jdk.CollectionConverters._
      import org.apache.parquet.hadoop.ParquetFileReader
      import org.apache.parquet.hadoop.util.HadoopInputFile
      val conf = spark.sessionState.newHadoopConf()
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
      var total = 0; var overlapping = 0
      files.foreach { f =>
        val rd = ParquetFileReader.open(HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getPath), conf))
        try rd.getFooter.getBlocks.asScala.foreach { b =>
          total += 1
          val st = b.getColumns.asScala
            .map(c => c.getPath.toDotString -> c.getStatistics).toMap
          def rng(c: String) = (st(c).genericGetMin.asInstanceOf[Number].intValue,
            st(c).genericGetMax.asInstanceOf[Number].intValue)
          val (xmn, xmx) = rng("x"); val (ymn, ymx) = rng("y")
          if (xmx >= xLo && xmn <= xHi && ymx >= yLo && ymn <= yHi)
            overlapping += 1
        } finally rd.close()
      }
      (overlapping, total)
    }
    val (zHit, zTotal) = overlappingRowGroups(zDir)
    val (uHit, uTotal) = overlappingRowGroups(uDir)
    assert(uHit == uTotal, "unsorted row groups all span the full range")
    assert(zHit * 2 <= zTotal,
      s"z-sorted layout should prune >= half the row groups, read $zHit/$zTotal")
    // (b) RUNTIME: Spark's own pushed-down scan reads fewer rows off
    // the z-sorted layout (scan numOutputRows = rows the parquet
    // reader actually surfaced after row-group skipping)
    def rowsRead(dir: String): (Long, Long) = {
      val df = spark.read.parquet(dir)
        .filter($"x".between(xLo, xHi) && $"y".between(yLo, yHi))
      val matched = df.count()
      df.collect()
      val scan = df.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.head
      assert(scan.metadata("PushedFilters").contains("GreaterThanOrEqual(x,"),
        "box predicate must reach the parquet reader")
      (matched, scan.metrics("numOutputRows").value)
    }
    val (zMatched, zRead) = rowsRead(zDir)
    val (uMatched, uRead) = rowsRead(uDir)
    assert(zMatched == uMatched) // layout never changes the answer
    assert(uRead == n, "unsorted layout reads every row")
    assert(zRead * 2 <= uRead,
      s"z-sorted layout should read <= half the rows, read $zRead vs $uRead")
  }
}
