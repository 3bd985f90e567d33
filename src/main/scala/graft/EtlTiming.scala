package graft
object EtlTiming {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(app = "etl-timing")
    val wh = java.nio.file.Files.createTempDirectory("graft-etl-t").toString
    val orch = new graft.plans.Orchestrator(spark, "/root/testdata/sf0.1", wh)
    val t0 = System.nanoTime()
    orch.runFullEtl()
    val fullS = (System.nanoTime() - t0) / 1e9
    println(f"[etl] total $fullS%.2f s")
    // idempotency economics: re-run the 3NF+DM loaders on UNCHANGED
    // staging — every fact loader takes its no-op branch (empty
    // watermark slice, zero partition swaps), dims re-merge to
    // identical rows. The printed ratio is the measured evidence for
    // the O(new data) claim (reference idempotency test:
    // python/dw_etl_tests.py:371-410); q74's gate requires the fact
    // partition files stay byte-untouched on this pass.
    val t1 = System.nanoTime()
    val noopCounts = orch.stage3nf() ++ orch.stageDm()
    val noopS = (System.nanoTime() - t1) / 1e9
    println(f"[etl] noop re-run total $noopS%.2f s (full $fullS%.2f s, ratio ${noopS / fullS}%.2f)")
    println(s"[etl] noop counts: ${noopCounts.toSeq.sortBy(_._1).mkString(", ")}")
    orch.wh.read("bl_cl", "etl_log").orderBy("log_ts")
      .collect().foreach(r => println(s"[etl] ${r.getString(0)}: ${r.getString(1)}"))
    spark.stop()
    // each run materializes a full sf0.1 warehouse into tmpfs — leaked
    // dirs from repeated timing runs would eventually starve the
    // benches' own tmpfs warehouses
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(wh))
  }
}
