package graft
object EtlTiming {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(app = "etl-timing")
    val wh = java.nio.file.Files.createTempDirectory("graft-etl-t").toString
    val orch = new graft.plans.Orchestrator(spark, "/root/testdata/sf0.1", wh)
    val t0 = System.nanoTime()
    orch.runFullEtl()
    println(f"[etl] total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    orch.wh.read("bl_cl", "etl_log").orderBy("log_ts")
      .collect().foreach(r => println(s"[etl] ${r.getString(0)}: ${r.getString(1)}"))
    spark.stop()
  }
}
