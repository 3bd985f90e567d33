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
    // each run materializes a full sf0.1 warehouse into tmpfs — leaked
    // dirs from repeated timing runs would eventually starve the
    // benches' own tmpfs warehouses
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(wh))
  }
}
