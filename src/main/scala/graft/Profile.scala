package graft

/** Dev tool: time individual SparkEntry queries (and optionally print the
  * formatted physical plan). Usage:
  *   runMain graft.Profile <sfDir> [--explain] <name> [name ...]
  * Each query is run twice; both timings print (first includes warmup).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val explain = args.contains("--explain")
    val names = args.drop(1).filterNot(_ == "--explain")
    val spark = Sessions.local(app = "graft-profile")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"[profile] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    }
    spark.stop()
  }
}
