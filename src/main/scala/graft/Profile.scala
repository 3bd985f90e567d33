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
    // validate up front: a typo'd LATER name would otherwise abort the
    // run after earlier queries already spent their minutes
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}; " +
      s"close matches: ${unknown.flatMap(u => SparkEntry.queries.keys
        .filter(_.take(4) == u.take(4))).mkString(", ")}")
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
