package graft

/** Dump `.explain("formatted")` for named queries to plans/<dir>/<q>_<suffix>.txt
  * — the committed plan evidence for optimization rounds.
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <query>...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, qs @ _*) = args: @unchecked
    val spark = Sessions.local(app = "plan-dump")
    new java.io.File(outDir).mkdirs()
    qs.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${q}_$suffix.txt"), plan): Unit
      println(s"[plandump] wrote $q ($suffix)")
    }
    spark.stop()
  }
}
