package graft.operators

// Temporary probe: where does the per-round time go?
object ProbeBpe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local(app = "probe-bpe")
    if (sys.env.contains("PROBE_NO_CODEGEN"))
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val taskMs = new java.util.concurrent.atomic.AtomicLong()
    val jobKinds = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()
    val jobTimes = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val cs = Option(j.properties.getProperty("spark.job.description")).getOrElse("?") + " | " + j.stageInfos.headOption.map(_.name).getOrElse("?")
        jobKinds.computeIfAbsent(cs, _ => new java.util.concurrent.atomic.AtomicInteger()).incrementAndGet()
        jobTimes.put(j.jobId, (cs, j.time))
        ()
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        Option(jobTimes.get(e.jobId)).foreach { case (cs, t0) =>
          jobTimes.put(e.jobId, (cs, e.time - t0))
        }
        ()
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        { taskMs.addAndGet(t.taskMetrics.executorRunTime); () }
    })
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    val t0 = System.nanoTime()
    val m = TextQueries.bpeMergeTableMerges(docs, "text", "doc_id", 64)
    val n = m.count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000)
    println(f"[bpe] merges=$n wall=$wall%.1f s jobs=${jobs.get} taskTimeSum=${taskMs.get / 1000.0}%.1f s")
    import scala.jdk.CollectionConverters._
    val byKind = jobTimes.values.asScala.toSeq.groupBy(_._1)
      .map { case (k, v) => (k, v.size, v.map(_._2).sum) }.toSeq.sortBy(-_._3)
    byKind.foreach { case (k, n, ms) => println(f"[jobs] $k%-40s n=$n%4d totalMs=$ms%6d") }
    spark.stop()
  }
}
