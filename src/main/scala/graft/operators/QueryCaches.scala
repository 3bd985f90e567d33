package graft.operators

import org.apache.spark.sql.SparkSession

/** Bounded compute-once registry shared by the query packs' train-once
  * caches (similarity models, verified near-dup pairs). One entry per
  * (session, corpus dir + content fingerprint) — the fingerprint (file
  * names/sizes/mtimes) makes an in-session corpus rewrite a cache miss,
  * not stale data; entries are EVICTED when their session's
  * context stops (an ApplicationEnd listener registered on first use,
  * plus a dead-context sweep on every access as belt-and-braces) — a
  * long-lived JVM cycling sessions never pins dead sessions'
  * localCheckpointed state. A session sharing a still-live context is
  * only dropped via [[evictSession]]; the values strongly reference
  * their session (DataFrames do), so weak keys alone could never
  * collect them. Every cached training is deterministic, so caching
  * cannot change any result — only how often the work runs.
  */
object QueryCaches {
  type Key = (SparkSession, String)
  type Cache[V] = java.util.concurrent.ConcurrentHashMap[Key, V]

  private val registry =
    new java.util.concurrent.CopyOnWriteArrayList[Cache[_]]

  /** A new cache participating in registry-wide eviction. */
  private[operators] def newCache[V](): Cache[V] = {
    val m = new java.util.concurrent.ConcurrentHashMap[Key, V]
    registry.add(m)
    m
  }

  /** Drop one session's entries from every registered cache. Wired to
    * the context's ApplicationEnd by [[cached]]; also the test seam and
    * the bench harness's between-family housekeeping hook (releasing the
    * localCheckpointed model state the cached DataFrames pin in the
    * block manager, so ContextCleaner can reclaim it after GC).
    */
  def evictSession(s: SparkSession): Unit =
    registry.forEach(_.keySet.removeIf(k => k._1 eq s))

  /** How many cached entries a session currently owns (test seam). */
  def cachedEntries(s: SparkSession): Int = {
    var n = 0
    registry.forEach(c => n += c.keySet.stream.filter(k => k._1 eq s).count().toInt)
    n
  }

  /** (registered caches holding ≥1 entry for `s`, total registered) —
    * the seam behind ModelCacheSpec's warm-coverage guard: after a
    * [[ModelWarm]] pass every registered cache must be populated, so a
    * NEW cache added without a warm step fails a test instead of
    * silently re-landing its training cost on whichever timed bench
    * query sorts first (the round-9 q160/q104/q207 attribution bug).
    */
  def cacheCoverage(s: SparkSession): (Int, Int) = {
    var hit = 0
    registry.forEach(c => if (c.keySet.stream.anyMatch(k => k._1 eq s)) hit += 1)
    (hit, registry.size)
  }

  private val hooked = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean])

  /** Cheap content fingerprint of a corpus directory: recursive
    * (path, size, mtime) fold over the FS listing — no data read. Folded
    * into the cache key so a rewritten corpus (e.g. testdata
    * regeneration within one session) misses the cache instead of
    * silently serving results trained on the old bytes. A missing dir
    * fingerprints as 0 (the training itself will surface the error).
    */
  private def fingerprint(s: SparkSession, d: String): Long =
    try {
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var h = 1125899906842597L
      while (it.hasNext) {
        val f = it.next()
        h = h * 31 + f.getPath.getName.hashCode
        h = h * 31 + f.getLen
        h = h * 31 + f.getModificationTime
      }
      h
    } catch { case _: java.io.IOException => 0L }

  private[operators] def cached[V](cache: Cache[V], s: SparkSession, d: String)(train: => V): V = {
    if (hooked.add(s))
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          evictSession(s)
          hooked.remove(s): Unit
        }
      })
    registry.forEach(_.keySet.removeIf(k => k._1.sparkContext.isStopped))
    cache.computeIfAbsent((s, s"$d@${fingerprint(s, d)}"), _ => train)
  }
}
