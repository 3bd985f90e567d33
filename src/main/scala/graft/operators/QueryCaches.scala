package graft.operators

import org.apache.spark.sql.SparkSession

/** Bounded compute-once registry shared by the query packs' train-once
  * caches (similarity models, verified near-dup pairs). One entry per
  * (session, corpus dir + content fingerprint) — the fingerprint (an
  * order-independent mix of per-file names and sizes, deliberately NO
  * mtime, see [[fingerprint]]) makes an in-session corpus rewrite a
  * cache miss, not stale data; entries are EVICTED when their session's
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
  def evictSession(s: SparkSession): Unit = {
    registry.forEach(_.keySet.removeIf(k => k._1 eq s))
    fpMemo.keySet.removeIf(_._1 eq s)
  }

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

  /** Cheap content fingerprint of a corpus directory: COMMUTATIVE sum
    * of per-file (name, size) hashes over the recursive FS listing — no
    * data read. Folded into the cache key so a rewritten corpus (e.g.
    * testdata regeneration within one session) misses the cache instead
    * of silently serving results trained on the old bytes. Two
    * deliberate non-features, both bench-regression lessons (round 10's
    * official run re-trained shared models behind consumer queries,
    * 4-40× per-query blow-ups totalling ~430 s):
    *
    *  - ORDER-INDEPENDENT: `fs.listFiles` guarantees no enumeration
    *    order, so an order-sensitive fold (the previous form) silently
    *    keys the same corpus differently whenever readdir order varies
    *    between calls — every "hit" becomes a full retrain.
    *  - NO MTIME: a copy/touch/rsync of unchanged bytes (or mtime
    *    granularity differences across filesystems) must not invalidate
    *    trained models. Spark-written datasets get fresh part-file
    *    NAMES on every rewrite, so (name, size) already catches any
    *    real rewrite the mtime term could.
    *
    * The value is recomputed on EVERY cache access BY DEFAULT —
    * deliberately NOT memoized. A (session, dir) memo (round 11's
    * shape) made the object-level guarantee a lie: an in-session
    * rewrite of the SAME dir kept serving models trained on the old
    * bytes until [[evictSession]]. Key stability without the memo
    * comes from the hash itself (order-independent, mtime-free:
    * unchanged files ⇒ identical fingerprint on every recomputation),
    * and the cost is one driver-side recursive listing per access —
    * metadata-only, microseconds against the queries it keys on this
    * rig. Fronting a millions-of-files object store, per-access
    * listing becomes O(files) namenode metadata per access: set
    * `graft.cache.fingerprintTtlMs` (session conf) to memoize the
    * fingerprint for that long, and call [[invalidate]] after any
    * in-session rewrite of a memoized dir — under a TTL the staleness
    * guarantee is explicitly time-bounded, the documented trade
    * (ModelCacheSpec regression-tests both regimes). A missing dir
    * fingerprints as 0 (the training itself will surface the error).
    *
    * Each per-file hash passes through a 64-bit finalizer BEFORE the
    * commutative sum: a raw linear term (nameHash·P + len) would make
    * the sum collapse to (Σ nameHash, Σ len), so any byte
    * redistribution preserving the name multiset and the total size —
    * e.g. a regeneration where part-0000/part-0001 swap sizes — would
    * collide and silently serve models trained on the old bytes. The
    * mix makes each (name, size) contribution non-linear, so only
    * identical multisets of (name, size) pairs agree.
    */
  // splitmix64 finalizer (public-domain constants; Steele et al. 2014)
  private def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  // fingerprint memo for the TTL regime — (session, dir) → (value,
  // computed-at nanos). Absent entries and ttl <= 0 mean per-access
  // listing; swept with the session like every other cache.
  private val fpMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (Long, Long)]

  /** Drop `dir`'s memoized fingerprint for this session — the explicit
    * invalidation seam for the TTL regime: call it after rewriting a
    * corpus in-session and the next cache access re-lists immediately
    * (and, the content having changed, misses and retrains). A no-op
    * when nothing is memoized.
    */
  def invalidate(s: SparkSession, dir: String): Unit =
    fpMemo.keySet.removeIf(k => (k._1 eq s) && k._2 == dir)

  private def fingerprintCached(s: SparkSession, d: String): Long = {
    val ttlMs = Dedup.longConf(s, "graft.cache.fingerprintTtlMs", 0L)
    if (ttlMs <= 0L) { invalidate(s, d); fingerprint(s, d) }
    else {
      val now = System.nanoTime()
      val k = (s, d)
      Option(fpMemo.get(k)) match {
        case Some((v, at)) if (now - at) / 1000000L < ttlMs => v
        case _ =>
          val v = fingerprint(s, d)
          fpMemo.put(k, (v, now)): Unit
          v
      }
    }
  }

  private[operators] def fingerprint(s: SparkSession, d: String): Long =
    try {
      val p = new org.apache.hadoop.fs.Path(d)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var h = 0L
      while (it.hasNext) {
        val f = it.next()
        h += mix64(f.getPath.getName.hashCode * 1125899906842597L + f.getLen)
      }
      h
    } catch { case _: java.io.IOException => 0L }

  // Hit/miss ledger (bench attribution): a MISS is a full model
  // training, so the bench snapshots these around every timed query and
  // publishes nonzero deltas in the detail JSON — a driver-environment
  // regression like round 10's is then attributable from the committed
  // evidence alone. Every miss also logs its composite key to stderr.
  private val hitCount = new java.util.concurrent.atomic.AtomicLong
  private val missCount = new java.util.concurrent.atomic.AtomicLong
  /** (hits, misses) since JVM start — monotonic; diff around a region
    * to attribute it. */
  def stats: (Long, Long) = (hitCount.get, missCount.get)

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
    fpMemo.keySet.removeIf(_._1.sparkContext.isStopped)
    val key = (s, s"$d@${fingerprintCached(s, d)}")
    // Sweep SUPERSEDED entries for the same (session, dir): after an
    // in-session corpus rewrite the new fingerprint mints a new key,
    // and without this sweep the old entry would sit in the registry
    // until session end, strongly referencing DataFrames that pin the
    // stale model's localCheckpoint blocks — repeated regeneration in
    // a long-lived session would grow the block manager unboundedly.
    // Keyed on the "dir@" prefix, so other dirs' entries are untouched.
    registry.forEach(_.keySet.removeIf(k =>
      (k._1 eq s) && k._2.startsWith(d + "@") && k._2 != key._2))
    var missed = false
    val v = cache.computeIfAbsent(key, _ => { missed = true; train })
    if (missed) {
      missCount.incrementAndGet()
      System.err.println(s"[graft-cache] miss (training now): ${key._2}")
    } else hitCount.incrementAndGet(): Unit
    v
  }
}
