package graft.operators

import graft.SparkSpec

/** The query pack's train-once model caches must be bounded: entries
  * are keyed by session instance, never shared across sessions, and a
  * session's entries are evictable (wired to ApplicationEnd for real
  * session shutdown; [[SimilarityQueries.evictSession]] is the seam).
  */
class ModelCacheSpec extends SparkSpec {

  test("model caches are per-session; a dead session's entries evict without touching others") {
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    // populate via a gated query that trains the coarse index + exact baseline
    SimilarityQueries.queries("q86_ann_recall")(s1, sf).count(): Unit
    val n1 = SimilarityQueries.cachedEntries(s1)
    assert(n1 > 0)
    // a different session never serves from s1's models
    assert(SimilarityQueries.cachedEntries(s2) == 0)
    SimilarityQueries.queries("q86_ann_recall")(s2, sf).count(): Unit
    assert(SimilarityQueries.cachedEntries(s2) > 0)
    // eviction is per-session: s2's entries go, s1's stay
    SimilarityQueries.evictSession(s2)
    assert(SimilarityQueries.cachedEntries(s2) == 0)
    assert(SimilarityQueries.cachedEntries(s1) == n1)
    SimilarityQueries.evictSession(s1)
    assert(SimilarityQueries.cachedEntries(s1) == 0)
  }

  test("cache keys are stable under mtime churn: one miss, then hits (round-10 driver-bench regression class)") {
    import java.nio.file.{Files, Path}
    val s = spark.newSession()
    // a private corpus copy we may legally touch (testdata is read-only)
    val dir = Files.createTempDirectory("graft-fp-corpus")
    val src = Path.of(sf, "documents.parquet")
    // the table may be a single parquet file or a part-file directory
    if (Files.isDirectory(src)) {
      val sub = Files.createDirectory(dir.resolve("documents.parquet"))
      scala.util.Using.resource(Files.list(src))(_.forEach { p =>
        Files.copy(p, sub.resolve(p.getFileName.toString)): Unit
      })
    } else Files.copy(src, dir.resolve("documents.parquet")): Unit
    val (_, m0) = QueryCaches.stats
    DedupQueries.shingles(s, dir.toString).count(): Unit // trains: 1 miss
    // churn every mtime the way a driver-side rsync/copy of unchanged
    // bytes would — the suspected round-10 invalidation source. Neither
    // the memoized key nor a fresh fingerprint may care.
    scala.util.Using.resource(Files.walk(dir))(_.forEach(p =>
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(12345000L)): Unit))
    DedupQueries.shingles(s, dir.toString).count(): Unit // must be a HIT
    DedupQueries.shingles(s, dir.toString).count(): Unit // and again
    val (_, m1) = QueryCaches.stats
    assert(m1 - m0 == 1, s"expected exactly one training miss, got ${m1 - m0}")
    QueryCaches.evictSession(s)
  }

  test("fingerprint memo: default regime re-lists per access (in-session rewrite ⇒ miss); TTL regime is stale-by-contract until invalidate(dir)") {
    import java.nio.file.{Files, Path}
    val s = spark.newSession()
    // private corpus copy (same device as the mtime test)
    val dir = Files.createTempDirectory("graft-ttl-corpus")
    val src = Path.of(sf, "documents.parquet")
    if (Files.isDirectory(src)) {
      val sub = Files.createDirectory(dir.resolve("documents.parquet"))
      scala.util.Using.resource(Files.list(src))(_.forEach { p =>
        Files.copy(p, sub.resolve(p.getFileName.toString)): Unit
      })
    } else Files.copy(src, dir.resolve("documents.parquet")): Unit
    def misses = QueryCaches.stats._2
    def access(): Unit = DedupQueries.shingles(s, dir.toString).count(): Unit
    // a sibling file changes the dir fingerprint without touching the
    // parquet the query reads — the cheapest stand-in for a rewrite
    def rewrite(n: String): Unit =
      Files.write(dir.resolve(n), Array.fill[Byte](7)('x')): Unit
    val m0 = misses
    access()
    assert(misses - m0 == 1) // trains once
    access()
    assert(misses - m0 == 1) // unchanged corpus ⇒ hit
    rewrite("extra1")
    access()
    assert(misses - m0 == 2,
      "default regime must re-list per access: an in-session rewrite is " +
        "an IMMEDIATE miss (the round-11 stale-memo hazard)")
    // TTL regime: listing memoized, staleness explicitly time-bounded
    s.conf.set("graft.cache.fingerprintTtlMs", "3600000")
    access()
    assert(misses - m0 == 2) // same content ⇒ hit; memo primed
    rewrite("extra2")
    access()
    assert(misses - m0 == 2,
      "under a TTL the rewrite is invisible until expiry/invalidate — " +
        "the documented trade for O(1) listings on a huge store")
    QueryCaches.invalidate(s, dir.toString) // the explicit seam
    access()
    assert(misses - m0 == 3,
      "invalidate(dir) must force a fresh listing ⇒ miss ⇒ retrain")
    s.conf.unset("graft.cache.fingerprintTtlMs")
    QueryCaches.evictSession(s)
  }

  test("fingerprint is (name, size)-commutative: independent of creation order, path prefix, and mtime") {
    import java.nio.file.{Files, Path}
    val s = spark.newSession()
    def mk(names: Seq[(String, Int)]): Path = {
      val d = Files.createTempDirectory("graft-fp")
      names.foreach { case (n, len) =>
        Files.write(d.resolve(n), Array.fill[Byte](len)('x')): Unit
      }
      d
    }
    // same (name, size) multiset, different parent dir, reversed
    // creation order (hence different readdir layout on many FS), and
    // different mtimes — the fingerprint must agree, because any of
    // those varying across two calls in one run retrains EVERY cached
    // model behind a timed query
    val files = Seq("part-0000.parquet" -> 100, "part-0001.parquet" -> 37, "_SUCCESS" -> 0)
    val a = mk(files)
    Thread.sleep(20)
    val b = mk(files.reverse)
    assert(QueryCaches.fingerprint(s, a.toString) == QueryCaches.fingerprint(s, b.toString))
    // and a genuinely different corpus (one size differs) must not collide
    val c = mk(Seq("part-0000.parquet" -> 101, "part-0001.parquet" -> 37, "_SUCCESS" -> 0))
    assert(QueryCaches.fingerprint(s, a.toString) != QueryCaches.fingerprint(s, c.toString))
    // nor may a byte REDISTRIBUTION with the same name multiset and the
    // same total size: a linear per-file term would collapse the
    // commutative sum to (Σ nameHash, Σ len) and serve stale models on
    // exactly the in-session-regeneration case the fingerprint exists
    // for — the per-file finalizer mix is what this pins
    val d = mk(Seq("part-0000.parquet" -> 37, "part-0001.parquet" -> 100, "_SUCCESS" -> 0))
    assert(QueryCaches.fingerprint(s, a.toString) != QueryCaches.fingerprint(s, d.toString))
    QueryCaches.evictSession(s)
  }

  test("ModelWarm covers EVERY registered cache (new caches must ship a warm step)") {
    // Force-load EVERY query pack first: newCache registration happens
    // at object init, so a cache in a pack this test never touched
    // would otherwise be invisible to the registry and the guard would
    // pass exactly when it should fail. SparkEntry.queries references
    // all packs.
    assert(graft.SparkEntry.queries.nonEmpty)
    // a fresh session so coverage counts only what the warm pass built
    val s = spark.newSession()
    graft.operators.ModelWarm.steps.foreach { case (name, fn) =>
      try fn(s, sf)
      catch { case e: Throwable => fail(s"warm step $name failed: $e") }
    }
    val (hit, total) = QueryCaches.cacheCoverage(s)
    // every QueryCaches registry must be populated after the pass —
    // otherwise that cache's training cost silently lands on whichever
    // timed bench query sorts first (the round-9 attribution bug)
    assert(hit == total && total >= 10, s"warm pass covered $hit of $total caches")
    QueryCaches.evictSession(s)
    assert(QueryCaches.cacheCoverage(s)._1 == 0)
  }
}
