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
