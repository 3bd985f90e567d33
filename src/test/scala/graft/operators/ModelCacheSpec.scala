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
}
