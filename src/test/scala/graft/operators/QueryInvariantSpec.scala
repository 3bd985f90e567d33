package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Targeted invariant cases for the round-8 query-pack additions that
  * until now had only gate (oracle) coverage: the keeper-flow matrix
  * (q204), path mining (q205), user features (q206), and the privacy
  * audit/enforcement pair (q209/q210). Each test pins the property the
  * query CLAIMS, independently of the DuckDB oracle.
  */
class QueryInvariantSpec extends SparkSpec {
  import spark.implicits._

  test("q204 keeper-flow: flows conserve dedup attrition exactly (Σ n_lost = docs − clusters)") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"source")
    // the same pair build the query rides (constants mirror DedupQueries)
    val pairs = Dedup.minhashLshNearDups(
      graft.sources.Tables.documents(spark, sf), "text", "doc_id",
      ngram = 3, k = 8, bands = 4, minJaccard = 0.2)
      .select($"id_1", $"id_2")
    val cc = Dedup.connectedComponents(pairs, docs.select($"doc_id"), "doc_id")
    val nDocs = cc.count()
    val nClusters = cc.select($"cluster_id").distinct().count()
    val flow = DedupQueries.queries("q204_keeper_flow")(spark, sf)
      .as[(String, String, Long)].collect()
    // every dropped doc appears in exactly one flow cell: totals match
    assert(flow.map(_._3).sum == nDocs - nClusters)
    // keepers really are cluster minima: a keeper_source must be the
    // source of the min-id member of some cluster
    val keeperSources = cc.groupBy($"cluster_id")
      .agg(count(lit(1)).as("sz")).filter($"sz" > 1)
      .join(docs.select($"doc_id".as("cluster_id"), $"source"), "cluster_id")
      .select($"source").as[String].collect().toSet
    assert(flow.map(_._2).toSet.subsetOf(keeperSources))
  }

  test("q205 path mining: 3-step sequences per user, deterministic order, bounded top-k") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ev").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
    // user 1: x y z x → paths (x,y,z), (y,z,x); user 2: a b → none
    val rows = Seq(
      (1L, ts(0), 1L, "x", 1.0, "{}"), (2L, ts(1), 1L, "y", 1.0, "{}"),
      (3L, ts(2), 1L, "z", 1.0, "{}"), (4L, ts(3), 1L, "x", 1.0, "{}"),
      (5L, ts(0), 2L, "a", 1.0, "{}"), (6L, ts(1), 2L, "b", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = EventsQueries.queries("q205_event_paths")(spark, dir)
      .as[(String, String, String, Long)].collect().toSeq
    // paths never cross users, each consecutive triple counted once,
    // ties ordered lexicographically after the count
    assert(got == Seq(("x", "y", "z", 1L), ("y", "z", "x", 1L)))
    // and the top-k bound holds on the real corpus
    assert(EventsQueries.queries("q205_event_paths")(spark, sf).count() <= 20)
  }

  test("q206 user features: associative argmax ties break to the larger type; recency exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ev6").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(h: Int) = new java.sql.Timestamp(base.getTime + h * 3600000L)
    // user 1: exact tie 2×"aa" vs 2×"zz" → modal must be "zz" (max
    // struct breaks ties on the LARGER string, the documented policy);
    // user 2 anchors the corpus max ts so user 1's recency is 5 hours
    val rows = Seq(
      (1L, ts(0), 1L, "aa", 1.5, "{}"), (2L, ts(1), 1L, "aa", 2.5, "{}"),
      (3L, ts(2), 1L, "zz", 3.0, "{}"), (4L, ts(3), 1L, "zz", 0.5, "{}"),
      (5L, ts(8), 2L, "bb", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = EventsQueries.queries("q206_user_features")(spark, dir)
      .select($"user_id", $"n_events", $"n_types", $"sum_value",
        $"modal_type", $"recency_hours")
      .as[(Long, Long, Long, Double, String, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 4L, 2L, 7.5, "zz", 5L)))
    assert(got(2L) == ((2L, 1L, 1L, 1.0, "bb", 0L)))
  }

  test("q209/q210: every released non-NULL band sits in a ≥k cell; suppressed mass matches the audit") {
    val audit = AnalyticsQueries.queries("q209_k_anonymity")(spark, sf)
    val release = AnalyticsQueries.queries("q210_anon_release")(spark, sf)
    // the release carries no direct identifier and no per-row flag
    assert(release.columns.toSeq ==
      Seq("c_nationkey", "c_mktsegment", "bal_kbucket"))
    val relCells = release.filter($"bal_kbucket".isNotNull)
      .groupBy($"c_nationkey", $"c_mktsegment", $"bal_kbucket")
      .agg(count(lit(1)).as("n_rel"))
    val joined = relCells.join(audit,
      Seq("c_nationkey", "c_mktsegment", "bal_kbucket"))
    // every surviving cell is audited, not at risk, and fully released
    assert(joined.count() == relCells.count())
    assert(joined.filter($"at_risk" || $"n_rel" =!= $"n_rows").count() == 0)
    assert(joined.filter($"n_rows" < 5).count() == 0)
    // suppressed rows = exactly the at-risk cells' population
    val nSuppressed = release.filter($"bal_kbucket".isNull).count()
    val atRiskMass = audit.filter($"at_risk")
      .agg(sum($"n_rows")).as[Long].head()
    assert(nSuppressed == atRiskMass && nSuppressed > 0)
  }
}
