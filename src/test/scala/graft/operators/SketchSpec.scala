package graft.operators

import graft.SparkSpec

/** Invariant pins for the audited sketch family (q182 CMS, q190
  * quantile bins, q191 HLL, q192 relational bloom) — each sketch has a
  * mathematical guarantee the oracle's value-equality check cannot
  * express by itself; these tests state them directly.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  // Misra–Gries single-partition guarantee: an item with frequency
  // > n/k SURVIVES the summary. Stream: 100×a + 50×b + 60 singletons
  // (n = 210, k = 5 → threshold 42): a and b must survive even though
  // the 60 distinct singletons force repeated decrement-all rounds.
  test("Misra-Gries partition summary keeps every item above n/k") {
    val stream = Seq.fill(100)("a") ++ Seq.fill(50)("b") ++
      (1 to 60).map(i => s"x$i")
    val kept = Sketches.mgPartition(stream.iterator, k = 5).toMap
    assert(kept.contains("a") && kept.contains("b"))
    assert(kept.size <= 5)
    // counters are underestimates, never overestimates
    assert(kept("a") <= 100 && kept("b") <= 50)
  }

  // Two-pass protocol end-to-end: heavyHitters over a multi-partition
  // token relation is BIT-IDENTICAL to the exact GROUP BY + HAVING —
  // the sketch bounds the shuffle, the answer never changes. k = 40 on
  // the corpus tokens forces real decrement churn per partition while
  // the top tokens (~3.5% mass each) still clear the 1/40 bar.
  test("heavyHitters equals the exact group-by across partitions") {
    import org.apache.spark.sql.functions._
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("tok"))
      .repartition(7)
    val got = Sketches.heavyHitters(toks, "tok", k = 40)
      .as[(String, Long, Long)].collect().toSet
    val n = toks.count()
    val exact = toks.groupBy($"tok").agg(count(lit(1)).as("c"))
      .filter($"c" * 40 > n)
      .select($"tok", $"c", lit(n)).as[(String, Long, Long)].collect().toSet
    assert(got == exact)
    assert(got.nonEmpty)
  }

  // CMS inner-product F2 estimate (q240): one-sided like the point
  // estimates — hash collisions only ADD cross terms, so a planner
  // sizing shuffle partitions off it over-provisions, never under.
  test("F2 join-size estimate is one-sided: cms_f2 >= exact_f2") {
    val (exact, est, over) = TextQueries.queries("q240_f2_join_estimate")(spark, sf)
      .as[(Long, Long, Long)].collect().head
    assert(est >= exact && over >= 0 && exact > 0)
  }

  test("CMS error is one-sided: estimate >= exact for every audited token") {
    val rows = TextQueries.queries("q182_cms_calibration")(spark, sf)
      .select($"exact", $"cms_estimate").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (ex, est) => assert(est >= ex, s"exact $ex est $est") }
  }

  test("quantile sketch brackets every exact percentile within the bin bound") {
    // upper-bound estimates: est >= exact always, and the 4-sub-bin
    // octave keeps est <= exact + exact/4 (+1 for the singleton floor)
    val rows = CurationQueries.queries("q190_quantile_sketch")(spark, sf)
      .select($"p50_exact", $"p50_est", $"p90_exact", $"p90_est",
        $"p99_exact", $"p99_est")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (e50, s50, e90, s90, e99, s99) =>
      Seq((e50, s50), (e90, s90), (e99, s99)).foreach { case (e, st) =>
        assert(st >= e && st <= e + e / 4 + 1, s"exact $e est $st")
      }
    }
  }

  test("HLL: deterministic across runs; linear-counting branch lands near exact") {
    val q = TextQueries.queries("q191_hll_calibration")(spark, sf)
      .select($"source", $"exact_distinct", $"hll_best").as[(String, Long, Double)]
      .collect()
    assert(q.nonEmpty)
    // bit-identical re-run (the whole point of the no-libm design)
    val again = TextQueries.queries("q191_hll_calibration")(spark, sf)
      .select($"source", $"exact_distinct", $"hll_best").as[(String, Long, Double)]
      .collect()
    assert(q.sortBy(_._1).sameElements(again.sortBy(_._1)))
    // at sf0.001 every source sits in the linear-counting range where
    // the corrected estimator is tight (raw HLL would be ~2x off here)
    q.foreach { case (src, ex, best) =>
      assert(math.abs(best - ex) <= 0.35 * ex + 3, s"$src exact $ex best $best")
    }
  }

  test("relational bloom admits every true member (no false negatives)") {
    val r = DedupQueries.queries("q192_bloom_fpr")(spark, sf)
      .select($"n_pass", $"n_true", $"n_false_pos").as[(Long, Long, Long)]
      .head()
    // n_pass = true members passed + false positives; equality with
    // n_true proves zero false negatives — the bloom contract
    assert(r._1 - r._3 == r._2, r.toString)
  }

  test("more-like-this plan is shingle equi-join — no cross product") {
    val plan = RetrievalQueries.queries("q197_more_like_this")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
