package graft.operators

import graft.SparkSpec

/** Invariant pins for the audited sketch family (q182 CMS, q190
  * quantile bins, q191 HLL, q192 relational bloom) — each sketch has a
  * mathematical guarantee the oracle's value-equality check cannot
  * express by itself; these tests state them directly.
  */
class SketchSpec extends SparkSpec {
  import spark.implicits._

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
