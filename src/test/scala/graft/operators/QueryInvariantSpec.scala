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

  // q216: the two-pass heavy-hitter plan must keep its scale claims —
  // exact recount via a BROADCAST join on the bounded candidate set,
  // never a cartesian, and the reported total equals the token count.
  test("q216 heavy hitters: broadcast exact pass, no cartesian, total conserved") {
    val df = TextQueries.queries("q216_heavy_hitters")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val rows = df.as[(String, Long, Long)].collect()
    val n = graft.sources.Tables.documents(spark, sf)
      .select(explode(split($"text", " "))).count()
    rows.foreach { case (_, c, t) => assert(t == n && c * 40 > 0 && c <= n) }
  }

  // q218: per-language terciles ride orderedRanks — the executed plan
  // of the returned frame must contain NO Window operator (the whole
  // point of the composite-key rank), and terciles partition each
  // language with head ≤ middle ≤ tail sizes within 1.
  test("q218 CCNet buckets: no Window in the plan; terciles balanced per language") {
    val df = CurationQueries.queries("q218_ccnet_buckets")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    val sizes = df.groupBy($"lang", $"bucket").count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (l, a) =>
        l -> a.map(r => r._2 -> r._3).toMap.withDefaultValue(0L)
      }
    sizes.foreach { case (l, m) =>
      val (h, mi, t) = (m("head"), m("middle"), m("tail"))
      assert(h <= mi + 1 && mi <= t + 1 && (h + mi + t) > 0, s"$l: $h/$mi/$t")
    }
  }

  // q220 incremental CC ≡ q68 full recompute, proven engine-side (the
  // gate proves it against DuckDB; this pins it within Spark too).
  test("q220 incremental CC equals the full-corpus recompute row for row") {
    val inc = DedupQueries.queries("q220_incremental_cc")(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    val full = DedupQueries.queries("q68_dedup_clusters")(spark, sf)
      .select($"doc_id", $"cluster_id", $"cluster_size")
      .as[(Long, Long, Long)].collect().toSet
    assert(inc == full && inc.nonEmpty)
  }

  // q226: the sweep-line peak must agree with a brute-force recount of
  // concurrent sessions at every session-start instant.
  test("q226 peak concurrency matches a brute-force interval recount") {
    val (peak, nSess, firstUs) =
      EventsQueries.queries("q226_peak_concurrency")(spark, sf)
        .as[(Long, Long, Long)].collect().head
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val sess = graft.sources.Tables.events(spark, sf)
      .withColumn("us", unix_micros($"ts"))
      .withColumn("new_s", when(lag($"us", 1).over(w).isNull ||
        ($"us" - lag($"us", 1).over(w)) > 30L * 60 * 1000000, 1).otherwise(0))
      .withColumn("sid", sum($"new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"sid")
      .agg(min($"us").as("s"), max($"us").as("e"))
      .as[(Long, Long, Long, Long)].collect().map(r => (r._3, r._4))
    assert(nSess == sess.length)
    val brute = sess.map { case (s, _) =>
      sess.count { case (s2, e2) => s2 <= s && s <= e2 }
    }.max
    assert(peak == brute, s"sweep $peak vs brute $brute")
    // the reported first-peak instant really carries peak concurrency
    val atFirst = sess.count { case (s2, e2) => s2 <= firstUs && firstUs <= e2 }
    assert(atFirst == peak)
  }

  // q227: stationary mass stays within the fixed-point budget — it can
  // only LEAK (integer truncation, sink states), never inflate.
  test("q227 Markov mass: non-negative, bounded by the initial 1e12 budget") {
    val masses = EventsQueries.queries("q227_markov_stationary")(spark, sf)
      .as[(String, Long)].collect()
    assert(masses.nonEmpty)
    masses.foreach { case (_, m) => assert(m >= 0) }
    val tot = masses.map(_._2).sum
    assert(tot > 0 && tot <= 1000000000000L, s"total $tot")
  }

  // q229: the audit itself must be internally consistent — a cell's
  // distinct-sensitive count can exceed neither its row count nor the
  // attribute's global cardinality, the l_ok flag must be exactly the
  // ≥3 predicate it claims, and no customer may vanish from the audit.
  test("q229 l-diversity: cell counts consistent, flag exact, total mass conserved") {
    val cells = AnalyticsQueries.queries("q229_l_diversity")(spark, sf)
      .as[(Int, Int, Long, Long, Boolean)].collect()
    assert(cells.nonEmpty)
    val nSegments = graft.sources.Tables.customer(spark, sf)
      .select($"c_mktsegment").distinct().count()
    cells.foreach { case (_, _, nRows, nSens, lOk) =>
      assert(nSens >= 1 && nSens <= math.min(nRows, nSegments))
      assert(lOk == (nSens >= 3))
    }
    assert(cells.map(_._3).sum ==
      graft.sources.Tables.customer(spark, sf).count())
  }

  // q242: greedy-by-density with an exclusive prefix sum means the
  // selected token mass brackets the budget tightly — at least the
  // budget whenever documents were left out, and under budget + one
  // straddling document — and never exceeds the corpus.
  test("q242 budget select: selected token mass brackets the 40% budget within one doc") {
    val rep = CurationQueries.queries("q242_budget_select")(spark, sf)
      .select($"n_docs", $"n_selected", $"tok_selected")
      .as[(Long, Long, Long)].collect()
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(size(split($"text", " ")).cast("long").as("t"))
    val total = docs.agg(sum($"t")).as[Long].head()
    val maxTok = docs.agg(max($"t")).as[Long].head()
    val budget = total * 2 / 5
    val selTok = rep.map(_._3).sum
    rep.foreach { case (nd, ns, _) => assert(ns >= 0 && ns <= nd) }
    assert(selTok < budget + maxTok, s"selTok=$selTok budget=$budget max=$maxTok")
    if (rep.map(_._1).sum > rep.map(_._2).sum) // some doc was left out
      assert(selTok >= budget, s"selTok=$selTok < budget=$budget with docs unselected")
  }

  // q245: probing Hamming-1 neighbor buckets can only ADD candidates —
  // every exact-bucket pair q51 verifies must survive in the
  // multi-probe relation (the strict-superset claim in its doc).
  test("q245 multi-probe LSH pairs are a superset of q51's exact-bucket pairs") {
    val exact = SimilarityQueries.queries("q51_ann_lsh")(spark, sf)
      .select($"id_1", $"id_2")
    val multi = SimilarityQueries.queries("q245_multiprobe_lsh")(spark, sf)
      .select($"id_1", $"id_2")
    assert(exact.count() > 0)
    assert(exact.join(multi, Seq("id_1", "id_2"), "left_anti").count() == 0)
    assert(multi.count() >= exact.count())
  }

  // q246: containment dominates Jaccard pointwise (min(n1,n2) ≤
  // n1+n2−inter always), both stay in [0, 10000] bps, and the
  // intersection can't exceed the smaller set.
  test("q246 containment ≥ Jaccard on every pair; bps bounded") {
    val rows = DedupQueries.queries("q246_containment")(spark, sf)
      .select($"inter", $"n1", $"n2", $"cont_bps", $"jac_bps", $"gap_bps")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (inter, n1, n2, cont, jac, gap) =>
      assert(inter >= 1 && inter <= math.min(n1, n2))
      assert(cont >= jac && gap == cont - jac)
      assert(cont <= 10000 && jac >= 0)
    }
  }

  // q248: the policy's defining property — cluster-keyed hashing can
  // never split a cluster (n_spanning = 0 by construction), and both
  // modes partition the same universe (split sizes sum to the corpus).
  test("q248 cluster-aware split: zero spanning clusters; both modes partition the corpus") {
    val rep = DedupQueries.queries("q248_cluster_split")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    val byMode = rep.map(r => r._1 -> r).toMap
    assert(byMode.keySet == Set("cluster_aware", "doc_level"))
    assert(byMode("cluster_aware")._5 == 0, "cluster-aware split leaked a cluster")
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    rep.foreach { case (_, tr, va, te, _) => assert(tr + va + te == nDocs) }
  }

  // q235: deterministic Poisson draws make the bootstrap repeatable,
  // the interval must be ordered, and at this corpus the point
  // estimate sits inside its own 90% CI (stable forever: every draw
  // is a salted-hash threshold, nothing is random).
  test("q235 bootstrap: CI ordered and contains the point estimate; run-to-run identical") {
    val a = TextQueries.queries("q235_bootstrap_ci")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a.nonEmpty)
    a.foreach { case (src, n, mean, lo, hi) =>
      assert(n > 0)
      assert(lo <= hi, src)
      assert(mean >= lo && mean <= hi, s"$src: $mean outside [$lo, $hi]")
    }
    val b = TextQueries.queries("q235_bootstrap_ci")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  // q239: both arms must be present, cells can't exceed k = 8, and the
  // hottest cell is by pigeonhole at least the perfect n/k share —
  // skew_bps ≥ ~10000 whenever all 8 cells are occupied.
  test("q239 occupancy: both methods, cells ≤ k, skew bounded below by pigeonhole") {
    val rep = SimilarityQueries.queries("q239_seed_occupancy")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rep.map(_._1).toSet == Set("minid", "kmpp"))
    rep.foreach { case (m, nCells, largest, smallest, skew) =>
      assert(nCells >= 1 && nCells <= 8, m)
      assert(largest >= smallest && smallest > 0, m)
      if (nCells == 8) assert(skew >= 9999, s"$m skew=$skew")
    }
  }

  // q241: the quarantine split must reproduce the injection rule
  // exactly — every 7th doc truncated and routed, everyone else parsed
  // with its values intact.
  test("q241 quarantine: split counts and recovered sums equal the injection rule") {
    val (nValid, nQuar, sumIds, sumChars) =
      WarehouseQueries.queries("q241_corrupt_quarantine")(spark, sf)
        .as[(Long, Long, Long, Long)].head()
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars")
    val exp = docs.agg(
      sum(when($"doc_id" % 7 =!= 0, 1L).otherwise(0L)),
      sum(when($"doc_id" % 7 === 0, 1L).otherwise(0L)),
      sum(when($"doc_id" % 7 =!= 0, $"doc_id")),
      sum(when($"doc_id" % 7 =!= 0, $"n_chars")))
      .as[(Long, Long, Long, Long)].head()
    assert((nValid, nQuar, sumIds, sumChars) == exp)
  }

  // q244: every audited cluster is connected (≥ size−1 edges), its
  // Jaccard range is ordered and respects the 0.2 admission floor,
  // and weak edges can't outnumber edges.
  test("q244 edge strength: connectivity, ordered bps range, admission floor") {
    val rows = DedupQueries.queries("q244_cluster_strength")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (cid, nMembers, nEdges, minJ, maxJ, nWeak) =>
      assert(nMembers >= 2, cid)
      assert(nEdges >= nMembers - 1, s"cluster $cid disconnected in audit")
      assert(minJ <= maxJ && minJ >= 2000 && maxJ <= 10000, cid)
      assert(nWeak >= 0 && nWeak <= nEdges, cid)
    }
  }

  // q247: exclusive mass is a subset of total mass per source, in
  // counts and in grams, and the bps stays a share.
  test("q247 novelty: novel ⊆ total per source") {
    val rows = TextQueries.queries("q247_source_novelty")(spark, sf)
      .select($"gram_mass", $"novel_mass", $"n_distinct_grams",
        $"n_novel_grams", $"novelty_bps")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (mass, novel, nd, nn, bps) =>
      assert(novel >= 0 && novel <= mass)
      assert(nn >= 0 && nn <= nd)
      assert(bps >= 0 && bps <= 10000)
      assert(bps == novel * 10000 / mass)
    }
  }

  // q249: the 2×2 agreement matrix partitions the corpus — cell counts
  // sum to the document total and shares to 10000 bps up to floor loss.
  test("q249 agreement matrix partitions the corpus; shares sum to ~10000 bps") {
    val rows = TextQueries.queries("q249_rule_agreement")(spark, sf)
      .as[(Boolean, Boolean, Long, Long)].collect()
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
    val nDocs = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_._3).sum == nDocs)
    val bps = rows.map(_._4).sum
    assert(bps <= 10000 && bps > 10000 - rows.length, s"bps=$bps")
    rows.foreach { case (_, _, n, share) => assert(share == n * 10000 / nDocs) }
  }

  // q219: the grid must cover exactly the K = 8 factorizations and the
  // chosen flag must mark the true argmin (smallest bands on ties).
  test("q219 auto-tune: full factorization grid, chosen = argmin") {
    val rows = DedupQueries.queries("q219_lsh_autotune")(spark, sf)
      .as[(Int, Int, Long, Boolean)].collect()
    assert(rows.map(r => (r._1, r._2)).toSet ==
      Set((1, 8), (2, 4), (4, 2), (8, 1)))
    val best = rows.minBy(r => (r._3, r._1))
    rows.foreach { case (b, r, err, chosen) =>
      assert(err >= 0)
      assert(chosen == (err == best._3 && b == best._1), s"($b,$r)")
    }
  }

  // q233: the distributed rank-based median/MAD must equal a local
  // brute-force recomputation per language, and the flag its formula.
  test("q233 median+MAD equal brute force per language; flag consistent") {
    val got = TextQueries.queries("q233_mad_outliers")(spark, sf)
      .as[(Long, String, Long, Long, Long, Long, Boolean)].collect()
    assert(got.nonEmpty)
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.size + 1) / 2 - 1)
    got.groupBy(_._2).foreach { case (lang, rs) =>
      val med = lowerMedian(rs.map(_._3).toSeq)
      val mad = lowerMedian(rs.map(r => math.abs(r._3 - med)).toSeq)
      rs.foreach { case (id, _, n, m, md, dev, flag) =>
        assert(m == med && md == mad, s"$lang doc $id")
        assert(dev == math.abs(n - med) && flag == (dev > 3 * mad), s"$lang doc $id")
      }
    }
  }

  // q237/q238: one-pass cumulative growth curves must end exactly at
  // the corpus totals and never decrease along the deciles.
  test("q237/q238 growth curves: monotone cumulatives, exact corpus endpoints") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val heaps = TextQueries.queries("q237_heaps_law")(spark, sf)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(heaps.map(_._1) == (1 to 10))
    assert(heaps.map(_._2) == heaps.map(_._2).sorted)
    assert(heaps.map(_._3) == heaps.map(_._3).sorted)
    val nOcc = docs.select(explode(split($"text", " ")).as("t")).count()
    val nVocab = docs.select(explode(split($"text", " ")).as("t"))
      .distinct().count()
    assert(heaps.last._2 == nOcc && heaps.last._3 == nVocab)
    val dup = DedupQueries.queries("q238_dup_growth")(spark, sf)
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(dup.map(_._1) == (1 to 10))
    assert(dup.map(_._4) == dup.map(_._4).sorted) // dups only accumulate
    assert(dup.last._2 == docs.count())
    dup.foreach { case (_, nd, dist, dups, bps) =>
      assert(dups == nd - dist && bps == dups * 10000 / nd)
    }
  }

  // q243: a larger inventory can only shrink out-of-inventory mass,
  // bounded by the total occurrence count.
  test("q243 OOV curve non-increasing in inventory size, bounded by total mass") {
    val curve = TextQueries.queries("q243_oov_curve")(spark, sf)
      .select($"vocab_size", $"oov_occurrences")
      .as[(Int, Long)].collect().sortBy(_._1).toSeq
    assert(curve.map(_._1) == Seq(32, 128, 512))
    assert(curve.map(-_._2) == curve.map(-_._2).sorted)
    val tot = graft.sources.Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("t")).count() -
      graft.sources.Tables.documents(spark, sf).count() // bigrams = occ − docs
    curve.foreach { case (_, oov) => assert(oov >= 0 && oov <= tot) }
  }

  // q230: the baseline arm must be present, every ablation can only
  // shrink the eval set, and the accuracy arithmetic must be exact.
  test("q230 ablation: baseline present, eval sets shrink, bps exact") {
    val rows = TextQueries.queries("q230_source_ablation")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    val base = rows.find(_._1 == "(none)")
      .getOrElse(fail("missing '(none)' baseline arm"))
    rows.foreach { case (excl, nEval, nCorrect, bps) =>
      assert(nCorrect >= 0 && nCorrect <= nEval, excl)
      assert(bps == nCorrect * 10000 / nEval, excl)
      if (excl != "(none)") assert(nEval <= base._2, excl)
    }
  }

  // q231: the salted pseudonym must stay injective on this corpus —
  // per-nation distinct-pseudonym counts summing to the raw distinct
  // key count is exactly the no-collision property the doc claims.
  test("q231 pseudonymization is collision-free on the corpus") {
    val perNation = AnalyticsQueries.queries("q231_pseudonymize")(spark, sf)
      .select($"n_customers").as[Long].collect()
    val raw = graft.sources.Tables.customer(spark, sf)
      .select($"c_custkey").distinct().count()
    assert(perNation.sum == raw)
  }

  // q234: removing a channel can only delete conversion paths in the
  // absorbing chain, so the baseline reach dominates every ablated
  // arm and the baseline's own removal effect is zero.
  test("q234 removal effects are non-negative; baseline effect is zero") {
    val rows = EventsQueries.queries("q234_markov_attribution")(spark, sf)
      .as[(String, Long, Long)].collect()
    val base = rows.find(_._1 == "(none)")
      .getOrElse(fail("missing '(none)' baseline arm"))
    assert(base._3 == 0L)
    rows.foreach { case (ch, reach, eff) =>
      assert(reach >= 0 && reach <= 1000000000000L, ch)
      assert(eff >= 0 && eff == base._2 - reach, ch)
    }
  }

  // q250: the release funnel only ever narrows — per source the stage
  // counts are monotone, the split partitions exactly the clean set,
  // the benchmark source never appears, and released token mass is
  // positive iff documents survived.
  test("q250 release funnel: monotone attrition, split partitions clean, no src0") {
    val rep = DedupQueries.queries("q250_text_release")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(rep.nonEmpty && !rep.exists(_._1 == "src0"))
    rep.foreach { case (src, raw, gated, dedup, clean, tr, va, te, tok) =>
      assert(raw >= gated && gated >= dedup && dedup >= clean, src)
      assert(tr + va + te == clean, src)
      assert((tok > 0) == (clean > 0), src)
    }
    assert(rep.map(_._5).sum > 0, "nothing survived the funnel at sf0.001")
  }

  // q251: the consistent-hashing contract the oracle hash can't pin
  // (the oracle shares the ring construction) — adding shard 9 moves
  // docs ONLY to shard 9, moves ~1/9 of the mass (vs mod-N's 8/9), and
  // the only-moves-to-the-new-shard property is structural: it must
  // hold at ANY vnode count, not just the query's 32.
  test("q251 shard ring: movers land only in the new shard; ~1/9 mass; vnode-count invariant") {
    val rows = TextQueries.queries("q251_shard_ring")(spark, sf)
      .as[(Int, Int, Long)].collect()
    val docs = graft.sources.Tables.documents(spark, sf)
    val nDocs = docs.count()
    assert(rows.map(_._3).sum == nDocs, "matrix does not partition the corpus")
    rows.foreach { case (s8, s9, n) =>
      assert(s8 >= 0 && s8 < 8 && s9 >= 0 && s9 < 9, s"($s8,$s9)")
      if (s8 != s9) assert(s9 == 8, s"$n docs moved $s8 -> $s9: not the new shard")
    }
    val moved = rows.filter(r => r._1 != r._2).map(_._3).sum
    // expectation nDocs/9 ≈ 11%; generous binomial bounds at 500 docs
    assert(moved > nDocs / 20 && moved < nDocs / 4, s"moved $moved of $nDocs")
    // mod-N rehashing (8 -> 9) relocates ~8/9 of the corpus — the ring
    // must beat it by a wide margin
    val modMoved = docs.filter($"doc_id" % 8 =!= $"doc_id" % 9).count()
    assert(moved * 4 < modMoved, s"ring moved $moved vs mod-N $modMoved")
    // re-derive the routing at 8 and 64 vnodes per shard with the same
    // ring rule: rings n and n+1 share every vnode except the new
    // shard's, so monotone movement must fall out at any vnode count
    import graft.functions.TextFunctions.{md5Ring48, md5Ring48Const, RING_M}
    for (vnodes <- Seq(8, 64)) {
      val vn = (shard: Int) => (0 until vnodes).map(v =>
        md5Ring48Const(s"ring:$shard:$v") * 16 + shard)
      val v8 = (0 until 8).flatMap(vn)
      val v9 = v8 ++ vn(8)
      def owner(vs: Seq[Long]) = expr(
        s"cast(array_min(transform(array(${vs.mkString(",")}), " +
          s"e -> pmod((e div 16) - dpos, $RING_M) * 16 + e % 16)) % 16 as int)")
      val moves = docs.select(md5Ring48($"doc_id").as("dpos"))
        .select(owner(v8).as("s8"), owner(v9).as("s9"))
        .filter($"s8" =!= $"s9")
      assert(moves.filter($"s9" =!= 8).count() == 0,
        s"vnodes=$vnodes: a mover landed outside the new shard")
      val m = moves.count()
      assert(m > 0 && m < nDocs / 4, s"vnodes=$vnodes moved=$m of $nDocs")
    }
  }

  // q252: the tabular-CUSUM recursion replayed by hand on a series
  // whose shift is hand-computable — 16 hours at 100 events, 4 at 160:
  // m = 112, k = 11, so the quiet phase accumulates S⁻ = 1/hour (never
  // near H = m) and the shifted phase accumulates S⁺ = 37/hour,
  // crossing H exactly at the 4th shifted hour. No single hour exceeds
  // 1.6× the mean — the sustained-drift case a spike threshold misses.
  // On the real corpus: one output row per distinct wall-clock hour
  // (the documented bound on the single-row array fold) and the flag
  // is exactly the S⁺>H ∨ S⁻>H predicate under a local replay.
  test("q252 CUSUM: hand-computed accumulators and flag hour; fold bounded by distinct hours") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ev252").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(h: Int, i: Int) =
      new java.sql.Timestamp(base.getTime + h * 3600000L + i * 1000L)
    val counts = Seq.fill(16)(100) ++ Seq.fill(4)(160)
    val rows = for {
      (n, h) <- counts.zipWithIndex
      i <- 0 until n
    } yield ((h * 1000 + i).toLong, ts(h, i), 1L, "e", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val got = EventsQueries.queries("q252_cusum_shift")(spark, dir)
      .orderBy($"hour")
      .select($"n_events", $"cusum_pos", $"cusum_neg", $"is_shift")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    // hand replay of the integer recursion (m = 2240/20 = 112, k = 11)
    val m = counts.map(_.toLong).sum / counts.size
    val k = m / 10
    assert(m == 112 && k == 11)
    val expected = counts.map(_.toLong)
      .scanLeft((0L, 0L)) { case ((sp, sn), n) =>
        (math.max(0L, sp + n - (m + k)), math.max(0L, sn + (m - k) - n))
      }.tail.zip(counts).map { case ((sp, sn), n) =>
        (n.toLong, sp, sn, sp > m || sn > m)
      }
    assert(got == expected)
    // the flag fires exactly once, at the 4th shifted hour (S⁺ = 148)
    assert(got.count(_._4) == 1 && got.last._4 && got.last._2 == 148L)
    // real corpus: row count = distinct hours; flag ≡ replayed S⁺/S⁻>H
    val real = EventsQueries.queries("q252_cusum_shift")(spark, sf)
      .orderBy($"hour")
      .select($"n_events", $"cusum_pos", $"cusum_neg", $"is_shift")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    val nHours = graft.sources.Tables.events(spark, sf)
      .select(date_trunc("hour", $"ts")).distinct().count()
    assert(real.size == nHours && nHours > 0)
    val rm = real.map(_._1).sum / real.size
    val rk = rm / 10
    val replay = real.map(_._1)
      .scanLeft((0L, 0L)) { case ((sp, sn), n) =>
        (math.max(0L, sp + n - (rm + rk)), math.max(0L, sn + (rm - rk) - n))
      }.tail
    real.zip(replay).foreach { case ((_, sp, sn, flag), (esp, esn)) =>
      assert(sp == esp && sn == esn && flag == (sp > rm || sn > rm))
    }
  }

  // ---- The md5-determinism family: the DuckDB oracle necessarily
  // replicates the SAME hash these queries route on, so it can pin the
  // assignment but not the properties the hash is there to provide —
  // uniformity, partition/permutation structure, and preservation of
  // the non-hashed payload. Those are pinned here. ----

  test("q81 split: partitions the corpus; 90/10 within binomial bounds; buckets near-uniform") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val n = docs.count()
    val out = TextQueries.queries("q81_train_split")(spark, sf)
      .select($"doc_id", $"bucket", $"split")
      .as[(Long, Int, String)].collect()
    assert(out.length == n && out.map(_._1).distinct.length == n,
      "not a partition of the corpus")
    out.foreach { case (_, b, s) =>
      assert(b >= 0 && b <= 9 && s == (if (b < 9) "train" else "eval"))
    }
    // 10% eval at n docs: allow ±4σ of Binomial(n, 0.1)
    val nEval = out.count(_._3 == "eval")
    val sd = math.sqrt(n * 0.1 * 0.9)
    assert(math.abs(nEval - 0.1 * n) < 4 * sd, s"eval=$nEval of $n")
    // per-bucket mass within ±5σ of n/10 — the uniformity the md5
    // nibbles exist to provide (row_number/rand give determinism OR
    // uniformity, never both)
    val byBucket = out.groupBy(_._2).view.mapValues(_.length)
    (0 to 9).foreach { b =>
      val c = byBucket.getOrElse(b, 0)
      assert(math.abs(c - n / 10.0) < 5 * sd, s"bucket $b: $c")
    }
  }

  test("q149 source cap: ≤15 kept per source; small sources intact; deterministic") {
    val bySource = graft.sources.Tables.documents(spark, sf)
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    val out = CurationQueries.queries("q149_source_cap")(spark, sf)
      .select($"source", $"doc_id").as[(String, Long)].collect()
    val kept = out.groupBy(_._1).view.mapValues(_.length).toMap
    bySource.foreach { case (src, nSrc) =>
      assert(kept.getOrElse(src, 0) == math.min(15L, nSrc),
        s"$src: kept ${kept.get(src)} of $nSrc")
    }
    val again = CurationQueries.queries("q149_source_cap")(spark, sf)
      .select($"source", $"doc_id").as[(String, Long)].collect()
    assert(out.toSet == again.toSet, "kept set not deterministic")
  }

  test("q150 MLM mask: unmasked tokens byte-identical to raw; ~15% rate in bounds; counts conserved") {
    val raw = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val out = CurationQueries.queries("q150_mlm_mask")(spark, sf)
      .as[(Long, Long, Long, String)].collect()
    assert(out.map(_._1).toSet == raw.keySet)
    var totTokens = 0L
    var totMasked = 0L
    out.foreach { case (id, nTok, nMask, masked) =>
      val rts = raw(id).split(" ", -1)
      val mts = masked.split(" ", -1)
      assert(rts.length == nTok && mts.length == nTok, s"doc $id token count")
      // every position: either the untouched original token or <MASK>
      val maskedAt = rts.indices.filter(i => mts(i) == "<MASK>" && rts(i) != "<MASK>")
      rts.indices.foreach { i =>
        assert(mts(i) == rts(i) || mts(i) == "<MASK>", s"doc $id pos $i")
      }
      assert(maskedAt.length.toLong <= nMask && nMask <= maskedAt.length +
        rts.count(_ == "<MASK>"), s"doc $id n_masked")
      totTokens += nTok; totMasked += nMask
    }
    // corpus-wide rate: 15% of 2^16 = 9830/65536, ±5σ binomial
    val p = 9830.0 / 65536
    val sd = math.sqrt(totTokens * p * (1 - p))
    assert(math.abs(totMasked - p * totTokens) < 5 * sd,
      s"masked $totMasked of $totTokens")
  }

  test("q154 epoch shuffle: each epoch a 1..N permutation of the corpus; epochs differ") {
    val ids = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id").as[Long].collect().toSet
    val out = CurationQueries.queries("q154_epoch_shuffle")(spark, sf)
      .select($"epoch", $"doc_id", $"pos").as[(Int, Long, Long)].collect()
    val byEpoch = out.groupBy(_._1)
    assert(byEpoch.keySet == Set(1, 2))
    byEpoch.foreach { case (e, rows) =>
      assert(rows.map(_._2).toSet == ids, s"epoch $e not the corpus")
      assert(rows.map(_._3).sorted.toSeq == (1L to ids.size).toSeq,
        s"epoch $e pos not a 1..N ranking")
    }
    // the salt differs per epoch, so the orders must actually differ
    val o1 = byEpoch(1).sortBy(_._3).map(_._2).toSeq
    val o2 = byEpoch(2).sortBy(_._3).map(_._2).toSeq
    assert(o1 != o2, "epochs produced the identical order")
  }

  test("q198 weighted sample: exactly n div 5 selected; selected mean quality ≥ overall; counts partition") {
    val n = graft.sources.Tables.documents(spark, sf).count()
    val out = CurationQueries.queries("q198_weighted_sample")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.map(_._2).sum == n, "n_docs does not partition the corpus")
    assert(out.map(_._3).sum == n / 5, s"selected ${out.map(_._3).sum} != ${n / 5}")
    out.foreach { case (src, nd, ns, _, _) => assert(ns <= nd, src) }
    // quality-weighting lifts the selected mean CORPUS-WIDE (monotone
    // likelihood: P(select|q) increases in q). Per source the lift is
    // only in expectation — the u16 factor spans orders of magnitude,
    // so a ~50-doc source can dip below its own mean (src8 does at
    // sf0.001); the corpus-wide weighted means must still separate.
    // ±1 per doc covers the per-source integer-div floors.
    val selMean = out.map(r => r._5 * r._3).sum.toDouble / out.map(_._3).sum
    val allMean = out.map(r => r._4 * r._2).sum.toDouble / n
    assert(selMean + 1 > allMean, s"selected $selMean !> overall $allMean")
  }

  // q253: the KPI arithmetic the oracle can't independently pin (it
  // shares the tree CTEs) — replay the aggregation driver-side in
  // BigDecimal over the same joined fact and require EXACT equality:
  // the whole point of the query's all-DECIMAL pipeline is that
  // revenue/cost/margin are exact sums with one DOUBLE conversion at
  // the edge, and margin ≡ revenue − cost in the decimal domain (not
  // re-derived from the two doubles). Cells must partition the joined
  // fact (Σ n_sales = join cardinality).
  test("q253 margin KPI: BigDecimal replay exact; margin ≡ rev − cost; cells partition the joined fact") {
    val out = HierarchyQueries.queries("q253_margin_kpi")(spark, sf)
      .as[(String, Int, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    // the same product tree the query rides (tree correctness is
    // HierarchySpec's job); the AGGREGATION is replayed independently
    val p = graft.sources.Tables.part(spark, sf)
    val cats = Hierarchy.categories(p)
    val subs = Hierarchy.subcategories(p, cats)
    val tree = p.select($"p_partkey".cast("long").as("product_id"),
        $"p_type", $"p_brand", $"p_retailprice".cast("string").as("retail"))
      .withColumn("sub_ref", Hierarchy.subcategoryOf($"p_type", $"p_brand"))
      .join(subs, upper($"sub_ref") === upper($"subcategory_name"))
      .join(cats, $"subcategory_category_id" === $"category_id")
      .select($"product_id", $"category_name", $"retail")
    val joined = graft.sources.Tables.lineitem(spark, sf)
      .select($"l_partkey".cast("long").as("product_id"),
        year($"l_shipdate").cast("int").as("sale_year"),
        $"l_extendedprice".cast("string").as("price"),
        $"l_quantity".cast("string").as("qty"))
      .join(tree, Seq("product_id"))
      .select($"category_name", $"sale_year", $"price", $"qty", $"retail")
      .as[(String, Int, String, String, String)].collect()
    assert(out.values.map(_._1).sum == joined.length,
      "n_sales does not partition the joined fact")
    import java.math.BigDecimal
    def bd(s: String) = new BigDecimal(s).setScale(2)
    val want = joined.groupBy(r => (r._1, r._2)).map { case (key, rs) =>
      val rev = rs.map(r => bd(r._3)).reduce(_ add _)
      val cst = rs.map(r => bd(r._4).multiply(bd(r._5))).reduce(_ add _)
      key -> (rs.length.toLong, rev.doubleValue, cst.doubleValue,
        rev.subtract(cst).doubleValue)
    }
    assert(out.keySet == want.keySet)
    want.foreach { case (key, w) =>
      assert(out(key) == w, s"$key: got ${out(key)}, want $w")
    }
  }

  // q254: the delta-maintained RDD trainer must be BIT-IDENTICAL to a
  // from-scratch full recount every round — the equivalence the oracle
  // hash also checks at sf0.01, pinned here per round on an
  // adversarial corpus the testdata doesn't exercise: a count tie
  // whose winner is decided by UTF-8 byte order, a null text, an empty
  // text, a single-token doc, and same-token chains ("a a a a" must
  // merge greedily left-to-right to [aa aa], not [a aa a]). The
  // reference recount below shares NO code with the trainer.
  test("q254 incremental BPE: identical to full recount per round; greedy chains; tie by bytes; null-safe") {
    val corpus = Seq[(Long, String)](
      (1L, "a a a a b c"),
      (2L, "x y x y x y"),
      (3L, "zz b zz b aa c aa c"), // "zz b" ties "aa c" at 2: bytes pick "aa c"
      (4L, ""),
      (5L, null),
      (6L, "q"))
    val docs = corpus.toDF("doc_id", "text")
    // naive reference: full pair recount + full corpus rewrite per round
    def toks(st: String): Array[String] = {
      var t = st
      while (t.startsWith(" ")) t = t.substring(1)
      while (t.endsWith(" ")) t = t.substring(0, t.length - 1)
      t.split("  ", -1)
    }
    def utf8Lte(a: String, b: String): Boolean = {
      val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      java.util.Arrays.compareUnsigned(x, y) <= 0
    }
    var st = corpus.toMap.view.mapValues(t =>
      if (t == null) null else " " + t.replace(" ", "  ") + " ").toMap
    val wantMerges = Seq.newBuilder[(Int, String, Long)]
    val nMerges = 10
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[String, Long]
      st.values.foreach { s =>
        if (s != null) {
          val ts = toks(s)
          (1 until ts.length).foreach { i =>
            val p = ts(i - 1) + " " + ts(i)
            counts(p) = counts.getOrElse(p, 0L) + 1L
          }
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (pair, c) = counts.toSeq.reduce { (x, y) =>
          if (x._2 != y._2) { if (x._2 > y._2) x else y }
          else if (utf8Lte(x._1, y._1)) x else y
        }
        r += 1
        wantMerges += ((r, pair, c))
        val Array(a, b) = pair.split(" ", 2)
        val (needle, repl) = (s" $a  $b ", " " + a + "\u0001" + b + " ")
        st = st.view.mapValues(s =>
          if (s == null) null else s.replace(needle, repl)).toMap
      }
    }
    val want = wantMerges.result()
    val got = TextQueries.bpeMergeTableMerges(docs, "text", "doc_id", nMerges)
      .orderBy($"rank").as[(Int, String, Long)].collect().toSeq
    assert(got == want, s"\ngot:  $got\nwant: $want")
    // the tie round really resolved by bytes (round 3, over "zz b" and
    // the \u0001-containing later candidates), and chains merged
    // greedily left-to-right (round 6 pairs the two [aa] units — the
    // [a][aa][a] split a non-greedy application would produce never
    // appears)
    assert(got.exists(_._2 == "aa c"))
    assert(got.exists(p => p._2 == "a\u0001a a\u0001a" && p._3 == 1L))
    // the trainer's returned STATE matches the reference rewrite too
    // (same docs, every round applied), nulls and empties intact
    val gotState = TextQueries.bpeTrain(docs, "text", "doc_id", nMerges)
      .as[(Long, String)].collect().toMap
    assert(gotState == st)
    // contract shape at the fixture scale: consecutive ranks from 1,
    // positive counts, unique pairs (q254 itself runs 64 merges there)
    val q = TextQueries.queries("q254_bpe_train64")(spark, sf)
      .orderBy($"rank").as[(Int, String, Long)].collect()
    assert(q.map(_._1).toSeq == (1 to q.length), "ranks not consecutive")
    assert(q.forall(_._3 > 0) && q.map(_._2).distinct.length == q.length)
  }
}
