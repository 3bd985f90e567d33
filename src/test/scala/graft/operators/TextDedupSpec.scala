package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "  The  quick brown fox jumps over the lazy dog "), // exact dup of 1 mod ws/case
    (4L, "completely different text about spark engines")
  ).toDF("doc_id", "text")

  test("fingerprint collapses whitespace/case variants") {
    val fps = docs.select($"doc_id", TextFunctions.fingerprint($"text").as("fp"))
      .as[(Long, String)].collect().toMap
    assert(fps(1L) == fps(3L))
    assert(fps(1L) != fps(2L))
  }

  test("normText canonicalizes NFC/NFD, accents, and case — codegen ≡ interpreted") {
    val variants = Seq(
      (1L, "Café RESUMÉ"),          // composed é, upper
      (2L, "Café Resumé"),        // decomposed e + combining acute
      (3L, "cafe resume"),                    // accent-stripped target form
      (4L, "plain ascii STAYS lowercased")
    ).toDF("doc_id", "text")
    val out = variants.select($"doc_id", TextFunctions.normText($"text").as("n"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "cafe resume" && out(2L) == "cafe resume" && out(3L) == "cafe resume")
    assert(out(4L) == "plain ascii stays lowercased")
    // interpreted path (eval without codegen) agrees with the df result
    import org.apache.spark.sql.graft.TextNormalize
    import org.apache.spark.unsafe.types.UTF8String
    assert(TextNormalize.normalize(UTF8String.fromString("Café Resumé")).toString
      == "cafe resume")
    // normalized exact-dedup collapses all three variants into one group
    val g = Dedup.exactGroups(
      variants.select($"doc_id", TextFunctions.normText($"text").as("text")),
      "text", "doc_id")
      .as[(String, Long, Long)].collect().map(t => t._2 -> t._3).toMap
    assert(g(1L) == 3 && g(4L) == 1)
  }

  test("exactGroups keeps min id and counts duplicates") {
    val g = Dedup.exactGroups(docs, "text", "doc_id")
      .as[(String, Long, Long)].collect().map(t => t._2 -> t._3).toMap
    assert(g(1L) == 2) // docs 1+3 collapse, keeper is min id 1
    assert(g(2L) == 1 && g(4L) == 1)
  }

  test("shingleTable emits distinct word n-grams; short docs emit none") {
    val sh = Dedup.shingleTable(Seq((1L, "a b c d"), (2L, "a b")).toDF("doc_id", "text"),
      "text", "doc_id", 3)
    val rows = sh.as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "a b c"), (1L, "b c d")))
  }

  test("jaccardPairs computes exact intersection/union ratio") {
    val sh = Dedup.shingleTable(docs, "text", "doc_id", 3)
    val pairs = Dedup.jaccardPairs(sh, "doc_id", 0.0)
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // docs 1,2: 9 tokens → 7 shingles each, 6 shared → 6/8
    assert(math.abs(pairs((1L, 2L)) - 6.0 / 8.0) < 1e-12)
    // identical-after-normalization docs differ in raw text shingles (case)
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("minhashLshNearDups finds the obvious near-dup pair and nothing with doc 4") {
    val found = Dedup.minhashLshNearDups(docs, "text", "doc_id",
      ngram = 3, k = 8, bands = 4, minJaccard = 0.2)
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2)).toSet
    assert(found.contains((1L, 2L)))
    assert(!found.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("simhash: identical token sets hash identically, near-dups are close") {
    val sim = Dedup.simhash16(docs, "text", "doc_id")
      .as[(Long, Int)].collect().toMap
    def ham(a: Int, b: Int) = Integer.bitCount(a ^ b)
    assert(ham(sim(1L), sim(2L)) < ham(sim(1L), sim(4L)))
    // pigeonhole blocking must reproduce the locally computed pair set
    // exactly, at several thresholds (incl. the 15-bit near-all case)
    for (h <- Seq(1, 3, 8, 15)) {
      val expected = (for {
        (a, sa) <- sim; (b, sb) <- sim
        if a < b && ham(sa, sb) <= h
      } yield (a, b, ham(sa, sb))).toSet
      val got = Dedup.simhashPairs(Dedup.simhash16(docs, "text", "doc_id"), "doc_id", h)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == expected, s"maxHamming=$h")
    }
    // maxHamming >= bits cannot be blocked — must be rejected, not wrong
    intercept[IllegalArgumentException] {
      Dedup.simhashPairs(Dedup.simhash16(docs, "text", "doc_id"), "doc_id", 16)
    }
  }

  test("simhashPairs plan is a block equi-join — no cross product") {
    val plan = Dedup.simhashPairs(
      Dedup.simhash16(docs, "text", "doc_id"), "doc_id", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("simhashWide agrees with the 16-bit fingerprint on its low bits") {
    // both draw bit j from the same md5 nibble, so the wide fingerprint's
    // low 16 bits ARE the 16-bit fingerprint
    val wide = Dedup.simhashWide(docs, "text", "doc_id", bits = 60)
      .as[(Long, Long)].collect().toMap
    val narrow = Dedup.simhash16(docs, "text", "doc_id")
      .as[(Long, Int)].collect().toMap
    narrow.foreach { case (id, s16) =>
      assert((wide(id) & 0xffffL) == (s16.toLong & 0xffffL), s"doc $id")
    }
    // wide pigeonhole pairs reproduce the locally computed pair set
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val expected = (for {
      (a, sa) <- wide; (b, sb) <- wide
      if a < b && ham(sa, sb) <= 3
    } yield (a, b, ham(sa, sb))).toSet
    val got = Dedup.simhashPairs(
      Dedup.simhashWide(docs, "text", "doc_id", bits = 60), "doc_id", 3, bits = 60)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == expected)
    intercept[IllegalArgumentException] {
      Dedup.simhashWide(docs, "text", "doc_id", bits = 61)
    }
  }

  test("simhashConnectivityEdges ≡ simhashPairs under connected components (star reduction is lossless)") {
    // the reduced relation must induce the SAME components (and
    // therefore the same min-id labels) as the full pair expansion, at
    // several hamming thresholds — including h=15 where nearly every
    // fingerprint pair qualifies and the reduction is at its sparsest
    // relative to the full clique blow-up
    for (h <- Seq(1, 3, 8, 15)) {
      val sim = Dedup.simhash16(docs, "text", "doc_id")
      val full = Dedup.connectedComponents(
        Dedup.simhashPairs(sim, "doc_id", h).select($"id_1", $"id_2"),
        docs.select($"doc_id"), "doc_id")
        .as[(Long, Long)].collect().toMap
      val reduced = Dedup.connectedComponents(
        Dedup.simhashConnectivityEdges(sim, "doc_id", h),
        docs.select($"doc_id"), "doc_id")
        .as[(Long, Long)].collect().toMap
      assert(reduced == full, s"maxHamming=$h")
      // and the reduction is never LARGER than the full pair relation
      val nFull = Dedup.simhashPairs(sim, "doc_id", h).count()
      val nReduced = Dedup.simhashConnectivityEdges(sim, "doc_id", h).count()
      assert(nReduced <= nFull, s"maxHamming=$h: $nReduced > $nFull")
    }
  }

  /** Run `body` with the driver-union-find gate forced off, so the
    * assertions inside pin the DISTRIBUTED min-label fixpoint — the
    * path a >1M-edge graph takes in production. */
  private def distributedCcOnly[T](body: => T): T = {
    spark.conf.set("graft.cc.driverEdgeLimit", "0")
    try body finally spark.conf.unset("graft.cc.driverEdgeLimit")
  }

  test("connectedComponents labels chains, cliques and singletons — driver and distributed paths agree") {
    val nodes = (1L to 7L).toDF("doc_id")
    // chain 1-2-3, clique 4-5-6 (all pairs), singleton 7
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L))
      .toDF("id_1", "id_2")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L, 7L -> 7L)
    // default conf: small graph ⇒ the driver union-find fast path
    val got = Dedup.connectedComponents(edges, nodes, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(got == want)
    // forced distributed fixpoint: identical labels
    assert(distributedCcOnly {
      Dedup.connectedComponents(edges, nodes, "doc_id")
        .as[(Long, Long)].collect().toMap
    } == want)
    // a long path needs diameter rounds — the FIXPOINT at maxIters=1
    // must refuse loudly (the fast path has no non-convergence to hide)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
      .toDF("id_1", "id_2")
    distributedCcOnly {
      intercept[IllegalStateException] {
        Dedup.connectedComponents(path, nodes, "doc_id", maxIters = 1)
      }
    }
    // and converge given room
    val full = Dedup.connectedComponents(path, nodes, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(full.values.toSet == Set(1L))
    // a dangling endpoint (dropped upstream) still bridges its
    // neighbours; output stays restricted to the given nodes — both paths
    val bridge = Seq((2L, 99L), (99L, 3L)).toDF("id_1", "id_2")
    val some = Seq(2L, 3L, 4L).toDF("doc_id")
    val wantBr = Map(2L -> 2L, 3L -> 2L, 4L -> 4L)
    assert(Dedup.connectedComponents(bridge, some, "doc_id")
      .as[(Long, Long)].collect().toMap == wantBr)
    assert(distributedCcOnly {
      Dedup.connectedComponents(bridge, some, "doc_id")
        .as[(Long, Long)].collect().toMap
    } == wantBr)
    // duplicate node rows still yield one labelled row per id (both paths)
    val dupNodes = Seq(2L, 2L, 3L).toDF("doc_id")
    val wantDup = Seq((2L, 2L), (3L, 2L))
    assert(Dedup.connectedComponents(bridge, dupNodes, "doc_id")
      .as[(Long, Long)].collect().sorted.toSeq == wantDup)
    assert(distributedCcOnly {
      Dedup.connectedComponents(bridge, dupNodes, "doc_id")
        .as[(Long, Long)].collect().sorted.toSeq
    } == wantDup)
    // non-integral ids can't take the driver path — string ids still label
    val sNodes = Seq("a", "b", "c").toDF("doc_id")
    val sEdges = Seq(("a", "b")).toDF("id_1", "id_2")
    assert(Dedup.connectedComponents(sEdges, sNodes, "doc_id")
      .as[(String, String)].collect().toMap ==
      Map("a" -> "a", "b" -> "a", "c" -> "c"))
    // a NULL node id drops on BOTH paths: the fixpoint's final semi-join
    // rejects NULL=NULL, and the fast path filters to match
    val nullNodes = Seq(Some(2L), None, Some(3L), Some(4L)).toDF("doc_id")
    assert(Dedup.connectedComponents(bridge, nullNodes, "doc_id")
      .as[(Long, Long)].collect().toMap == wantBr)
    assert(distributedCcOnly {
      Dedup.connectedComponents(bridge, nullNodes, "doc_id")
        .as[(Long, Long)].collect().toMap
    } == wantBr)
  }

  test("driverEdgeLimit boundary: exactly at the cap = driver path; one row over = distributed fixpoint; malformed conf fails loudly") {
    import org.apache.spark.sql.DataFrame
    val nodes = (1L to 40L).toDF("doc_id")
    // star around node 1 (diameter 2 — converges on both paths):
    // 39 edges → undirected relation = 2 rows per distinct edge = 78
    val edges = (2L to 40L).map(i => (1L, i)).toDF("id_1", "id_2")
    val undRows = 78L
    val want = (1L to 40L).map(_ -> 1L).toMap
    val sc = spark.sparkContext
    // path selection is observable in the block manager: the driver
    // path retires everything it cut (no persisted label generation
    // survives the call); the distributed fixpoint's FINAL labels stay
    // persisted because the returned plan reads them. Keep the result
    // DataFrame referenced so weak-valued getPersistentRDDs can't reap
    // it mid-assertion.
    def ccWithLimit(limit: Long): (DataFrame, Map[Long, Long], Set[Int]) = {
      spark.conf.set("graft.cc.driverEdgeLimit", limit.toString)
      try {
        val before = sc.getPersistentRDDs.keySet.toSet
        val df = Dedup.connectedComponents(edges, nodes, "doc_id")
        val got = df.as[(Long, Long)].collect().toMap
        (df, got, sc.getPersistentRDDs.keySet.toSet -- before)
      } finally spark.conf.unset("graft.cc.driverEdgeLimit")
    }
    val (_, atCap, leftAt) = ccWithLimit(undRows)
    assert(atCap == want)
    assert(leftAt.isEmpty,
      s"at the cap the driver path must leave no persisted generations, left $leftAt")
    val (dfOver, overCap, leftOver) = ccWithLimit(undRows - 1)
    assert(overCap == want)
    assert(leftOver.nonEmpty,
      "one row past the cap must take the distributed path — a future " +
        "refactor collecting an over-limit edge set onto the driver " +
        "would show up as an empty set here")
    assert(dfOver != null) // reference alive through the assertions above
    Dedup.retireTracked(spark, leftOver)
    // a malformed limit must fail loudly, never silently re-enable the
    // default fast path the user was tuning away
    spark.conf.set("graft.cc.driverEdgeLimit", "500_000")
    try intercept[IllegalArgumentException] {
      Dedup.connectedComponents(edges, nodes, "doc_id")
    } finally spark.conf.unset("graft.cc.driverEdgeLimit")
  }

  test("hashToMin ≡ min-label CC on converging inputs; O(log d) on chains that throw min-label") {
    val nodes = (1L to 7L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L))
      .toDF("id_1", "id_2")
    val a = Dedup.connectedComponents(edges, nodes, "doc_id")
      .as[(Long, Long)].collect().toMap
    val b = Dedup.connectedComponentsHashToMin(edges, nodes, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    // dangling-endpoint bridging matches too
    val bridge = Seq((2L, 99L), (99L, 3L)).toDF("id_1", "id_2")
    val some = Seq(2L, 3L, 4L).toDF("doc_id")
    assert(Dedup.connectedComponentsHashToMin(bridge, some, "doc_id")
      .as[(Long, Long)].collect().toMap == Map(2L -> 2L, 3L -> 2L, 4L -> 4L))
    // a 200-node path: diameter 199 ≫ min-label's 25-round default,
    // whose FIXPOINT must refuse loudly (forced — the driver fast path
    // would solve it without iterating)…
    val n = 200L
    val chainNodes = (1L to n).toDF("doc_id")
    val chain = (1L until n).map(i => (i, i + 1)).toDF("id_1", "id_2")
    distributedCcOnly {
      intercept[IllegalStateException] {
        Dedup.connectedComponents(chain, chainNodes, "doc_id")
      }
    }
    // …while hash-to-min converges inside 2·log2(d) + slack rounds
    val maxRounds = 2 * (math.log(n.toDouble) / math.log(2)).ceil.toInt + 4
    val got = Dedup.connectedComponentsHashToMin(chain, chainNodes, "doc_id",
      maxIters = maxRounds).as[(Long, Long)].collect()
    assert(got.length == n && got.forall(_._2 == 1L))
    // the reliable-checkpoint path produces identical labels
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ck").toString
    val ck = Dedup.connectedComponentsHashToMin(chain, chainNodes, "doc_id",
      maxIters = maxRounds, checkpointDir = Some(dir)).as[(Long, Long)].collect()
    assert(ck.sorted.sameElements(got.sorted))
  }

  test("alternatingStar ≡ min-label ≡ hash-to-min: chains, cliques, bridges, random graphs, empty") {
    def stars(es: Seq[(Long, Long)], ns: Seq[Long]): Map[Long, Long] =
      Dedup.connectedComponentsAlternatingStar(
        es.toDF("id_1", "id_2"), ns.toDF("doc_id"), "doc_id")
        .as[(Long, Long)].collect().toMap
    // mixed chain + clique + singleton
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L))
    assert(stars(edges, 1L to 7L) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L, 7L -> 7L))
    // dangling endpoint bridges; output restricted to the given nodes
    assert(stars(Seq((2L, 99L), (99L, 3L)), Seq(2L, 3L, 4L)) ==
      Map(2L -> 2L, 3L -> 2L, 4L -> 4L))
    // no edges: every node its own singleton
    assert(stars(Seq.empty, Seq(5L, 9L)) == Map(5L -> 5L, 9L -> 9L))
    // the 200-node path that throws min-label: stars converge and the
    // reliable-checkpoint path matches
    val n = 200L
    val chain = (1L until n).map(i => (i, i + 1))
    val labs = stars(chain, 1L to n)
    assert(labs.size == n.toInt && labs.values.forall(_ == 1L))
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-star").toString
    assert(Dedup.connectedComponentsAlternatingStar(
      chain.toDF("id_1", "id_2"), (1L to n).toDF("doc_id"), "doc_id",
      checkpointDir = Some(dir)).as[(Long, Long)].collect().toMap == labs)
    // seeded random graphs: alternating-star ≡ min-label FIXPOINT ≡
    // min-label driver fast path, label for label
    val rnd = new scala.util.Random(42)
    (1 to 4).foreach { _ =>
      val ns = 1L to 12L
      val es = Seq.fill(10)((rnd.nextInt(12) + 1L, rnd.nextInt(12) + 1L))
        .filter(p => p._1 != p._2)
      val want = distributedCcOnly {
        Dedup.connectedComponents(
          es.toDF("id_1", "id_2"), ns.toDF("doc_id"), "doc_id")
          .as[(Long, Long)].collect().toMap
      }
      assert(Dedup.connectedComponents(
        es.toDF("id_1", "id_2"), ns.toDF("doc_id"), "doc_id")
        .as[(Long, Long)].collect().toMap == want, s"fast-path edges=$es")
      assert(stars(es, ns) == want, s"edges=$es")
    }
  }

  test("CC fixpoint retires generations at the RDD level: ≤1 persisted RDD per run (block-manager bound)") {
    // Dataset.unpersist is a no-op for localCheckpointed frames (it
    // only clears CacheManager entries) — the loop must unpersist the
    // backing RDD ids, or a d-diameter run pins O(log d) full copies.
    // The 200-node chain drives many batches; only the FINAL generation
    // (the returned relation's backing) may remain per invocation.
    // keySet diffs, not size diffs: persistentRdds is weak-valued, so a
    // GC reaping OTHER tests' leftovers between the reads could mask a
    // real leak under a size comparison. New ids are monotonic — a NEW
    // id still registered after the run IS this run's leftover.
    val sc = spark.sparkContext
    def newIds[T](body: => T): Set[Int] = {
      val before = sc.getPersistentRDDs.keySet.toSet
      body
      sc.getPersistentRDDs.keySet.toSet -- before
    }
    val n = 200L
    val chain = (1L until n).map(i => (i, i + 1)).toDF("id_1", "id_2")
    val nodes = (1L to n).toDF("doc_id")
    val l1 = newIds {
      Dedup.connectedComponentsAlternatingStar(chain, nodes, "doc_id").count(): Unit
    }
    assert(l1.size <= 1, s"alternating-star left persisted RDDs: $l1")
    val l2 = newIds {
      Dedup.connectedComponentsHashToMin(chain, nodes, "doc_id").count(): Unit
    }
    assert(l2.size <= 1, s"hash-to-min left persisted RDDs: $l2")
    // min-label's fixpoint (forced — below the driver-path gate it
    // wouldn't iterate): a 20-round run must not strand 20 generations
    val short = (1L until 20L).map(i => (i, i + 1)).toDF("id_1", "id_2")
    val shortNodes = (1L to 20L).toDF("doc_id")
    val l3 = newIds {
      distributedCcOnly {
        Dedup.connectedComponents(short, shortNodes, "doc_id").count(): Unit
      }
    }
    assert(l3.size <= 1, s"min-label left persisted RDDs: $l3")
    // the driver fast path retires the materialized edge relation too —
    // its returned plan persists NOTHING
    val l4 = newIds {
      Dedup.connectedComponents(short, shortNodes, "doc_id").count(): Unit
    }
    assert(l4.isEmpty, s"driver path left persisted RDDs: $l4")
  }

  test("bpeTrain bounds kept state at one persisted RDD per session (needState leak fix)") {
    // each needState training used to strand a corpus-sized
    // MEMORY_AND_DISK copy for the session's lifetime (warmup + timed +
    // verify each one more); now the next training retires the previous
    // invocation's kept state, so two back-to-back trainings leave at
    // most one copy (plus nothing else from the generation queues).
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    TextQueries.queries("q146_bpe_train")(spark, sf).count(): Unit
    TextQueries.queries("q146_bpe_train")(spark, sf).count(): Unit
    val leaked = sc.getPersistentRDDs.size - before
    assert(leaked <= 1, s"two bpeTrain invocations left $leaked persisted RDDs (want ≤1)")
  }

  test("tokensNormalized handles tabs, runs of spaces, and empty text") {
    val messy = Seq((1L, " the\tquick  brown  fox "), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val out = messy.select($"doc_id",
      TextFunctions.tokensNormalized($"text").as("ts"),
      TextFunctions.tokens($"text").as("raw"))
      .as[(Long, Seq[String], Seq[String])].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(out(1L)._1 == Seq("the", "quick", "brown", "fox"))
    assert(out(2L)._1.isEmpty && out(3L)._1.isEmpty)
    // the oracle-contract tokens() splits on single spaces only
    assert(out(1L)._2.contains("the\tquick"))
  }

  test("punctRatio and rollingFingerprint are deterministic and bounded") {
    val df = Seq((1L, "a, b. c!"), (2L, "abc"), (3L, "")).toDF("doc_id", "text")
    val r = df.select($"doc_id",
      TextFunctions.punctRatio($"text").as("pr"),
      TextFunctions.rollingFingerprint($"text").as("fp"))
      .as[(Long, Double, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(math.abs(r(1L)._1 - 3.0 / 8.0) < 1e-12)
    assert(r(2L)._1 == 0.0 && r(3L)._1 == 0.0)
    // order sensitivity: same tokens, different order → different hash
    val swapped = Seq((1L, "b a"), (2L, "a b")).toDF("doc_id", "text")
      .select(TextFunctions.rollingFingerprint($"text")).as[Long].collect()
    assert(swapped(0) != swapped(1))
    assert(r.values.forall(v => v._2 >= 0L && v._2 < 2147483647L))
  }

  test("token stats, quality and langid columns are sane") {
    val sw = Seq("the", "over")
    val r = docs.select($"doc_id",
      TextFunctions.tokenCount($"text").as("n"),
      TextFunctions.stopwordRatio($"text", sw).as("swr"),
      TextFunctions.qualityScore($"text", sw).as("q"))
      .as[(Long, Int, Double, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(r(1L)._1 == 9)
    assert(math.abs(r(1L)._2 - 3.0 / 9.0) < 1e-12)
    assert(r.values.forall(v => v._3 >= 0.0 && v._3 <= 1.0))
  }

  test("bloom decontamination is exact (≡ broadcast-set operator) and guards empty eval") {
    val train = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      (11L, "spark engines shuffle data across the cluster"),
      (12L, "the quick brown fox naps")
    ).toDF("doc_id", "text")
    val eval_ = Seq((90L, "the quick brown fox jumps again")).toDF("doc_id", "text")
    val exact = Dedup.contaminatedDocs(train, eval_, "text", "doc_id", n = 3, minShared = 1)
      .as[(Long, Long)].collect().toSet
    val bloom = Dedup.contaminatedDocsBloom(train, eval_, "text", "doc_id",
      n = 3, minShared = 1, expectedItems = 100L)
      .as[(Long, Long)].collect().toSet
    assert(bloom == exact)
    assert(exact.map(_._1) == Set(10L, 12L)) // 11 shares no shingle
    val none = Dedup.contaminatedDocsBloom(train, eval_.limit(0), "text", "doc_id",
      n = 3, minShared = 1)
    assert(none.count() == 0) // NULL bloom = nothing matches, not everything
  }

  test("bpe merge round: top pair deterministic, greedy application arithmetic holds") {
    val r = TextQueries.queries("q130_bpe_merge")(spark, sf).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (before, merges, after) =
        (row.getLong(2), row.getLong(3), row.getLong(4))
      assert(after == before - merges)
      assert(merges >= 0 && before > 0)
    }
    assert(r.map(_.getString(5)).distinct.length == 1) // one winning pair
    assert(r.head.getString(5).contains(" "))          // it's an adjacent pair
  }

  test("curation funnel: stagewise-monotone attrition over every train source") {
    val rows = TextQueries.queries("q132_curation_funnel")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, total, q, nr, uniq, clean) =>
      assert(src != "src0") // the eval slice is never in the funnel
      assert(total >= q && q >= nr && nr >= uniq && uniq >= clean,
        s"$src attrition not monotone: $total $q $nr $uniq $clean")
      assert(total > 0)
    }
    // the funnel must not empty the corpus (threshold sanity)
    assert(rows.map(_._6).sum > 0)
  }

  test("groupOverlapMatrix: identical sources at 10000 bps, disjoint at 0, full matrix") {
    val docs = Seq(
      (1L, "a b c d", "x"), (2L, "a b c d", "y"), // identical shingle sets
      (3L, "e f g h", "z"), // disjoint from both
      (4L, "a b c", "x") // extra doc, shingle already in x's set
    ).toDF("doc_id", "text", "source")
    val m = Dedup.groupOverlapMatrix(docs, "text", "source", 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // x/y: shingles {a b c, b c d} both sides → jaccard = 1 → 10000 bps;
    // z never overlaps; zero-overlap pairs still present (full matrix)
    assert(m == Map(
      ("x", "y") -> ((2L, 2L, 2L, 10000L)),
      ("x", "z") -> ((2L, 2L, 0L, 0L)),
      ("y", "z") -> ((2L, 2L, 0L, 0L))))
  }

  test("crossCorpusNearDups = within-corpus near-dups restricted to cross-side pairs") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .withColumn("side", when($"doc_id" % 3 === 0, "evl").otherwise("trn"))
    val cross = Dedup.crossCorpusNearDups(docs, "text", "doc_id", "side",
      "trn", "evl", ngram = 3, k = 8, bands = 4, minJaccard = 0.2)
      .as[(Long, Long, Double)].collect().toSet
    // ground truth: the full within-corpus pipeline, filtered to pairs
    // straddling the split (canonical id_1 < id_2 → normalize sides)
    val all = Dedup.minhashLshNearDups(docs, "text", "doc_id",
      ngram = 3, k = 8, bands = 4, minJaccard = 0.2)
      .as[(Long, Long, Double)].collect()
    val want = all.flatMap { case (a, b, j) =>
      (a % 3 == 0, b % 3 == 0) match {
        case (false, true) => Some((a, b, j)) // train, eval
        case (true, false) => Some((b, a, j)) // swap into (train, eval)
        case _ => None                        // same side: excluded
      }
    }.toSet
    assert(cross == want)
    assert(cross.forall { case (t, e, _) => t % 3 != 0 && e % 3 == 0 })
  }

  test("keepBestPerCluster keeps the highest-score copy; min-id only on exact ties") {
    val docs = Seq(
      (1L, "x x x x x x", "a"), // cluster {1,2}: doc 2 scores higher
      (2L, "x x x x x x y", "a"), // (more tokens → more length credit)
      (3L, "solo doc", "b"), // singleton: always kept
      (4L, "t t t", "c"), (5L, "t t t", "c") // identical → tie → min id
    ).toDF("doc_id", "text", "source")
    val pairs = Seq((1L, 2L), (4L, 5L)).toDF("id_1", "id_2")
    val best = Dedup.keepBestPerCluster(docs, pairs, "doc_id",
      graft.functions.TextFunctions.qualityScore($"text", TextQueries.EN))
      .select($"doc_id").as[Long].collect().toSet
    assert(best == Set(2L, 3L, 4L)) // 2 beats 1 on quality; 4 ties 5 → min id
    val first = Dedup.keepOnePerCluster(docs, pairs, "doc_id")
      .select($"doc_id").as[Long].collect().toSet
    assert(first == Set(1L, 3L, 4L)) // the policy actually differs
  }

  test("crossCorpusNearDups and q142 plan at scale shape: no cartesian, broadcast feature join") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .withColumn("side", when($"doc_id" % 2 === 0, "trn").otherwise("evl"))
    val crossPlan = Dedup.crossCorpusNearDups(docs, "text", "doc_id", "side",
      "trn", "evl", ngram = 3, k = 8, bands = 4, minJaccard = 0.2)
      .queryExecution.executedPlan.toString
    // the candidate step must be the (band, bkey) equi-join — an
    // accidental cross/NLJ would be the all-pairs blowup the LSH exists
    // to avoid
    assert(!crossPlan.contains("CartesianProduct"), crossPlan)
    assert(!crossPlan.contains("BroadcastNestedLoopJoin"), crossPlan)
    val dsirPlan = TextQueries.queries("q142_dsir_weight")(spark, sf)
      .queryExecution.executedPlan.toString
    // the O(B)-row feature table must broadcast onto the per-doc counts
    assert(dsirPlan.contains("BroadcastHashJoin"), dsirPlan)
    assert(!dsirPlan.contains("CartesianProduct"), dsirPlan)
  }

  test("bpeTrain: greedy left-to-right merges, ties lexicographic, merged tokens merge further") {
    val J = ""
    def finalTokens(texts: Seq[String], rounds: Int): Map[Long, Seq[String]] = {
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      TextQueries.bpeTrain(docs, "text", "doc_id", rounds)
        .select($"doc_id", $"st").as[(Long, String)].collect()
        .map { case (id, st) => id -> st.trim.split("  ").toSeq }.toMap
    }
    // greedy left-to-right on a same-token chain: a a a -> [a+a, a]
    assert(finalTokens(Seq("a a a"), 1) == Map(0L -> Seq(s"a${J}a", "a")))
    // round 1 picks the most frequent pair corpus-wide; round 2 breaks
    // the tie lexicographically; round 3 merges what remains — and the
    // round-2 winner is a pair OF merged tokens
    assert(finalTokens(Seq("b c b c", "b c x"), 3) ==
      Map(0L -> Seq(s"b${J}c${J}b${J}c"), 1L -> Seq(s"b${J}c${J}x")))
  }

  test("bpeMergeTable: vocab-target budget, ordered artifact, replay re-tokenizes held-out text") {
    val J = ""
    // base vocab {b, c, x, y} = 4; pair counts: "b c" ×3, "c x" ×2 …
    val docs = Seq((0L, "b c b c y"), (1L, "b c x"), (2L, "x y"))
      .toDF("doc_id", "text")
    // target ≤ base vocab → zero merges, empty artifact
    assert(TextQueries.bpeMergeTable(docs, "text", "doc_id", 4).count() == 0L)
    // target base+2 → exactly 2 ordered merges; rank 1 is the most
    // frequent pair, rank 2 builds ON the rank-1 merged token
    val mt = TextQueries.bpeMergeTable(docs, "text", "doc_id", 6)
      .orderBy($"rank").as[(Int, String, Long)].collect().toSeq
    assert(mt.map(_._1) == Seq(1, 2))
    assert(mt.head == ((1, "b c", 3L)))
    assert(mt(1)._2.startsWith(s"b${J}c"), s"rank-2 pair was ${mt(1)._2}")
    // a tiny corpus exhausts before a huge budget: every doc collapses
    // to one token and training stops early instead of spinning
    val small = Seq((0L, "p q"), (1L, "p q")).toDF("doc_id", "text")
    val ex = TextQueries.bpeMergeTable(small, "text", "doc_id", 100)
      .as[(Int, String, Long)].collect()
    assert(ex.length == 1 && ex.head._2 == "p q")
    // replaying the artifact in rank order re-tokenizes text exactly as
    // training would — including a HELD-OUT doc never seen in training
    val merges = mt.map(_._2)
    val trained = TextQueries.bpeTrain(docs, "text", "doc_id", rounds = 2)
      .select($"doc_id", $"st").as[(Long, String)].collect()
      .map { case (id, st) => id -> st.trim.split("  ").toSeq }.toMap
    assert(TextQueries.bpeReplay(merges, "b c b c y") == trained(0L))
    assert(TextQueries.bpeReplay(merges, "b c x") == trained(1L))
    val heldOut = TextQueries.bpeReplay(merges, "y b c c b c x")
    assert(heldOut.contains(s"b${J}c") && !heldOut.contains("b"),
      s"held-out replay missed a merge: $heldOut")
  }

  test("bpeTrain: exhaustion before the round budget EMPTIES the state (the oracle's cross-join contract)") {
    // one merge possible; q146's oracle joins each state against the
    // 1-row winner (`FROM s_{i-1}, t_i`), so an exhausted round
    // annihilates the state — the trainer must keep that contract
    val docs = Seq((1L, "a b"), (2L, "c")).toDF("doc_id", "text")
    assert(TextQueries.bpeTrain(docs, "text", "doc_id", rounds = 3).count() == 0L)
    // exhaustion exactly AT the budget is not early: state survives
    assert(TextQueries.bpeTrain(docs, "text", "doc_id", rounds = 1).count() == 2L)
  }

  test("q138 bigram lift: every row recomputes from raw counts; threshold, order, limit hold") {
    val corpus = graft.sources.Tables.documents(spark, sf)
      .select($"text").as[String].collect()
    val uni = corpus.flatMap(_.split(" ")).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = uni.values.sum
    val bi = corpus.flatMap(t => t.split(" ").sliding(2).filter(_.length == 2)
      .map(p => p(0) + " " + p(1))).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = bi.collect { case (b, cab) if cab >= 3 =>
      val Array(a, w) = b.split(" ", 2)
      (b, cab, uni(a), uni(w), cab * total * 1000000L / (uni(a) * uni(w)))
    }.toSeq.sortBy { case (b, _, _, _, lift) => (-lift, b) }.take(50)
    val got = TextQueries.queries("q138_bigram_lift")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("q140 token-rank surprisal: ranks are the (freq desc, tok) ordinals; per-doc mean exact") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val counts = docs.flatMap(_._2.split(" ")).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val rank = counts.toSeq.sortBy { case (tok, c) => (-c, tok) }
      .zipWithIndex.map { case ((tok, _), i) => tok -> (i + 1L) }.toMap
    val expected = docs.map { case (id, text) =>
      val toks = text.split(" ")
      val sumRank = toks.map(rank).sum
      (id, toks.length.toLong, sumRank, 1000L * sumRank / toks.length)
    }.toSet
    val got = TextQueries.queries("q140_token_rank")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("q143 char collision stats: integer-exact against a by-hand recount") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    val expected = docs.map { case (id, text) =>
      val cs = text.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = cs.values.sum
      val mass = cs.values.map(c => c * c).sum
      (id, n, cs.size.toLong, mass,
        if (n != 0) Some(1000000L * mass / (n * n)) else None)
    }.toSet
    val got = TextQueries.queries("q143_char_stats")(spark, sf)
      .as[(Long, Long, Long, Long, Option[Long])].collect().toSet
    assert(got == expected)
  }

  test("q142 DSIR weights: ppm ratios bounded, integral, and target-lang docs rank higher") {
    val rows = TextQueries.queries("q142_dsir_weight")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, score, mean) =>
      assert(n > 0)
      // each gram's smoothed ratio is ≤ 1e6 (c_tgt ≤ c_all), so the
      // per-doc sum and mean are bounded accordingly
      assert(score <= n * 1000000L, s"score $score exceeds ${n} * 1e6")
      assert(mean == score / n)
    }
    // the importance signal must actually separate the target: mean ppm
    // over en docs strictly above mean over the rest (seeded corpus)
    val lang = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toMap
    val (en, rest) = rows.partition(r => lang(r._1) == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    val enMean = en.map(_._4).sum.toDouble / en.size
    val restMean = rest.map(_._4).sum.toDouble / rest.size
    assert(enMean > restMean,
      s"DSIR signal inverted: en $enMean vs rest $restMean")
  }

  test("LSH banding: candidate sets nest as bands grow (the q152 curve is monotone)") {
    // If a pair shares an r-row band key, each of those minhashes is
    // equal individually, so the pair also collides under every finer
    // banding — cand(2,4) ⊆ cand(4,2) ⊆ cand(8,1). This is the
    // structural fact that makes the q152 recall curve monotone in
    // bands (at monotone candidate cost).
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i k"),   // near-dup of 1
      (3L, "a b c d e f x y z w"),   // weaker overlap
      (4L, "p q r s t u v w x y"),   // unrelated
      (5L, "p q r s t u v w x j")    // near-dup of 4
    ).toDF("doc_id", "text")
    val sh = Dedup.shingleTable(docs, "text", "doc_id", 3)
    val sigs = Dedup.minhashSignatures(sh, "doc_id", 8)
    def cands(b: Int): Set[(Long, Long)] =
      Dedup.lshCandidatePairs(sigs, "doc_id", b, 8 / b)
        .as[(Long, Long)].collect().toSet
    val (c2, c4, c8) = (cands(2), cands(4), cands(8))
    assert(c2.subsetOf(c4), s"cand(2) ⊄ cand(4): ${c2 -- c4}")
    assert(c4.subsetOf(c8), s"cand(4) ⊄ cand(8): ${c4 -- c8}")
    // single-row bands (b=8) collide on ANY shared minhash — the exact
    // near-dups must be candidates there
    assert(c8.contains((1L, 2L)) && c8.contains((4L, 5L)))
  }

  test("incremental dedup (q157 shape) finds exactly the pairs a rebuild would add") {
    // index = docs 1-4, new batch = docs 5-6. 5 ≈ 1 (cross), 6 ≈ 5
    // (within-batch), 1 ≈ 2 (idx-internal — must NOT be re-found).
    val docs = Seq(
      (1L, "a b c d e f g h i j", "idx"),
      (2L, "a b c d e f g h i k", "idx"),
      (3L, "m n o p q r s t u v", "idx"),
      (4L, "z y x w v u t s r q", "idx"),
      (5L, "a b c d e f g h i l", "new"),
      (6L, "a b c d e f g h j l", "new")
    ).toDF("doc_id", "text", "split")
    val cross = Dedup.crossCorpusNearDups(docs, "text", "doc_id", "split",
      "new", "idx", ngram = 3, k = 8, bands = 4, minJaccard = 0.2)
      .select($"new_id", $"idx_id").as[(Long, Long)].collect().toSet
    val within = Dedup.minhashLshNearDups(docs.filter($"split" === "new"),
      "text", "doc_id", ngram = 3, k = 8, bands = 4, minJaccard = 0.2)
      .select($"id_1", $"id_2").as[(Long, Long)].collect().toSet
    // the full-rebuild truth, restricted to pairs with a new endpoint
    val full = Dedup.minhashLshNearDups(docs, "text", "doc_id",
      ngram = 3, k = 8, bands = 4, minJaccard = 0.2)
      .select($"id_1", $"id_2").as[(Long, Long)].collect().toSet
    val newIds = Set(5L, 6L)
    val fullNewTouching = full.filter(p => newIds(p._1) || newIds(p._2))
    val incremental = cross.map { case (n, i) => (math.min(n, i), math.max(n, i)) } ++ within
    assert(incremental == fullNewTouching,
      s"incremental $incremental != rebuild-restricted $fullNewTouching")
    // and the idx-internal pair the incremental pass SKIPS is real work saved
    assert(full.contains((1L, 2L)) && !incremental.contains((1L, 2L)))
  }

  test("longestSharedRuns: diagonal islands recover the exact shared token run") {
    // doc 1: w1..w20; doc 2: x1 x2 then w6..w15 verbatim then y1 y2 —
    // the longest shared run is exactly 10 tokens. doc 3 shares the
    // SAME 3-gram at two scattered (non-consecutive) spots only.
    val d1 = (1 to 20).map(i => s"w$i").mkString(" ")
    val d2 = "x1 x2 " + (6 to 15).map(i => s"w$i").mkString(" ") + " y1 y2"
    val d3 = "w6 w7 w8 a b c d e w6 w7 w8 f g"
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val ps = Dedup.positionalShingleTable(docs, "text", "doc_id", 3)
    val allPairs = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("id_1", "id_2")

    val runs = Dedup.longestSharedRuns(ps, allPairs, n = 3, minTokens = 3)
      .select($"id_1", $"id_2", $"longest_tokens", $"n_matched_positions")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // 10-token run = 8 consecutive 3-gram matches on one diagonal
    assert(runs((1L, 2L)) == (10L, 8L))
    // doc 3 vs doc 1: shingle "w6 w7 w8" matches from TWO d3 positions
    // (different diagonals) — each an island of 1, so the longest run
    // stays exactly one shingle wide and occurrences are not conflated
    assert(runs((1L, 3L)) == (3L, 2L))
    // threshold filters below-minTokens pairs out entirely
    val gated = Dedup.longestSharedRuns(ps, allPairs, n = 3, minTokens = 8)
      .select($"id_1", $"id_2").as[(Long, Long)].collect().toSet
    assert(gated == Set((1L, 2L)))
    // misuse guard: a threshold under the shingle width is unobservable
    intercept[IllegalArgumentException] {
      Dedup.longestSharedRuns(ps, allPairs, n = 3, minTokens = 2)
    }
    // duplicated candidate rows must not fragment the islands: the
    // operator distincts internally, so (1,2) listed twice still
    // reports the intact 10-token run, counted once
    val dup = Seq((1L, 2L), (1L, 2L)).toDF("id_1", "id_2")
    val dedup = Dedup.longestSharedRuns(ps, dup, n = 3, minTokens = 3)
      .select($"id_1", $"id_2", $"longest_tokens", $"n_matched_positions")
      .as[(Long, Long, Long, Long)].collect()
    assert(dedup.toSeq == Seq((1L, 2L, 10L, 8L)))
  }

  test("sharedShingleCandidates: quoted-run pairs surface, hot-shingle-only pairs capped out") {
    // docs 1/2 embed the same 9-token quote inside otherwise-disjoint
    // text — the exact-substring target document-level LSH structurally
    // under-recalls; docs 3..8 share ONLY one corpus-hot shingle.
    val quote = "alpha beta gamma delta epsilon zeta eta theta iota"
    val docs = (Seq(
      (1L, s"unique one text $quote padding aa bb cc dd ee"),
      (2L, s"other words entirely $quote tail xx yy zz ww vv")) ++
      (3L to 8L).map(i => (i, s"hot hot hot filler$i more$i words$i"))
    ).toDF("doc_id", "text")
    val sh = Dedup.shingleTable(docs, "text", "doc_id", 3)
    val cands = Dedup.sharedShingleCandidates(sh, "doc_id", maxDf = 4)
      .as[(Long, Long)].collect().toSet
    // the quote's shingles have df=2 ≤ 4 → (1,2) is a candidate…
    assert(cands == Set((1L, 2L)))
    // …and the run it carries is recovered intact end-to-end
    val runs = Dedup.longestSharedRuns(
      Dedup.positionalShingleTable(docs, "text", "doc_id", 3),
      cands.toSeq.toDF("id_1", "id_2"), n = 3, minTokens = 8)
      .as[(Long, Long, Long, Long)].collect()
    assert(runs.toSeq == Seq((1L, 2L, 9L, 7L)))
    // df cap guard
    intercept[IllegalArgumentException] {
      Dedup.sharedShingleCandidates(sh, "doc_id", maxDf = 1)
    }
  }

  test("exactSubstrRuns ≡ longestSharedRuns ∘ sharedShingleCandidates, hot run interiors intact") {
    // docs 1/2 share an 8-token quote whose MIDDLE shingle
    // ("hot1 hot2 hot3") is corpus-hot (df = 10 > maxDf = 4): the pair
    // must qualify via the quote's rare shingles, and the hot-shingle
    // match must still land INSIDE the diagonal island — dropping it
    // would fragment the 8-token run into 5. Docs 3..10 share ONLY the
    // hot shingle pairwise → never candidates in either form.
    val quote = "q1 q2 hot1 hot2 hot3 q3 q4 q5"
    val docs = (Seq(
      (1L, s"one lead in $quote tail aa bb"),
      (2L, s"two other start words $quote end zz")) ++
      (3L to 10L).map(i => (i, s"hot1 hot2 hot3 filler$i more$i"))
    ).toDF("doc_id", "text")
    val ps = Dedup.positionalShingleTable(docs, "text", "doc_id", 3)
    val fused = Dedup.exactSubstrRuns(ps, maxDf = 4, n = 3, minTokens = 3)
      .select($"id_1", $"id_2", $"longest_tokens", $"n_matched_positions")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    val composed = Dedup.longestSharedRuns(ps,
      Dedup.sharedShingleCandidates(
        Dedup.shingleTable(docs, "text", "doc_id", 3), "doc_id", maxDf = 4),
      n = 3, minTokens = 3)
      .select($"id_1", $"id_2", $"longest_tokens", $"n_matched_positions")
      .as[(Long, Long, Long, Long)].collect().sorted.toSeq
    assert(fused == composed)
    val byPair = fused.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // 8-token run = 6 consecutive shingle matches, hot interior included
    assert(byPair((1L, 2L)) == (8L, 6L))
    // hot-only pairs never surface
    assert(byPair.keySet == Set((1L, 2L)))
  }

  test("q207 source classifier: disjoint vocabularies classify perfectly; held-out mass conserved") {
    // Two sources with DISJOINT vocabularies — any held-out doc's dot
    // product against the wrong source's centroid is exactly 0, so the
    // confusion matrix must be purely diagonal.
    def md5bucket(id: Long): Int = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (Character.digit(h(0), 16) * 16 + Character.digit(h(1), 16)) % 10
    }
    val rows = (1L to 80L).map { i =>
      val (src, vocab) = if (i % 2 == 0) ("sA", "alpha") else ("sB", "beta")
      (i, src, (0 until 6).map(j => s"$vocab${(i + j) % 7}").mkString(" "))
    }
    // plus one held-out doc whose every token is ABSENT from the
    // training vocabulary: it must surface as 'unclassified', not
    // silently vanish from the matrix (the inner-join-on-tok trap)
    val novelId = (81L to 400L).find(i => md5bucket(i) == 9).get
    val all = rows :+ ((novelId, "sC", "omega1 omega2 omega3"))
    val dir = java.nio.file.Files.createTempDirectory("graft-clf").toString
    all.toDF("doc_id", "source", "text")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextQueries.queries("q207_source_classifier")(spark, dir)
      .as[(String, String, Long)].collect()
    assert(got.nonEmpty)
    assert(got.filter(_._1 != "sC").forall { case (t, p, _) => t == p },
      s"off-diagonal predictions on disjoint vocab: ${got.mkString(", ")}")
    assert(got.contains(("sC", "unclassified", 1L)))
    // every held-out doc (bucket 9) is accounted for exactly once
    val heldOut = rows.count(r => md5bucket(r._1) == 9)
    assert(got.map(_._3).sum == heldOut + 1 && heldOut > 0)
    // q208 eval on the same (cached) predictions: perfect classifier
    // ⇒ recall == precision == 10000 bps for sA/sB; the novel-vocab
    // class and the 'unclassified' sink both conserve their mass
    val ev = TextQueries.queries("q208_classifier_eval")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).sortBy(_._1)
    assert(ev.map(_._1).toSeq == Seq("sA", "sB", "sC", "unclassified"))
    ev.filter(e => e._1 == "sA" || e._1 == "sB").foreach {
      case (_, nh, nc, rec, np, prec) =>
        assert(nh == nc && nh == np && rec.contains(10000L) && prec.contains(10000L))
    }
    val sc = ev.find(_._1 == "sC").get
    assert(sc._2 == 1 && sc._3 == 0 && sc._4.contains(0L) && sc._5 == 0 && sc._6.isEmpty)
    val un = ev.find(_._1 == "unclassified").get
    assert(un._2 == 0 && un._4.isEmpty && un._5 == 1 && un._6.contains(0L))
    assert(ev.map(_._2).sum == heldOut + 1)
  }

  // q225: the relational Viterbi DP must return, per word, EXACTLY the
  // lexicographic optimum over ALL segmentations — verified here by
  // exhaustive enumeration (words are ≤ 8 chars at spec scale, so the
  // full segmentation tree is tiny), with the inventory rebuilt in
  // plain Scala from first principles. Checks the semantic claim
  // (fewest pieces, then max frequency mass) directly, not the integer
  // encoding.
  test("q225 unigram fertility: DP optimum equals exhaustive-search optimum per word") {
    val rows = TextQueries.queries("q225_unigram_fertility")(spark, sf)
      .select($"word", $"c", $"n_pieces", $"freq_sum")
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("w")).as[String].collect()
    val wc = toks.groupBy(identity).map { case (w, a) => (w, a.length.toLong) }
    val words = wc.filter { case (w, _) => w.nonEmpty && w.length <= 16 }
    val tot = toks.length.toLong
    val pc = scala.collection.mutable.HashMap.empty[String, Long].withDefaultValue(0L)
    for ((w, c) <- words; i <- 0 until w.length; k <- 1 to 4 if i + k <= w.length)
      pc(w.substring(i, i + k)) += c
    val inv = pc.filter { case (p, f) => p.length == 1 || f * 100 >= tot }.toMap
    def segs(w: String): Seq[(Int, Long)] =
      if (w.isEmpty) Seq((0, 0L))
      else (1 to math.min(4, w.length)).flatMap { k =>
        inv.get(w.take(k)).toSeq.flatMap { f =>
          segs(w.drop(k)).map { case (p, fs) => (p + 1, fs + f) }
        }
      }
    assert(rows.length == words.size)
    rows.foreach { case (w, c, np, fs) =>
      assert(c == wc(w), s"count of $w")
      val all = segs(w)
      val minP = all.map(_._1).min
      val bestFs = all.filter(_._1 == minP).map(_._2).max
      assert(np == minP, s"$w: pieces $np vs exhaustive $minP")
      assert(fs == bestFs, s"$w: freq mass $fs vs exhaustive $bestFs")
    }
  }

  // The incremental trainer's SCALE claim, pinned as a plan-shape
  // assertion (the q218-no-Window / q216-no-cartesian discipline): one
  // driver action per merge round plus bounded setup. The replaced
  // DataFrame loop paid ~4 jobs/round (winner collect + eager patch
  // checkpoint + AQE stages); a regression to per-phase actions blows
  // straight past this bound.
  test("incremental BPE job count is O(rounds): one fold action per merge + bounded setup") {
    val sc = spark.sparkContext
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    sc.addSparkListener(listener)
    try {
      val rounds = 8
      val merges = TextQueries.bpeMergeTableMerges(
        graft.sources.Tables.documents(spark, sf), "text", "doc_id", rounds)
      assert(merges.count() == rounds)
      // listener events are async: poll until the count settles
      var prev = -1
      var cur = jobs.get
      while (cur != prev) { Thread.sleep(250); prev = cur; cur = jobs.get }
      // setup = corpus-bytes agg + repartition + initial pair counts
      // (AQE may split each into a few jobs); then 1 action/round, no
      // compaction below 16 rounds, no state materialization for the
      // merge-table path
      assert(cur <= rounds + 16, s"jobs=$cur for $rounds merges")
    } finally sc.removeSparkListener(listener)
  }

  // The slot-capped candidate sampler: k = 1 (cap above the slot
  // count) must reproduce the exact relation, a small cap must return
  // a non-empty subset of it, and the subset must be the deterministic
  // mixer-mod-k slice (re-running gives the identical set).
  test("sharedShingleCandidatesSampled: k=1 exact, capped = deterministic subset") {
    val sh = Dedup.shingleTable(
      graft.sources.Tables.documents(spark, sf), "text", "doc_id", 3)
    val exact = Dedup.sharedShingleCandidates(sh, "doc_id", 25)
      .as[(Long, Long)].collect().toSet
    val uncapped = Dedup.sharedShingleCandidatesSampled(sh, "doc_id", 25, Long.MaxValue)
      .as[(Long, Long)].collect().toSet
    assert(uncapped == exact && exact.nonEmpty)
    val capped = Dedup.sharedShingleCandidatesSampled(sh, "doc_id", 25, 50L)
      .as[(Long, Long)].collect().toSet
    assert(capped.subsetOf(exact))
    assert(capped.nonEmpty && capped.size < exact.size)
    val again = Dedup.sharedShingleCandidatesSampled(sh, "doc_id", 25, 50L)
      .as[(Long, Long)].collect().toSet
    assert(again == capped)
  }

  // The retirement-attribution contract (the round-12 concurrency
  // hazard): cutTracked reads its id off the cut's own plan, so a
  // relation persisted CONCURRENTLY by another thread of the session
  // (serving reads during a maintenance drain, a QueryCaches training)
  // can never be captured — and retiring the returned ids can never
  // kill it. Under the old global keySet diff this test fails two
  // ways: ids.size > 1 when a foreign persist lands inside the cut
  // window, and the survival scan throws missing-block after
  // retirement truncates a foreign localCheckpoint's lineage.
  test("cutTracked attribution is plan-precise: concurrent persists are never captured or retired") {
    val preexisting = (1 to 5).map(i =>
      spark.range(i * 1000L, i * 1000L + 100L).toDF("v").localCheckpoint(true))
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val foreign =
      new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.DataFrame]()
    val failed = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val t = new Thread(() => {
      var i = 100000L
      try while (!stop.get) {
        foreign.add(spark.range(i, i + 50L).toDF("v").localCheckpoint(true)): Unit
        i += 100L
      } catch { case e: Throwable => failed.set(e) }
    })
    t.start()
    try {
      (1 to 15).foreach { i =>
        val (ck, ids) = Dedup.cutTracked(
          spark.range(i * 10L, i * 10L + 200L).toDF("x"))
        assert(ids.size == 1,
          s"cut $i captured ${ids.size} ids — attribution is a window " +
            "diff again, a concurrent persist was swept in")
        assert(ck.count() == 200)
        Dedup.retireTracked(spark, ids)
      }
    } finally { stop.set(true); t.join() }
    assert(failed.get == null, s"foreign thread died: ${failed.get}")
    // every concurrently-persisted relation survives the retirements:
    // reading a truncated-lineage localCheckpoint would throw
    preexisting.foreach(df => assert(df.count() == 100))
    assert(!foreign.isEmpty, "foreign thread persisted nothing — no race exercised")
    foreign.forEach(df => assert(df.count() == 50))
  }

  // The observe-riding key-bucket set: the per-band collect_set form
  // (aggregation state bounded by nBands × n, never O(rows × bands))
  // must equal the flat exploded bucket set — a lost bucket would make
  // the streaming probe's file pruning LOSSY (silently missed
  // candidates). NULL arrays contribute nothing; arrays WIDER than the
  // declared band count trip the size guard to all n buckets (lossless
  // over-read, never a miss).
  test("keyBucketSetExprs: per-band union ≡ exploded bucket set; null-safe; oversize falls back to all buckets") {
    val n = 8
    val df = Seq(
      (1L, Seq("alpha", "beta", "gamma")),
      (2L, Seq("delta", "epsilon", "zeta")),
      (3L, null: Seq[String]),
      (4L, Seq("eta", "theta", "iota"))
    ).toDF("id", Dedup.BAND_KEYS_COL)
    val expected = df.select(explode(col(Dedup.BAND_KEYS_COL)).as("k"))
      .select(Dedup.idBucket(col("k"), n).as("b"))
      .distinct().as[Int].collect().toSet
    val obs = org.apache.spark.sql.Observation()
    val exprs = Dedup.keyBucketSetExprs(col(Dedup.BAND_KEYS_COL), n, 3, "kb")
    df.observe(obs, exprs.head, exprs.tail: _*).count(): Unit
    val got = Dedup.observedKeyBuckets(obs, "kb", n, 3)
    assert(got.toSet == expected, s"per-band union $got != exploded $expected")
    assert(got.size == got.distinct.size)
    // declared band count narrower than the stored arrays: the guard
    // must widen to every bucket rather than silently drop band 3's keys
    val obs2 = org.apache.spark.sql.Observation()
    val exprs2 = Dedup.keyBucketSetExprs(col(Dedup.BAND_KEYS_COL), n, 2, "kb")
    df.observe(obs2, exprs2.head, exprs2.tail: _*).count(): Unit
    assert(Dedup.observedKeyBuckets(obs2, "kb", n, 2).toSet == (0 until n).toSet)
  }
}
