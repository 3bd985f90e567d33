package graft.operators

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // Path graph 1—2—3 plus isolated node 4, rounds = 1, scale = 1e12:
  // base = 250e9; deg = (1:1, 2:2, 3:1, 4:−).
  // in-mass: 1 ← 2/2 = 125e9; 2 ← 1/1 + 3/1 = 500e9; 3 ← 125e9; 4 ← 0.
  // r1(v) = (15·250e9 + 85·in) div 100.
  test("pageRank: hand-computed integer ranks after one round") {
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val und = e.unionByName(e.select($"dst".as("src"), $"src".as("dst")))
    val got = Graph.pageRank(nodes, "id", und, rounds = 1)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 1L, 143750000000L),
      (2L, 2L, 462500000000L),
      (3L, 1L, 143750000000L),
      (4L, 0L, 37500000000L)))
  }

  // Path 1—2—3—4, separate edge 5—6, isolated seed 7. Seeds {1, 5, 7},
  // maxHops = 2: node 4 is 3 hops out → absent; 7 has no edges → (7, 0).
  test("seedDistances: hand-computed BFS levels, hop cap, edgeless seed") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("a", "b")
    val seeds = Seq(1L, 5L, 7L).toDF("doc_id")
    val got = Graph.seedDistances(pairs, seeds, "doc_id", maxHops = 2)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 2L),
      (5L, 0L), (6L, 1L), (7L, 0L)))
  }

  // Triangle 1—2—3 with seed 1: node 3 must settle at its SHORTEST hop
  // (1, direct edge), not the 2-hop path through 2 — the anti-join
  // settles each node the first level it appears.
  test("seedDistances: settles at the shortest hop, not a longer path") {
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("a", "b")
    val seeds = Seq(1L).toDF("doc_id")
    val got = Graph.seedDistances(pairs, seeds, "doc_id", maxHops = 4)
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 1L)))
  }

  test("pageRank: isolated node sits at the teleport fixpoint; ranks stay positive") {
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val und = e.unionByName(e.select($"dst".as("src"), $"src".as("dst")))
    val got = Graph.pageRank(nodes, "id", und, rounds = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // teleport-only fixpoint: (15 · (1e12 div 4)) div 100, reached after
    // round 1 and stable thereafter
    assert(got.find(_._1 == 4L).get._3 == 37500000000L)
    assert(got.forall(_._3 > 0L))
    // the hub (degree 2) outranks the leaves every round
    assert(got.find(_._1 == 2L).get._3 > got.find(_._1 == 1L).get._3)
  }

  test("pageRankContracted ≡ pageRank over the blown-up member graph (random class graphs)") {
    // random quotient graphs: classes of size 1-4, random class edges;
    // the blown-up member graph makes every same-class pair and every
    // cross-pair of adjacent classes an edge — the exact structure the
    // contraction assumes. Ranks and degrees must match bit for bit
    // per member, across several rounds, including isolated nodes
    // carried OUTSIDE the class relation via nNodes + the caller-side
    // teleport default (the q139 expansion shape).
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 4) {
      val nClasses = 2 + rnd.nextInt(4)
      val sizes = (0 until nClasses).map(_ => 1 + rnd.nextInt(4))
      val memberOf = sizes.zipWithIndex.flatMap { case (g, c) =>
        (0 until g).map(_ => c) }.zipWithIndex.map { case (c, m) => (m.toLong, c) }
      val clsEdges = (for {
        a <- 0 until nClasses; b <- (a + 1) until nClasses
        if rnd.nextBoolean()
      } yield (a, b)).toSeq
      val nIsolated = rnd.nextInt(3) // extra classless nodes
      val isolated = (0 until nIsolated).map(i => 10000L + i)
      val memberEdges =
        memberOf.combinations(2).collect {
          case Seq((m1, c1), (m2, c2))
            if c1 == c2 || clsEdges.contains((math.min(c1, c2), math.max(c1, c2))) =>
            (m1, m2)
        }.toSeq
      val allIds = memberOf.map(_._1) ++ isolated
      val nodes = allIds.toDF("id")
      val e = memberEdges.toDF("src", "dst")
      val und = e.unionByName(e.select($"dst".as("src"), $"src".as("dst")))
      val rounds = 1 + rnd.nextInt(3)
      val want = Graph.pageRank(nodes, "id", und, rounds = rounds)
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      val classes = sizes.zipWithIndex.map { case (g, c) => (c, g.toLong) }
        .toDF("cls", "cnt")
      val ranked = Graph.pageRankContracted(classes, "cls", "cnt",
        clsEdges.toDF("c1", "c2"), rounds = rounds,
        nNodes = Some(allIds.length.toLong))
      val teleportOnly = 15L * (1000000000000L / allIds.length) / 100L
      val got = memberOf.toDF("id", "cls")
        .unionByName(isolated.map(i => (i, -1)).toDF("id", "cls"))
        .join(ranked.withColumnRenamed("cls", "cls2"),
          $"cls" === $"cls2", "left")
        .select($"id",
          org.apache.spark.sql.functions.coalesce($"degree",
            org.apache.spark.sql.functions.lit(0L)).as("degree"),
          org.apache.spark.sql.functions.coalesce($"rank_q",
            org.apache.spark.sql.functions.lit(teleportOnly)).as("rank_q"))
        .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == want, s"trial=$trial sizes=$sizes clsEdges=$clsEdges rounds=$rounds")
    }
  }
}
