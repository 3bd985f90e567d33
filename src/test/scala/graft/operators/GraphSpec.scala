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
}
