package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over pair relations. The reference pipeline stops at
  * flat dedup (keep min-id per cluster); centrality is the step a
  * curation pipeline takes next — pick the CANONICAL representative of
  * a near-dup cluster as its most-linked member, weight sources by how
  * central their documents sit in the similarity graph, etc.
  */
object Graph {

  /** Fixed-round PageRank with PURE-INTEGER state. Ranks are held at
    * fixed-point scale `scale` (default 1e12) and every update is
    *
    *   r'(v) = (15·base + 85·Σ_{u→v} (r(u) div deg(u))) div 100,
    *   base  = scale div N
    *
    * — integer division only, so the state after any number of rounds
    * is bit-identical on every engine and partitioning. (Iterated IEEE
    * float PageRank is NOT: the summation order of the in-mass varies
    * with the physical plan.) Dangling out-mass is dropped rather than
    * redistributed — the standard sparse simplification; the teleport
    * term keeps every node's rank positive.
    *
    * Scale shape: each round is one equi-join (ranks ⋈ edges on src —
    * shuffled, the rank relation is never assumed broadcastable) + one
    * partial-aggregated shuffle (groupBy dst) + a left join back to the
    * node set; `deg` is computed once. Rounds are data-independent, so
    * at 100 TB the same plan runs with `rounds` set by convergence
    * budget. Lineage is cut per round (localCheckpoint, as
    * [[Dedup.connectedComponents]] does) so the plan doesn't grow with
    * iterations; no collect beyond the bounded node count, no driver
    * state.
    *
    * `edges` is directed (src, dst) — symmetrize first for undirected
    * graphs. `nodes` is one row per id (isolated nodes allowed: they
    * keep degree 0 and converge to the teleport-only fixpoint
    * (15·base) div 100). Returns (idCol, degree, rank_q).
    */
  def pageRank(nodes: DataFrame, idCol: String, edges: DataFrame,
               rounds: Int, scale: Long = 1000000000000L): DataFrame = {
    require(rounds >= 1, s"pageRank needs at least 1 round, got $rounds")
    val n = nodes.select(col(idCol).as("id"))
    // Materialize the adjacency ONCE: the edge relation is typically the
    // output of a whole candidate-pair pipeline (q139 feeds simhash
    // banding through here), and every iteration below joins it — lazy,
    // it would re-run that pipeline per round (plus once for the final
    // degree join). The iterative-graph contract at any scale is: build
    // the edge list, pin it, iterate over the pinned copy.
    val e = edges.toDF("src", "dst").localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg")).localCheckpoint(true)
    // bounded driver scalar (node count), same class as the watermark
    // reads and the q122 doc count
    val nNodes = n.count()
    require(nNodes > 0, "pageRank over an empty node set")
    val base = scale / nNodes
    var r = n.select(col("id"), lit(base).as("r"))
    for (_ <- 1 to rounds) {
      val inMass = r.join(e, col("id") === col("src"))
        .join(deg, Seq("src"))
        .select(col("dst").as("id"), expr("r div deg").as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("s"))
      r = n.join(inMass, Seq("id"), "left")
        .select(col("id"),
          expr(s"(15 * ${base}L + 85 * coalesce(s, 0L)) div 100").as("r"))
        .localCheckpoint(true)
    }
    n.join(deg.select(col("src").as("id"), col("deg")), Seq("id"), "left")
      .join(r, Seq("id"))
      .select(col("id").as(idCol),
        coalesce(col("deg"), lit(0L)).as("degree"),
        col("r").as("rank_q"))
  }

  /** Bounded-hop BFS distance from a SEED SET over an undirected pair
    * relation — the "distance to trusted documents" primitive of
    * seed-based quality propagation (the TrustRank idea restricted to
    * its exact integer core: hop count instead of damped mass). A
    * curation pipeline seeds with a vetted corpus slice and keeps/
    * weights documents by graph proximity to it.
    *
    * Level-synchronous BFS: each hop expands only the FRONTIER (nodes
    * first reached last hop) through one equi-join on src, then
    * anti-joins the settled set so every node is discovered exactly
    * once, at its true shortest hop — the min-agg inside a hop settles
    * ties when two frontier nodes reach the same neighbor. Per-hop
    * cost is O(frontier × avg-degree) shuffled on the node id; the
    * settled relation only ever appends. Lineage is cut per hop like
    * [[pageRank]]; the early exit fires on an already-materialized
    * frontier (localCheckpoint), so `isEmpty` costs no recompute.
    *
    * `pairs` rows are unordered edges (a, b); both directions are
    * expanded. Seeds absent from the edge relation still appear at
    * hops = 0. Returns (idCol, hops) for every node within `maxHops`
    * of a seed — unreachable nodes are absent, not NULL.
    */
  def seedDistances(pairs: DataFrame, seeds: DataFrame, idCol: String,
                    maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"seedDistances needs maxHops >= 0, got $maxHops")
    val p = pairs.toDF("a", "b")
    val e = p.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
      .distinct().localCheckpoint(true)
    var settled = seeds.select(col(idCol).as("id")).distinct()
      .select(col("id"), lit(0L).as("hops")).localCheckpoint(true)
    var frontier = settled
    var h = 1L
    while (h <= maxHops && !frontier.isEmpty) {
      val next = frontier.select(col("id").as("src"))
        .join(e, Seq("src"))
        .select(col("dst").as("id")).distinct()
        .join(settled, Seq("id"), "left_anti")
        .select(col("id"), lit(h).as("hops"))
        .localCheckpoint(true)
      settled = settled.unionByName(next).localCheckpoint(true)
      frontier = next
      h += 1
    }
    settled.select(col("id").as(idCol), col("hops"))
  }
}
