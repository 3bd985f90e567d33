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

  /** [[pageRank]] over a graph given in CONTRACTED (class) form, for
    * graphs that are blow-ups of a small quotient: `classes` =
    * (classCol, cntCol) with one row per equivalence class of
    * STRUCTURALLY IDENTICAL nodes — every member adjacent to every
    * other member of its own class and to every member of each
    * adjacent class, and to nothing else (exactly the shape a
    * fingerprint-group near-dup graph has: identical fingerprints form
    * cliques, qualifying fingerprint pairs form complete bipartite
    * links). `classEdges` = distinct undirected class adjacency
    * (c1 ≠ c2, each unordered pair once).
    *
    * Member ranks are class-uniform by induction — the integer update
    * r'(v) = (15·base + 85·Σ (r(u) div deg(u))) div 100 depends only on
    * class-level aggregates: every member of class i has
    * deg d_i = (cnt_i − 1) + Σ_{j ∈ N(i)} cnt_j and in-mass
    * S_i = (cnt_i − 1)·(r_i div d_i) + Σ_j cnt_j·(r_j div d_j), each
    * term an integer MULTIPLE of a per-member share, so the class-level
    * arithmetic reproduces the member-level sums exactly — bit-identical
    * to [[pageRank]] over the blown-up member graph (GraphSpec pins it).
    * Rounds run over |classes| rows instead of the quadratically
    * blown-up member edge relation: the dedup-graph regime where the
    * member relation is millions of rows and the quotient thousands.
    *
    * Returns per-CLASS (classCol, degree, rank_q); expand to members
    * with one join. `nNodes` (the teleport base's denominator)
    * defaults to Σ cnt; pass it explicitly when the NODE set is larger
    * than the classed members (e.g. isolated nodes carried outside the
    * class relation — they converge to the teleport-only fixpoint
    * (15·base) div 100 with degree 0, exactly as in [[pageRank]], and
    * the caller attaches that constant on expansion).
    */
  def pageRankContracted(classes: DataFrame, classCol: String, cntCol: String,
                         classEdges: DataFrame, rounds: Int,
                         scale: Long = 1000000000000L,
                         nNodes: Option[Long] = None): DataFrame = {
    require(rounds >= 1, s"pageRankContracted needs at least 1 round, got $rounds")
    val cls = classes.select(col(classCol).as("c"), col(cntCol).cast("long").as("cnt"))
      .localCheckpoint(true)
    val e = classEdges.toDF("c1", "c2")
    val und = e.unionByName(e.select(col("c2").as("c1"), col("c1").as("c2")))
      .localCheckpoint(true)
    // degree of every member of class i: own clique + adjacent classes
    val nbrCnt = und.join(cls.select(col("c").as("c2"), col("cnt").as("cnt2")), Seq("c2"))
      .groupBy(col("c1").as("c")).agg(sum(col("cnt2")).as("nbr"))
    val degC = cls.join(nbrCnt, Seq("c"), "left")
      .select(col("c"), col("cnt"),
        (col("cnt") - 1L + coalesce(col("nbr"), lit(0L))).as("d"))
      .localCheckpoint(true)
    val n = nNodes.getOrElse(
      cls.agg(coalesce(sum(col("cnt")), lit(0L))).head().getLong(0))
    require(n > 0, "pageRankContracted over an empty node set")
    val base = scale / n
    var r = degC.select(col("c"), col("cnt"), col("d"), lit(base).as("r"))
    for (_ <- 1 to rounds) {
      // per-member share; a zero-degree class is a size-1 singleton
      // with no neighbors — it contributes nothing anywhere
      val sh = r.select(col("c"), col("cnt"),
        when(col("d") > 0, expr("r div d")).otherwise(lit(0L)).as("share"))
      val nbrIn = und
        .join(sh.select(col("c").as("c2"), (col("cnt") * col("share")).as("m")), Seq("c2"))
        .groupBy(col("c1").as("c")).agg(sum(col("m")).as("nbrS"))
      r = r.join(sh.select(col("c"), col("share")), Seq("c"))
        .join(nbrIn, Seq("c"), "left")
        .select(col("c"), col("cnt"), col("d"),
          expr(s"(15 * ${base}L + 85 * ((cnt - 1L) * share + coalesce(nbrS, 0L))) div 100").as("r"))
        .localCheckpoint(true)
    }
    r.select(col("c").as(classCol), col("d").as("degree"), col("r").as("rank_q"))
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
