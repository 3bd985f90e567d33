package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Three paths, mirroring what a 100 TB pipeline needs:
  *  - [[bruteForceKnn]]: exact cosine top-k via a broadcast block
  *    kernel — the correctness baseline, quadratic, only for
  *    small/filtered sets (or per-bucket after blocking).
  *  - [[lshNearPairs]]: sign-bit LSH bucketing → candidates share a
  *    bucket → exact cosine only on candidates. The bucket join is an
  *    equi-join (shuffle on the bucket key), so the all-pairs cross
  *    product never materializes; bucket skew is handled by AQE or by
  *    raising `bits`.
  *  - [[ivfKnn]]: the same shape with coarse-quantizer cell ids as the
  *    bucket key.
  *
  * Zero vectors have no defined cosine: every path drops pairs where
  * either norm is 0 — the column paths guard the division explicitly
  * (NULL, matching the oracle; under Spark's default ANSI mode an
  * unguarded `/` would THROW on the first zero vector), and the
  * kernels skip them with the same result.
  */
object Similarity {

  /** cos = dot/(na·nb) over precomputed norms, NULL when either norm is
    * 0 — see [[graft.functions.VectorFunctions.cosine]] for why the
    * guard is load-bearing under ANSI mode.
    */
  private def safeCos(d: org.apache.spark.sql.Column,
                      na: org.apache.spark.sql.Column,
                      nb: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(na * nb =!= 0, d / (na * nb))

  /** Driver/kernel-side float dot product — replicates
    * [[org.apache.spark.sql.graft.DotProductFloat]]'s fold EXACTLY
    * (min length, widen-then-multiply, strict left-to-right) so every
    * Scala-computed value is bit-identical to the codegen'd expression
    * and the oracle. The single copy all kernels share.
    */
  private def dotf(x: Array[Float], y: Array[Float]): Double = {
    val n = math.min(x.length, y.length)
    var acc = 0.0; var i = 0
    while (i < n) { acc += x(i).toDouble * y(i).toDouble; i += 1 }
    acc
  }

  /** Exact cosine top-k — the ground-truth baseline every recall
    * number in this file is measured against (q86/q119/q123/q136).
    *
    * Numeric contract: cos = dot/(na·nb) with the left-to-right
    * float→double fold of [[VectorFunctions.dot]] and the DuckDB
    * oracle, NULL-guarded on zero norms; ties break nn_id asc.
    */
  def bruteForceKnn(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    // Fully relational exact scan: non-equi self-join → codegen'd
    // guarded cosine → bounded TopK partial agg. No driver collect and
    // no assumption that either side fits anywhere whole: at small N
    // the planner picks BroadcastNestedLoopJoin, at large N it degrades
    // to the partition-pair CartesianProduct — still O(N²) compute
    // (exactness is inherently quadratic; this is the ground-truth
    // baseline, blockedKnn/IVFADC are the serving paths) but each task
    // only ever holds one partition pair. TopKByScore reduces map-side
    // to ≤k rows per query before the exchange.
    import graft.functions.VectorFunctions.{dot, norm}
    // norms precomputed once per SIDE, not once per pair — same fold,
    // same doubles, 1/3 the flops of cosine-per-pair
    //
    // The streamed side is repartitioned to the session's compute
    // parallelism ([[KernelPar]]): the join's work is O(N²) cosines but
    // its INPUT is N small rows, so byte-based split sizing leaves the
    // whole nested loop on however few partitions the scan produced
    // (measured: 4 tasks for the 2000-vector corpus — a 32-core session
    // ran the 4M-pair loop 87% idle). Round-robin of N rows is noise
    // next to the N² stage it spreads; per-row results are independent
    // and the TopK agg's merge is a total order, so the relation is
    // bit-identical under any partitioning.
    //
    // Zero-norm endpoints are dropped PER SIDE (N rows) instead of via
    // a cos-isNotNull filter on the joined relation (N² rows): the
    // pushed-down null filter landed INSIDE the nested-loop join
    // condition, where the interpreted `vec_dot` ran once in the
    // condition and again in the projection — two 64-dim dots per pair.
    // cos is NULL exactly when a side's norm is 0 (norms are
    // non-negative, and for float32 coordinates a nonzero norm is
    // ≥ ~1.4e-45, so the na·nb product ≥ ~2e-90 can never underflow a
    // DOUBLE to 0 — the when-guard cannot fire once both sides are
    // filtered), so the relation is unchanged and the join condition
    // shrinks to the id inequality alone.
    val a = emb.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("__va"),
      norm(col(vecCol)).as("__na"))
      .filter(col("__na") =!= 0)
      .repartition(KernelPar.partitions(emb.sparkSession))
    val b = emb.select(col(idCol).cast("long").as("nn_id"), col(vecCol).as("__vb"),
      norm(col(vecCol)).as("__nb"))
      .filter(col("__nb") =!= 0)
    val topk = org.apache.spark.sql.functions.udaf(new graft.functions.TopKByScore(k))
    a.join(b, col("vec_id") =!= col("nn_id"))
      .withColumn("cos",
        safeCos(dot(col("__va"), col("__vb")), col("__na"), col("__nb")))
      .groupBy(col("vec_id"))
      .agg(topk(col("cos"), col("nn_id")).as("__nns"))
      .select(col("vec_id"), posexplode(col("__nns")))
      .select(col("vec_id"), col("col._2").as("nn_id"),
        col("col._1").as("cos"), (col("pos") + 1).cast("int").as("rn"))
  }

  /** Sign-bit LSH buckets: (id, bucket). */
  def buckets(emb: DataFrame, idCol: String, vecCol: String, bits: Int): DataFrame =
    emb.select(col(idCol), col(vecCol), signBucket(col(vecCol), bits).as("bucket"))

  /** IVF-style ANN: exact top-k restricted to the probed coarse
    * partition (`clusterCol` — a centroid/cell id from any coarse
    * quantizer; the testdata's `label` plays that role). The classic
    * IVF trade: recall bounded by the quantizer, cost divided by the
    * number of cells. nprobe>1 = union several cluster ids upstream.
    * Partition-local: the self-join shuffles on the cluster key only —
    * each cell's quadratic search is independent, so the shape
    * parallelizes across cells at 100 TB.
    */
  def ivfKnn(emb: DataFrame, idCol: String, vecCol: String,
             clusterCol: String, k: Int): DataFrame = {
    val a = emb.select(col(clusterCol).as("cluster"), col(idCol).as("vec_id"),
      col(vecCol).as("va"), norm(col(vecCol)).as("na"))
    val b = emb.select(col(clusterCol).as("cluster"), col(idCol).as("nn_id"),
      col(vecCol).as("vb"), norm(col(vecCol)).as("nb"))
    // Top-k via bounded partial aggregation (TopKByScore): map tasks
    // reduce to ≤k rows per vector before the exchange, instead of a
    // window shuffling the whole candidate relation.
    val topk = udaf(new graft.functions.TopKByScore(k))
    a.join(b, "cluster").filter(col("vec_id") =!= col("nn_id"))
      .withColumn("cos", safeCos(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cos").isNotNull) // zero-norm vectors have no cosine
      .groupBy(col("cluster"), col("vec_id"))
      .agg(topk(col("cos"), col("nn_id")).as("nns"))
      .select(col("cluster"), col("vec_id"), posexplode(col("nns")))
      .select(col("cluster"), col("vec_id"), col("col._2").as("nn_id"),
        col("col._1").as("cos"), (col("pos") + 1).cast("int").as("rn"))
  }

  /** One Lloyd refinement step for a cosine k-means coarse quantizer —
    * the TRAINING shape behind [[ivfKnn]]'s cells: assign every vector
    * to its nearest seed centroid (seeds = the k smallest ids,
    * deterministic), recompute centroids as per-dimension exact LONG
    * sums of 1e-7-quantized coordinates, re-assign. Cosine is
    * scale-invariant, so the (scaled) sum IS the mean for assignment
    * purposes; exact integer sums are order-independent where double
    * means are not; and floor() on the shared IEEE double value has no
    * decimal-expansion rounding ambiguity (a double→decimal cast
    * rounds shortest-repr vs exact-binary digits differently across
    * engines at halfway cases). The 1e-7 grid is far below any float
    * coordinate's precision — harmless for a coarse quantizer.
    *
    * Scale shape: centroids are k rows → broadcast; the assignment
    * top-1 and the (cid, dim) sum are both partial-aggregated, so the
    * only wide work is two narrow shuffles. Iterate by feeding the
    * output clusters back in; one step per pass keeps each pass
    * verifiable.
    */
  def kmeansAssignStep(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    kmeansAssign(emb, idCol, vecCol,
      kmeansCentroids(emb, idCol, vecCol, k, rounds = 1)).drop(vecCol)

  /** Nearest-candidate assignment shared by the k-means|| voting
    * reduction and q239's occupancy A/B — one home for the
    * smallest-cand_id tie-break encoded as max(struct(cos, −cand_id)),
    * which the SQL oracles mirror verbatim (two copies of a
    * load-bearing encoding desynchronize silently). `cand` must be the
    * algorithm-constant-bounded (cand_id, cvec) relation (broadcast);
    * rows whose every cosine is NULL (zero vectors) drop out, matching
    * both callers. Returns (idCol, cand_id).
    */
  def assignToNearestCandidate(pts: DataFrame, idCol: String, vecCol: String,
                               cand: DataFrame): DataFrame =
    pts.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(cand))
      .withColumn("cos", cosine(col(vecCol), col("cvec")))
      .filter(col("cos").isNotNull)
      .groupBy(col(idCol))
      .agg(max(struct(col("cos"), (col("cand_id") * -1).as("nid"))).as("m"))
      .select(col(idCol), (col("m.nid") * -1).as("cand_id"))

  /** DERANDOMIZED k-means|| initialization (Bahmani et al., "Scalable
    * K-Means++", VLDB 2012): instead of k sequential k-means++ draws
    * (k round trips — unusable distributed), each of `rounds`
    * oversampling passes selects ~`oversample` points AT ONCE with
    * probability ∝ cost, then the bounded candidate set reduces to k
    * by weight. Every "random" draw here is a SALTED-HASH THRESHOLD:
    * point p is selected in round r iff
    *   u32("kmpp r" ‖ id) < (oversample · dist_q(p) · 2³²) div total_q
    * with dist_q = ⌊(1 − best_cos)·1e6⌋ — so the seed set is
    * bit-identical on any engine or partitioning (the q235 device
    * pointed at cluster init). An already-selected point has cost 0
    * and can never be re-drawn, so the candidate union needs no dedup.
    * Reduction: each point votes for its nearest candidate (cosine,
    * smallest-id tie-break via the associative struct argmax), and the
    * k heaviest candidates win (weight desc, id asc) — the standard
    * weighted reduction with the recluster step simplified to a
    * deterministic top-k. Candidate set stays ~1 + rounds·oversample
    * (broadcastable); per round: one broadcast join + one bounded agg;
    * the corpus is scanned rounds + 1 times, never shuffled on id.
    * Zero-norm vectors (cosine undefined) are excluded from cost,
    * selection and votes — both engines agree.
    * Returns (cid 1..k, seed_id, weight).
    */
  def kmeansParallelSeeds(emb: DataFrame, idCol: String, vecCol: String,
                          k: Int, rounds: Int, oversample: Int): DataFrame = {
    require(k >= 1 && rounds >= 1 && oversample >= 1,
      s"kmeansParallelSeeds: k=$k rounds=$rounds oversample=$oversample")
    import graft.functions.TextFunctions.hexNibble
    val pts = emb.select(col(idCol).as("pid"), col(vecCol).as("pvec"))
    def u32(r: Int): Column = {
      val h = md5(concat(lit(s"kmpp$r-"), col("pid").cast("string")))
      (1 to 8).map(i =>
        hexNibble(substring(h, i, 1)).cast("long") * lit(1L << (4 * (8 - i))))
        .reduce(_ + _)
    }
    var cand = pts.orderBy(col("pid")).limit(1)
      .select(col("pid").as("cand_id"), col("pvec").as("cvec"))
      .localCheckpoint(true)
    for (r <- 1 to rounds) {
      val dq = pts.crossJoin(broadcast(cand))
        .withColumn("cos", cosine(col("pvec"), col("cvec")))
        .filter(col("cos").isNotNull)
        .groupBy(col("pid"), col("pvec"))
        .agg(max(col("cos")).as("best"))
        .withColumn("dq", greatest(lit(0L),
          floor((lit(1.0) - col("best")) * lit(1000000.0)).cast("long")))
      val tot = dq.agg(sum(col("dq")).as("tot"))
      val sel = dq.crossJoin(broadcast(tot))
        .filter(u32(r) <
          expr(s"(($oversample * dq) * 4294967296) div greatest(tot, 1)"))
        .select(col("pid").as("cand_id"), col("pvec").as("cvec"))
      cand = cand.unionByName(sel).localCheckpoint(true)
    }
    val votes = assignToNearestCandidate(pts, "pid", "pvec", cand)
      .groupBy(col("cand_id")).agg(count(lit(1)).as("weight"))
    votes.orderBy(col("weight").desc, col("cand_id")).limit(k)
      .withColumn("cid", row_number().over(
        graft.operators.Relational.tinyOrderedWindow(
          col("weight").desc, col("cand_id"))).cast("int"))
      .select(col("cid"), col("cand_id").as("seed_id"), col("weight"))
  }

  /** Seed centroids: the k smallest ids (whatever the id space), cid 1..k. */
  private def kmeansSeeds(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame =
    emb.orderBy(col(idCol)).limit(k)
      // k-row input — tinyOrderedWindow keeps WindowExec's corpus-scale
      // warning out of the logs
      .withColumn("cid",
        row_number().over(Relational.tinyOrderedWindow(col(idCol))).cast("int"))
      .select(col("cid"), col(vecCol).as("centroid"))

  /** Nearest-centroid assignment via the bounded TopKByScore partial
    * aggregation (k=1): map tasks reduce each vector's k candidate rows
    * to one before the exchange — no window sort over the N·k relation.
    * Returns (idCol, vecCol, cid, cos).
    */
  private def kmeansAssign(emb: DataFrame, idCol: String, vecCol: String,
                           cents: DataFrame): DataFrame = {
    val top1 = udaf(new graft.functions.TopKByScore(1))
    emb.crossJoin(broadcast(cents))
      .withColumn("cos", cosine(col(vecCol), col("centroid")))
      .filter(col("cos").isNotNull) // zero-norm vectors: no cosine
      .groupBy(col(idCol), col(vecCol))
      .agg(top1(col("cos"), col("cid").cast("long")).as("nns"))
      .select(col(idCol), col(vecCol),
        expr("nns[0]._2").cast("int").as("cid"), expr("nns[0]._1").as("cos"))
  }

  /** Per-cell centroids from an assignment: per-dimension exact LONG
    * sums of 1e-7-quantized coordinates (see [[kmeansAssignStep]] for
    * why quantized integer sums, not double means).
    *
    * `mean = false` (the default) keeps the SCALED SUM as the centroid —
    * fine wherever centroids are only ever arguments to the
    * scale-invariant cosine (assignment, routing, cell-local search).
    * `mean = true` divides back to the TRUE MEAN, (s/n)/1e7 — required
    * the moment centroids enter vector ARITHMETIC: residual encoding
    * subtracts the centroid from data vectors and adds it back at
    * scoring time ([[residuals]]/[[ivfAdcResidualKnn]]), where a
    * 1e7·count-scaled "centroid" would swamp the data term entirely.
    * Both divisions are single IEEE double ops in a fixed order, so the
    * mean is as cross-engine exact as the sum.
    */
  private def kmeansRecenter(assigned: DataFrame, vecCol: String,
                             mean: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    val sums = assigned.select(col("cid"), posexplode(col(vecCol)))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(floor(col("col").cast(DoubleType) * 1e7).cast("long")).as("s"),
        count(lit(1)).as("n"))
    val v = if (mean) (col("s").cast(DoubleType) / col("n")) / lit(1e7)
    else col("s").cast(DoubleType)
    sums.groupBy(col("cid"))
      .agg(collect_list(struct(col("pos"), v.as("v"))).as("xs"))
      .select(col("cid"),
        expr("transform(array_sort(xs), x -> CAST(x.v AS FLOAT))").as("centroid"))
  }

  /** L2 (Euclidean) nearest-centroid assignment — the residual
    * sub-quantizer's metric: a residual's information is mostly its
    * MAGNITUDE, which the cosine metric throws away (and near-zero
    * residuals get essentially random cosine cells). Score =
    * −‖v−c‖², decomposed (vv − 2·vc) + cc with fixed association so
    * both engines compute the identical double; ties cid asc via the
    * same bounded top-1 partial agg as [[kmeansAssign]]. The score
    * lands in the `cos` column so the PQ plumbing is metric-agnostic.
    */
  private def kmeansAssignL2(emb: DataFrame, idCol: String, vecCol: String,
                             cents: DataFrame): DataFrame = {
    val top1 = udaf(new graft.functions.TopKByScore(1))
    val negd = -((dot(col(vecCol), col(vecCol)) -
      lit(2.0) * dot(col(vecCol), col("centroid"))) +
      dot(col("centroid"), col("centroid")))
    emb.crossJoin(broadcast(cents))
      .withColumn("cos", negd)
      .groupBy(col(idCol), col(vecCol))
      .agg(top1(col("cos"), col("cid").cast("long")).as("nns"))
      .select(col(idCol), col(vecCol),
        expr("nns[0]._2").cast("int").as("cid"), expr("nns[0]._1").as("cos"))
  }

  /** L2 Lloyd training: Euclidean assignment + TRUE-MEAN recentering —
    * the textbook k-means, used where centroids are reconstruction
    * terms (residual codebooks) rather than cosine arguments.
    */
  def kmeansCentroidsL2(emb: DataFrame, idCol: String, vecCol: String,
                        k: Int, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    var cents = kmeansSeeds(emb, idCol, vecCol, k)
    for (_ <- 1 to rounds)
      cents = kmeansRecenter(kmeansAssignL2(emb, idCol, vecCol, cents), vecCol,
        mean = true).localCheckpoint(true)
    cents
  }

  /** TRUE-MEAN centroids of an EXISTING cell assignment — the scoring
    * geometry for the residual path: the shared scaled-sum index keeps
    * doing the routing (same cells — cosine is scale-invariant), while
    * vector arithmetic (x − c, c + r̂) uses these means.
    */
  def cellMeans(emb: DataFrame, idCol: String, vecCol: String,
                cells: DataFrame): DataFrame =
    kmeansRecenter(emb.join(cells, idCol), vecCol, mean = true)

  /** TRAIN the coarse quantizer: `rounds` deterministic Lloyd
    * refinements from the id-seeded start. Each round is one broadcast
    * assignment plus one narrow (cid, dim) sum; the k-row centroid
    * table is localCheckpointed per round so the plan doesn't grow with
    * the round count. A cell that loses all members simply drops out
    * (both engines agree). Returns the final (cid, centroid) table.
    */
  def kmeansCentroids(emb: DataFrame, idCol: String, vecCol: String,
                      k: Int, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds=$rounds must be >= 1")
    var cents = kmeansSeeds(emb, idCol, vecCol, k)
    for (_ <- 1 to rounds)
      cents = kmeansRecenter(kmeansAssign(emb, idCol, vecCol, cents), vecCol)
        .localCheckpoint(true)
    cents
  }

  /** Train-once IVF index: the trained centroid table plus the full
    * cell assignment, both eagerly materialized (`localCheckpoint`, so
    * CONSTRUCTION runs the Lloyd rounds as Spark jobs — callers building
    * plans without executing them still pay the training here). Within
    * one query's DAG the checkpoint dedups the train work; reuse ACROSS
    * queries is the caller's job — [[graft.operators.SimilarityQueries]]
    * caches the (cents, cells) pair per (session, corpus dir), the way a
    * real ANN index is built once and served many times. Centroids are
    * k rows; the assignment is one narrow (id, cid) relation with
    * exactly one row per id (the precondition [[ivfProbedKnn]] /
    * [[ivfAdcKnn]] rely on).
    */
  def trainedIndex(emb: DataFrame, idCol: String, vecCol: String,
                   k: Int, rounds: Int): (DataFrame, DataFrame) = {
    val cents = kmeansCentroids(emb, idCol, vecCol, k, rounds)
    val cells = kmeansAssign(emb, idCol, vecCol, cents)
      .select(col(idCol), col("cid")).localCheckpoint(true)
    (cents, cells)
  }

  /** The closed ANN loop in one call: train the quantizer
    * ([[kmeansCentroids]]), assign every vector to its trained cell,
    * then [[ivfKnn]] within those cells — index cells come from the
    * learned centroids, not a fixture label. The train side touches
    * k-row tables only; the search side is the partition-local IVF
    * join. (The q76 query pack composes the identical
    * `ivfKnn(emb ⋈ cells)` shape from its SHARED cached index instead
    * of calling this, so one training run serves many queries; this
    * one-call form is the standalone API.)
    */
  def ivfTrainedKnn(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int, rounds: Int, kNeighbors: Int): DataFrame = {
    val (_, cells) = trainedIndex(emb, idCol, vecCol, k, rounds)
    ivfKnn(emb.join(cells, idCol), idCol, vecCol, "cid", kNeighbors)
  }

  /** Incremental index maintenance: route NEW vectors onto an EXISTING
    * trained index without retraining — the daily operation of a
    * production ANN deployment (the corpus grows continuously; the
    * quantizer retrains on a schedule, not per arrival). Same
    * assignment kernel as training-time ([[kmeansCentroids]]'s
    * argmax-cosine, ties cid asc, zero-norm dropped), so appending
    * these rows to the index's `cells` preserves the one-row-per-id
    * precondition and new vectors are immediately searchable by
    * [[ivfProbedKnn]] / [[ivfAdcKnn]]. Broadcast of the k-row centroid
    * table + bounded top-1 partial agg — O(new rows), never O(index).
    * Returns (idCol, cid, cos).
    */
  def assignToCells(emb: DataFrame, idCol: String, vecCol: String,
                    cents: DataFrame): DataFrame =
    kmeansAssign(emb, idCol, vecCol, cents)
      .select(col(idCol), col("cid"), col("cos"))

  /** Query-side cell routing: each vector's top-`nprobe` trained cells
    * by centroid cosine — THE recall knob every IVF deployment turns
    * first. nprobe=1 is the plain nearest-cell assignment; higher p
    * unions more cells into the candidate set, recall climbs toward
    * exact while cost grows only linearly in p (at nprobe = #cells the
    * search degenerates to exact). k-row centroid broadcast + the
    * bounded [[graft.functions.TopKByScore]] partial agg — map tasks
    * reduce each query's k centroid candidates to p before the
    * exchange, no window over the N·k relation. Returns (idCol, cid),
    * one row per probed cell. Deterministic: ties broken by cid asc,
    * matching the assignment's own tie-break, so probe #1 IS the
    * assigned cell. Zero-norm vectors have no cosine → no probes.
    */
  def probedCells(emb: DataFrame, idCol: String, vecCol: String,
                  cents: DataFrame, nprobe: Int): DataFrame = {
    require(nprobe >= 1, s"nprobe=$nprobe must be >= 1")
    val topp = udaf(new graft.functions.TopKByScore(nprobe))
    emb.crossJoin(broadcast(cents))
      .withColumn("cos", cosine(col(vecCol), col("centroid")))
      .filter(col("cos").isNotNull)
      .groupBy(col(idCol))
      .agg(topp(col("cos"), col("cid").cast("long")).as("pc"))
      .select(col(idCol), explode(col("pc")).as("p"))
      .select(col(idCol), col("p._2").cast("int").as("cid"))
  }

  /** IVF search with multi-cell probing: exact cosine against the
    * members of each query's top-`nprobe` cells ([[probedCells]]).
    * PRECONDITION: `cells` has exactly ONE row per id (what
    * [[trainedIndex]] returns) — each candidate then lives in exactly
    * one cell, the per-cell searches union without any dedup, and the
    * global top-k falls out of one bounded partial aggregation. A
    * multi-row assignment would duplicate candidate pairs and inflate
    * ranks. The join shuffles on the cell id only — each cell's work is
    * independent, so the shape parallelizes across cells at 100 TB
    * exactly like [[ivfKnn]], just with p× the probe-side rows.
    */
  def ivfProbedKnn(emb: DataFrame, idCol: String, vecCol: String,
                   cents: DataFrame, cells: DataFrame,
                   nprobe: Int, kNeighbors: Int): DataFrame = {
    val probes = probedCells(emb, idCol, vecCol, cents, nprobe)
    val a = emb.join(probes, idCol).select(col("cid"), col(idCol).as("vec_id"),
      col(vecCol).as("va"), norm(col(vecCol)).as("na"))
    val b = emb.join(cells, idCol).select(col("cid"), col(idCol).as("nn_id"),
      col(vecCol).as("vb"), norm(col(vecCol)).as("nb"))
    val topk = udaf(new graft.functions.TopKByScore(kNeighbors))
    a.join(b, "cid").filter(col("vec_id") =!= col("nn_id"))
      .withColumn("cos", safeCos(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cos").isNotNull)
      .groupBy(col("vec_id"))
      .agg(topk(col("cos"), col("nn_id")).as("nns"))
      .select(col("vec_id"), posexplode(col("nns")))
      .select(col("vec_id"), col("col._2").as("nn_id"),
        col("col._1").as("cos"), (col("pos") + 1).cast("int").as("rn"))
  }

  /** Product-quantization encoder: split each vector into `m` equal
    * subspaces and train an INDEPENDENT deterministic quantizer
    * ([[kmeansCentroids]]) per subspace; each vector compresses to its
    * m per-subspace code ids — m·log2(k) bits instead of dim·32
    * (64-dim floats at m=4, k=8: 256 → 12 bits, ~21×). The product
    * structure is why PQ beats one coarse quantizer at equal bits:
    * k^m distinct reconstructions from m·k stored centroids. Returns
    * (idCol, code0..codeM-1, cos0..cosM-1) — codes for the index,
    * assignment cosines as the per-subspace quantization-quality
    * signal. Scale shape: per subspace the training/assignment work is
    * the [[kmeansAssignStep]] broadcast pattern; the m assignments
    * equi-join back on the id, and at 100 TB each is a narrow
    * (id, int, double) relation. (The q97 query pack calls [[pqCodes]]
    * on its SHARED cached model instead of this train-and-encode
    * one-call form.)
    */
  def pqEncode(emb: DataFrame, idCol: String, vecCol: String,
               dim: Int, m: Int, k: Int, rounds: Int): DataFrame =
    pqCodes(pqTrain(emb, idCol, vecCol, dim, m, k, rounds), idCol)

  /** The code relation of a trained [[PqModel]]:
    * (idCol, code0..codeM-1, cos0..cosM-1) — m narrow equi-joins on the
    * id, each side already materialized by [[pqTrain]].
    */
  def pqCodes(pq: PqModel, idCol: String): DataFrame =
    pq.parts.map(_._1).reduce(_.join(_, Seq(idCol)))

  /** SQ8 scalar quantization (the FAISS `SQ8` codec — one byte per
    * dimension, 4× smaller than float32): per-dimension corpus min/max
    * learned in one explode + 64-row agg, folded to a ONE-ROW array
    * relation and broadcast; each vector then quantizes to
    * code_i = clamp(floor((x_i − mn_i) / (mx_i − mn_i) · 256), 0, 255)
    * and reconstructs at the cell midpoint
    * x̂_i = mn_i + (code_i + 0.5) · (mx_i − mn_i) / 256, cast to float.
    * Zero-variance dims code as 0 and reconstruct to the constant.
    * Returns (idCol, codes array<int>, recon array<float>) — a pure
    * projection against a 1-row broadcast, scan-speed at any corpus
    * size; serving is [[bruteForceKnn]] (or any ANN kernel) over
    * `recon`, trading exactly the quantization error SQ8 trades.
    * All arithmetic is IEEE-double with fixed association, so codes
    * AND reconstructions are bit-identical cross-engine.
    */
  def sq8Quantize(emb: DataFrame, idCol: String, vecCol: String,
                  dim: Int): DataFrame =
    sq8QuantizeWith(emb, idCol, vecCol, dim, sq8Stats(emb, vecCol))

  /** The trained SQ8 model: a ONE-ROW (mns, mxs) relation of per-dim
    * corpus min/max — what [[saveSq8Stats]] persists so a serving tier
    * reloads the codec instead of rescanning the corpus per session.
    */
  def sq8Stats(emb: DataFrame, vecCol: String): DataFrame =
    emb.select(posexplode(col(vecCol)).as(Seq("p", "x")))
      .groupBy(col("p"))
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .agg(
        transform(array_sort(collect_list(struct(col("p"), col("mn")))),
          z => z.getField("mn")).as("mns"),
        transform(array_sort(collect_list(struct(col("p"), col("mx")))),
          z => z.getField("mx")).as("mxs"))

  /** [[sq8Quantize]] against an EXISTING stats model (in-session or
    * reloaded): pure projection over the 1-row broadcast, identical
    * arithmetic either way.
    */
  def sq8QuantizeWith(emb: DataFrame, idCol: String, vecCol: String,
                      dim: Int, statsRow: DataFrame): DataFrame = {
    def mn(i: Column) = element_at(col("mns"), i)
    def mx(i: Column) = element_at(col("mxs"), i)
    def code(i: Column) = {
      val x = element_at(col(vecCol), i).cast("double")
      when(mx(i) > mn(i),
        least(greatest(floor((x - mn(i)) / (mx(i) - mn(i)) * lit(256.0)),
          lit(0.0)), lit(255.0))).otherwise(lit(0.0)).cast("int")
    }
    emb.crossJoin(broadcast(statsRow))
      .select(col(idCol),
        transform(sequence(lit(1), lit(dim)), i => code(i)).as("codes"),
        transform(sequence(lit(1), lit(dim)), i =>
          when(mx(i) > mn(i),
            mn(i) + (code(i).cast("double") + lit(0.5)) * (mx(i) - mn(i)) / lit(256.0))
            .otherwise(mn(i)).cast("float")).as("recon"))
  }

  /** SQ8-compressed IVF serving: the scalar-quantized twin of the
    * [[ivfAdcKnn]] routing — queries probe their top-`nprobe` trained
    * cells ([[probedCells]], full-precision routing), and candidates
    * are the probed cells' members scored from their SQ8
    * reconstructions ([[sq8Quantize]]) with the ASYMMETRIC distance
    * (full-precision query · reconstructed candidate — the FAISS
    * convention: quantization error is paid once, on the stored side
    * only, which is why asymmetric beats recon-vs-recon at equal
    * bits). The candidate join shuffles on the cell id alone, so each
    * query touches nprobe/k_cells of the corpus and every cell's
    * search is independent — the same 100 TB shape as [[ivfProbedKnn]]
    * with the candidate side 4× smaller in memory, never the flat
    * quadratic scan. PRECONDITION (as [[ivfProbedKnn]]): `cells` has
    * one row per id. Returns (vec_id, nn_id, cos, rn).
    */
  def sq8IvfKnn(emb: DataFrame, idCol: String, vecCol: String,
                cents: DataFrame, cells: DataFrame, dim: Int,
                nprobe: Int, kNeighbors: Int,
                stats: Option[DataFrame] = None): DataFrame = {
    import graft.functions.VectorFunctions.{dot, norm}
    val recon = sq8QuantizeWith(emb, idCol, vecCol, dim,
      stats.getOrElse(sq8Stats(emb, vecCol)))
      .select(col(idCol), col("recon"))
    val probes = probedCells(emb, idCol, vecCol, cents, nprobe)
    val a = emb.join(probes, idCol).select(col("cid"), col(idCol).as("vec_id"),
      col(vecCol).as("va"), norm(col(vecCol)).as("na"))
    val b = recon.join(cells, idCol).select(col("cid"), col(idCol).as("nn_id"),
      col("recon").as("vb"), norm(col("recon")).as("nb"))
    val topk = udaf(new graft.functions.TopKByScore(kNeighbors))
    a.join(b, "cid").filter(col("vec_id") =!= col("nn_id"))
      .withColumn("cos", safeCos(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cos").isNotNull)
      .groupBy(col("vec_id"))
      .agg(topk(col("cos"), col("nn_id")).as("nns"))
      .select(col("vec_id"), posexplode(col("nns")))
      .select(col("vec_id"), col("col._2").as("nn_id"),
        col("col._1").as("cos"), (col("pos") + 1).cast("int").as("rn"))
  }

  /** A trained PQ model: per-subspace code relations
    * (idCol, code_i, cos_i) plus the COLLECTED m·k-row codebooks
    * (bounded by the algorithm constants — the same localize pattern
    * as the hierarchy dims). Train once, serve many: encode, flat ADC
    * and IVFADC all reuse the same model, the way a production index
    * separates build time from query time. Code relations are eagerly
    * materialized so reuse doesn't re-run the Lloyd rounds.
    */
  final case class PqModel(dim: Int, m: Int, k: Int,
                           parts: Seq[(DataFrame, Map[Int, Array[Float]])]) {
    def sub: Int = dim / m
  }

  /** Train the PQ codebooks: split into m subspaces, one independent
    * deterministic quantizer each ([[kmeansCentroids]]); see
    * [[pqEncode]] for why the product structure wins at equal bits.
    * EAGER: construction runs the m Lloyd trainings as Spark jobs (the
    * code relations are localCheckpointed, the codebooks collected) —
    * building a plan over the model is free afterwards, but the build
    * itself is where the training cost lands. Train once, serve many:
    * [[graft.operators.SimilarityQueries]] caches the model per
    * (session, corpus dir) so encode / flat ADC / IVFADC share one run.
    */
  def pqTrain(emb: DataFrame, idCol: String, vecCol: String,
              dim: Int, m: Int, k: Int, rounds: Int): PqModel = {
    require(dim % m == 0, s"dim=$dim must split evenly into m=$m subspaces")
    val sub = dim / m
    val parts = (0 until m).map { i =>
      val sliced = emb.select(col(idCol), slice(col(vecCol), i * sub + 1, sub).as(vecCol))
      val cents = kmeansCentroids(sliced, idCol, vecCol, k, rounds)
      val codes = kmeansAssign(sliced, idCol, vecCol, cents)
        .select(col(idCol), col("cid").as(s"code$i"), col("cos").as(s"cos$i"))
        .localCheckpoint(true)
      val byCid = cents.collect()
        .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
      (codes, byCid)
    }
    PqModel(dim, m, k, parts)
  }

  // cid slots a Lloyd round emptied stay null — no code references them
  private def cidSlots[T](k: Int, byCid: Map[Int, Array[Float]])(f: Array[Float] => T): Seq[Option[T]] =
    (1 to k).map(c => byCid.get(c).map(f))

  /** Compressed index relation: (idCol, code_0..m-1, cn2) — the codes
    * plus the reconstruction norm², a per-INDEX-row quantity folded in
    * once via driver-built k-slot constants per subspace.
    */
  private def pqDb(pq: PqModel, idCol: String): DataFrame =
    pq.parts.zipWithIndex.map { case ((codes, _), i) =>
      codes.select(col(idCol), col(s"code$i"))
    }.reduce(_.join(_, Seq(idCol)))
      .withColumn("cn2", (0 until pq.m).map { i =>
        val cn2Arr = cidSlots(pq.k, pq.parts(i)._2)(c => dotf(c, c))
        element_at(typedLit(cn2Arr), col(s"code$i"))
      }.reduce(_ + _))

  /** Per-query ADC lookup tables: (vec_id, qn, lut_0..m-1) where
    * lut_i[c] = dot(q_i, centroid_c) — m·k small dots per QUERY row,
    * built in one projection before any candidate join, so every
    * candidate costs m table lookups, not m sub-dim dot products.
    */
  /** Per-query LUT relation (vec_id, qn, lut0..m−1) against `pq`'s
    * codebooks; `keepVec` additionally carries the full vector as `qv`
    * (the residual path needs one dot(q, centroid) per probed cell).
    * One home for the load-bearing slot layout (slot order, NULL for
    * emptied cids) — the flat and residual ADC paths must never
    * desynchronize on it.
    */
  private def pqLutQueries(emb: DataFrame, idCol: String, vecCol: String,
                           pq: PqModel, keepVec: Boolean = false): DataFrame = {
    val sub = pq.sub
    val qv = if (keepVec) Seq(col(vecCol).as("qv")) else Seq.empty
    val qvOut = if (keepVec) Seq(col("qv")) else Seq.empty
    emb.select(col(idCol).as("vec_id") +: (qv ++
      Seq(norm(col(vecCol)).as("qn")) ++
      (0 until pq.m).map(i => slice(col(vecCol), i * sub + 1, sub).as(s"q$i"))): _*)
      .select(col("vec_id") +: (qvOut ++ Seq(col("qn")) ++ (0 until pq.m).map { i =>
        val slots = cidSlots(pq.k, pq.parts(i)._2)(identity)
        array(slots.map {
          case Some(c) => dot(col(s"q$i"), typedLit(c))
          case None => lit(null).cast("double")
        }: _*).as(s"lut$i")
      }): _*)
  }

  /** ADC score: fixed-order partial sums ((d0+d1)+d2)+d3 of the LUT
    * entries — same association in the oracle, so the double is
    * bit-identical across engines. Same ANSI-safe division guard as
    * [[safeCos]] (a zero-norm query or reconstruction has no cosine).
    */
  private def pqAdcScore(pq: PqModel): org.apache.spark.sql.Column = {
    val num = (0 until pq.m).map(i => element_at(col(s"lut$i"), col(s"code$i"))).reduce(_ + _)
    val denom = col("qn") * sqrt(col("cn2"))
    when(denom =!= 0, num / denom)
  }

  /** Blocked exact KNN: the [[bruteForceKnn]] insertion-buffer kernel
    * composed per LSH bucket, with NO driver collect — buckets shuffle
    * once on the bucket key (`groupByKey`) and each group runs the exact
    * quadratic kernel over only its own members. The broadcast/collect
    * side of the naive baseline disappears; memory per task is one
    * bucket, so the exact kernel never sees an unbounded relation. This
    * is the 100 TB shape for exact-within-block search (recall bounded
    * by the blocking, like IVF).
    *
    * Same ordering contract as [[bruteForceKnn]]: (cos desc, nn_id asc),
    * zero-norm vectors dropped, rn 1..k.
    */
  def blockedKnn(emb: DataFrame, idCol: String, vecCol: String,
                 bits: Int, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    val spark = emb.sparkSession
    import spark.implicits._
    buckets(emb, idCol, vecCol, bits)
      .select(col("bucket"), col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .as[(String, Long, Array[Float])]
      .groupByKey(_._1)
      .flatMapGroups { (bucket, it) =>
        val rows = it.map { case (_, id, v) => (id, v, math.sqrt(dotf(v, v))) }.toArray
        rows.iterator.flatMap { case (id, v, na) =>
          val top = new Array[(Double, Long)](k)
          var used = 0
          rows.foreach { case (nid, nv, nb) =>
            if (nid != id && na != 0.0 && nb != 0.0) {
              val c = dotf(v, nv) / (na * nb)
              if (used < k || c > top(used - 1)._1 ||
                  (c == top(used - 1)._1 && nid < top(used - 1)._2)) {
                var j = math.min(used, k - 1)
                while (j > 0 && (top(j - 1)._1 < c ||
                       (top(j - 1)._1 == c && top(j - 1)._2 > nid))) {
                  top(j) = top(j - 1); j -= 1
                }
                top(j) = (c, nid)
                if (used < k) used += 1
              }
            }
          }
          (0 until used).map(r => (bucket, id, top(r)._2, top(r)._1, r + 1))
        }
      }.toDF("bucket", "vec_id", "nn_id", "cos", "rn")
  }

  /** PQ asymmetric-distance (ADC) search, flat scan: queries score
    * against the COMPRESSED index — each database vector is represented
    * only by its m per-subspace codes, reconstructed as the
    * concatenation of its m assigned centroids. The score is
    * cosine(query, reconstruction), computed the way a real ADC kernel
    * computes it: each query first builds an m×k LOOKUP TABLE of
    * per-subspace dots dot(q_i, centroid_c) (m·k small dots per QUERY),
    * and every candidate then costs m table lookups summed in fixed
    * subspace order — not m sub-dim dot products per PAIR. The LUT
    * entries are the identical doubles the per-pair form would compute,
    * so results are bit-stable and the oracle is unchanged. Returns
    * (vec_id, nn_id, adc, rn) — top kNeighbors per query by
    * (adc desc, nn_id asc), self excluded, rank via the bounded
    * [[graft.functions.TopKByScore]] partial agg (no window sort over
    * the candidate relation).
    *
    * FLAT SCAN = the documented QUADRATIC BASELINE — every query scores
    * every index row, O(queries × index) when the query side is the
    * corpus itself; [[ivfAdcKnn]] is the 100 TB serving path (same LUT
    * kernel, candidates restricted to probed IVF cells).
    */
  def pqAdcKnnFlat(emb: DataFrame, idCol: String, vecCol: String,
                   pq: PqModel, kNeighbors: Int): DataFrame = {
    require(kNeighbors >= 1, s"kNeighbors=$kNeighbors must be >= 1")
    val db = pqDb(pq, idCol).withColumnRenamed(idCol, "nn_id")
    val topk = udaf(new graft.functions.TopKByScore(kNeighbors))
    pqLutQueries(emb, idCol, vecCol, pq)
      .join(broadcast(db), col("vec_id") =!= col("nn_id"))
      .withColumn("adc", pqAdcScore(pq))
      .filter(col("adc").isNotNull) // zero-norm query or reconstruction
      .groupBy(col("vec_id"))
      .agg(topk(col("adc"), col("nn_id")).as("nns"))
      .select(col("vec_id"), posexplode(col("nns")))
      .select(col("vec_id"), col("col._2").as("nn_id"),
        col("col._1").as("adc"), (col("pos") + 1).cast("int").as("rn"))
  }

  /** IVFADC — the composed large-scale ANN serving shape (Jégou et al.,
    * "Product Quantization for Nearest Neighbor Search", TPAMI 2011):
    * the coarse quantizer ROUTES (each query's top-`nprobe` trained
    * cells, [[probedCells]]), PQ codes SCORE (the same per-query LUT
    * kernel as [[pqAdcKnnFlat]]). The candidate set shrinks from the
    * whole index to the probed cells' members, and the join becomes a
    * cid equi-join — shuffle on the cell key, per-cell work
    * independent, no unbounded broadcast of the code relation.
    * PRECONDITION (as in [[ivfProbedKnn]]): `cells` has exactly one row
    * per id — each candidate then appears in exactly one probed cell and
    * no dedup is needed; recall is the coarse quantizer's, tunable by
    * nprobe and measured by the q119 harness. Returns
    * (vec_id, nn_id, adc, rn).
    */
  def ivfAdcKnn(emb: DataFrame, idCol: String, vecCol: String, pq: PqModel,
                cents: DataFrame, cells: DataFrame,
                nprobe: Int, kNeighbors: Int): DataFrame = {
    require(kNeighbors >= 1, s"kNeighbors=$kNeighbors must be >= 1")
    val db = pqDb(pq, idCol).join(cells, idCol).withColumnRenamed(idCol, "nn_id")
    val probes = probedCells(emb, idCol, vecCol, cents, nprobe)
      .withColumnRenamed(idCol, "vec_id")
    val topk = udaf(new graft.functions.TopKByScore(kNeighbors))
    pqLutQueries(emb, idCol, vecCol, pq)
      .join(probes, "vec_id")
      .join(db, Seq("cid"))
      .filter(col("vec_id") =!= col("nn_id"))
      .withColumn("adc", pqAdcScore(pq))
      .filter(col("adc").isNotNull) // zero-norm query or reconstruction
      .groupBy(col("vec_id"))
      .agg(topk(col("adc"), col("nn_id")).as("nns"))
      .select(col("vec_id"), posexplode(col("nns")))
      .select(col("vec_id"), col("col._2").as("nn_id"),
        col("col._1").as("adc"), (col("pos") + 1).cast("int").as("rn"))
  }

  /** Residual relation of a trained coarse index: per id,
    * r = x − mean(cell(x)), elementwise FLOAT subtraction (exact
    * across engines: the difference of two binary32 values is exactly
    * representable in binary64, so double-subtract-then-round and
    * native float-subtract round the same exact value once). The
    * centroids here MUST be true means ([[cellMeans]]), not the scaled
    * sums the routing index carries — vector arithmetic is not
    * scale-invariant. The k-row centroid table broadcasts; ids without
    * a cell (zero-norm vectors) drop, matching every other path's
    * no-cosine contract.
    */
  def residuals(emb: DataFrame, idCol: String, vecCol: String,
                meanCents: DataFrame, cells: DataFrame): DataFrame =
    emb.join(cells, idCol)
      .join(broadcast(meanCents.select(col("cid"), col("centroid"))), "cid")
      .select(col(idCol), zip_with(col(vecCol), col("centroid"),
        (a, b) => a - b).as(vecCol))

  /** Train PQ codebooks on RESIDUALS x − mean(cell(x)) — the accuracy
    * half of the Jégou et al. IVFADC construction: residuals have far
    * less variance than raw vectors, so the same m·log2(k) bits
    * quantize them with much smaller reconstruction error, and
    * [[ivfAdcResidualKnn]]'s scores track the true cosine more closely
    * than raw-vector PQ at identical bits (measured by the q123 recall
    * harness). The sub-quantizers are L2 Lloyd ([[kmeansCentroidsL2]]):
    * Euclidean assignment (residual information is magnitude, not
    * direction) and TRUE-MEAN recentering (their centroids are
    * reconstruction terms, not just cosine arguments). Same eager
    * train-once contract as [[pqTrain]].
    */
  def pqTrainResidual(emb: DataFrame, idCol: String, vecCol: String,
                      meanCents: DataFrame, cells: DataFrame,
                      dim: Int, m: Int, k: Int, rounds: Int): PqModel = {
    require(dim % m == 0, s"dim=$dim must split evenly into m=$m subspaces")
    val resid = residuals(emb, idCol, vecCol, meanCents, cells)
    val sub = dim / m
    val parts = (0 until m).map { i =>
      val sliced = resid.select(col(idCol), slice(col(vecCol), i * sub + 1, sub).as(vecCol))
      val cents = kmeansCentroidsL2(sliced, idCol, vecCol, k, rounds)
      val codes = kmeansAssignL2(sliced, idCol, vecCol, cents)
        .select(col(idCol), col("cid").as(s"code$i"), col("cos").as(s"cos$i"))
        .localCheckpoint(true)
      val byCid = cents.collect()
        .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
      (codes, byCid)
    }
    PqModel(dim, m, k, parts)
  }

  /** IVFADC with residual encoding (true IVF-PQ): candidates are scored
    * as cosine(q, centroid(cell) + recon_residual) — the reconstruction
    * is the cell centroid PLUS the PQ-decoded residual, a strictly
    * better approximation of x than raw-vector PQ at the same bits.
    * The score decomposes into the standard residual-ADC lookup form,
    * so the per-candidate cost stays m LUT reads plus three bounded
    * table lookups:
    *
    *   num  = dot(q, c) + Σ_i LUT_i[code_i]          (LUT_i from q's slices
    *                                                  vs residual codebooks)
    *   ‖c + r̂‖² = ‖c‖² + 2·Σ_i ccdot_i[cid][code_i] + Σ_i ‖rc_i[code_i]‖²
    *   adc  = num / (‖q‖ · sqrt(‖c + r̂‖²))
    *
    * where ccdot_i[cid][code] = dot(mean-centroid slice i, residual
    * codebook centroid) — a (cells × m × k)-entry constant table built
    * driver-side from the already-collected codebooks (bounded by the
    * algorithm constants, like the LUTs). dot(q, c) is computed once per
    * (query, probed cell), not per candidate. Routing runs on the SHARED
    * scaled-sum index (`cents` — same cells, cosine is scale-invariant);
    * every arithmetic term uses the true means (`meanCents`,
    * [[cellMeans]]). Same join shape, preconditions and determinism
    * contract as [[ivfAdcKnn]]; returns (vec_id, nn_id, adc, rn).
    */
  def ivfAdcResidualKnn(emb: DataFrame, idCol: String, vecCol: String,
                        pqr: PqModel, cents: DataFrame, meanCents: DataFrame,
                        cells: DataFrame,
                        nprobe: Int, kNeighbors: Int): DataFrame = {
    require(kNeighbors >= 1, s"kNeighbors=$kNeighbors must be >= 1")
    val sub = pqr.sub
    // driver-side constant tables from the k-row MEAN centroid relation
    // (scoring arithmetic needs true means; `cents` only routes)
    val centArr: Map[Int, Array[Float]] = meanCents.select(col("cid"), col("centroid"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
    val maxCid = centArr.keys.max
    val cnorm2Slots: Seq[Option[Double]] =
      (1 to maxCid).map(c => centArr.get(c).map(v => dotf(v, v)))
    def ccdot2d(i: Int): Seq[Seq[Option[Double]]] =
      (1 to maxCid).map { c =>
        centArr.get(c) match {
          case Some(cv) =>
            val cs = cv.slice(i * sub, (i + 1) * sub)
            cidSlots(pqr.k, pqr.parts(i)._2)(rc => dotf(cs, rc))
          case None => Seq.fill(pqr.k)(Option.empty[Double])
        }
      }
    // query side: per-subspace LUTs vs the RESIDUAL codebooks, plus the
    // full vector (needed once per probed cell for dot(q, c)) — shared
    // with the flat path via pqLutQueries so the slot layout has one home
    val qrel = pqLutQueries(emb, idCol, vecCol, pqr, keepVec = true)
    val probes = probedCells(emb, idCol, vecCol, cents, nprobe)
      .withColumnRenamed(idCol, "vec_id")
    val qp = qrel.join(probes, "vec_id")
      .join(broadcast(meanCents.select(col("cid"), col("centroid"))), "cid")
      .withColumn("qc", dot(col("qv"), col("centroid")))
      .drop("qv", "centroid")
    // index side: residual codes + the FULL reconstruction norm²
    // ‖c + r̂‖² = (‖c‖² + 2·Σ ccdot_i[cid][code_i]) + Σ‖rc_i‖². The
    // norm depends only on (cid, codes) — i.e. on the INDEX ROW — so
    // it is projected here, once per database vector, never per
    // (query, candidate) pair (the precomputed-table half of Jégou
    // et al.'s ADC). Measured: folding it into the per-pair score
    // instead put the nested constant-table lookups on the
    // #candidates-row path and cost ~10× the whole serving query.
    // Same ops, same association as the per-pair form, so scores stay
    // bit-identical to the oracle's.
    val crossterm = (0 until pqr.m).map(i =>
      element_at(element_at(typedLit(ccdot2d(i)), col("cid")), col(s"code$i")))
      .reduce(_ + _)
    val db = pqDb(pqr, idCol).join(cells, idCol).withColumnRenamed(idCol, "nn_id")
      .withColumn("cn2p", element_at(typedLit(cnorm2Slots), col("cid")) +
        lit(2.0) * crossterm + col("cn2"))
    val num = (col("qc") +: (0 until pqr.m).map(i =>
      element_at(col(s"lut$i"), col(s"code$i")))).reduce(_ + _)
    val den = col("qn") * sqrt(col("cn2p"))
    val topk = udaf(new graft.functions.TopKByScore(kNeighbors))
    qp.join(db, Seq("cid"))
      .filter(col("vec_id") =!= col("nn_id"))
      .withColumn("adc", when(den =!= 0, num / den))
      .filter(col("adc").isNotNull) // zero-norm query or reconstruction
      .groupBy(col("vec_id"))
      .agg(topk(col("adc"), col("nn_id")).as("nns"))
      .select(col("vec_id"), posexplode(col("nns")))
      .select(col("vec_id"), col("col._2").as("nn_id"),
        col("col._1").as("adc"), (col("pos") + 1).cast("int").as("rn"))
  }

  /** Two-stage serving: ADC shortlist → exact re-rank — the standard
    * production recipe on top of [[ivfAdcResidualKnn]]. Stage 1 takes
    * the top-`shortlist` candidates per query under compressed
    * (residual-ADC) scoring, probed cells only; stage 2 rescores ONLY
    * those candidates with the TRUE cosine — two id equi-joins back to
    * the vector relation, shortlist rows per query, never |cell| — and
    * keeps the exact top-k. PQ error therefore never reaches the final
    * ranking; what remains is pure routing error (the nprobe knob).
    *
    * Monotone by construction at equal (nprobe, k): the ADC top-k is a
    * prefix of the shortlist ranking, and a true top-k member in the
    * shortlist can be outranked by at most k−1 corpus vectors — so
    * every exact-top-k hit the ADC answer contains survives re-ranking
    * (asserted by VectorSpec; measured with the q123 harness as q126).
    * Returns (vec_id, nn_id, cos, rn), ties nn_id asc.
    */
  def ivfAdcRerankKnn(emb: DataFrame, idCol: String, vecCol: String,
                      pqr: PqModel, cents: DataFrame, meanCents: DataFrame,
                      cells: DataFrame,
                      nprobe: Int, shortlist: Int, kNeighbors: Int): DataFrame = {
    require(shortlist >= kNeighbors,
      s"shortlist=$shortlist must cover kNeighbors=$kNeighbors")
    val cand = ivfAdcResidualKnn(emb, idCol, vecCol, pqr, cents, meanCents,
      cells, nprobe, shortlist).select(col("vec_id"), col("nn_id"))
    val qv = emb.select(col(idCol).as("vec_id"), col(vecCol).as("__qv"))
    val cv = emb.select(col(idCol).as("nn_id"), col(vecCol).as("__cv"))
    val topk = udaf(new graft.functions.TopKByScore(kNeighbors))
    cand.join(qv, "vec_id").join(cv, "nn_id")
      .withColumn("cos", graft.functions.VectorFunctions.cosine(col("__qv"), col("__cv")))
      .filter(col("cos").isNotNull) // zero-norm endpoints drop, as everywhere
      .groupBy(col("vec_id"))
      .agg(topk(col("cos"), col("nn_id")).as("nns"))
      .select(col("vec_id"), posexplode(col("nns")))
      .select(col("vec_id"), col("col._2").as("nn_id"),
        col("col._1").as("cos"), (col("pos") + 1).cast("int").as("rn"))
  }

  /** Deterministic Johnson–Lindenstrauss random projection: project
    * each vector onto `outDim` ±1 sign rows derived from md5 (the
    * Achlioptas construction with a reproducible hash in place of
    * rand()) — the dimension-reduction pass an embedding pipeline runs
    * before cheaper ANN / storage. Engine-exact by construction: the
    * sign matrix is a pure function of (i, j) both engines recompute
    * identically, and every sum folds in fixed ascending order, so the
    * projected doubles are bit-identical. Emits the JL quality audit
    * per vector: `ratio_q6` = quantized ‖y‖²/(outDim·‖x‖²) (expected
    * 1 — THE distortion number JL bounds), NULL for zero vectors, and
    * `proj_acc`, an integer checksum of the projected coords pinning
    * the full projection through the hash gate. Scan-speed, no
    * shuffle; the sign matrix is outDim·dim literals baked into the
    * codegen'd expression.
    */
  private def foldSum(arr: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(arr, lit(0.0), (acc, v) => acc + v)

  /** The projection itself: (vec_id, proj array<double>), every output
    * coordinate a fixed-ascending-order fold — see
    * [[jlProjectionAudit]] for the construction and parity contract.
    * Downstream search runs on `proj` exactly as it would on the raw
    * vectors, at outDim/dim of the per-pair cost.
    */
  def jlProject(emb: DataFrame, idCol: String, vecCol: String,
                dim: Int, outDim: Int): DataFrame = {
    val signs: Array[Array[Double]] =
      Array.tabulate(outDim, dim)((j, i) => jlSign(i + 1, j))
    val x = col(vecCol)
    val proj = array((0 until outDim).map { j =>
      foldSum(zip_with(x, lit(signs(j)),
        (xi, s) => xi.cast("double") * s))
    }: _*)
    emb.select(col(idCol).as("vec_id"), x.as(vecCol))
      .withColumn("proj", proj)
      .select(col("vec_id"), col(vecCol), col("proj"))
  }

  def jlProjectionAudit(emb: DataFrame, idCol: String, vecCol: String,
                       dim: Int, outDim: Int): DataFrame = {
    val nx2 = foldSum(transform(col(vecCol),
      xi => xi.cast("double") * xi.cast("double")))
    val ny2 = foldSum(transform(col("proj"), y => y * y))
    val acc = aggregate(transform(col("proj"),
      y => floor(y * lit(1e6)).cast("long")), lit(0L), (a, v) => a + v)
    jlProject(emb, idCol, vecCol, dim, outDim)
      .withColumn("__nx2", nx2)
      .select(col("vec_id"),
        when(col("__nx2") =!= 0.0,
          floor(lit(1e6) * ny2 / (lit(outDim).cast("double") * col("__nx2")))
            .cast("long")).as("ratio_q6"),
        acc.as("proj_acc"))
  }

  /** The (i, j) sign: +1 when the first md5 nibble of "rp-i-j" is odd
    * under the hexNibble value map ('0'→0, '1'→1 … 'f'→15) — exactly
    * `strpos('123456789abcdef', substr(md5(...), 1, 1)) % 2` on the
    * oracle side.
    */
  private def jlSign(i: Int, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"rp-$i-$j".getBytes("UTF-8"))
      .take(1).map(b => f"${b & 0xff}%02x").mkString
    val nibble = "123456789abcdef".indexOf(hex.charAt(0)) + 1
    if (nibble % 2 == 1) 1.0 else -1.0
  }

  /** Persist a trained coarse index through the versioned warehouse —
    * the durability story the in-session model caches deliberately
    * don't have (localCheckpointed frames die with an executor; caches
    * die with the session). An index BUILD becomes an immutable
    * snapshot pair — `<prefix>_cells` (vec_id → cid) and
    * `<prefix>_centroids` (cid → centroid) — at one shared version:
    * cells commit first, centroids last, so the centroid snapshot is
    * the commit point readers resolve. Re-training writes the next
    * version; serving a PREVIOUS index build is `loadIndex(v)` — the
    * same time-travel contract as any warehouse table (q114), which is
    * exactly what an index rollback after a bad rebuild needs.
    * Single-writer per prefix, like all snapshot writes.
    */
  def saveIndex(wh: graft.sources.Warehouse, layer: String, prefix: String,
                cents: DataFrame, cells: DataFrame): Int = {
    val vCells = wh.writeVersion(cells, layer, s"${prefix}_cells")
    val vCents = wh.writeVersion(cents, layer, s"${prefix}_centroids")
    require(vCents == vCells,
      s"index snapshots diverged (centroids v$vCents, cells v$vCells): " +
        "write this prefix through saveIndex only")
    vCents
  }

  /** Reload a persisted index build — latest by default, or any
    * retained version for rollback/serving comparisons. Returns
    * (centroids, cells, version); the pair is immutable, so serving
    * plans built on it are stable across executor loss and restarts.
    */
  def loadIndex(wh: graft.sources.Warehouse, layer: String, prefix: String,
                version: Option[Int] = None): (DataFrame, DataFrame, Int) = {
    val v = version.orElse(wh.latestVersion(layer, s"${prefix}_centroids"))
      .getOrElse(sys.error(s"no committed index at $layer.$prefix"))
    (wh.readVersion(layer, s"${prefix}_centroids", v),
      wh.readVersion(layer, s"${prefix}_cells", v), v)
  }

  /** Persist a trained [[PqModel]] the way [[saveIndex]] persists the
    * coarse build — a retrain-per-session serving tier is not
    * deployable at 100 TB; the codebooks belong in the same versioned
    * model registry as the cells. Two snapshot relations per version:
    * `<prefix>_codes` (the joined (id, code0..m-1, cos0..m-1) code
    * relation — corpus-sized, the compressed index itself) written
    * first, and `<prefix>_codebook` ((sub, cid, centroid) plus the
    * dim/m/k shape constants, m·k rows) written LAST as the commit
    * point readers resolve. Floats round-trip parquet exactly, so a
    * reloaded model serves bit-identically ([[loadPqModel]], proved by
    * the q211 gate + ModelCacheSpec).
    */
  def savePqModel(wh: graft.sources.Warehouse, layer: String, prefix: String,
                  pq: PqModel, idCol: String): Int = {
    val spark = pq.parts.head._1.sparkSession
    val vCodes = wh.writeVersion(pqCodes(pq, idCol), layer, s"${prefix}_codes")
    val cbRows = for {
      (part, i) <- pq.parts.zipWithIndex
      (cid, cent) <- part._2.toSeq.sortBy(_._1)
    } yield (i, cid, cent.toSeq, pq.dim, pq.m, pq.k)
    val cb = spark.createDataFrame(cbRows)
      .toDF("sub", "cid", "centroid", "dim", "m", "k")
    val vCb = wh.writeVersion(cb, layer, s"${prefix}_codebook")
    require(vCb == vCodes,
      s"PQ snapshots diverged (codebook v$vCb, codes v$vCodes): " +
        "write this prefix through savePqModel only")
    vCb
  }

  /** Reload a persisted PQ model — latest by default. The codebook
    * collect is m·k rows (algorithm constants, the same localize
    * contract as [[pqTrain]]'s own driver-side codebooks); the code
    * relations are column-pruned projections of one immutable
    * snapshot. Returns (model, version).
    */
  def loadPqModel(wh: graft.sources.Warehouse, layer: String, prefix: String,
                  idCol: String, version: Option[Int] = None): (PqModel, Int) = {
    val v = version.orElse(wh.latestVersion(layer, s"${prefix}_codebook"))
      .getOrElse(sys.error(s"no committed PQ model at $layer.$prefix"))
    val cb = wh.readVersion(layer, s"${prefix}_codebook", v).collect()
    require(cb.nonEmpty, s"empty PQ codebook at $layer.$prefix v$v")
    val (dim, m, k) = (cb.head.getAs[Int]("dim"), cb.head.getAs[Int]("m"),
      cb.head.getAs[Int]("k"))
    val codes = wh.readVersion(layer, s"${prefix}_codes", v)
    val parts = (0 until m).map { i =>
      val rel = codes.select(col(idCol), col(s"code$i"), col(s"cos$i"))
      val byCid = cb.filter(_.getAs[Int]("sub") == i)
        .map(r => r.getAs[Int]("cid") ->
          r.getSeq[Float](r.fieldIndex("centroid")).toArray).toMap
      (rel, byCid)
    }
    (PqModel(dim, m, k, parts), v)
  }

  /** Persist the SQ8 codec's trained stats ([[sq8Stats]] — the 1-row
    * per-dim min/max relation) as a versioned snapshot; serving
    * reloads the codec ([[loadSq8Stats]] → [[sq8QuantizeWith]] /
    * [[sq8IvfKnn]]) instead of rescanning the corpus per session.
    */
  def saveSq8Stats(wh: graft.sources.Warehouse, layer: String, prefix: String,
                   stats: DataFrame): Int =
    wh.writeVersion(stats, layer, s"${prefix}_sq8_stats")

  /** Reload persisted SQ8 stats — latest by default. Doubles
    * round-trip parquet exactly, so codes and reconstructions from a
    * reloaded model are bit-identical to the training session's.
    */
  def loadSq8Stats(wh: graft.sources.Warehouse, layer: String, prefix: String,
                   version: Option[Int] = None): (DataFrame, Int) = {
    val v = version.orElse(wh.latestVersion(layer, s"${prefix}_sq8_stats"))
      .getOrElse(sys.error(s"no committed SQ8 stats at $layer.$prefix"))
    (wh.readVersion(layer, s"${prefix}_sq8_stats", v), v)
  }

  /** Nearest-class-mean probe — the standard cheap embedding-quality
    * eval (NCM / prototype classifier): per-label mean vectors as
    * class prototypes, every vector assigned to its nearest prototype
    * by L2, reported as the label × predicted-label confusion matrix.
    * A useful embedding space separates its labels; a collapsed one
    * routes everything to one prototype — this measures that with one
    * pass and no training.
    *
    * Engine-exact by integer discipline: vectors are quantized to
    * 1e-6 grid longs FIRST (float→double widening and ×1e6 are both
    * correctly rounded, floor exact), prototype means use integer
    * division, and distances are integer sums of squared diffs — no
    * float accumulation order can differ between engines or partition
    * counts. Shapes: per-dim partial-aggregated shuffle (|labels|·dim
    * rows), a |labels|-row broadcast, argmin via min-of-struct with
    * label tie-break. Scan-speed at 100 TB; nothing all-pairs.
    *
    * Returns (label, pred_label, n) — the confusion matrix.
    */
  def classMeanProbe(emb: DataFrame, idCol: String, vecCol: String,
                     labelCol: String): DataFrame = {
    val qvec = transform(col(vecCol),
      x => floor(x.cast("double") * lit(1e6)).cast("long"))
    val vecs = emb.select(col(idCol).as("vec_id"),
      col(labelCol).as("label"), qvec.as("qv"))
    val perDim = vecs
      .select(col("label"), posexplode(col("qv")).as(Seq("pos", "q")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
      .withColumn("mean_q", expr("s div n"))
    val protos = perDim.groupBy(col("label").as("plabel"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("mean_q")))),
        s => s.getField("mean_q")).as("proto"))
    val scored = vecs.crossJoin(broadcast(protos)) // |labels| rows
      .withColumn("dist", aggregate(
        zip_with(col("qv"), col("proto"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x))
    scored.groupBy(col("vec_id"), col("label"))
      .agg(min(struct(col("dist"), col("plabel"))).as("m"))
      .select(col("label"), col("m.plabel").as("pred_label"))
      .groupBy(col("label"), col("pred_label"))
      .agg(count(lit(1)).as("n"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication = cluster the embeddings with the coarse quantizer,
    * then inside each cluster drop every vector that has a SAME-CELL
    * neighbor of higher keep-priority (smaller id) at cosine ≥ minCos.
    * Returns the per-cell attrition ledger
    * (cid, n, n_removed, n_kept) — the number a curation run reports.
    *
    * Scale: this is the paper's whole point — the quadratic test runs
    * per cell (one `cid` equi-join), never all-pairs, so cost is
    * Σ|cell|² not N²; at 100 TB you raise k so cells stay bounded and
    * each cell's block is an independent task. Zero-norm vectors have
    * no cosine (NULL under the ANSI guard) and are therefore never
    * removed. Reuses the train-once cells of [[trainedIndex]] — dedup
    * rides the same index the ANN stack serves from.
    */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
               cells: DataFrame, minCos: Double): DataFrame = {
    val e = emb.select(col(idCol), col(vecCol)).join(cells, Seq(idCol))
    val a = e.select(col("cid"), col(idCol).as("a_id"), col(vecCol).as("va"),
      norm(col(vecCol)).as("na"))
    val b = e.select(col("cid"), col(idCol).as("b_id"), col(vecCol).as("vb"),
      norm(col(vecCol)).as("nb"))
    val removed = a.join(b, Seq("cid"))
      .filter(col("a_id") < col("b_id"))
      .filter(safeCos(dot(col("va"), col("vb")), col("na"), col("nb")) >= minCos)
      .select(col("cid"), col("b_id")).distinct()
    cells.groupBy(col("cid")).agg(count(lit(1)).as("n"))
      .join(removed.groupBy(col("cid")).agg(count(lit(1)).as("n_removed")),
        Seq("cid"), "left")
      .select(col("cid"), col("n"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        (col("n") - coalesce(col("n_removed"), lit(0L))).as("n_kept"))
  }

  /** Hard-negative mining for contrastive training: for each vector,
    * the top-k most-similar SAME-CELL vectors with a DIFFERENT label —
    * the near-misses a metric-learning loss needs (easy negatives are
    * plentiful and uninformative; the hard ones live next door in
    * embedding space). Returns (vec_id, neg_id, rnk, cos), rnk 1..k by
    * (cos desc, neg_id asc); vectors whose cell holds no other-label
    * member yield no rows, zero-norm vectors have no cosine and join
    * nothing.
    *
    * Scale: candidate generation rides the SAME trained coarse cells
    * the ANN stack serves from — one cid equi-join, pairwise cosine
    * only within a cell (Σ|cell|², never N²), one bounded top-k window
    * co-partitioned with the join. Raising k (cells) bounds cell size
    * at 100 TB exactly as for [[semDedup]].
    */
  def hardNegatives(emb: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, cells: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k=$k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val e = emb.select(col(idCol), col(vecCol), col(labelCol)).join(cells, Seq(idCol))
    val a = e.select(col("cid"), col(idCol).as("vec_id"), col(vecCol).as("va"),
      norm(col(vecCol)).as("na"), col(labelCol).as("la"))
    val b = e.select(col("cid"), col(idCol).as("neg_id"), col(vecCol).as("vb"),
      norm(col(vecCol)).as("nb"), col(labelCol).as("lb"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("neg_id"))
    a.join(b, Seq("cid"))
      .filter(col("vec_id") =!= col("neg_id") && col("la") =!= col("lb"))
      .withColumn("cos", safeCos(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cos").isNotNull)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("vec_id"), col("neg_id"), col("rnk"), col("cos"))
  }

  /** Contrastive training pairs mined from the trained cells — the
    * dataset an embedding fine-tune consumes: per anchor, the top-kPos
    * same-cell SAME-label neighbors (positives: semantically close AND
    * same class) and the top-kNeg same-cell OTHER-label neighbors (the
    * [[hardNegatives]] — close enough to confuse, labeled apart).
    * Mining never leaves a trained cell, so the pairwise stage is
    * Σ|cell|², not N² — the same scale contract as SemDeDup. Returns
    * (vec_id, pair_id, rnk, cos, is_positive).
    */
  def contrastivePairs(emb: DataFrame, idCol: String, vecCol: String,
                       labelCol: String, cells: DataFrame,
                       kPos: Int, kNeg: Int): DataFrame = {
    require(kPos >= 1 && kNeg >= 1, s"kPos=$kPos and kNeg=$kNeg must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val e = emb.select(col(idCol), col(vecCol), col(labelCol)).join(cells, Seq(idCol))
    val a = e.select(col("cid"), col(idCol).as("vec_id"), col(vecCol).as("va"),
      norm(col(vecCol)).as("na"), col(labelCol).as("la"))
    val b = e.select(col("cid"), col(idCol).as("pair_id"), col(vecCol).as("vb"),
      norm(col(vecCol)).as("nb"), col(labelCol).as("lb"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("pair_id"))
    val pos = a.join(b, Seq("cid"))
      .filter(col("vec_id") =!= col("pair_id") && col("la") === col("lb"))
      .withColumn("cos", safeCos(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cos").isNotNull)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= kPos)
      .select(col("vec_id"), col("pair_id"), col("rnk"), col("cos"),
        lit(true).as("is_positive"))
    val neg = hardNegatives(emb, idCol, vecCol, labelCol, cells, kNeg)
      .select(col("vec_id"), col("neg_id").as("pair_id"), col("rnk"), col("cos"),
        lit(false).as("is_positive"))
    pos.unionByName(neg)
  }

  /** Near pairs: same bucket AND exact cosine ≥ minCos. */
  def lshNearPairs(emb: DataFrame, idCol: String, vecCol: String,
                   bits: Int, minCos: Double): DataFrame = {
    val bk = buckets(emb, idCol, vecCol, bits)
    val a = bk.select(col(idCol).as("id_1"), col(vecCol).as("va"),
      norm(col(vecCol)).as("na"), col("bucket"))
    val b = bk.select(col(idCol).as("id_2"), col(vecCol).as("vb"),
      norm(col(vecCol)).as("nb"), col("bucket"))
    a.join(b, "bucket").filter(col("id_1") < col("id_2"))
      .withColumn("cos", safeCos(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cos") >= minCos)
      .select(col("id_1"), col("id_2"), col("cos"))
  }
}
