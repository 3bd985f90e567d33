package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search surface over `embeddings` (64-dim float vectors).
  * The DuckDB oracle folds dot products with the same left-to-right
  * double arithmetic, so cosines are bit-identical.
  */
object SimilarityQueries extends QueryPack {

  private val BITS = 8
  private val MIN_COS = 0.3

  /** Train-once caches: a production ANN index separates build time
    * from query time, so every query over the same (session, corpus)
    * serves from ONE trained model — q76/q86/q118/q119 share the coarse
    * IVF index, q97/q104/q118 the PQ codebooks. Keyed by the session
    * instance because the materialized (localCheckpointed) relations
    * die with it; a fresh session retrains rather than serving a stale
    * handle. Both trainings are deterministic, so caching cannot change
    * any result — only how often the Lloyd rounds run.
    */
  private val ivfCache = QueryCaches.newCache[(DataFrame, DataFrame)]()
  private val pqCache = QueryCaches.newCache[Similarity.PqModel]()
  private val residCache = QueryCaches.newCache[(Similarity.PqModel, DataFrame)]()
  private val exactCache = QueryCaches.newCache[DataFrame]()
  private val sq8Cache = QueryCaches.newCache[DataFrame]()

  /** Test seams — delegate to the shared registry ([[QueryCaches]],
    * where the eviction contract is documented).
    */
  private[graft] def evictSession(s: SparkSession): Unit =
    QueryCaches.evictSession(s)
  private[graft] def cachedEntries(s: SparkSession): Int =
    QueryCaches.cachedEntries(s)

  private def cached[V](cache: QueryCaches.Cache[V],
                        s: SparkSession, d: String)(train: => V): V =
    QueryCaches.cached(cache, s, d)(train)

  /** Cached exact top-3 (the recall ground truth): q50 publishes it,
    * q86/q119/q123 measure against it — one quadratic kernel run per
    * (session, corpus), not four.
    */
  private[operators] def exactKnn(s: SparkSession, d: String): DataFrame =
    cached(exactCache, s, d)(
      Similarity.bruteForceKnn(Tables.embeddings(s, d), "vec_id", "embedding", 3)
        .localCheckpoint(true))

  /** Cached (cents, cells) of the trained coarse quantizer. */
  private[operators] def ivfIndex(s: SparkSession, d: String): (DataFrame, DataFrame) =
    cached(ivfCache, s, d)(
      Similarity.trainedIndex(Tables.embeddings(s, d), "vec_id", "embedding",
        KM_K, KM_ROUNDS))

  /** Cached SQ8 per-dim min/max stats — q153/q123's sq8 serves share
    * one corpus scan instead of re-deriving the stats per probe width.
    */
  private[operators] def sq8StatsCached(s: SparkSession, d: String): DataFrame =
    cached(sq8Cache, s, d)(
      Similarity.sq8Stats(Tables.embeddings(s, d), "embedding")
        .localCheckpoint(true))

  /** Cached trained PQ codebooks (raw vectors). */
  private[operators] def pqModel(s: SparkSession, d: String): Similarity.PqModel =
    cached(pqCache, s, d)(
      Similarity.pqTrain(Tables.embeddings(s, d), "vec_id", "embedding",
        dim = 64, m = PQ_M, k = PQ_K, rounds = PQ_ROUNDS))

  /** Cached residual-PQ model + the true-mean centroid table of the
    * shared coarse cells (the IVF-PQ construction: routing reuses the
    * scaled-sum index; all reconstruction arithmetic uses the means).
    */
  private[operators] def residModel(s: SparkSession, d: String): (Similarity.PqModel, DataFrame) =
    cached(residCache, s, d) {
      val emb = Tables.embeddings(s, d)
      val (_, cells) = ivfIndex(s, d)
      val meanCents = Similarity.cellMeans(emb, "vec_id", "embedding", cells)
        .localCheckpoint(true)
      val pqr = Similarity.pqTrainResidual(emb, "vec_id", "embedding",
        meanCents, cells, dim = 64, m = PQ_M, k = PQ_K, rounds = PQ_ROUNDS)
      (pqr, meanCents)
    }

  /** The four served codecs whose recall q123/q257-q260 report, in the
    * output's canonical order. */
  private val ADC_SCORER_NAMES =
    Seq("adc_raw", "adc_residual", "adc_rerank", "sq8")

  /** The (scorer, nprobe) recall measurement behind q123 (all four
    * curves in one relation) and the per-scorer ledger rows q257-q260.
    * `concurrent` overlaps the independent measurement jobs over the
    * shared materialized models (q123's 12-job form — fastest
    * wall-clock, but scheduler-overlap timing noise); the per-scorer
    * rows run their 3 probe widths sequentially for a stable
    * single-codec bench number. Output relation and hash are identical
    * either way (Future.sequence preserves tuple order).
    */
  private def adcRecall(s: SparkSession, d: String, names: Seq[String],
                        concurrent: Boolean): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val (cents, cells) = ivfIndex(s, d)
    val exact = exactKnn(s, d).select(col("vec_id"), col("nn_id"))
    import s.implicits._
    // every model fetch stays INSIDE its scorer's lambda (all cached —
    // the point is attribution, not reuse): a cold BENCH_ONLY run of a
    // single per-scorer row (q257/q260) must pay only the training its
    // codec actually scores with, not an eager residual-PQ build it
    // never reads — misattribution inside the rows made for attribution
    val all: Seq[(String, Int => DataFrame)] = Seq(
      "adc_raw" -> (p => Similarity.ivfAdcKnn(emb, "vec_id", "embedding",
        pqModel(s, d), cents, cells, p, 3)),
      "adc_residual" -> (p => {
        val (pqr, meanCents) = residModel(s, d)
        Similarity.ivfAdcResidualKnn(emb, "vec_id", "embedding",
          pqr, cents, meanCents, cells, p, 3)
      }),
      "adc_rerank" -> (p => {
        val (pqr, meanCents) = residModel(s, d)
        Similarity.ivfAdcRerankKnn(emb, "vec_id", "embedding",
          pqr, cents, meanCents, cells, p, RERANK_R, 3)
      }),
      "sq8" -> (p => Similarity.sq8IvfKnn(emb, "vec_id", "embedding",
        cents, cells, 64, p, 3, stats = Some(sq8StatsCached(s, d)))))
    val scorers = all.filter(sc => names.contains(sc._1))
    require(scorers.size == names.size,
      s"adcRecall: unknown scorer in $names (have ${all.map(_._1)})")
    def measure(name: String, fn: Int => DataFrame, p: Int): (String, Int, Long, Long, Long) = {
      val served = fn(p).select(col("vec_id"), col("nn_id"))
      val r = exact
        .join(served.withColumn("hit", lit(1)), Seq("vec_id", "nn_id"), "left")
        .agg(count(lit(1)).as("n"), sum(coalesce(col("hit"), lit(0))).as("o"))
        .head()
      val (n, o) = (r.getLong(0), r.getLong(1))
      (name, p, n, o, if (n == 0) 0L else math.floor(10000.0 * o / n).toLong)
    }
    val measured: Seq[(String, Int, Long, Long, Long)] =
      if (!concurrent)
        for { (name, fn) <- scorers; p <- NPROBES } yield measure(name, fn, p)
      else {
        // Concurrent form: independent reads of shared materialized
        // models — overlap their stages instead of draining schedules
        // end-to-end. Dedicated executor sized to the job count (each
        // future BLOCKS on a Spark action — the shared fork-join pool
        // would starve on low-core machines), and a bounded wait so a
        // wedged job fails loudly instead of hanging forever.
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration._
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          scorers.size * NPROBES.size)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
        try Await.result(
          Future.sequence(for { (name, fn) <- scorers; p <- NPROBES } yield
            Future(scala.concurrent.blocking(measure(name, fn, p)))),
          30.minutes)
        finally pool.shutdown()
      }
    measured.toDF("scorer", "nprobe", "n_exact_pairs", "n_overlap_pairs", "recall_bps")
  }

  val queries: Map[String, Q] = Map(
    // Exact brute-force cosine top-3 neighbors (baseline ANN), served
    // from the shared cache q86/q119 also measure against.
    "q50_cosine_knn" -> ((s, d) => exactKnn(s, d)),

    // Retrieval-quality eval over the KNN baseline: label-match
    // relevance scored as precision@3 and MRR per query, aggregated by
    // query label — the embedding-space quality report next to q129's
    // confusion matrix (prototype view) and q123's recall curve (index
    // view; this is the RELEVANCE view — does the neighborhood agree
    // with the labels at all?). Integer-exact: precision_bps =
    // hits·10⁴ div 3, mrr_ppm = 10⁶ div first-hit rank (0 when the
    // top-3 has no hit), label means by BIGINT division. Two id
    // equi-joins + two bounded aggs on top of the shared exact relation.
    "q179_knn_label_eval" -> ((s, d) => {
      val emb = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
      val per = exactKnn(s, d)
        .join(emb.toDF("vec_id", "qlabel"), Seq("vec_id"))
        .join(emb.toDF("nn_id", "nlabel"), Seq("nn_id"))
        .groupBy(col("vec_id"), col("qlabel"))
        .agg(sum(when(col("nlabel") === col("qlabel"), 1L).otherwise(0L)).as("hits"),
          min(when(col("nlabel") === col("qlabel"), col("rn"))).as("first_rank"))
        .select(col("qlabel").as("label"),
          expr("(hits * 10000) div 3").as("precision_bps"),
          coalesce(expr("1000000 div first_rank"), lit(0L)).as("mrr_ppm"))
      per.groupBy(col("label"))
        .agg(count(lit(1)).as("n_queries"),
          expr("sum(precision_bps) div count(1)").as("mean_precision_bps"),
          expr("sum(mrr_ppm) div count(1)").as("mean_mrr_ppm"))
    }),

    // Sign-bit LSH bucketed ANN: candidates share an 8-bit bucket,
    // verified with exact cosine ≥ 0.3 (the scale path).
    "q51_ann_lsh" -> ((s, d) =>
      Similarity.lshNearPairs(Tables.embeddings(s, d), "vec_id", "embedding",
        BITS, MIN_COS)),

    // Multi-probe LSH (Lv et al. 2007): q51's recall is bounded by
    // exact-bucket collision; instead of paying for more hash tables,
    // each vector ALSO probes its 8 Hamming-1 neighbor buckets — the
    // perturbation sequence of sign-bit LSH — so near-miss pairs
    // whose codes differ in one bit surface too. Candidates = probe
    // relation ⋈ exact buckets (9× the probe rows, same equi-join
    // shape — never pairwise), dedup, verify with exact cosine.
    // Returns a strict superset of q51's pairs; diff the counts for
    // the recall-per-probe trade.
    "q245_multiprobe_lsh" -> ((s, d) => {
      val bk = Similarity.buckets(Tables.embeddings(s, d),
        "vec_id", "embedding", BITS)
      val flips = (0 to BITS).map { i =>
        if (i == 0) col("bucket")
        else concat(substring(col("bucket"), 1, i - 1),
          when(substring(col("bucket"), i, 1) === "1", "0").otherwise("1"),
          substring(col("bucket"), i + 1, BITS - i))
      }
      val probes = bk.select(col("vec_id"), explode(array(flips: _*)).as("pb"))
      val cand = probes.select(col("vec_id").as("id_1"), col("pb"))
        .join(bk.select(col("vec_id").as("id_2"), col("bucket").as("pb")), Seq("pb"))
        .filter(col("id_1") < col("id_2"))
        .select(col("id_1"), col("id_2")).distinct()
      cand
        .join(bk.select(col("vec_id").as("id_1"), col("embedding").as("e1")), Seq("id_1"))
        .join(bk.select(col("vec_id").as("id_2"), col("embedding").as("e2")), Seq("id_2"))
        .withColumn("cos", graft.functions.VectorFunctions.cosine(col("e1"), col("e2")))
        .filter(col("cos") >= MIN_COS)
        .select(col("id_1"), col("id_2"), col("cos"))
    }),

    // Bucket histogram — shows LSH balance (skew → raise bits).
    "q52_lsh_buckets" -> ((s, d) =>
      Similarity.buckets(Tables.embeddings(s, d), "vec_id", "embedding", BITS)
        .groupBy(col("bucket")).agg(count(lit(1)).as("n_vecs"))),

    // IVF-style ANN: exact top-3 within the coarse partition (label as
    // the quantizer cell) — recall bounded by the quantizer, cost ÷ cells.
    "q57_ivf_knn" -> ((s, d) =>
      Similarity.ivfKnn(Tables.embeddings(s, d), "vec_id", "embedding", "label", 3)),

    // Blocked exact KNN: the brute-force kernel run per LSH bucket with
    // no driver collect — the bounded-memory exact path at scale
    // (q50 stays as the small-set global baseline).
    "q59_blocked_knn" -> ((s, d) =>
      Similarity.blockedKnn(Tables.embeddings(s, d), "vec_id", "embedding", BITS, 3)),

    // SQ8 scalar-quantized serving (the third compression family next
    // to PQ q104/q118 and residual-PQ q124): one byte per dimension
    // learned from per-dim corpus min/max, candidates reconstructed at
    // cell midpoints and served through the SAME probed-cells routing
    // as the ADC family — queries route full-precision onto the shared
    // coarse index, candidates are the probed cells' members scored
    // asymmetrically from their reconstructions (Similarity.sq8IvfKnn).
    // 4× memory reduction at 8 bits/dim with a cells-bounded plan:
    // cost per query is nprobe/k_cells of the corpus, never the flat
    // quadratic scan (its recall sits on q123's curve family).
    "q153_sq8_knn" -> ((s, d) => {
      val (cents, cells) = ivfIndex(s, d)
      Similarity.sq8IvfKnn(Tables.embeddings(s, d), "vec_id", "embedding",
        cents, cells, dim = 64, nprobe = NPROBE, kNeighbors = 3,
        stats = Some(sq8StatsCached(s, d)))
    }),

    // Corpus cartography: pairwise cosine between SOURCE centroids in
    // embedding space — the map view of inter-source redundancy that
    // q128 draws in shingle space. Centroids use q129's 1e-6-grid
    // integer means (order-independent exact sums, `div` truncation
    // matching both engines); the pairwise stage runs over the
    // |sources|-row proto relation, so the quadratic part is bounded
    // by the source count, never the corpus. Integer dot/norms are
    // exact; cos_q6 quantizes the one double step (IEEE sqrt + two
    // divisions, association mirrored in the oracle).
    "q155_source_map" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
      val emb = Tables.embeddings(s, d)
      val qv = transform(col("embedding"),
        x => floor(x.cast("double") * lit(1e6)).cast("long"))
      val vecs = emb.join(docs, emb("vec_id") === docs("doc_id"))
        .select(col("source"), qv.as("qv"))
      val perDim = vecs
        .select(col("source"), posexplode(col("qv")).as(Seq("pos", "q")))
        .groupBy(col("source"), col("pos"))
        .agg(sum(col("q")).as("sm"), count(lit(1)).as("n"))
        .withColumn("mean_q", expr("sm div n"))
      val protos = perDim.groupBy(col("source"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mean_q")))),
          z => z.getField("mean_q")).as("proto"))
      val a = protos.select(col("source").as("src_1"), col("proto").as("pa"))
      val b = protos.select(col("source").as("src_2"), col("proto").as("pb"))
      a.join(b, col("src_1") < col("src_2"))
        .withColumn("dot", aggregate(
          zip_with(col("pa"), col("pb"), (x, y) => x * y),
          lit(0L), (acc, v) => acc + v))
        .withColumn("n2_1", aggregate(transform(col("pa"), x => x * x),
          lit(0L), (acc, v) => acc + v))
        .withColumn("n2_2", aggregate(transform(col("pb"), x => x * x),
          lit(0L), (acc, v) => acc + v))
        .select(col("src_1"), col("src_2"), col("dot"), col("n2_1"), col("n2_2"),
          when(col("n2_1") > 0 && col("n2_2") > 0,
            floor(col("dot").cast("double")
              / sqrt(col("n2_1").cast("double"))
              / sqrt(col("n2_2").cast("double")) * lit(1e6)).cast("long"))
            .as("cos_q6"))
    }),

    // Quantizer training: one deterministic Lloyd step (seed on the 8
    // smallest ids, decimal-exact centroid sums, cosine re-assignment) —
    // how ivfKnn's cells are learned rather than given.
    "q72_kmeans_assign" -> ((s, d) =>
      Similarity.kmeansAssignStep(Tables.embeddings(s, d), "vec_id", "embedding", k = 8)
        .withColumnRenamed("cid", "cluster")),

    // Derandomized k-means|| initialization (Bahmani et al. 2012) —
    // the missing scale story of cluster training: min-id seeding
    // (kmeansSeeds) is deterministic but arbitrary; k-means++ is good
    // but needs k sequential draws; k-means|| oversamples ~16 points
    // per pass cost-proportionally and reduces the bounded candidate
    // set to k by vote weight. Every draw is a salted-hash threshold
    // ([[Similarity.kmeansParallelSeeds]]), so the "randomized"
    // algorithm is bit-exact under the oracle.
    "q236_kmeanspp_seeds" -> ((s, d) =>
      Similarity.kmeansParallelSeeds(Tables.embeddings(s, d),
        "vec_id", "embedding", k = 8, rounds = 2, oversample = 16)),

    // The MEASURED payoff of q236: cell occupancy under min-id seeding
    // vs k-means|| seeding, on identical assignment rules. Occupancy
    // balance is the operational IVF metric — a hot cell is a hot
    // probe at serving time — so skew_bps (hottest cell's load vs the
    // perfectly-balanced n/k) is the number an index build reports
    // before committing centroids. Both A/B arms share one broadcast
    // assignment pattern (smallest-id ties), and the whole comparison
    // is oracle-exact because the || draws are salted-hash
    // deterministic.
    "q239_seed_occupancy" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val minid = emb.orderBy(col("vec_id")).limit(8)
        .select(col("vec_id").as("cand_id"), col("embedding").as("cvec"))
      val pp = Similarity.kmeansParallelSeeds(emb, "vec_id", "embedding",
          k = 8, rounds = 2, oversample = 16)
        .join(emb, col("seed_id") === col("vec_id"))
        .select(col("seed_id").as("cand_id"), col("embedding").as("cvec"))
      def occupancy(cand: DataFrame, method: String) = {
        val sz = Similarity.assignToNearestCandidate(emb, "vec_id", "embedding", cand)
          .groupBy(col("cand_id")).agg(count(lit(1)).as("sz"))
        sz.agg(count(lit(1)).as("n_cells"), max(col("sz")).as("largest"),
            min(col("sz")).as("smallest"), sum(col("sz")).as("tot"))
          .select(lit(method).as("method"), col("n_cells"), col("largest"),
            col("smallest"), expr("(largest * 8 * 10000) div tot").as("skew_bps"))
      }
      occupancy(minid, "minid").unionByName(occupancy(pp, "kmpp"))
    }),

    // Product-quantization encoder: 4 independent sub-quantizers over
    // 16-dim slices compress each 64-dim vector to 4 3-bit codes — the
    // memory-side half of large-scale ANN (IVF above is the routing
    // half). Codes + per-subspace assignment cosines, all oracle-exact;
    // the codebooks come from the shared train-once model.
    "q97_pq_encode" -> ((s, d) =>
      Similarity.pqCodes(pqModel(s, d), "vec_id")),

    // The closed ANN loop: 2 Lloyd training rounds → assign to trained
    // cells → exact top-3 within each learned cell. q57's cells come
    // from the fixture label; here they come from the quantizer itself
    // (the shared train-once index).
    "q76_ivf_trained" -> ((s, d) =>
      Similarity.ivfKnn(Tables.embeddings(s, d).join(ivfIndex(s, d)._2, "vec_id"),
        "vec_id", "embedding", "cid", 3)),

    // PQ asymmetric-distance search, FLAT SCAN: queries rank the
    // COMPRESSED index (each database vector = its m per-subspace
    // codes, reconstructed from the trained codebooks). Per-subspace
    // dots sum in fixed order; scores are bit-exact vs the oracle's
    // mirrored fold. Kept as the exhaustive-ADC correctness baseline —
    // q118 is the same LUT kernel on the IVF-routed candidate set, the
    // shape that actually serves at 100 TB.
    "q104_pq_adc" -> ((s, d) =>
      Similarity.pqAdcKnnFlat(Tables.embeddings(s, d), "vec_id", "embedding",
        pqModel(s, d), kNeighbors = 3)),

    // IVFADC — the composed serving path (coarse quantizer ROUTES each
    // query to its top-nprobe trained cells, PQ codes SCORE via the
    // per-query LUT kernel): the candidate set shrinks from the whole
    // index to the probed cells' members and the join becomes a cid
    // equi-join — no unbounded broadcast, no quadratic scan. Same
    // hash-checked contract as q104, over the same shared models.
    "q118_ivfadc" -> ((s, d) => {
      val (cents, cells) = ivfIndex(s, d)
      Similarity.ivfAdcKnn(Tables.embeddings(s, d), "vec_id", "embedding",
        pqModel(s, d), cents, cells, nprobe = NPROBE, kNeighbors = 3)
    }),

    // Incremental index maintenance: the corpus grows daily but the
    // quantizer retrains on a schedule — new arrivals (held-out 10%)
    // are argmax-routed onto the index trained WITHOUT them, O(new),
    // never O(index), and immediately searchable.
    "q120_ivf_assign_new" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = Similarity.kmeansCentroids(
        emb.filter(col("vec_id") % 10 =!= NEW_MOD), "vec_id", "embedding",
        KM_K, KM_ROUNDS)
      Similarity.assignToCells(
        emb.filter(col("vec_id") % 10 === NEW_MOD), "vec_id", "embedding", cents)
    }),

    // Filtered ANN: the IVFADC serving path with a metadata predicate
    // restricting the CANDIDATE set (here: exclude one label class) —
    // the filter composes as a narrow semi-join on the one-row-per-id
    // cell relation, so routing, scoring, and the no-dedup guarantee
    // are untouched.
    "q121_filtered_ivfadc" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val (cents, cells) = ivfIndex(s, d)
      val allowed = emb.filter(col("label") =!= FILTER_LABEL).select(col("vec_id"))
      Similarity.ivfAdcKnn(emb, "vec_id", "embedding", pqModel(s, d), cents,
        cells.join(allowed, "vec_id"), nprobe = NPROBE, kNeighbors = 3)
    }),

    // Recall-vs-nprobe: THE knob every IVF deployment turns first,
    // measured — ivfProbedKnn at p = 1, 2, 4 against the exact
    // brute-force top-3, one integral row per p (pair counts + a
    // basis-point floor), so the hash check pins the whole curve.
    "q119_ivf_nprobe_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val (cents, cells) = ivfIndex(s, d)
      // the shared exact baseline; three probe settings compare
      // against the same materialized relation
      val exact = exactKnn(s, d).select(col("vec_id"), col("nn_id"))
      import s.implicits._
      NPROBES.map { p =>
        val probed = Similarity
          .ivfProbedKnn(emb, "vec_id", "embedding", cents, cells, p, 3)
          .select(col("vec_id"), col("nn_id"))
        val r = exact
          .join(probed.withColumn("hit", lit(1)), Seq("vec_id", "nn_id"), "left")
          .agg(count(lit(1)).as("n"), sum(coalesce(col("hit"), lit(0))).as("o"))
          .head()
        val (n, o) = (r.getLong(0), r.getLong(1))
        (p, n, o, if (n == 0) 0L else math.floor(10000.0 * o / n).toLong)
      }.toDF("nprobe", "n_exact_pairs", "n_overlap_pairs", "recall_bps")
    }),

    // Residual IVFADC (true IVF-PQ): same routing as q118, but PQ
    // codebooks trained on residuals x − centroid(cell(x)) and
    // candidates scored as cosine(q, centroid + decoded residual) —
    // the Jégou construction's accuracy half: identical bits, strictly
    // better reconstruction, measurably higher recall (q123).
    "q124_residual_ivfadc" -> ((s, d) => {
      val (cents, cells) = ivfIndex(s, d)
      val (pqr, meanCents) = residModel(s, d)
      Similarity.ivfAdcResidualKnn(Tables.embeddings(s, d), "vec_id", "embedding",
        pqr, cents, meanCents, cells, nprobe = NPROBE, kNeighbors = 3)
    }),

    // Two-stage serving: residual-ADC shortlist (top-10 compressed
    // scores, probed cells only) exactly re-ranked by true cosine —
    // PQ error never reaches the final ranking, leaving only routing
    // error. The per-query cost is RERANK_R exact dots via two id
    // equi-joins, never |cell|.
    "q126_adc_rerank" -> ((s, d) => {
      val (cents, cells) = ivfIndex(s, d)
      val (pqr, meanCents) = residModel(s, d)
      Similarity.ivfAdcRerankKnn(Tables.embeddings(s, d), "vec_id", "embedding",
        pqr, cents, meanCents, cells,
        nprobe = NPROBE, shortlist = RERANK_R, kNeighbors = 3)
    }),

    // IVF cell-occupancy audit — the re-cluster trigger every serving
    // deployment watches: per trained cell, member count, occupancy as
    // a percent of the mean, and the overfull flag (> 2× mean). A
    // skewed cell means probed-cell scans stop being uniform work —
    // routing hotspots at serve time, stragglers at build time — and
    // the fix (split the cell / retrain the quantizer) is scheduled
    // off exactly this relation. k-row output; integer arithmetic.
    "q168_ivf_occupancy" -> ((s, d) => {
      val (_, cells) = ivfIndex(s, d)
      val occ = cells.groupBy(col("cid")).agg(count(lit(1)).as("n"))
      val tot = occ.agg(sum(col("n")).as("t"), count(lit(1)).as("k"))
      occ.crossJoin(broadcast(tot))
        .select(col("cid"), col("n"),
          expr("(100 * n * k) div t").as("occupancy_pct_of_mean"),
          (col("n") * col("k") > col("t") * 2).as("overfull"))
        .orderBy(col("cid"))
    }),

    // Cluster labeling (topic discovery) — make the trained cells
    // human-readable: for each IVF cell, the 5 tokens whose in-cell
    // occurrence rate most exceeds their corpus-wide rate (integer
    // ppm lift, the q183 drift arithmetic pointed at clusters instead
    // of sources), over the documents the cell's vectors embed
    // (vec_id ≡ doc_id in the fixture). min count ≥ 3 keeps noise
    // tokens out. Corpus rates derive from the per-cell stats by one
    // more agg; the top-5 window partitions by cell over the
    // vocab-bounded (cell, token) relation — k·5 rows out.
    "q193_cluster_labels" -> ((s, d) => {
      val (_, cells) = ivfIndex(s, d)
      val occ = Tables.documents(s, d)
        .join(cells.withColumnRenamed("vec_id", "doc_id"), "doc_id")
        .select(col("cid"), explode(split(col("text"), " ")).as("tok"))
      val ct = occ.groupBy(col("cid"), col("tok")).agg(count(lit(1)).as("o"))
      val cellTot = ct.groupBy(col("cid")).agg(sum(col("o")).as("nc"))
      val tokTot = ct.groupBy(col("tok")).agg(sum(col("o")).as("c"))
      val tot = tokTot.agg(sum(col("c")).as("n"))
      val rated = ct.filter(col("o") >= 3)
        .join(broadcast(cellTot), "cid")
        .join(tokTot, "tok")
        .crossJoin(broadcast(tot))
        .select(col("cid"), col("tok"), col("o"),
          expr("(o * 1000000) div nc").as("rate_cell_ppm"),
          expr("(c * 1000000) div n").as("rate_corpus_ppm"))
        .withColumn("lift_ppm", col("rate_cell_ppm") - col("rate_corpus_ppm"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("cid"))
        .orderBy(col("lift_ppm").desc, col("tok"))
      rated.withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 5)
        .select(col("cid"), col("rn"), col("tok"), col("o"),
          col("rate_cell_ppm"), col("rate_corpus_ppm"), col("lift_ppm"))
    }),

    // Embedding outlier audit — the data-cleaning signal on top of the
    // same trained assignment every serving path reads: per cell, the
    // 3 members FARTHEST from their own centroid (lowest assignment
    // cosine, quantized to integer q6) with the cell's mean for
    // context. Mislabeled, corrupt, or out-of-distribution vectors
    // surface here first — at 100 TB this relation is the re-embed /
    // human-review queue. One k-row stat broadcast + one per-cell
    // bottom-k window (partition = cell, bounded like q141's).
    "q186_embedding_outliers" -> ((s, d) => {
      // the cached index's cells drop the assignment cosine; re-derive
      // it with one more k-row-broadcast assign pass over the SAME
      // trained centroids (identical tie-breaks ⇒ identical cells)
      val (cents, _) = ivfIndex(s, d)
      val q = Similarity.assignToCells(Tables.embeddings(s, d),
          "vec_id", "embedding", cents)
        .select(col("vec_id"), col("cid"),
          floor(col("cos") * 1e6).cast("long").as("cos_q6"))
      val stats = q.groupBy(col("cid")).agg(count(lit(1)).as("n"),
          sum(col("cos_q6")).as("sumq"))
        .select(col("cid"), expr("sumq div n").as("mean_cos_q6"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("cid")).orderBy(col("cos_q6"), col("vec_id"))
      q.join(broadcast(stats), "cid")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("cid"), col("rn"), col("vec_id"), col("cos_q6"),
          col("mean_cos_q6"),
          (col("mean_cos_q6") - col("cos_q6")).as("gap_q6"))
    }),

    // Filtered ANN on the BEST serving path: q121 composes the
    // metadata predicate with raw-PQ scoring only; here the same
    // cells ⋉ allowed semi-join restricts the two-stage re-ranked
    // pipeline (q126) — the shortlist is drawn from allowed candidates
    // only, so an excluded vector can never reach re-ranking, and PQ
    // error still never touches the final ranking. VectorSpec pins
    // zero excluded neighbors and recall ≥ the filtered-raw path at
    // equal probe width.
    "q161_filtered_rerank" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val (cents, cells) = ivfIndex(s, d)
      val (pqr, meanCents) = residModel(s, d)
      val allowed = emb.filter(col("label") =!= FILTER_LABEL).select(col("vec_id"))
      Similarity.ivfAdcRerankKnn(emb, "vec_id", "embedding", pqr, cents,
        meanCents, cells.join(allowed, "vec_id"),
        nprobe = NPROBE, shortlist = RERANK_R, kNeighbors = 3)
    }),

    // ADC recall — the quantization-loss number a PQ deployment reports
    // alongside nprobe: recall of the SERVED (compressed-scored) paths
    // against the exact baseline, for raw-vector PQ (q118's scorer),
    // residual PQ (q124's), the exactly-re-ranked shortlist (q126's),
    // and SQ8 asymmetric (q153's) at each probe width. One integral row
    // per (scorer, nprobe); the hash check pins all four curves —
    // residual ≥ raw at equal bits, re-rank ≥ residual at equal routing
    // (quantization loss removed), and SQ8 ≈ exact-routing recall
    // (8 bits/dim is near-lossless, the point of the codec).
    "q123_adc_recall" -> ((s, d) =>
      adcRecall(s, d, ADC_SCORER_NAMES, concurrent = true)),

    // q123's 12 concurrent measurements make ONE bench row whose
    // timing is dominated by scheduler overlap — measured 4.0↔13.3 s
    // across same-code runs, the highest-variance row in the ledger
    // (round-10 verdict directive 5: it masks real regressions in the
    // round-over-round diff). These four are the SAME measurements as
    // per-scorer rows, each running its 3 probe widths sequentially —
    // a stable serving-path number per codec. q123 stays the combined
    // relation (its single hash pins all four curves against each
    // other: residual ≥ raw at equal bits, re-rank ≥ residual,
    // SQ8 ≈ exact routing); the BENCH times the per-scorer rows and
    // skips q123 (graft.Bench's benchSkip), so the ledger carries four
    // stable rows instead of one noisy one.
    "q257_adc_recall_raw" -> ((s, d) =>
      adcRecall(s, d, Seq("adc_raw"), concurrent = false)),
    "q258_adc_recall_residual" -> ((s, d) =>
      adcRecall(s, d, Seq("adc_residual"), concurrent = false)),
    "q259_adc_recall_rerank" -> ((s, d) =>
      adcRecall(s, d, Seq("adc_rerank"), concurrent = false)),
    "q260_adc_recall_sq8" -> ((s, d) =>
      adcRecall(s, d, Seq("sq8"), concurrent = false)),

    // MEASURED recall of the trained IVF index against the exact
    // brute-force top-3 — the eval every ANN deployment needs before
    // trusting its quantizer. Integer outputs only (pair counts and a
    // basis-point floor), so the hash check is exact: recall claims are
    // numbers here, not vibes.
    "q86_ann_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val exact = exactKnn(s, d).select(col("vec_id"), col("nn_id"))
      val ivf = Similarity.ivfKnn(emb.join(ivfIndex(s, d)._2, "vec_id"),
        "vec_id", "embedding", "cid", 3).select(col("vec_id"), col("nn_id"))
      // one pass over the exact side: left-join indicator gives the
      // pair total AND the overlap without running the quadratic
      // kernel twice
      val r = exact
        .join(ivf.withColumn("hit", lit(1)), Seq("vec_id", "nn_id"), "left")
        .agg(count(lit(1)).as("n"), sum(coalesce(col("hit"), lit(0))).as("o"))
        .head()
      val (nExact, overlap) = (r.getLong(0), r.getLong(1))
      val recallBps =
        if (nExact == 0) 0L else math.floor(10000.0 * overlap / nExact).toLong
      emb.sparkSession.range(1).select(
        lit(nExact).as("n_exact_pairs"),
        lit(overlap).as("n_overlap_pairs"),
        lit(recallBps).as("recall_bps"))
    }),

    // Deterministic JL random projection (64 → 16 dims, md5-derived ±1
    // signs): the dimension-reduction audit — per-vector quantized
    // norm-distortion ratio (expected ≈ 1, the JL number) plus an
    // integer checksum of the projected coords, so the hash gate pins
    // the ENTIRE projection, not just its statistics.
    "q135_jl_projection" -> ((s, d) =>
      Similarity.jlProjectionAudit(Tables.embeddings(s, d),
        "vec_id", "embedding", dim = 64, outDim = JL_DIM)),

    // Search in the PROJECTED space — the point of q135's reduction:
    // exact KNN over the 16-dim float projections, recall measured
    // against the shared 64-dim exact baseline. The number that tells
    // you whether projected search (at 1/4 the per-pair cost) is good
    // enough to serve, or belongs in a shortlist+re-rank cascade.
    "q136_jl_search_recall" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val projected = Similarity.jlProject(emb, "vec_id", "embedding", 64, JL_DIM)
        .select(col("vec_id"), transform(col("proj"), y => y.cast("float")).as("pvec"))
      val exact = exactKnn(s, d).select(col("vec_id"), col("nn_id"))
      val projKnn = Similarity.bruteForceKnn(projected, "vec_id", "pvec", 3)
        .select(col("vec_id"), col("nn_id"))
      val r = exact
        .join(projKnn.withColumn("hit", lit(1)), Seq("vec_id", "nn_id"), "left")
        .agg(count(lit(1)).as("n"), sum(coalesce(col("hit"), lit(0))).as("o"))
        .head()
      val (n, o) = (r.getLong(0), r.getLong(1))
      val bps = if (n == 0) 0L else math.floor(10000.0 * o / n).toLong
      emb.sparkSession.range(1).select(
        lit(n).as("n_exact_pairs"), lit(o).as("n_overlap_pairs"),
        lit(bps).as("recall_bps"))
    }),

    // Persisted-index serving: save the shared trained build as a
    // versioned snapshot pair, reload it from DISK, and serve the
    // probed search from the reloaded copy ONLY. The oracle rebuilds
    // the same index from scratch in SQL, so the hash check proves the
    // save→load round-trip is bit-transparent to serving — the
    // durability contract (executor loss, session death, rollback)
    // costs zero accuracy.
    "q133_persisted_serving" -> ((s, d) => {
      val (cents, cells) = ivfIndex(s, d)
      val root = java.nio.file.Files.createTempDirectory("graft-idx-q133").toString
      val wh = new graft.sources.Warehouse(root, s)
      val v = Similarity.saveIndex(wh, "idx", "ann", cents, cells)
      val (lc, ll, _) = Similarity.loadIndex(wh, "idx", "ann", Some(v))
      Similarity.ivfProbedKnn(Tables.embeddings(s, d), "vec_id", "embedding",
        lc, ll, NPROBE, 3)
    }),

    // q133's PQ twin: the trained codebooks persisted as a versioned
    // (codes, codebook) snapshot pair, reloaded from DISK, and the
    // IVFADC serve run from the RELOADED model only — the oracle
    // rebuilds the whole model from scratch in SQL (q118's statement),
    // so the hash check proves savePqModel→loadPqModel is
    // bit-transparent to serving. This closes the retrain-per-session
    // gap: at 100 TB the codebooks live in the model registry next to
    // the coarse cells, not in a session cache.
    "q211_persisted_pq_serving" -> ((s, d) => {
      val (cents, cells) = ivfIndex(s, d)
      val root = java.nio.file.Files.createTempDirectory("graft-pq-q211").toString
      val wh = new graft.sources.Warehouse(root, s)
      val v = Similarity.savePqModel(wh, "idx", "pq", pqModel(s, d), "vec_id")
      val (lpq, _) = Similarity.loadPqModel(wh, "idx", "pq", "vec_id", Some(v))
      Similarity.ivfAdcKnn(Tables.embeddings(s, d), "vec_id", "embedding",
        lpq, cents, cells, NPROBE, 3)
    }),

    // q133's SQ8 twin: the codec's trained per-dim min/max persisted
    // as a versioned snapshot, reloaded from disk, and q153's routed
    // serve run from the RELOADED stats only (oracle = q153's
    // statement, rebuilt from scratch) — reload ≡ retrain, exactly.
    "q212_persisted_sq8_serving" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val (cents, cells) = ivfIndex(s, d)
      val root = java.nio.file.Files.createTempDirectory("graft-sq8-q212").toString
      val wh = new graft.sources.Warehouse(root, s)
      val v = Similarity.saveSq8Stats(wh, "idx", "ann",
        Similarity.sq8Stats(emb, "embedding"))
      val (lstats, _) = Similarity.loadSq8Stats(wh, "idx", "ann", Some(v))
      Similarity.sq8IvfKnn(emb, "vec_id", "embedding", cents, cells,
        dim = 64, nprobe = NPROBE, kNeighbors = 3, stats = Some(lstats))
    }),

    // SemDeDup: semantic dedup over the SHARED trained cells — inside
    // each coarse cell, a vector with an earlier (smaller-id) neighbor
    // at cosine ≥ 0.3 is dropped; output is the per-cell attrition
    // ledger. The pairwise test never leaves a cell, so the cost is
    // Σ|cell|², not N² — the SemDeDup paper's scale device, riding the
    // same index every ANN query serves from.
    "q137_semdedup" -> ((s, d) => {
      val (_, cells) = ivfIndex(s, d)
      Similarity.semDedup(Tables.embeddings(s, d), "vec_id", "embedding",
        cells, MIN_COS)
    }),

    // Hard-negative mining over the SHARED trained cells: per vector,
    // the top-3 same-cell other-label neighbors by cosine — the
    // contrastive-training sampler, riding the index every ANN query
    // serves from (candidates per cell, never all-pairs).
    "q141_hard_negatives" -> ((s, d) => {
      val (_, cells) = ivfIndex(s, d)
      Similarity.hardNegatives(Tables.embeddings(s, d), "vec_id", "embedding",
        "label", cells, 3)
    }),

    // Contrastive pair mining — q141 completed into the dataset an
    // embedding fine-tune actually consumes: per anchor, the top
    // same-cell SAME-label neighbor (positive) and the top same-cell
    // other-label neighbor (hard negative), one labeled relation.
    // Mining never leaves a trained cell (Σ|cell|², not N²).
    "q173_contrastive_pairs" -> ((s, d) => {
      val (_, cells) = ivfIndex(s, d)
      Similarity.contrastivePairs(Tables.embeddings(s, d), "vec_id", "embedding",
        "label", cells, kPos = 1, kNeg = 1)
    }),

    // Nearest-class-mean probe: per-label prototype vectors, every
    // vector assigned to its nearest prototype, output as the
    // label × pred confusion matrix — the one-pass embedding-quality
    // eval (no trained model; integer-quantized end-to-end, so the
    // hash check pins every assignment).
    "q129_ncm_probe" -> ((s, d) =>
      Similarity.classMeanProbe(Tables.embeddings(s, d),
        "vec_id", "embedding", "label"))
  )

  private val KM_K = 8
  private val KM_ROUNDS = 2
  private val PQ_M = 4       // subspaces
  private val PQ_SUB = 16    // dims per subspace (4 × 16 = 64)
  private val PQ_K = 8       // codebook size per subspace
  private val PQ_ROUNDS = 1
  private val NPROBE = 2           // q118/q121's routing width
  private val NPROBES = Seq(1, 2, 4) // q119's measured recall curve
  private val RERANK_R = 10        // q126: exact-rescored shortlist size
  private val JL_DIM = 16          // q135: projected dimensionality
  private val NEW_MOD = 0          // q120: vec_id % 10 == 0 are "new arrivals"
  private val FILTER_LABEL = 0     // q121: candidate predicate label <> 0

  /** cosine(a,b) with strict left-fold double arithmetic. */
  private[operators] def cosSql(a: String, b: String) =
    s"""(list_reduce(list_transform(list_zip($a, $b),
          x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p, q) -> p + q) /
        (sqrt(list_reduce(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p, q) -> p + q)) *
         sqrt(list_reduce(list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (p, q) -> p + q))))"""

  private[operators] val bucketSql = (1 to BITS).map(i =>
    s"(CASE WHEN embedding[$i] >= 0 THEN '1' ELSE '0' END)").mkString(" || ")

  /** WITH-body for the q236 derandomized k-means|| chain (emb → c0 →
    * two oversampling rounds → votes → `top` ranked candidates) —
    * shared by q236 (the seeds themselves) and q239 (occupancy A/B
    * against min-id seeding). No leading WITH.
    */
  private lazy val kmppChainSql: String = {
    def u32(r: Int) = (1 to 8).map(i =>
      s"strpos('123456789abcdef', substr(md5('kmpp$r-' || CAST(vec_id AS VARCHAR)), $i, 1)) * ${1L << (4 * (8 - i))}")
      .mkString("(", " + ", ")")
    def roundCtes(r: Int) =
      s"""b$r AS (SELECT e.vec_id, e.embedding,
         |          MAX(${cosSql("e.embedding", "c.cvec")}) AS best
         |        FROM emb e CROSS JOIN c${r - 1} c
         |        WHERE ${cosSql("e.embedding", "c.cvec")} IS NOT NULL
         |        GROUP BY 1, 2),
         |d$r AS (SELECT vec_id, embedding,
         |          GREATEST(0, CAST(floor((1.0 - best) * 1000000.0) AS BIGINT)) AS dq
         |        FROM b$r),
         |t$r AS (SELECT CAST(SUM(dq) AS BIGINT) AS tot FROM d$r),
         |s$r AS (SELECT vec_id AS cand_id, embedding AS cvec FROM d$r
         |        WHERE ${u32(r)} <
         |          ((16 * dq) * 4294967296) // GREATEST((SELECT tot FROM t$r), 1)),
         |c$r AS (SELECT * FROM c${r - 1} UNION ALL SELECT * FROM s$r)""".stripMargin
    s"""emb AS (SELECT vec_id, embedding FROM embeddings),
       |c0 AS (SELECT vec_id AS cand_id, embedding AS cvec FROM emb
       |       ORDER BY vec_id LIMIT 1),
       |${roundCtes(1)},
       |${roundCtes(2)},
       |asg AS (SELECT vec_id, cand_id FROM (
       |          SELECT e.vec_id, c.cand_id,
       |            row_number() OVER (PARTITION BY e.vec_id
       |              ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC,
       |                       c.cand_id) AS rn
       |          FROM emb e CROSS JOIN c2 c
       |          WHERE ${cosSql("e.embedding", "c.cvec")} IS NOT NULL)
       |        WHERE rn = 1),
       |w AS (SELECT cand_id, CAST(count(*) AS BIGINT) AS weight
       |      FROM asg GROUP BY 1),
       |top AS (SELECT cand_id, weight,
       |          row_number() OVER (ORDER BY weight DESC, cand_id) AS cid
       |        FROM w)""".stripMargin
  }

  /** WITH-clause chain for `rounds` Lloyd refinements over the 64-dim
    * embeddings (range(1,65) indexes the vector): seeds → a1 → cents1 →
    * a2 → … — the final assignment relation is `a{rounds+1}`. Mirrors
    * [[Similarity.kmeansCentroids]] exactly, macro-expanded per round.
    */
  private def kmeansWith(k: Int, rounds: Int, where: String = ""): String = {
    val pred = if (where.isEmpty) "" else s" WHERE $where"
    def argmin(cents: String) =
      s"""SELECT vec_id, embedding, cid, cos FROM (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |         ${cosSql("e.embedding", "c.centroid")} AS cos,
         |         row_number() OVER (PARTITION BY e.vec_id
         |           ORDER BY ${cosSql("e.embedding", "c.centroid")} DESC, c.cid) AS rn
         |  FROM emb e CROSS JOIN $cents c
         |  WHERE ${cosSql("e.embedding", "c.centroid")} IS NOT NULL)
         |WHERE rn = 1""".stripMargin
    val head =
      s"""WITH emb AS (SELECT vec_id, embedding FROM embeddings$pred),
         |seeds AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cid,
         |                 embedding AS centroid
         |          FROM (SELECT vec_id, embedding FROM embeddings$pred ORDER BY vec_id LIMIT $k)),
         |a1 AS (${argmin("seeds")})""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""sums$r AS (
         |  SELECT cid, r.i AS pos,
         |         SUM(CAST(floor(CAST(embedding[r.i] AS DOUBLE) * 1e7) AS BIGINT)) AS s
         |  FROM a$r, range(1, 65) r(i) GROUP BY 1, 2),
         |cents$r AS (
         |  SELECT cid, list(CAST(CAST(s AS DOUBLE) AS FLOAT) ORDER BY pos) AS centroid
         |  FROM sums$r GROUP BY cid),
         |a${r + 1} AS (${argmin(s"cents$r")})""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** [[kmeansWith]] generalized to a vector SLICE `[lo:hi]` with
    * suffix-disambiguated CTE names (no leading WITH), so several
    * independent sub-quantizer chains compose into one statement — the
    * per-subspace training of product quantization. Final assignment
    * relation: `a$sfx${rounds + 1}`.
    */
  private def kmeansWithSub(k: Int, rounds: Int, lo: Int, hi: Int, sfx: String,
                            from: String = "embeddings",
                            mean: Boolean = false,
                            l2: Boolean = false): String = {
    // l2=true mirrors Similarity.kmeansAssignL2: score = −‖v−c‖²
    // decomposed (vv − 2·vc) + cc in the identical association; never
    // NULL, so no guard. Cosine argmin keeps the zero-norm guard.
    def score(e: String, c: String) =
      if (l2) s"(-((${dotSql(e, e)} - 2.0 * ${dotSql(e, c)}) + ${dotSql(c, c)}))"
      else cosSql(e, c)
    def argmin(cents: String) = {
      val guard = if (l2) ""
      else s"\n         |  WHERE ${cosSql("e.embedding", "c.centroid")} IS NOT NULL"
      s"""SELECT vec_id, embedding, cid, cos FROM (
         |  SELECT e.vec_id, e.embedding, c.cid,
         |         ${score("e.embedding", "c.centroid")} AS cos,
         |         row_number() OVER (PARTITION BY e.vec_id
         |           ORDER BY ${score("e.embedding", "c.centroid")} DESC, c.cid) AS rn
         |  FROM emb$sfx e CROSS JOIN $cents c$guard)
         |WHERE rn = 1""".stripMargin
    }
    // mean=true mirrors Similarity.kmeansRecenter(mean = true): the
    // centroid is (s/n)/1e7, needed when centroids enter vector
    // arithmetic (residual chains) rather than just cosine arguments.
    val centExpr =
      if (mean) "CAST((CAST(s AS DOUBLE) / n) / 1e7 AS FLOAT)"
      else "CAST(CAST(s AS DOUBLE) AS FLOAT)"
    val head =
      s"""emb$sfx AS (SELECT vec_id, embedding[$lo:$hi] AS embedding FROM $from),
         |seeds$sfx AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cid,
         |                 embedding AS centroid
         |          FROM (SELECT vec_id, embedding[$lo:$hi] AS embedding
         |                FROM $from ORDER BY vec_id LIMIT $k)),
         |a$sfx${1} AS (${argmin(s"seeds$sfx")})""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""sums$sfx$r AS (
         |  SELECT cid, r.i AS pos,
         |         SUM(CAST(floor(CAST(embedding[r.i] AS DOUBLE) * 1e7) AS BIGINT)) AS s,
         |         COUNT(*) AS n
         |  FROM a$sfx$r, range(1, ${hi - lo + 2}) r(i) GROUP BY 1, 2),
         |cents$sfx$r AS (
         |  SELECT cid, list($centExpr ORDER BY pos) AS centroid
         |  FROM sums$sfx$r GROUP BY cid),
         |a$sfx${r + 1} AS (${argmin(s"cents$sfx$r")})""".stripMargin
    }
    (head +: steps).mkString(",\n")
  }

  /** Strict left-fold dot product — the numerator of [[cosSql]] alone. */
  /** The q135/q136 JL CTE chain: sign matrix sg(j, i, s), per-(vec, j)
    * terms, and yv — each projected coordinate folded in ascending i
    * order (list(... ORDER BY i) + list_reduce), mirroring the Spark
    * side's zip_with/aggregate fold exactly.
    */
  private def jlCtesSql: String =
    s"""sg AS (SELECT j, i,
       |        CASE WHEN strpos('123456789abcdef',
       |               substr(md5('rp-' || CAST(i AS VARCHAR) || '-' || CAST(j AS VARCHAR)), 1, 1)) % 2 = 1
       |             THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END AS s
       |      FROM generate_series(0, ${JL_DIM - 1}) t1(j),
       |           generate_series(1, 64) t2(i)),
       |terms AS (SELECT e.vec_id, sg.j, sg.i,
       |            CAST(e.embedding[sg.i] AS DOUBLE) * sg.s AS t
       |          FROM embeddings e JOIN sg ON true),
       |yv AS (SELECT vec_id, j,
       |         list_reduce(list_prepend(CAST(0 AS DOUBLE), list(t ORDER BY i)),
       |           (p, q) -> p + q) AS y
       |       FROM terms GROUP BY 1, 2)""".stripMargin

  private def dotSql(a: String, b: String) =
    s"""list_reduce(list_transform(list_zip($a, $b),
          x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (p, q) -> p + q)"""

  // ---- shared PQ-oracle fragments (q104 flat scan, q118 IVFADC) ----

  /** The m sub-quantizer training chains, suffix-disambiguated. */
  private def pqChainsSql: String = (0 until PQ_M).map { i =>
    kmeansWithSub(PQ_K, PQ_ROUNDS, i * PQ_SUB + 1, (i + 1) * PQ_SUB, s"_s${i}_")
  }.mkString(",\n")

  /** recon CTE: each vector's m assigned centroids c0..cM-1. */
  private def pqReconSql: String = {
    val joins = (0 until PQ_M).map { i =>
      val base = if (i == 0) s"FROM a_s0_${PQ_ROUNDS + 1} a0"
      else s"JOIN a_s${i}_${PQ_ROUNDS + 1} a$i ON a$i.vec_id = a0.vec_id"
      s"$base\n  JOIN cents_s${i}_$PQ_ROUNDS c$i ON a$i.cid = c$i.cid"
    }.mkString("\n  ")
    val cols = (0 until PQ_M).map(i => s"c$i.centroid AS c$i").mkString(", ")
    s"""recon AS (
       |  SELECT a0.vec_id, $cols
       |  $joins)""".stripMargin
  }

  /** The fixed-order ADC fold over query q and reconstruction r —
    * mirrors [[Similarity]]'s ((d0+d1)+d2)+d3 association exactly. */
  private def pqAdcSql: String = {
    val num = (0 until PQ_M).map { i =>
      dotSql(s"q.embedding[${i * PQ_SUB + 1}:${(i + 1) * PQ_SUB}]", s"r.c$i")
    }.reduce((a, b) => s"($a + $b)")
    val cn2 = (0 until PQ_M).map(i => dotSql(s"r.c$i", s"r.c$i"))
      .reduce((a, b) => s"($a + $b)")
    s"""($num / (sqrt(${dotSql("q.embedding", "q.embedding")}) * sqrt($cn2)))"""
  }

  /** The full IVFADC statement (q118/q121): coarse chain routes, PQ
    * chains score; `candFilterJoin` optionally restricts the candidate
    * set by a metadata predicate (filtered ANN).
    */
  private def ivfadcSql(candFilterJoin: String): String = {
    val adc = pqAdcSql
    val filt = if (candFilterJoin.isEmpty) "" else s"\n  $candFilterJoin"
    s"""${kmeansWith(KM_K, KM_ROUNDS)},
       |$pqChainsSql,
       |$pqReconSql,
       |${probesSql(NPROBE, "")}
       |SELECT vec_id, nn_id, adc, rn FROM (
       |  SELECT q.vec_id, r.vec_id AS nn_id, $adc AS adc,
       |         CAST(row_number() OVER (PARTITION BY q.vec_id
       |              ORDER BY $adc DESC, r.vec_id) AS INT) AS rn
       |  FROM embeddings q
       |  JOIN probes p ON p.vec_id = q.vec_id
       |  JOIN a${KM_ROUNDS + 1} ce ON ce.cid = p.cid$filt
       |  JOIN recon r ON r.vec_id = ce.vec_id AND r.vec_id != q.vec_id
       |  WHERE $adc IS NOT NULL)
       |WHERE rn <= 3""".stripMargin
  }

  // ---- residual-PQ oracle fragments (q123 recall, q124 IVF-PQ) ----

  /** mcents CTE: TRUE-MEAN centroids of the trained coarse cells —
    * mirrors [[Similarity.cellMeans]]: exact LONG sums of 1e-7-quantized
    * coordinates, divided back (s/n)/1e7. The scoring geometry for the
    * residual path; routing stays on the scaled `cents`.
    */
  private def meanCentsSql: String =
    s"""mcents AS (
       |  SELECT cid, list(CAST((CAST(s AS DOUBLE) / n) / 1e7 AS FLOAT) ORDER BY pos) AS centroid
       |  FROM (SELECT cid, r.i AS pos,
       |               SUM(CAST(floor(CAST(embedding[r.i] AS DOUBLE) * 1e7) AS BIGINT)) AS s,
       |               COUNT(*) AS n
       |        FROM a${KM_ROUNDS + 1}, range(1, 65) r(i) GROUP BY 1, 2)
       |  GROUP BY cid)""".stripMargin

  /** resid CTE: per id, embedding − mean(cell), elementwise.
    * Subtraction in DOUBLE then cast to FLOAT is bit-identical to the
    * engine's native float subtraction (the exact difference of two
    * binary32 values always fits binary64, so both round it once). */
  private def residSql: String =
    s"""resid AS (
       |  SELECT a.vec_id, list_transform(list_zip(a.embedding, c.centroid),
       |    x -> CAST(CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE) AS FLOAT)) AS embedding
       |  FROM a${KM_ROUNDS + 1} a JOIN mcents c ON a.cid = c.cid)""".stripMargin

  /** The m sub-quantizer chains trained over `resid` (suffix `_r`):
    * L2 assignment + mean recentering — their centroids are
    * reconstruction terms, and residual information is magnitude. */
  private def pqResidChainsSql: String = (0 until PQ_M).map { i =>
    kmeansWithSub(PQ_K, PQ_ROUNDS, i * PQ_SUB + 1, (i + 1) * PQ_SUB, s"_r${i}_",
      "resid", mean = true, l2 = true)
  }.mkString(",\n")

  /** rrecon CTE: each vector's m assigned RESIDUAL centroids c0..cM-1. */
  private def residReconSql: String = {
    val joins = (0 until PQ_M).map { i =>
      val base = if (i == 0) s"FROM a_r0_${PQ_ROUNDS + 1} a0"
      else s"JOIN a_r${i}_${PQ_ROUNDS + 1} a$i ON a$i.vec_id = a0.vec_id"
      s"$base\n  JOIN cents_r${i}_$PQ_ROUNDS c$i ON a$i.cid = c$i.cid"
    }.mkString("\n  ")
    val cols = (0 until PQ_M).map(i => s"c$i.centroid AS c$i").mkString(", ")
    s"""rrecon AS (
       |  SELECT a0.vec_id, $cols
       |  $joins)""".stripMargin
  }

  /** Residual ADC score: cosine(q, cc + decoded residual), decomposed
    * with the exact association [[Similarity.ivfAdcResidualKnn]] uses —
    * num = ((((qc + l0) + l1) + l2) + l3, ‖c+r̂‖² = (cn2 + 2·cross) + rn2.
    * Aliases: q = query row, cc = probed cell's MEAN centroid (mcents),
    * r = rrecon. */
  private def residAdcSql: String = {
    val num = (dotSql("q.embedding", "cc.centroid") +: (0 until PQ_M).map { i =>
      dotSql(s"q.embedding[${i * PQ_SUB + 1}:${(i + 1) * PQ_SUB}]", s"r.c$i")
    }).reduce((a, b) => s"($a + $b)")
    val cross = (0 until PQ_M).map { i =>
      dotSql(s"cc.centroid[${i * PQ_SUB + 1}:${(i + 1) * PQ_SUB}]", s"r.c$i")
    }.reduce((a, b) => s"($a + $b)")
    val rn2 = (0 until PQ_M).map(i => dotSql(s"r.c$i", s"r.c$i"))
      .reduce((a, b) => s"($a + $b)")
    val cn2p = s"((${dotSql("cc.centroid", "cc.centroid")} + 2.0 * ($cross)) + ($rn2))"
    s"""(($num) / (sqrt(${dotSql("q.embedding", "q.embedding")}) * sqrt($cn2p)))"""
  }

  /** short$sfx CTE: the residual-ADC top-[[RERANK_R]] shortlist per
    * query within probes$sfx — q124's ranking with a wider cut, the
    * compressed half of the two-stage q126 serving path. */
  private def residShortSql(sfx: String, candFilterJoin: String = ""): String = {
    val adc = residAdcSql
    val filt = if (candFilterJoin.isEmpty) "" else s"\n  $candFilterJoin"
    s"""short$sfx AS (SELECT vec_id, nn_id FROM (
       |  SELECT q.vec_id, r.vec_id AS nn_id,
       |         row_number() OVER (PARTITION BY q.vec_id
       |           ORDER BY $adc DESC, r.vec_id) AS rn
       |  FROM embeddings q
       |  JOIN probes$sfx p ON p.vec_id = q.vec_id
       |  JOIN mcents cc ON cc.cid = p.cid
       |  JOIN a${KM_ROUNDS + 1} ce ON ce.cid = p.cid$filt
       |  JOIN rrecon r ON r.vec_id = ce.vec_id AND r.vec_id != q.vec_id
       |  WHERE $adc IS NOT NULL)
       |  WHERE rn <= $RERANK_R)""".stripMargin
  }

  /** SQ8 CTE chain (st/sa/rec): per-dim corpus min/max, midpoint
    * reconstruction cast to REAL — mirrors [[Similarity.sq8Quantize]].
    * Shared by the q153 serve and q123's sq8 recall rows. */
  private def sq8CtesSql: String =
    s"""st AS (SELECT i, min(CAST(e.embedding[i] AS DOUBLE)) AS mn,
       |          max(CAST(e.embedding[i] AS DOUBLE)) AS mx
       |        FROM embeddings e, generate_series(1, 64) t(i) GROUP BY 1),
       |sa AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM st),
       |rec AS (SELECT e.vec_id,
       |          list_transform(generate_series(1, 64), i ->
       |            CAST(CASE WHEN mxs[i] > mns[i]
       |                 THEN mns[i] + (least(greatest(floor(
       |                        (CAST(e.embedding[i] AS DOUBLE) - mns[i])
       |                          / (mxs[i] - mns[i]) * 256.0), 0.0), 255.0) + 0.5)
       |                      * (mxs[i] - mns[i]) / 256.0
       |                 ELSE mns[i] END AS REAL)) AS recon
       |        FROM embeddings e CROSS JOIN sa)""".stripMargin

  /** The full SQ8 routed-serve statement (q153, and q212's
    * reload-transparency proof): coarse chain routes, candidates scored
    * asymmetrically against their midpoint reconstructions. */
  private def sq8RoutedServeSql: String =
    s"""${kmeansWith(KM_K, KM_ROUNDS)},
       |${probesSql(NPROBE, "")},
       |$sq8CtesSql
       |SELECT vec_id, nn_id, cos, rn FROM (
       |  SELECT q.vec_id, r.vec_id AS nn_id,
       |         ${cosSql("q.embedding", "r.recon")} AS cos,
       |         CAST(row_number() OVER (PARTITION BY q.vec_id
       |              ORDER BY ${cosSql("q.embedding", "r.recon")} DESC, r.vec_id) AS INT) AS rn
       |  FROM embeddings q
       |  JOIN probes p ON p.vec_id = q.vec_id
       |  JOIN a${KM_ROUNDS + 1} ce ON ce.cid = p.cid
       |  JOIN rec r ON r.vec_id = ce.vec_id AND r.vec_id != q.vec_id
       |  WHERE ${cosSql("q.embedding", "r.recon")} IS NOT NULL)
       |WHERE rn <= 3""".stripMargin

  /** probes$sfx CTE: each query's top-`nprobe` trained coarse cells by
    * centroid cosine, ties cid asc — mirrors [[Similarity.probedCells]]. */
  private def probesSql(nprobe: Int, sfx: String): String =
    s"""probes$sfx AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${cosSql("e.embedding", "c.centroid")} DESC, c.cid) AS rn
       |    FROM emb e CROSS JOIN cents$KM_ROUNDS c
       |    WHERE ${cosSql("e.embedding", "c.centroid")} IS NOT NULL)
       |  WHERE rn <= $nprobe)""".stripMargin

  /** The q123/q257-q260 oracle builder: shared trained chains + exact
    * baseline + the per-probe serving CTEs for all four codecs (DuckDB
    * prunes whichever a given statement never references), closed by
    * one summary row per requested (scorer, nprobe). `scorers` pairs
    * the output scorer name with its summary-CTE prefix.
    */
  private def adcRecallOracle(scorers: Seq[(String, String)]): String = {
    val adcRaw = pqAdcSql
    val adcRes = residAdcSql
    val perP = NPROBES.map { p =>
      s"""${probesSql(p, s"$p")},
         |praw$p AS (SELECT vec_id, nn_id FROM (
         |  SELECT q.vec_id, r.vec_id AS nn_id,
         |         row_number() OVER (PARTITION BY q.vec_id
         |           ORDER BY $adcRaw DESC, r.vec_id) AS rn
         |  FROM embeddings q
         |  JOIN probes$p p ON p.vec_id = q.vec_id
         |  JOIN a${KM_ROUNDS + 1} ce ON ce.cid = p.cid
         |  JOIN recon r ON r.vec_id = ce.vec_id AND r.vec_id != q.vec_id
         |  WHERE $adcRaw IS NOT NULL)
         |  WHERE rn <= 3),
         |pres$p AS (SELECT vec_id, nn_id FROM (
         |  SELECT q.vec_id, r.vec_id AS nn_id,
         |         row_number() OVER (PARTITION BY q.vec_id
         |           ORDER BY $adcRes DESC, r.vec_id) AS rn
         |  FROM embeddings q
         |  JOIN probes$p p ON p.vec_id = q.vec_id
         |  JOIN mcents cc ON cc.cid = p.cid
         |  JOIN a${KM_ROUNDS + 1} ce ON ce.cid = p.cid
         |  JOIN rrecon r ON r.vec_id = ce.vec_id AND r.vec_id != q.vec_id
         |  WHERE $adcRes IS NOT NULL)
         |  WHERE rn <= 3),
         |${residShortSql(s"$p")},
         |prer$p AS (SELECT vec_id, nn_id FROM (
         |  SELECT s.vec_id, s.nn_id,
         |         row_number() OVER (PARTITION BY s.vec_id
         |           ORDER BY ${cosSql("q.embedding", "c.embedding")} DESC, s.nn_id) AS rn
         |  FROM short$p s
         |  JOIN embeddings q ON q.vec_id = s.vec_id
         |  JOIN embeddings c ON c.vec_id = s.nn_id
         |  WHERE ${cosSql("q.embedding", "c.embedding")} IS NOT NULL)
         |  WHERE rn <= 3),
         |psq8$p AS (SELECT vec_id, nn_id FROM (
         |  SELECT q.vec_id, r.vec_id AS nn_id,
         |         row_number() OVER (PARTITION BY q.vec_id
         |           ORDER BY ${cosSql("q.embedding", "r.recon")} DESC, r.vec_id) AS rn
         |  FROM embeddings q
         |  JOIN probes$p p ON p.vec_id = q.vec_id
         |  JOIN a${KM_ROUNDS + 1} ce ON ce.cid = p.cid
         |  JOIN rec r ON r.vec_id = ce.vec_id AND r.vec_id != q.vec_id
         |  WHERE ${cosSql("q.embedding", "r.recon")} IS NOT NULL)
         |  WHERE rn <= 3),
         |sraw$p AS (SELECT (SELECT count(*) FROM exact) AS n,
         |                  (SELECT count(*) FROM exact JOIN praw$p USING (vec_id, nn_id)) AS o),
         |sres$p AS (SELECT (SELECT count(*) FROM exact) AS n,
         |                  (SELECT count(*) FROM exact JOIN pres$p USING (vec_id, nn_id)) AS o),
         |srer$p AS (SELECT (SELECT count(*) FROM exact) AS n,
         |                  (SELECT count(*) FROM exact JOIN prer$p USING (vec_id, nn_id)) AS o),
         |ssq8$p AS (SELECT (SELECT count(*) FROM exact) AS n,
         |                  (SELECT count(*) FROM exact JOIN psq8$p USING (vec_id, nn_id)) AS o)""".stripMargin
    }.mkString(",\n")
    val rows = (for {
      (scorer, pre) <- scorers
      p <- NPROBES
    } yield
      s"""SELECT '$scorer' AS scorer, CAST($p AS INT) AS nprobe,
         |       CAST(n AS BIGINT) AS n_exact_pairs, CAST(o AS BIGINT) AS n_overlap_pairs,
         |       CASE WHEN n = 0 THEN CAST(0 AS BIGINT)
         |            ELSE CAST(floor(10000.0 * o / n) AS BIGINT) END AS recall_bps
         |FROM $pre$p""".stripMargin).mkString("\nUNION ALL\n")
    s"""${kmeansWith(KM_K, KM_ROUNDS)},
       |$pqChainsSql,
       |$pqReconSql,
       |$meanCentsSql,
       |$residSql,
       |$pqResidChainsSql,
       |$residReconSql,
       |$sq8CtesSql,
       |exact AS (SELECT vec_id, nn_id FROM (
       |  SELECT a.vec_id, b.vec_id AS nn_id,
       |         row_number() OVER (PARTITION BY a.vec_id
       |              ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rn
       |  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
       |  WHERE ${cosSql("a.embedding", "b.embedding")} IS NOT NULL)
       |  WHERE rn <= 3),
       |$perP
       |$rows""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q104_pq_adc" -> {
      val adc = pqAdcSql
      s"""WITH $pqChainsSql,
         |$pqReconSql
         |SELECT vec_id, nn_id, adc, rn FROM (
         |  SELECT q.vec_id, r.vec_id AS nn_id, $adc AS adc,
         |         CAST(row_number() OVER (PARTITION BY q.vec_id
         |              ORDER BY $adc DESC, r.vec_id) AS INT) AS rn
         |  FROM embeddings q JOIN recon r ON q.vec_id != r.vec_id
         |  WHERE $adc IS NOT NULL)
         |WHERE rn <= 3""".stripMargin
    },
    // IVFADC: the coarse chain routes (probes = top-NPROBE cells per
    // query), the PQ chains score (same recon + fixed-order fold as
    // q104) — candidates are exactly the probed cells' members.
    "q118_ivfadc" -> ivfadcSql(""),
    // SemDeDup attrition over the trained cells: a{KM_ROUNDS+1} is the
    // final (vec_id, embedding, cid) assignment, exactly the index the
    // Spark side serves from.
    "q137_semdedup" -> {
      val aN = s"a${KM_ROUNDS + 1}"
      s"""${kmeansWith(KM_K, KM_ROUNDS)},
         |rem AS (SELECT DISTINCT b.cid, b.vec_id
         |        FROM $aN a JOIN $aN b ON a.cid = b.cid AND a.vec_id < b.vec_id
         |        WHERE ${cosSql("a.embedding", "b.embedding")} >= $MIN_COS),
         |nrem AS (SELECT cid, count(*) AS n_removed FROM rem GROUP BY cid),
         |tot AS (SELECT cid, count(*) AS n FROM $aN GROUP BY cid)
         |SELECT t.cid, CAST(t.n AS BIGINT) AS n,
         |       CAST(COALESCE(r.n_removed, 0) AS BIGINT) AS n_removed,
         |       CAST(t.n - COALESCE(r.n_removed, 0) AS BIGINT) AS n_kept
         |FROM tot t LEFT JOIN nrem r USING (cid)
         |ORDER BY t.cid""".stripMargin
    },
    // Hard negatives: same-cell, other-label top-3 by cosine; a{N} is
    // the final assignment (vec_id, embedding, cid), labels joined in.
    "q141_hard_negatives" -> {
      val aN = s"a${KM_ROUNDS + 1}"
      val cos = cosSql("a.embedding", "b.embedding")
      s"""${kmeansWith(KM_K, KM_ROUNDS)},
         |lab AS (SELECT c.vec_id, c.cid, c.embedding, e.label
         |        FROM $aN c JOIN embeddings e USING (vec_id))
         |SELECT vec_id, neg_id, CAST(rnk AS INT) AS rnk, cos FROM (
         |  SELECT a.vec_id, b.vec_id AS neg_id, $cos AS cos,
         |         row_number() OVER (PARTITION BY a.vec_id
         |           ORDER BY $cos DESC, b.vec_id) AS rnk
         |  FROM lab a JOIN lab b ON a.cid = b.cid AND a.vec_id != b.vec_id
         |       AND a.label != b.label
         |  WHERE $cos IS NOT NULL)
         |WHERE rnk <= 3""".stripMargin
    },
    // Filtered ANN: same serving path, candidate set additionally
    // restricted by the metadata predicate.
    "q121_filtered_ivfadc" ->
      ivfadcSql(s"JOIN embeddings me ON me.vec_id = ce.vec_id AND me.label <> $FILTER_LABEL"),
    // Residual IVFADC (true IVF-PQ): coarse chain routes, residual
    // chains score — candidates' reconstructions are cell centroid +
    // decoded residual, the Jégou construction.
    "q124_residual_ivfadc" -> {
      val adc = residAdcSql
      s"""${kmeansWith(KM_K, KM_ROUNDS)},
         |$meanCentsSql,
         |$residSql,
         |$pqResidChainsSql,
         |$residReconSql,
         |${probesSql(NPROBE, "")}
         |SELECT vec_id, nn_id, adc, rn FROM (
         |  SELECT q.vec_id, r.vec_id AS nn_id, $adc AS adc,
         |         CAST(row_number() OVER (PARTITION BY q.vec_id
         |              ORDER BY $adc DESC, r.vec_id) AS INT) AS rn
         |  FROM embeddings q
         |  JOIN probes p ON p.vec_id = q.vec_id
         |  JOIN mcents cc ON cc.cid = p.cid
         |  JOIN a${KM_ROUNDS + 1} ce ON ce.cid = p.cid
         |  JOIN rrecon r ON r.vec_id = ce.vec_id AND r.vec_id != q.vec_id
         |  WHERE $adc IS NOT NULL)
         |WHERE rn <= 3""".stripMargin
    },
    // Two-stage serving: residual-ADC shortlist exactly re-ranked by
    // true cosine — mirrors Similarity.ivfAdcRerankKnn (same shortlist
    // ranking as q124 with rn <= RERANK_R, then exact rescoring, ties
    // nn_id asc).
    "q126_adc_rerank" -> {
      val cos = cosSql("q.embedding", "c.embedding")
      s"""${kmeansWith(KM_K, KM_ROUNDS)},
         |$meanCentsSql,
         |$residSql,
         |$pqResidChainsSql,
         |$residReconSql,
         |${probesSql(NPROBE, "")},
         |${residShortSql("")}
         |SELECT vec_id, nn_id, cos, rn FROM (
         |  SELECT s.vec_id, s.nn_id, $cos AS cos,
         |         CAST(row_number() OVER (PARTITION BY s.vec_id
         |              ORDER BY $cos DESC, s.nn_id) AS INT) AS rn
         |  FROM short s
         |  JOIN embeddings q ON q.vec_id = s.vec_id
         |  JOIN embeddings c ON c.vec_id = s.nn_id
         |  WHERE $cos IS NOT NULL)
         |WHERE rn <= 3""".stripMargin
    },
    // Positives = q141's statement with the label predicate flipped;
    // the union is the labeled contrastive relation.
    "q173_contrastive_pairs" -> {
      val aN = s"a${KM_ROUNDS + 1}"
      val cos = cosSql("a.embedding", "b.embedding")
      def leg(pred: String, flag: String): String =
        s"""SELECT vec_id, pair_id, CAST(rnk AS INT) AS rnk, cos,
           |       $flag AS is_positive FROM (
           |  SELECT a.vec_id, b.vec_id AS pair_id, $cos AS cos,
           |         row_number() OVER (PARTITION BY a.vec_id
           |           ORDER BY $cos DESC, b.vec_id) AS rnk
           |  FROM lab a JOIN lab b ON a.cid = b.cid AND a.vec_id != b.vec_id
           |       AND a.label $pred b.label
           |  WHERE $cos IS NOT NULL)
           |WHERE rnk <= 1""".stripMargin
      s"""${kmeansWith(KM_K, KM_ROUNDS)},
         |lab AS (SELECT c.vec_id, c.cid, c.embedding, e.label
         |        FROM $aN c JOIN embeddings e USING (vec_id))
         |${leg("=", "TRUE")}
         |UNION ALL
         |${leg("!=", "FALSE")}""".stripMargin
    },
    // Occupancy audit over the same trained assignment the serving
    // paths read (a{KM_ROUNDS+1}).
    "q168_ivf_occupancy" -> {
      val aN = s"a${KM_ROUNDS + 1}"
      s"""${kmeansWith(KM_K, KM_ROUNDS)},
         |occ AS (SELECT cid, CAST(count(*) AS BIGINT) AS n FROM $aN GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t,
         |               CAST(count(*) AS BIGINT) AS k FROM occ)
         |SELECT cid, n, (100 * n * k) // t AS occupancy_pct_of_mean,
         |       n * k > 2 * t AS overfull
         |FROM occ, tot ORDER BY cid""".stripMargin
    },
    // Top-5 lift tokens per trained cell (q183's rate arithmetic).
    "q193_cluster_labels" -> {
      val aN = s"a${KM_ROUNDS + 1}"
      s"""${kmeansWith(KM_K, KM_ROUNDS)},
         |occ AS (SELECT a.cid, unnest(string_split(d.text, ' ')) AS tok
         |        FROM $aN a JOIN documents d ON d.doc_id = a.vec_id),
         |ct AS (SELECT cid, tok, CAST(count(*) AS BIGINT) AS o
         |       FROM occ GROUP BY 1, 2),
         |cellt AS (SELECT cid, CAST(sum(o) AS BIGINT) AS nc FROM ct GROUP BY 1),
         |tokt AS (SELECT tok, CAST(sum(o) AS BIGINT) AS c FROM ct GROUP BY 1),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM tokt),
         |rated AS (SELECT ct.cid, ct.tok, ct.o,
         |            (ct.o * 1000000) // cellt.nc AS rate_cell_ppm,
         |            (tokt.c * 1000000) // (SELECT n FROM tot) AS rate_corpus_ppm
         |          FROM ct JOIN cellt USING (cid) JOIN tokt USING (tok)
         |          WHERE ct.o >= 3),
         |rk AS (SELECT cid, tok, o, rate_cell_ppm, rate_corpus_ppm,
         |         rate_cell_ppm - rate_corpus_ppm AS lift_ppm,
         |         CAST(row_number() OVER (PARTITION BY cid
         |              ORDER BY rate_cell_ppm - rate_corpus_ppm DESC, tok)
         |           AS BIGINT) AS rn
         |       FROM rated)
         |SELECT cid, rn, tok, o, rate_cell_ppm, rate_corpus_ppm, lift_ppm
         |FROM rk WHERE rn <= 5""".stripMargin
    },
    // Bottom-3-per-cell outlier audit over the trained assignment.
    "q186_embedding_outliers" -> {
      val aN = s"a${KM_ROUNDS + 1}"
      s"""${kmeansWith(KM_K, KM_ROUNDS)},
         |q AS (SELECT vec_id, cid, CAST(floor(cos * 1e6) AS BIGINT) AS cos_q6
         |      FROM $aN),
         |m AS (SELECT cid, CAST(sum(cos_q6) AS BIGINT) // CAST(count(*) AS BIGINT)
         |               AS mean_cos_q6
         |      FROM q GROUP BY 1),
         |r AS (SELECT q.cid, q.vec_id, q.cos_q6, m.mean_cos_q6,
         |        CAST(row_number() OVER (PARTITION BY q.cid
         |             ORDER BY q.cos_q6, q.vec_id) AS BIGINT) AS rn
         |      FROM q JOIN m USING (cid))
         |SELECT cid, rn, vec_id, cos_q6, mean_cos_q6,
         |       mean_cos_q6 - cos_q6 AS gap_q6
         |FROM r WHERE rn <= 3""".stripMargin
    },
    // Filtered two-stage serving: q126's statement with the metadata
    // predicate restricting the shortlist's candidate members.
    "q161_filtered_rerank" -> {
      val cos = cosSql("q.embedding", "c.embedding")
      s"""${kmeansWith(KM_K, KM_ROUNDS)},
         |$meanCentsSql,
         |$residSql,
         |$pqResidChainsSql,
         |$residReconSql,
         |${probesSql(NPROBE, "")},
         |${residShortSql("",
             s"JOIN embeddings me ON me.vec_id = ce.vec_id AND me.label <> $FILTER_LABEL")}
         |SELECT vec_id, nn_id, cos, rn FROM (
         |  SELECT s.vec_id, s.nn_id, $cos AS cos,
         |         CAST(row_number() OVER (PARTITION BY s.vec_id
         |              ORDER BY $cos DESC, s.nn_id) AS INT) AS rn
         |  FROM short s
         |  JOIN embeddings q ON q.vec_id = s.vec_id
         |  JOIN embeddings c ON c.vec_id = s.nn_id
         |  WHERE $cos IS NOT NULL)
         |WHERE rn <= 3""".stripMargin
    },
    // ADC recall: all four served scorers (raw-PQ q118, residual-PQ
    // q124, exactly-re-ranked shortlist q126, SQ8 q153) at each probe
    // width vs the guarded exact baseline — one integral row per
    // (scorer, nprobe).
    "q123_adc_recall" -> adcRecallOracle(Seq("adc_raw" -> "sraw",
      "adc_residual" -> "sres", "adc_rerank" -> "srer", "sq8" -> "ssq8")),
    // The per-scorer ledger twins (q257-q260): the IDENTICAL statement
    // filtered to one codec's branch — DuckDB prunes the unreferenced
    // scorers' CTEs, so each oracle pays its own serving chain plus the
    // shared training chains only.
    "q257_adc_recall_raw" -> adcRecallOracle(Seq("adc_raw" -> "sraw")),
    "q258_adc_recall_residual" -> adcRecallOracle(Seq("adc_residual" -> "sres")),
    "q259_adc_recall_rerank" -> adcRecallOracle(Seq("adc_rerank" -> "srer")),
    "q260_adc_recall_sq8" -> adcRecallOracle(Seq("sq8" -> "ssq8")),
    // Incremental maintenance: train on the retained 90%, argmax-assign
    // the held-out arrivals against the FINAL centroids (top-1, ties
    // cid asc, zero-norm dropped) — mirrors Similarity.assignToCells.
    "q120_ivf_assign_new" ->
      s"""${kmeansWith(KM_K, KM_ROUNDS, s"vec_id % 10 <> $NEW_MOD")},
         |newv AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = $NEW_MOD)
         |SELECT vec_id, cid, cos FROM (
         |  SELECT n.vec_id, c.cid,
         |         ${cosSql("n.embedding", "c.centroid")} AS cos,
         |         row_number() OVER (PARTITION BY n.vec_id
         |           ORDER BY ${cosSql("n.embedding", "c.centroid")} DESC, c.cid) AS rn
         |  FROM newv n CROSS JOIN cents$KM_ROUNDS c
         |  WHERE ${cosSql("n.embedding", "c.centroid")} IS NOT NULL)
         |WHERE rn = 1""".stripMargin,
    // Recall-vs-nprobe curve: for each p, probed-IVF top-3 within the
    // probed cells' members vs the exact top-3; integral stats per p.
    "q119_ivf_nprobe_recall" -> {
      val perP = NPROBES.map { p =>
        s"""${probesSql(p, s"$p")},
           |ivf$p AS (SELECT vec_id, nn_id FROM (
           |  SELECT q.vec_id, b.vec_id AS nn_id,
           |         row_number() OVER (PARTITION BY q.vec_id
           |           ORDER BY ${cosSql("q.embedding", "b.embedding")} DESC, b.vec_id) AS rn
           |  FROM emb q JOIN probes$p pr ON pr.vec_id = q.vec_id
           |       JOIN a${KM_ROUNDS + 1} b ON b.cid = pr.cid AND b.vec_id != q.vec_id
           |  WHERE ${cosSql("q.embedding", "b.embedding")} IS NOT NULL)
           |  WHERE rn <= 3),
           |stats$p AS (SELECT (SELECT count(*) FROM exact) AS n_exact_pairs,
           |                   (SELECT count(*) FROM exact JOIN ivf$p USING (vec_id, nn_id)) AS n_overlap_pairs)""".stripMargin
      }.mkString(",\n")
      val rows = NPROBES.map { p =>
        s"""SELECT CAST($p AS INT) AS nprobe,
           |       CAST(n_exact_pairs AS BIGINT) AS n_exact_pairs,
           |       CAST(n_overlap_pairs AS BIGINT) AS n_overlap_pairs,
           |       CASE WHEN n_exact_pairs = 0 THEN CAST(0 AS BIGINT)
           |            ELSE CAST(floor(10000.0 * n_overlap_pairs / n_exact_pairs) AS BIGINT)
           |       END AS recall_bps
           |FROM stats$p""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""${kmeansWith(KM_K, KM_ROUNDS)},
         |exact AS (SELECT vec_id, nn_id FROM (
         |  SELECT a.vec_id, b.vec_id AS nn_id,
         |         row_number() OVER (PARTITION BY a.vec_id
         |              ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rn
         |  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} IS NOT NULL)
         |  WHERE rn <= 3),
         |$perP
         |$rows""".stripMargin
    },
    "q236_kmeanspp_seeds" ->
      s"""WITH $kmppChainSql
         |SELECT CAST(cid AS INT) AS cid, cand_id AS seed_id, weight
         |FROM top WHERE cid <= 8""".stripMargin,
    "q239_seed_occupancy" -> {
      def assignSql(seeds: String) =
        s"""SELECT cand_id, CAST(count(*) AS BIGINT) AS sz FROM (
           |  SELECT vec_id, cand_id FROM (
           |    SELECT e.vec_id, c.cand_id,
           |      row_number() OVER (PARTITION BY e.vec_id
           |        ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC,
           |                 c.cand_id) AS rn
           |    FROM emb e CROSS JOIN $seeds c
           |    WHERE ${cosSql("e.embedding", "c.cvec")} IS NOT NULL)
           |  WHERE rn = 1) GROUP BY 1""".stripMargin
      def occSql(rel: String, method: String) =
        s"""SELECT '$method' AS method,
           |  CAST(count(*) AS BIGINT) AS n_cells,
           |  CAST(MAX(sz) AS BIGINT) AS largest,
           |  CAST(MIN(sz) AS BIGINT) AS smallest,
           |  CAST((MAX(sz) * 8 * 10000) // SUM(sz) AS BIGINT) AS skew_bps
           |FROM $rel""".stripMargin
      s"""WITH $kmppChainSql,
         |mseed AS (SELECT vec_id AS cand_id, embedding AS cvec FROM emb
         |          ORDER BY vec_id LIMIT 8),
         |pseed AS (SELECT t.cand_id, e.embedding AS cvec
         |          FROM top t JOIN emb e ON e.vec_id = t.cand_id
         |          WHERE t.cid <= 8),
         |szm AS (${assignSql("mseed")}),
         |szp AS (${assignSql("pseed")})
         |${occSql("szm", "minid")}
         |UNION ALL
         |${occSql("szp", "kmpp")}""".stripMargin
    },
    "q97_pq_encode" -> {
      val chains = (0 until PQ_M).map { i =>
        kmeansWithSub(PQ_K, PQ_ROUNDS, i * PQ_SUB + 1, (i + 1) * PQ_SUB, s"_s${i}_")
      }.mkString(",\n")
      val cols = (0 until PQ_M).map { i =>
        s"s$i.cid AS code$i, s$i.cos AS cos$i"
      }.mkString(",\n           ")
      val joins = (1 until PQ_M).map { i =>
        s"JOIN a_s${i}_${PQ_ROUNDS + 1} s$i USING (vec_id)"
      }.mkString("\n         ")
      s"""WITH $chains
         |SELECT vec_id, $cols
         |FROM a_s0_${PQ_ROUNDS + 1} s0
         |$joins""".stripMargin
    },
    "q72_kmeans_assign" ->
      s"""${kmeansWith(8, 1)}
         |SELECT vec_id, cid AS cluster, cos FROM a2""".stripMargin,
    "q76_ivf_trained" ->
      s"""${kmeansWith(KM_K, KM_ROUNDS)}
         |SELECT cluster, vec_id, nn_id, cos, rn FROM (
         |  SELECT a.cid AS cluster, a.vec_id, b.vec_id AS nn_id,
         |         ${cosSql("a.embedding", "b.embedding")} AS cos,
         |         CAST(row_number() OVER (PARTITION BY a.vec_id
         |              ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS INT) AS rn
         |  FROM a${KM_ROUNDS + 1} a JOIN a${KM_ROUNDS + 1} b
         |    ON a.cid = b.cid AND a.vec_id != b.vec_id)
         |WHERE rn <= 3""".stripMargin,
    "q86_ann_recall" ->
      s"""${kmeansWith(KM_K, KM_ROUNDS)},
         |exact AS (SELECT vec_id, nn_id FROM (
         |  SELECT a.vec_id, b.vec_id AS nn_id,
         |         row_number() OVER (PARTITION BY a.vec_id
         |              ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rn
         |  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} IS NOT NULL)
         |  WHERE rn <= 3),
         |ivf AS (SELECT vec_id, nn_id FROM (
         |  SELECT a.vec_id, b.vec_id AS nn_id,
         |         row_number() OVER (PARTITION BY a.vec_id
         |              ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS rn
         |  FROM a${KM_ROUNDS + 1} a JOIN a${KM_ROUNDS + 1} b
         |    ON a.cid = b.cid AND a.vec_id != b.vec_id
         |  WHERE ${cosSql("a.embedding", "b.embedding")} IS NOT NULL)
         |  WHERE rn <= 3),
         |stats AS (SELECT (SELECT count(*) FROM exact) AS n_exact_pairs,
         |                 (SELECT count(*) FROM exact JOIN ivf USING (vec_id, nn_id)) AS n_overlap_pairs)
         |SELECT CAST(n_exact_pairs AS BIGINT) AS n_exact_pairs,
         |       CAST(n_overlap_pairs AS BIGINT) AS n_overlap_pairs,
         |       CASE WHEN n_exact_pairs = 0 THEN CAST(0 AS BIGINT)
         |            ELSE CAST(floor(10000.0 * n_overlap_pairs / n_exact_pairs) AS BIGINT)
         |       END AS recall_bps
         |FROM stats""".stripMargin,
    // Mirrors Similarity.jlProjectionAudit: the same md5-derived sign
    // matrix, every fold in ascending (i, j) order via ordered list()
    // + list_reduce, the same association in the ratio — projected
    // doubles are bit-identical, so even the float-derived outputs
    // quantize identically.
    "q135_jl_projection" ->
      s"""WITH $jlCtesSql,
         |ny AS (SELECT vec_id,
         |         list_reduce(list_prepend(CAST(0 AS DOUBLE), list(y * y ORDER BY j)),
         |           (p, q) -> p + q) AS ny2,
         |         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |                list(CAST(floor(y * 1000000.0) AS BIGINT) ORDER BY j)),
         |              (p, q) -> p + q) AS BIGINT) AS proj_acc
         |       FROM yv GROUP BY vec_id),
         |nx AS (SELECT vec_id,
         |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |             list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
         |           (p, q) -> p + q) AS nx2
         |       FROM embeddings)
         |SELECT n.vec_id,
         |  CASE WHEN nx2 != 0
         |       THEN CAST(floor(1000000.0 * ny2 / (CAST($JL_DIM AS DOUBLE) * nx2)) AS BIGINT)
         |  END AS ratio_q6,
         |  proj_acc
         |FROM ny n JOIN nx USING (vec_id)""".stripMargin,

    // Mirrors q136: project (shared JL CTEs), round each coordinate to
    // FLOAT (same IEEE round-to-nearest as the Spark cast), rank
    // pairwise in projected space with the standard guarded cosine,
    // overlap vs the exact 64-dim baseline.
    "q136_jl_search_recall" -> {
      val pcos = cosSql("a.pvec", "b.pvec")
      val ecos = cosSql("a.embedding", "b.embedding")
      s"""WITH $jlCtesSql,
         |pv AS (SELECT vec_id, list(CAST(y AS FLOAT) ORDER BY j) AS pvec
         |       FROM yv GROUP BY vec_id),
         |exact AS (SELECT vec_id, nn_id FROM (
         |  SELECT a.vec_id, b.vec_id AS nn_id,
         |         row_number() OVER (PARTITION BY a.vec_id
         |              ORDER BY $ecos DESC, b.vec_id) AS rn
         |  FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
         |  WHERE $ecos IS NOT NULL)
         |  WHERE rn <= 3),
         |pk AS (SELECT vec_id, nn_id FROM (
         |  SELECT a.vec_id, b.vec_id AS nn_id,
         |         row_number() OVER (PARTITION BY a.vec_id
         |              ORDER BY $pcos DESC, b.vec_id) AS rn
         |  FROM pv a JOIN pv b ON a.vec_id != b.vec_id
         |  WHERE $pcos IS NOT NULL)
         |  WHERE rn <= 3),
         |stats AS (SELECT (SELECT count(*) FROM exact) AS n_exact_pairs,
         |                 (SELECT count(*) FROM exact JOIN pk USING (vec_id, nn_id)) AS n_overlap_pairs)
         |SELECT CAST(n_exact_pairs AS BIGINT) AS n_exact_pairs,
         |       CAST(n_overlap_pairs AS BIGINT) AS n_overlap_pairs,
         |       CASE WHEN n_exact_pairs = 0 THEN CAST(0 AS BIGINT)
         |            ELSE CAST(floor(10000.0 * n_overlap_pairs / n_exact_pairs) AS BIGINT)
         |       END AS recall_bps
         |FROM stats""".stripMargin
    },

    // Mirrors q133: the oracle has no warehouse, so it re-derives the
    // SAME trained index (kmeans CTE chain) and runs the same probed
    // exact-scored search — a hash match proves the persisted copy
    // served identically to the from-scratch build.
    "q133_persisted_serving" -> {
      val cos = cosSql("q.embedding", "c.embedding")
      s"""${kmeansWith(KM_K, KM_ROUNDS)},
         |${probesSql(NPROBE, "")}
         |SELECT vec_id, nn_id, cos, rn FROM (
         |  SELECT q.vec_id, c.vec_id AS nn_id, $cos AS cos,
         |         CAST(row_number() OVER (PARTITION BY q.vec_id
         |              ORDER BY $cos DESC, c.vec_id) AS INT) AS rn
         |  FROM embeddings q
         |  JOIN probes p ON p.vec_id = q.vec_id
         |  JOIN a${KM_ROUNDS + 1} ce ON ce.cid = p.cid
         |  JOIN embeddings c ON c.vec_id = ce.vec_id AND c.vec_id != q.vec_id
         |  WHERE $cos IS NOT NULL)
         |WHERE rn <= 3""".stripMargin
    },

    // Mirrors q155_source_map: per-source 1e-6-grid integer centroids,
    // bounded pairwise stage, quantized cosine with mirrored
    // association.
    "q155_source_map" ->
      """WITH q AS (SELECT d2.source, e.vec_id, e.embedding
                    FROM embeddings e JOIN documents d2 ON d2.doc_id = e.vec_id),
         pd AS (SELECT source, i AS pos,
                  CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0)
                       AS BIGINT)) AS BIGINT) AS sm,
                  count(*) AS n
                FROM q, generate_series(1, 64) t(i) GROUP BY 1, 2),
         m AS (SELECT source, pos, sm // n AS mean_q FROM pd),
         proto AS (SELECT source, list(mean_q ORDER BY pos) AS proto
                   FROM m GROUP BY 1),
         sc AS (SELECT a.source AS src_1, b.source AS src_2,
                  list_reduce(list_transform(list_zip(a.proto, b.proto),
                    x -> x[1] * x[2]), (p, q) -> p + q) AS dot,
                  list_reduce(list_transform(a.proto, x -> x * x),
                    (p, q) -> p + q) AS n2_1,
                  list_reduce(list_transform(b.proto, x -> x * x),
                    (p, q) -> p + q) AS n2_2
                FROM proto a JOIN proto b ON a.source < b.source)
         SELECT src_1, src_2, CAST(dot AS BIGINT) AS dot,
           CAST(n2_1 AS BIGINT) AS n2_1, CAST(n2_2 AS BIGINT) AS n2_2,
           CASE WHEN n2_1 > 0 AND n2_2 > 0
                THEN CAST(floor(CAST(dot AS DOUBLE)
                       / sqrt(CAST(n2_1 AS DOUBLE))
                       / sqrt(CAST(n2_2 AS DOUBLE)) * 1000000.0) AS BIGINT)
           END AS cos_q6
         FROM sc""",

    // Mirrors Similarity.classMeanProbe: 1e-6-grid quantized vectors,
    // integer-mean prototypes (// truncates toward zero, same as
    // Spark's div), integer L2, argmin with plabel tie-break.
    "q129_ncm_probe" ->
      """WITH v AS (SELECT vec_id, label, pos,
           CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1000000.0) AS BIGINT) AS q
         FROM (SELECT vec_id, label, embedding,
                 unnest(generate_series(1, len(embedding))) AS pos
               FROM embeddings)),
         p AS (SELECT label AS plabel, pos,
                 CAST(CAST(SUM(q) AS BIGINT) // count(*) AS BIGINT) AS mean_q
               FROM v GROUP BY 1, 2),
         d AS (SELECT v.vec_id, v.label, p.plabel,
                 CAST(SUM((v.q - p.mean_q) * (v.q - p.mean_q)) AS BIGINT) AS dist
               FROM v JOIN p ON v.pos = p.pos
               GROUP BY 1, 2, 3),
         pr AS (SELECT vec_id, label, plabel AS pred_label,
                  row_number() OVER (PARTITION BY vec_id ORDER BY dist, plabel) AS rn
                FROM d)
         SELECT label, pred_label, count(*) AS n
         FROM pr WHERE rn = 1 GROUP BY 1, 2""",
    "q50_cosine_knn" ->
      s"""SELECT vec_id, nn_id, cos, rn FROM (
           SELECT a.vec_id, b.vec_id AS nn_id,
                  ${cosSql("a.embedding", "b.embedding")} AS cos,
                  CAST(row_number() OVER (PARTITION BY a.vec_id
                       ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS INT) AS rn
           FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
           WHERE ${cosSql("a.embedding", "b.embedding")} IS NOT NULL)
         WHERE rn <= 3""",
    "q179_knn_label_eval" ->
      s"""WITH knn AS (SELECT vec_id, nn_id, rn FROM (
           SELECT a.vec_id, b.vec_id AS nn_id,
                  CAST(row_number() OVER (PARTITION BY a.vec_id
                       ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS INT) AS rn
           FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
           WHERE ${cosSql("a.embedding", "b.embedding")} IS NOT NULL)
         WHERE rn <= 3),
         per AS (SELECT k.vec_id, qa.label AS qlabel,
                   sum(CASE WHEN qb.label = qa.label THEN 1 ELSE 0 END) AS hits,
                   min(CASE WHEN qb.label = qa.label THEN rn END) AS first_rank
                 FROM knn k
                 JOIN embeddings qa ON qa.vec_id = k.vec_id
                 JOIN embeddings qb ON qb.vec_id = k.nn_id
                 GROUP BY 1, 2),
         sc AS (SELECT qlabel AS label,
                  (hits * 10000) // 3 AS precision_bps,
                  COALESCE(1000000 // first_rank, 0) AS mrr_ppm
                FROM per)
       SELECT label, count(*) AS n_queries,
              CAST(CAST(sum(precision_bps) AS BIGINT) // count(*) AS BIGINT)
                AS mean_precision_bps,
              CAST(CAST(sum(mrr_ppm) AS BIGINT) // count(*) AS BIGINT)
                AS mean_mrr_ppm
       FROM sc GROUP BY 1""",
    // Mirrors Similarity.sq8IvfKnn: the coarse chain routes (top-NPROBE
    // cells per query), candidates are the probed cells' members scored
    // asymmetrically against their SQ8 midpoint reconstructions.
    "q153_sq8_knn" -> sq8RoutedServeSql,
    // Persisted-model serving ≡ from-scratch: the oracle KNOWS NOTHING
    // about the snapshot files — it rebuilds model + serve in SQL, so a
    // green hash proves the save→load round-trip changed nothing.
    "q211_persisted_pq_serving" -> ivfadcSql(""),
    "q212_persisted_sq8_serving" -> sq8RoutedServeSql,
    "q51_ann_lsh" ->
      s"""WITH bk AS (SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings)
         SELECT a.vec_id AS id_1, b.vec_id AS id_2,
                ${cosSql("a.embedding", "b.embedding")} AS cos
         FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         WHERE ${cosSql("a.embedding", "b.embedding")} >= $MIN_COS""",
    "q245_multiprobe_lsh" -> {
      val flipSelects = (0 to BITS).map { i =>
        if (i == 0) "SELECT vec_id, bucket AS pb FROM bk"
        else s"""SELECT vec_id, substr(bucket, 1, ${i - 1}) ||
                 (CASE WHEN substr(bucket, $i, 1) = '1' THEN '0' ELSE '1' END) ||
                 substr(bucket, ${i + 1}, ${BITS - i}) AS pb FROM bk"""
      }.mkString("\n UNION ALL ")
      s"""WITH bk AS (SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings),
         |probes AS ($flipSelects),
         |cand AS (SELECT DISTINCT p.vec_id AS id_1, b.vec_id AS id_2
         |         FROM probes p JOIN bk b ON p.pb = b.bucket
         |         WHERE p.vec_id < b.vec_id)
         |SELECT c.id_1, c.id_2,
         |       ${cosSql("a.embedding", "b.embedding")} AS cos
         |FROM cand c
         |JOIN bk a ON a.vec_id = c.id_1
         |JOIN bk b ON b.vec_id = c.id_2
         |WHERE ${cosSql("a.embedding", "b.embedding")} >= $MIN_COS""".stripMargin
    },
    "q52_lsh_buckets" ->
      s"""SELECT $bucketSql AS bucket, count(*) AS n_vecs
         FROM embeddings GROUP BY 1""",
    "q57_ivf_knn" ->
      s"""SELECT cluster, vec_id, nn_id, cos, rn FROM (
           SELECT a.label AS cluster, a.vec_id, b.vec_id AS nn_id,
                  ${cosSql("a.embedding", "b.embedding")} AS cos,
                  CAST(row_number() OVER (PARTITION BY a.vec_id
                       ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS INT) AS rn
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id != b.vec_id)
         WHERE rn <= 3""",
    "q59_blocked_knn" ->
      s"""WITH bk AS (SELECT vec_id, embedding, $bucketSql AS bucket FROM embeddings)
         SELECT bucket, vec_id, nn_id, cos, rn FROM (
           SELECT a.bucket, a.vec_id, b.vec_id AS nn_id,
                  ${cosSql("a.embedding", "b.embedding")} AS cos,
                  CAST(row_number() OVER (PARTITION BY a.vec_id
                       ORDER BY ${cosSql("a.embedding", "b.embedding")} DESC, b.vec_id) AS INT) AS rn
           FROM bk a JOIN bk b
             ON a.bucket = b.bucket AND a.vec_id != b.vec_id)
         WHERE rn <= 3"""
  )
}
