package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Deduplication surface over `documents`: exact, n-gram Jaccard,
  * MinHash+LSH, SimHash. The DuckDB oracles rebuild the identical
  * hash-math (md5-based) so results hash-match exactly.
  */
object DedupQueries extends QueryPack {

  private val K = 8      // minhash functions
  private val BANDS = 4  // LSH bands (rows per band = K/BANDS = 2)
  private val MIN_JACCARD = 0.2
  private val MAX_SHINGLE_DF = 25  // q58/q175: drop shingles hotter than this
  private val MIN_RUN_TOKENS = 8   // q175: shortest reportable shared run
  // q246: containment verification pays candidates × shingles-per-doc,
  // and this corpus's ~31-word vocabulary makes rare-shingle pair
  // density pathological (~9% of all doc pairs at sf0.1 — SURVEY §4).
  // Above this bound the candidate set is deterministically
  // hash-sampled down to ~CAP pairs (integer-mixer mod k, mirrored
  // verbatim by the oracle); below it the audit runs unsampled — at
  // sf0.01 the candidate count sits under the bound, so the gate
  // hashes the exact form there.
  private val CONTAIN_CAND_CAP = 50000L

  // q219: every (bands, rows_per_band) factorization of the K-hash
  // signature the auto-tuner scores
  private val LSH_CONFIGS = Seq((8, 1), (4, 2), (2, 4), (1, 8))

  /** x^e at fixed-point ppm scale with TRUNCATING division after every
    * multiply — x·x div 1e6, then ·x div 1e6, … — emitted as an
    * expression string so the identical arithmetic runs in Spark
    * (`div`) and DuckDB (`//`). Integer ops are exact, so unlike libm
    * pow the curve is bit-identical across engines.
    */
  private def powPpmExpr(v: String, e: Int, div: String): String =
    (2 to e).foldLeft(v)((acc, _) => s"(($acc * $v) $div 1000000)")

  /** Verified near-dup pairs (id_1, id_2, jaccard), computed ONCE per
    * (session, corpus) and shared by q46 (publishes them), q68
    * (clusters them) and q80 (filters by them) — a dedup pass over one
    * corpus is one index build, not one per consumer. Same bounded
    * registry as the similarity model caches ([[QueryCaches]]);
    * deterministic pipeline, so caching cannot change any result.
    */
  private val pairsCache = QueryCaches.newCache[org.apache.spark.sql.DataFrame]()
  private[operators] def nearDupPairs(s: org.apache.spark.sql.SparkSession,
                           d: String): org.apache.spark.sql.DataFrame =
    QueryCaches.cached(pairsCache, s, d)(
      // spread the scan ([[KernelPar.spread]]): the per-shingle md5
      // signature hashing runs map-side of the first exchange, i.e. at
      // the scan's byte-derived split count — near-serial on a small
      // corpus file
      Dedup.minhashLshNearDups(KernelPar.spread(Tables.documents(s, d)),
        "text", "doc_id",
        ngram = 3, k = K, bands = BANDS, minJaccard = MIN_JACCARD)
        .localCheckpoint(true))

  /** The distinct (doc, 3-gram shingle) relation q45/q58/q84 all start
    * from, materialized once per (session, corpus).
    */
  private val shingleCache = QueryCaches.newCache[org.apache.spark.sql.DataFrame]()
  private[operators] def shingles(s: org.apache.spark.sql.SparkSession,
                       d: String): org.apache.spark.sql.DataFrame =
    QueryCaches.cached(shingleCache, s, d)(
      Dedup.shingleTable(Tables.documents(s, d), "text", "doc_id", 3)
        .localCheckpoint(true))

  /** The slot-capped rare-shingle candidate pairs q246 audits —
    * computed ONCE per (session, corpus), like [[nearDupPairs]]: the
    * engulfed-document review queue is a dedup-index artifact, not a
    * per-query scan. k derives from the pair-SLOT count Σ nd·(nd−1)/2
    * (known before any pair materializes), the integer-mixer sample
    * runs BEFORE the distinct, and the DuckDB oracle recomputes the
    * same k from the same slot arithmetic (adversarial-corpus bound,
    * VERDICT r9 item 6; k = 1 at sf0.01 → exact audit there).
    * Deterministic pipeline, so caching cannot change any result;
    * trained in the `warm_contain_cands` bench row.
    */
  private val containCandsCache = QueryCaches.newCache[org.apache.spark.sql.DataFrame]()
  private[operators] def containCands(s: org.apache.spark.sql.SparkSession,
                                      d: String): org.apache.spark.sql.DataFrame =
    QueryCaches.cached(containCandsCache, s, d)(
      Dedup.sharedShingleCandidatesSampled(
        shingles(s, d), "doc_id", MAX_SHINGLE_DF, CONTAIN_CAND_CAP)
        .localCheckpoint(true))

  val queries: Map[String, Q] = Map(
    // Exact dedup: fingerprint group-by with keeper id + dup count.
    "q44_dedup_exact" -> ((s, d) =>
      Dedup.exactGroups(Tables.documents(s, d), "text", "doc_id")),

    // Exact pairwise word-3-gram Jaccard near-dups (the verification
    // primitive; all-pairs via shingle join only below LSH scale).
    "q45_ngram_jaccard" -> ((s, d) =>
      Dedup.jaccardPairs(shingles(s, d), "doc_id", MIN_JACCARD)),

    // MinHash signatures + LSH banding + exact-Jaccard verification
    // (served from the shared per-(session, corpus) pairs cache).
    "q46_minhash_lsh" -> ((s, d) => nearDupPairs(s, d)),

    // FUZZY decontamination: near-dup pairs BETWEEN the q81 train/eval
    // splits through one shared LSH index — exact decontamination (q83)
    // misses paraphrased/reformatted leakage; this catches anything at
    // shingle-Jaccard ≥ 0.2. Sides split before the candidate join, so
    // train-side internal duplication (the dominant density in web
    // corpora) never reaches verification.
    "q144_near_decontaminate" -> ((s, d) => {
      // Derived from the SHARED whole-corpus pair relation
      // ([[nearDupPairs]] — the same cached build q46/q68/q80/q145/q217
      // ride): minhash signatures and band keys are per-document, so
      // the cross-corpus pair set is EXACTLY the mixed-side slice of
      // the full LSH pair relation (guide §2.4: operators keyed the
      // same way share one build). The previous body re-shingled and
      // re-signatured the whole corpus through a second
      // crossCorpusNearDups pipeline per run.
      val bucket = graft.functions.TextFunctions.md5Bucket10(col("doc_id"))
      val sides = Tables.documents(s, d).select(col("doc_id"),
        when(bucket < 9, "train").otherwise("eval").as("split"))
      nearDupPairs(s, d)
        .join(sides.select(col("doc_id").as("id_1"), col("split").as("split_1")), "id_1")
        .join(sides.select(col("doc_id").as("id_2"), col("split").as("split_2")), "id_2")
        .filter(col("split_1") =!= col("split_2"))
        .select(
          when(col("split_1") === "train", col("id_1")).otherwise(col("id_2")).as("train_id"),
          when(col("split_1") === "train", col("id_2")).otherwise(col("id_1")).as("eval_id"),
          col("jaccard"))
    }),

    // 16-bit SimHash fingerprints per document.
    "q47_simhash" -> ((s, d) =>
      Dedup.simhash16(Tables.documents(s, d), "text", "doc_id")),

    // SimHash near-dup pairs at Hamming ≤ 3, candidates via pigeonhole
    // block equi-join (no cross product — TextDedupSpec asserts the plan).
    "q48_simhash_pairs" -> ((s, d) =>
      Dedup.simhashPairs(Dedup.simhash16(Tables.documents(s, d), "text", "doc_id"),
        "doc_id", maxHamming = 3)),

    // q48's corpus-scale twin: 60-bit fingerprints → 15-bit pigeonhole
    // blocks (32k values each), so candidate buckets stay sparse where
    // the 16-bit fingerprint's 4-bit blocks congest into O(n²/16) pairs.
    "q65_simhash_wide_pairs" -> ((s, d) =>
      Dedup.simhashPairs(
        Dedup.simhashWide(Tables.documents(s, d), "text", "doc_id", bits = 60),
        "doc_id", maxHamming = 3, bits = 60)),

    // q45's scale-safe twin: identical Jaccard pipeline with the
    // hot-shingle cap ON — a shingle present in > MAX_SHINGLE_DF docs
    // carries no dedup signal but emits df²/2 candidate rows, so the
    // 100 TB run always caps. The oracle applies the identical df filter.
    "q58_jaccard_capped" -> ((s, d) =>
      Dedup.jaccardPairs(shingles(s, d), "doc_id", MIN_JACCARD,
        maxShingleDf = Some(MAX_SHINGLE_DF))),

    // The step AFTER pair generation: connected components over the
    // verified LSH near-dup pairs → one cluster id (min doc_id) and a
    // cluster size per document. The keeper policy "keep cluster_id,
    // drop the rest" is then a filter.
    "q68_dedup_clusters" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = nearDupPairs(s, d).select(col("id_1"), col("id_2"))
      val cc = Dedup.connectedComponents(pairs, docs.select(col("doc_id")), "doc_id")
      val sizes = cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
      cc.join(sizes, "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    }),

    // q68's long-diameter twin: Hash-to-Min connected components over
    // a CHAIN graph (docs linked to their doc_id-successor within a
    // lang → diameter = |lang| − 1, 63-217 at sf0.01, far past the
    // min-label operator's 25-round bound). Converges in O(log d)
    // rounds; the same-shape q68 operator provably throws here
    // (TextDedupSpec pins both facts).
    "q158_cc_hash_to_min" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      val edges = docs.select(col("doc_id").as("src"),
        lead(col("doc_id"), 1).over(w).as("dst")).where(col("dst").isNotNull)
      val cc = Dedup.connectedComponentsHashToMin(
        edges, docs.select(col("doc_id")), "doc_id")
      val sizes = cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
      cc.join(sizes, "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    }),

    // q158's SAME chain graph through alternating large-star /
    // small-star CC (Kiveris et al. 2014) — the O(n+m)-per-round
    // long-diameter algorithm. Hash-to-Min's cluster-set state has a
    // measured 200× transient on these chains (14,990 rows ballooning
    // to 3.05M mid-convergence before collapsing — see
    // Dedup.connectedComponentsAlternatingStar's scaladoc); the star
    // rounds carry parent-pointer edges only, so the relation NEVER
    // exceeds the seed size and the same answer lands in a fraction of
    // the task time. Identical output contract and oracle as q158:
    // both converge to min-id labels.
    "q255_cc_alternating_star" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      val edges = docs.select(col("doc_id").as("src"),
        lead(col("doc_id"), 1).over(w).as("dst")).where(col("dst").isNotNull)
      val cc = Dedup.connectedComponentsAlternatingStar(
        edges, docs.select(col("doc_id")), "doc_id")
      val sizes = cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("cluster_size"))
      cc.join(sizes, "cluster_id")
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    }),

    // Exact-substring near-dup detection (Lee et al. 2022 ExactSubstr,
    // arXiv:2107.06499): longest verbatim shared token run per
    // candidate pair — the quoted-paragraph signal whole-doc Jaccard
    // dilutes below every threshold. Runs are consecutive-diagonal
    // islands over the positional shingle match relation; candidates
    // come from the shingle relation ITSELF (any shared df-capped
    // shingle ⇒ candidate — document-level LSH would structurally miss
    // the advertised target, a quoted run between pages whose whole-doc
    // Jaccard never clears the band threshold); the
    // fused posting-list form skips the candidate×position re-join —
    // same relation, an order of magnitude less shuffle.
    "q175_exact_substring" -> ((s, d) =>
      Dedup.exactSubstrRuns(
        Dedup.positionalShingleTable(Tables.documents(s, d), "text", "doc_id", 3),
        MAX_SHINGLE_DF, n = 3, minTokens = MIN_RUN_TOKENS)),

    // MinHash estimator calibration — for every LSH candidate pair,
    // the number of matching signature components m (the sketch's
    // Jaccard estimate, m/K) against the TRUE shingle Jaccard, grouped
    // into the calibration curve (m → mean true similarity). This is
    // how a deployment picks K and the band threshold with evidence
    // instead of the textbook formula: if mean_true_bps at m=6/8 sits
    // under the dedup threshold, bands are too loose. Integer-exact
    // (both sides in bps via BIGINT div); work is candidate-bounded —
    // two K-column signature equi-joins plus the verification
    // intersection the pipeline already pays.
    "q184_minhash_calibration" -> ((s, d) => {
      val sh = shingles(s, d)
      val sigs = Dedup.minhashSignatures(sh, "doc_id", K)
      val cands = Dedup.lshCandidatePairs(sigs, "doc_id", BANDS, K / BANDS)
      val sets = sh.groupBy(col("doc_id")).agg(collect_set(col("shingle")).as("sset"))
      val withJ = cands
        .join(sets.select(col("doc_id").as("id_1"), col("sset").as("s1")), "id_1")
        .join(sets.select(col("doc_id").as("id_2"), col("sset").as("s2")), "id_2")
        .select(col("id_1"), col("id_2"),
          size(array_intersect(col("s1"), col("s2"))).cast("long").as("inter"),
          (size(col("s1")) + size(col("s2"))).cast("long").as("sz"))
        .select(col("id_1"), col("id_2"),
          expr("(10000 * inter) div (sz - inter)").as("true_bps"))
      val aSig = sigs.toDF(("id_1" +: (0 until K).map(i => s"a$i")): _*)
      val bSig = sigs.toDF(("id_2" +: (0 until K).map(i => s"b$i")): _*)
      val m = (0 until K).map(i =>
        when(col(s"a$i") === col(s"b$i"), 1L).otherwise(0L)).reduce(_ + _)
      withJ.join(aSig, "id_1").join(bSig, "id_2")
        .select(col("true_bps"), m.as("m"))
        .groupBy(col("m"))
        .agg(count(lit(1)).as("n_pairs"),
          expr("sum(true_bps) div count(1)").as("mean_true_bps"))
        .select(col("m").as("n_matching"),
          expr(s"(m * 10000) div $K").as("est_bps"),
          col("n_pairs"), col("mean_true_bps"))
    }),

    // Centrality over the near-dup graph: fixed-round integer PageRank
    // on the symmetrized SimHash pair edges (q48's exact pair set) —
    // the canonical-representative signal a curation pass uses instead
    // of min-id (the most-linked member of a template family is its
    // best exemplar; heavy boilerplate shows up as high-rank hubs).
    // Integer fixed-point state makes 3 iterated rounds bit-identical
    // across engines — iterated FLOAT PageRank never hash-matches
    // because in-mass summation order varies with the physical plan.
    "q139_pagerank" -> ((s, d) => {
      // The SimHash near-dup graph is a BLOW-UP of its fingerprint
      // quotient (identical fingerprints form cliques, qualifying
      // fingerprint pairs complete bipartite links), so the integer
      // PageRank runs on the CONTRACTED class graph — |distinct
      // fingerprints| rows per round instead of the quadratically
      // expanded member edge relation (3.85M pairs at sf0.1) — and
      // ranks expand back by one broadcast-sized join. Bit-identical
      // to pageRank over the expanded graph (the update is an integer
      // multiple of per-member shares; GraphSpec pins the equality,
      // the oracle pins this query's output).
      val docs = Tables.documents(s, d)
      val sim = Dedup.simhash16(docs, "text", "doc_id").localCheckpoint(true)
      val (groups, fpPairs) = Dedup.simhashFpRelations(sim, maxHamming = 3, bits = 16)
      val classes = groups.select(col("__sh").as("cls"), size(col("ids")).as("cnt"))
      // the node set is ALL docs (a tokenless doc has no fingerprint
      // row — it is an isolated node that converges to the teleport
      // fixpoint with degree 0, attached via the left-join defaults)
      val nDocs = docs.count()
      val ranked = Graph.pageRankContracted(classes, "cls", "cnt",
        fpPairs.select(col("sh_1"), col("sh_2")), rounds = 3,
        nNodes = Some(nDocs))
      val teleportOnly = 15L * (1000000000000L / nDocs) / 100L
      docs.select(col("doc_id"))
        .join(sim.toDF("doc_id", "cls"), Seq("doc_id"), "left")
        // 16-bit fingerprint space bounds the class relation at 65,536
        // rows at ANY corpus scale — broadcast-safe by construction
        .join(broadcast(ranked), Seq("cls"), "left")
        .select(col("doc_id"), coalesce(col("degree"), lit(0L)).as("degree"),
          coalesce(col("rank_q"), lit(teleportOnly)).as("rank_q"))
    }),

    // Seed-proximity curation ([[Graph.seedDistances]]): hop distance
    // from the vetted slice (source = 'src0' — the same trusted set
    // q83/q92 decontaminate against) through the verified LSH near-dup
    // graph, capped at 4 hops. The TrustRank shape reduced to its
    // integer-exact core: a curation pass keeps/weights documents by
    // proximity to the seeds, and "absent" (unreachable) is itself the
    // signal for isolated content. Rides the SAME cached pairs
    // relation as q46/q68/q80 — the dedup index build is shared, the
    // BFS adds one frontier-×-degree join per hop.
    "q217_seed_distance" -> ((s, d) => {
      val seeds = Tables.documents(s, d)
        .filter(col("source") === "src0").select(col("doc_id"))
      Graph.seedDistances(
        nearDupPairs(s, d).select(col("id_1"), col("id_2")),
        seeds, "doc_id", maxHops = 4)
    }),

    // LSH parameter auto-tune: for every (bands, rows_per_band)
    // factorization of the K = 8 signature, integrate the S-curve
    // collision probability p(s) = 1 − (1 − s^r)^b against the ideal
    // step function at the pack's MIN_JACCARD threshold, and flag the
    // config minimizing total area (false-positive mass below the
    // threshold + false-negative mass above). q152 MEASURES the curves
    // on the corpus; this is the a-priori calibration a pipeline runs
    // BEFORE committing a banding — pure bounded arithmetic (4 configs
    // × 21 grid points), no corpus scan at all. All powers are
    // fixed-point ppm with truncating integer division at every
    // multiply ([[powPpmExpr]]), so the curve is bit-identical on any
    // engine — no libm pow.
    "q219_lsh_autotune" -> ((s, d) => {
      val grid = s.range(0, 21).select((col("id") * 50000L).as("s_ppm"))
      val curves = LSH_CONFIGS.map { case (b, r) =>
        val sr = powPpmExpr("s_ppm", r, "div")
        val qb = powPpmExpr(s"(1000000 - $sr)", b, "div")
        grid.select(lit(b).as("bands"), lit(r).as("rows_per_band"),
          col("s_ppm"), expr(s"1000000 - $qb").as("p_ppm"))
      }.reduce(_ unionByName _)
      val thr = (MIN_JACCARD * 1000000).toLong
      val err = curves
        .withColumn("ideal",
          when(col("s_ppm") >= thr, lit(1000000L)).otherwise(lit(0L)))
        .groupBy(col("bands"), col("rows_per_band"))
        .agg(sum(abs(col("p_ppm") - col("ideal"))).as("err_sum"))
      val best = err.agg(min(struct(col("err_sum"), col("bands"))).as("m"))
      err.crossJoin(broadcast(best))
        .select(col("bands"), col("rows_per_band"), col("err_sum"),
          (col("err_sum") === col("m.err_sum") &&
            col("bands") === col("m.bands")).as("chosen"))
    }),

    // INCREMENTAL connected-components maintenance — the index-update
    // path a daily-ingest dedup tier actually runs. The corpus splits
    // by the q144 arrival hash (bucket < 9 "indexed", else "new"); the
    // indexed side carries a PRE-EXISTING assignment (CC over
    // indexed-internal pairs), and the arrival folds in WITHOUT
    // re-touching indexed×indexed pairs: new×indexed edges route
    // through the cross-corpus index probe, new×new pairs through LSH
    // over the arrivals only, existing components CONTRACT to their
    // label (connectivity-preserving), and CC runs on the contracted
    // graph — O(components touched + arrivals), not O(corpus). The
    // oracle is the FULL-corpus recompute (q68's recursive-CTE CC,
    // verbatim): the gate hash-proves incremental ≡ batch, which holds
    // because minhash signatures and band keys are per-document — the
    // LSH pair relation decomposes exactly into indexed×indexed ∪
    // indexed×new ∪ new×new.
    "q220_incremental_cc" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val bucket = graft.functions.TextFunctions.md5Bucket10(col("doc_id"))
      val tagged = docs.withColumn("side",
        when(bucket < 9, "indexed").otherwise("new"))
      val arrivals = tagged.filter(col("side") === "new")
      // ONE pair build instead of three: minhash signatures and band
      // keys are per-document, so the LSH pair relation over the union
      // decomposes EXACTLY into indexed×indexed ∪ indexed×new ∪
      // new×new — the three slices below are filters of the SHARED
      // cached whole-corpus relation ([[nearDupPairs]]), not three
      // separate shingle→signature→verify pipelines over overlapping
      // corpus slices (guide §2.4). The incremental machinery under
      // test — the contracted CC fold — is unchanged.
      val sides = docs.select(col("doc_id"),
        when(bucket < 9, "indexed").otherwise("new").as("side"))
      val allPairs = nearDupPairs(s, d)
        .join(sides.select(col("doc_id").as("id_1"), col("side").as("side_1")), "id_1")
        .join(sides.select(col("doc_id").as("id_2"), col("side").as("side_2")), "id_2")
        .localCheckpoint(true)
      val idxPairs = allPairs
        .filter(col("side_1") === "indexed" && col("side_2") === "indexed")
        .select(col("id_1"), col("id_2"))
      val assign = Dedup.connectedComponents(idxPairs,
        tagged.filter(col("side") === "indexed").select(col("doc_id")), "doc_id")
        .select(col("doc_id"), col("cluster_id")).localCheckpoint(true)
      val cross = allPairs.filter(col("side_1") =!= col("side_2"))
        .select(
          when(col("side_1") === "indexed", col("id_1")).otherwise(col("id_2")).as("indexed_id"),
          when(col("side_1") === "indexed", col("id_2")).otherwise(col("id_1")).as("new_id"))
      val newPairs = allPairs
        .filter(col("side_1") === "new" && col("side_2") === "new")
        .select(col("id_1"), col("id_2"))
      val finalAssign = Dedup.contractedCcMerge(assign,
        arrivals.select(col("doc_id")), "doc_id",
        cross, "indexed_id", "new_id", newPairs)
      val sizes = finalAssign.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"))
      finalAssign.join(sizes, Seq("cluster_id"))
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    }),

    // Vocabulary statistics: top-100 shingles by document frequency
    // with a deterministic tie-break — the df scan behind stopword
    // lists, hot-shingle caps (q58) and BPE vocab prep. Partial-agg
    // group-by + bounded TakeOrderedAndProject: no full sort at scale.
    "q84_vocab_topk" -> ((s, d) => {
      shingles(s, d)
        .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("shingle"))
        .limit(100)
    }),

    // Benchmark decontamination: training docs sharing >= 3 distinct
    // 3-gram shingles with the 'src0' slice (standing in for an eval
    // benchmark) are flagged with their overlap count. The eval shingle
    // set broadcasts; the train side never shuffles except the final
    // per-doc count.
    "q83_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.contaminatedDocs(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "text", "doc_id", n = 3, minShared = 3)
    }),

    // q83's 100 TB form: bloom-filter prefilter on the train-side scan
    // (few MB at any eval-set cardinality, vs an unbounded broadcast
    // set) + exact confirm join, so the answer is identical to the
    // exact operator — the oracle is the SAME exact SQL. minShared=2
    // keeps the two queries' outputs distinct.
    "q92_bloom_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.contaminatedDocsBloom(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "text", "doc_id", n = 3, minShared = 2)
    }),

    // Dedup keeper-flow matrix — who LOSES documents to whom when
    // near-dup dedup keeps one copy per cluster: for every dropped
    // document, the (loser source → keeper source) edge, aggregated to
    // the flow matrix with self-flows (within-source dups) on the
    // diagonal. q128's overlap matrix says which sources share
    // content; this says which source the dedup pass actually
    // CREDITS with it — the attribution evidence behind a mixing
    // weight renegotiation. Rides the shared verified-pairs cache and
    // q68's clusters (cluster id = min member = the keeper); the flow
    // itself is two doc-keyed equi-joins + one bounded matrix agg.
    "q204_keeper_flow" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
      val cc = Dedup.connectedComponents(
        nearDupPairs(s, d).select(col("id_1"), col("id_2")),
        docs.select(col("doc_id")), "doc_id")
      val kSrc = docs.select(col("doc_id").as("cluster_id"),
        col("source").as("keeper_source"))
      cc.filter(col("doc_id") =!= col("cluster_id"))
        .join(docs, "doc_id")
        .join(kSrc, "cluster_id")
        .groupBy(col("source").as("loser_source"), col("keeper_source"))
        .agg(count(lit(1)).as("n_lost"))
    }),

    // Triangle counting over the near-dup graph — the local-density
    // signal (a near-dup neighborhood full of triangles is a
    // paraphrase CLUSTER; triangle-free edges are chains of pairwise
    // coincidences) on the DISTINCT-fingerprint graph: hamming-0
    // groups contract to one super-node first, because a 2k-member
    // exact-dup clique holds C(2k,3) triangles and would detonate the
    // wedge join while saying nothing — the contraction is what makes
    // the ordered wedge-join (a<b<c, then closure probe against the
    // edge set) safe at corpus scale. Per super-node: representative
    // id, member count, degree, triangle count.
    "q199_triangle_count" -> ((s, d) => {
      val fps = Dedup.simhashWide(Tables.documents(s, d), "text", "doc_id")
      val nodes = fps.groupBy(col("simhash"))
        .agg(count(lit(1)).as("n_members"), min(col("doc_id")).as("rep_id"))
        .localCheckpoint(true)
      val pairs = Dedup.simhashPairs(
        nodes.select(col("simhash").as("id"), col("simhash")), "id",
        maxHamming = 3, bits = 60)
        .select(col("id_1"), col("id_2")).distinct().localCheckpoint(true)
      val deg = pairs.select(explode(array(col("id_1"), col("id_2"))).as("simhash"))
        .groupBy(col("simhash")).agg(count(lit(1)).as("degree"))
      val tri = pairs.toDF("a", "b")
        .join(pairs.toDF("b", "c"), "b")
        .join(pairs.toDF("a", "c"), Seq("a", "c"))
        .select(col("a"), col("b"), col("c"))
      val perNode = tri.select(explode(array(col("a"), col("b"), col("c"))).as("simhash"))
        .groupBy(col("simhash")).agg(count(lit(1)).as("n_triangles"))
      nodes.join(deg, Seq("simhash"), "left")
        .join(perNode, Seq("simhash"), "left")
        .select(col("rep_id"), col("n_members"),
          coalesce(col("degree"), lit(0L)).as("degree"),
          coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
    }),

    // Span-level decontamination SCRUB — q83 flags contaminated
    // documents; this repairs them: every train-side token covered by
    // a 3-gram shared with the eval set is removed, and the cleaned
    // text reassembles in position order (so a mostly-clean document
    // keeps its value instead of being dropped whole — the
    // span-surgery form of decontamination used when eval overlap is
    // small but widespread). Covered positions come from the
    // position-preserving shingle table (q175's relation) joined
    // against the eval shingle set; reassembly is a per-doc bounded
    // sort inside one aggregation. Emits only repaired docs with
    // before/after token accounting.
    "q196_decontaminate_scrub" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val train = docs.filter(col("source") =!= "src0")
      val evalSh = Dedup.shingleTable(docs.filter(col("source") === "src0"),
        "text", "doc_id", 3).select(col("shingle")).distinct()
      val hits = Dedup.positionalShingleTable(train, "text", "doc_id", 3)
        .join(evalSh, "shingle")
      val covered = hits.select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + 2)).as("p")).distinct()
      val toks = train.select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), (col("pos") + 1).as("p"), col("col").as("tok"))
      toks.join(covered.withColumn("cut", lit(1)), Seq("doc_id", "p"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("cut").isNotNull, 1L).otherwise(0L)).as("n_scrubbed"),
          concat_ws(" ", transform(
            array_sort(collect_list(
              when(col("cut").isNull, struct(col("p"), col("tok"))))),
            x => x.getField("tok"))).as("clean_text"))
        .filter(col("n_scrubbed") > 0)
    }),

    // Cross-modal duplicate clusters — the composition a multimodal
    // curation pass actually runs: text near-dup edges (q65's 60-bit
    // wide SimHash, hamming ≤ 3) and image perceptual edges (q185's 60-bit
    // dHash) feed ONE connected-components pass, so a page duplicated
    // as text in one copy and as a re-encoded screenshot in another
    // still lands in the same cluster. Per cluster (size > 1): size,
    // keeper (min id), and the edge count by modality — the evidence
    // column a reviewer reads to see WHY the cluster exists.
    "q195_crossmodal_clusters" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // each modality's fingerprint relation is materialized once
      // (bounded: one row per doc) and feeds BOTH the per-pair edge
      // relation (the evidence columns) and the CC input below
      val textFp = Dedup.simhashWide(docs, "text", "doc_id")
        .localCheckpoint(true)
      val text = Dedup.simhashPairs(textFp, "doc_id",
        maxHamming = 3, bits = 60)
        .select(col("id_1"), col("id_2"), lit(1L).as("is_text"))
      val payload = docs.select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"))
      val imgFp = Multimodal.decodeImageGrid(payload, rows = 6, cols = 11)
        .select(col("doc_id"), Multimodal.dHash(col("luma"), 6, 11).as("dhash"))
        .localCheckpoint(true)
      val img = Dedup.simhashPairs(imgFp, "doc_id", maxHamming = 3, bits = 60)
        .select(col("id_1"), col("id_2"), lit(0L).as("is_text"))
      val pairs = text.unionByName(img).localCheckpoint(true)
      // CC consumes only CONNECTIVITY, so it gets the star-reduced
      // edge relation (O(docs + fingerprint pairs) edges instead of
      // the clique expansion — same components, same min-id labels;
      // the full `pairs` relation above still feeds the per-modality
      // edge counts, which DO need every pair row)
      val connEdges = Dedup
        .simhashConnectivityEdges(textFp, "doc_id", maxHamming = 3, bits = 60)
        .unionByName(Dedup
          .simhashConnectivityEdges(imgFp, "doc_id", maxHamming = 3, bits = 60))
      val cc = Dedup.connectedComponents(connEdges,
        docs.select(col("doc_id")), "doc_id").localCheckpoint(true)
      val edgeStats = pairs
        .join(cc.toDF("id_1", "cluster_id"), "id_1")
        .groupBy(col("cluster_id"))
        .agg(sum(col("is_text")).as("n_text_edges"),
          sum(lit(1L) - col("is_text")).as("n_image_edges"))
      cc.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"), min(col("doc_id")).as("keeper_id"))
        .filter(col("cluster_size") > 1)
        .join(edgeStats, Seq("cluster_id"), "left")
        .select(col("cluster_id"), col("cluster_size"), col("keeper_id"),
          coalesce(col("n_text_edges"), lit(0L)).as("n_text_edges"),
          coalesce(col("n_image_edges"), lit(0L)).as("n_image_edges"))
    }),

    // Bloom-filter FPR audit — the calibration number behind q92's
    // prefilter, measured instead of assumed: a RELATIONAL bloom
    // (k = 4 md5-derived positions into m = 32768 bits, the bit array
    // as a distinct-positions relation — deterministic and
    // engine-portable where a binary bloom blob is not) is built over
    // the eval shingles and probed with every distinct train shingle.
    // One row: items, bits set, probes, passes, true hits, false
    // positives, measured FPR and the (b/m)^k theoretical — the
    // evidence for sizing m before a 100 TB decontamination pass.
    // The positions relation is ≤ m rows (broadcastable at any eval
    // cardinality), probing is one equi-join + one count per shingle.
    "q192_bloom_fpr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val evalSh = Dedup.shingleTable(docs.filter(col("source") === "src0"),
        "text", "doc_id", 3).select(col("shingle")).distinct().localCheckpoint(true)
      val trainSh = Dedup.shingleTable(docs.filter(col("source") =!= "src0"),
        "text", "doc_id", 3).select(col("shingle")).distinct()
      def legs(sh: org.apache.spark.sql.DataFrame) = sh.select(col("shingle"),
        explode(array((0 until 4).map(r =>
          Curation.hashU16(col("shingle"), s"bf$r") % 32768): _*)).as("pos"))
      val bits = legs(evalSh).select(col("pos")).distinct().localCheckpoint(true)
      val probed = legs(trainSh)
        .join(broadcast(bits.withColumn("hit", lit(1))), Seq("pos"), "left")
        .groupBy(col("shingle"))
        .agg(sum(coalesce(col("hit"), lit(0))).as("hits"))
      val stats = probed
        .join(evalSh.withColumn("intest", lit(1)), Seq("shingle"), "left")
        .agg(count(lit(1)).as("n_probes"),
          sum(when(col("hits") === 4, 1L).otherwise(0L)).as("n_pass"),
          sum(when(col("intest").isNotNull, 1L).otherwise(0L)).as("n_true"),
          sum(when(col("hits") === 4 && col("intest").isNull, 1L).otherwise(0L))
            .as("n_false_pos"))
      stats
        .crossJoin(broadcast(bits.agg(count(lit(1)).as("n_bits_set"))))
        .crossJoin(broadcast(evalSh.agg(count(lit(1)).as("n_items"))))
        .select(col("n_items"), col("n_bits_set"), col("n_probes"),
          col("n_pass"), col("n_true"), col("n_false_pos"),
          expr("(n_false_pos * 10000) div (n_probes - n_true)")
            .as("fpr_measured_bps"),
          // (b/m)^4 in bps via two exact squarings (b² ≤ 2^30)
          expr("(((n_bits_set * n_bits_set * 10000) div 1073741824) * " +
            "((n_bits_set * n_bits_set * 10000) div 1073741824)) div 10000")
            .as("fpr_theory_bps"))
    }),

    // Inter-source overlap matrix: pairwise distinct-3-gram Jaccard
    // between sources (which crawls share content; which eval source a
    // train source contaminates) — the curation analytic you run BEFORE
    // spending a corpus-wide dedup pass. Grouped-pairs intersection
    // (never a shingle self-join fan-out), full matrix incl. zero
    // pairs, integral bps output.
    "q128_source_overlap" -> ((s, d) =>
      Dedup.groupOverlapMatrix(Tables.documents(s, d), "text", "source", 3)),

    // The dedup pipeline's final act: near-dup pairs → clusters →
    // keep min-id per cluster → the FILTERED corpus (what actually
    // ships to training). Composes q46's pair generation with q68's
    // clustering and the keep-one semi-join.
    "q80_dedup_filter" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val pairs = nearDupPairs(s, d).select(col("id_1"), col("id_2"))
      Dedup.keepOnePerCluster(docs, pairs, "doc_id")
        .select(col("doc_id"), col("source"), col("lang"))
    }),

    // q80 with the keeper a real pipeline wants: per cluster keep the
    // HIGHEST-QUALITY copy (q41's score; id asc on exact ties), not
    // whichever copy got the smallest id — min-id dedup silently ships
    // the noisier duplicate whenever the clean copy crawled later.
    // Same associative-agg shuffle shape; pairs from the shared cache.
    "q145_dedup_keep_best" -> ((s, d) => {
      import graft.functions.TextFunctions.qualityScore
      val docs = Tables.documents(s, d)
      val pairs = nearDupPairs(s, d).select(col("id_1"), col("id_2"))
      Dedup.keepBestPerCluster(docs, pairs, "doc_id",
        qualityScore(col("text"), TextQueries.EN))
        .select(col("doc_id"), col("source"), col("lang"))
    }),

    // Embedding-cosine near-dup: LSH-bucketed candidate pairs above the
    // cosine threshold resolved back to the documents (vec_id = doc_id),
    // with the keeper chosen as the smaller id — semantic dedup, the
    // embedding-space sibling of MinHash. (Synthetic random embeddings
    // are near-orthogonal, so the demo threshold sits at 0.35; real
    // near-dup corpora use ~0.9.)
    "q49_embedding_neardup" -> ((s, d) => {
      val pairs = Similarity.lshNearPairs(
        Tables.embeddings(s, d), "vec_id", "embedding", bits = 8, minCos = 0.35)
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
      pairs
        .join(docs.toDF("id_1", "source_1"), "id_1")
        .join(docs.toDF("id_2", "source_2"), "id_2")
        .select(col("id_1").as("keep_id"), col("id_2").as("dup_id"),
          col("cos"), (col("source_1") === col("source_2")).as("same_source"))
    }),

    // Fuzzy entity matching (edit distance ≤ 2 on part names), the
    // string-metric sibling of the shingle/minhash family. Scale design
    // in two moves: (1) collapse to DISTINCT names first — the pair
    // space is then bounded by the VOCABULARY, not the corpus, so the
    // output is constant-size as data grows (24 pairs at every sf);
    // (2) block on the name's last token, so levenshtein only runs
    // inside blocks — never a cross product. Group sizes ride along to
    // re-expand matches to row counts.
    "q112_fuzzy_match" -> ((s, d) => {
      val g = Tables.part(s, d)
        .groupBy(col("p_name"))
        .agg(min(col("p_partkey")).as("rep"), count(lit(1)).as("cnt"))
        .withColumn("ts", split(col("p_name"), " "))
        .withColumn("noun", element_at(col("ts"), size(col("ts"))))
        .drop("ts")
      val a = g.select(col("noun"), col("p_name").as("name_a"),
        col("rep").as("rep_a"), col("cnt").as("n_a"))
      val b = g.select(col("noun"), col("p_name").as("name_b"),
        col("rep").as("rep_b"), col("cnt").as("n_b"))
      a.join(b, Seq("noun"))
        .where(col("name_a") < col("name_b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
        .where(col("dist") <= 2)
        .select(col("name_a"), col("name_b"), col("dist"),
          col("rep_a"), col("rep_b"), col("n_a"), col("n_b"))
    }),

    // LSH band-sensitivity curve: the MEASURED precision/recall
    // trade-off of the banding knob — for each (bands, rows-per-band)
    // config over the same k=8 signatures, the candidate-pair volume
    // (the cost axis: every candidate is an exact-Jaccard verification)
    // and the recall against the exact >= 0.2 all-pairs truth (q45's
    // relation, recomputed from the shared shingle cache). More bands ⇒
    // an S-curve shifted left ⇒ higher recall AND more candidates; this
    // query is how a deployment picks the operating point before
    // committing a 100 TB pass. All counts integral, recall floored to
    // bps — hash-exact across engines.
    "q152_lsh_curve" -> ((s, d) => {
      val sh = shingles(s, d)
      val sigs = Dedup.minhashSignatures(sh, "doc_id", K)
      val truth = Dedup.jaccardPairs(sh, "doc_id", MIN_JACCARD)
        .select(col("id_1"), col("id_2"))
      Seq(2, 4, 8).map { b =>
        val cand = Dedup.lshCandidatePairs(sigs, "doc_id", b, K / b)
        val hits = truth
          .join(cand.withColumn("hit", lit(1)), Seq("id_1", "id_2"), "left")
          .agg(count(lit(1)).as("n_true_pairs"),
            sum(coalesce(col("hit"), lit(0))).as("n_detected"))
        hits.crossJoin(cand.agg(count(lit(1)).as("n_candidates")))
          .select(
            lit(b).as("bands"), lit(K / b).as("rows_per_band"),
            col("n_candidates"), col("n_true_pairs"), col("n_detected"),
            when(col("n_true_pairs") === 0, 0L)
              .otherwise(floor(lit(10000.0) * col("n_detected") / col("n_true_pairs"))
                .cast("long")).as("recall_bps"))
      }.reduce(_ union _)
    }),

    // Incremental dedup-index maintenance (the q120 contract applied
    // to TEXT dedup): new arrivals (the md5 10% slice) are checked
    // against the EXISTING LSH index (new × indexed, via
    // crossCorpusNearDups — sides split before the candidate join)
    // and among THEMSELVES (new × new, the within-batch pass) — never
    // indexed × indexed, which is the work an index rebuild would
    // redo. Cost is O(new · collision density), not O(corpus²);
    // `vs_index` labels which path found each verified pair. This is
    // how a 100 TB corpus stays deduped under continuous ingest.
    // q157's maintenance contract meeting the STREAMING door: the idx
    // split is pre-landed as the deduped corpus, the 'new' split
    // arrives as a stream, and each micro-batch is within-batch
    // deduped (pairwise min-id) + checked new×indexed against the
    // landed table before landing exactly-once. The landed result must
    // hash-match the batch oracle: idx ∪ {new docs with no verified
    // pair into idx and no smaller-id pair among new} — stream-dedup ≡
    // batch-dedup, which is what lets ingest run continuously without
    // rebuild passes.
    "q166_stream_dedup_ingest" -> ((s, d) => {
      import graft.functions.TextFunctions.hexNibble
      import graft.streaming.EventPipelines
      val wh = new graft.sources.Warehouse(graft.plans.EtlQueries.tmpWarehouse(), s)
      def bucket(c: org.apache.spark.sql.Column) =
        graft.functions.TextFunctions.md5Bucket10(c)
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), col("source"))
      // seed the index in the BUCKETED layout (EventPipelines.
      // seedDedupIndex): stored band keys + id-hash bucket dirs + the
      // key-posting sibling table — each micro-batch then probes the
      // stored postings through the arrivals' key buckets and fetches
      // candidate text through id buckets, O(arrivals + collisions)
      // FILES from the landed corpus (round-12 verdict directive 1;
      // the round-11 stored-key contract made the WORK O(arrivals),
      // this layout makes the I/O match)
      graft.BenchProbes.timed("q166_stream_dedup_ingest", "seed_index") {
        EventPipelines.seedDedupIndex(wh, "bl_3nf", "docs_dedup",
          docs.filter(bucket(col("doc_id")) < 9),
          idCol = "doc_id", textCol = "text", partCol = "source",
          ngram = 3, k = K, bands = BANDS)
      }
      val stream = s.readStream
        .schema(s.read.option("pathGlobFilter", "documents.parquet").parquet(d).schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
      graft.BenchProbes.timed("q166_stream_dedup_ingest", "stream_drain") {
        EventPipelines.dedupIngestAvailableNow(stream, wh, "bl_3nf", "docs_dedup",
          idCol = "doc_id", textCol = "text", partCol = "source",
          ngram = 3, k = K, bands = BANDS, minJaccard = MIN_JACCARD,
          prep = Some(b => b.filter(bucket(col("doc_id")) === 9)
            .select(col("doc_id"), col("text"), col("source"))))
      }
      wh.readPartitioned("bl_3nf", "docs_dedup", "source")
        .select(col("doc_id"), col("source"))
    }),

    // STREAMING connected-components maintenance — q220's contraction
    // algorithm running inside the exactly-once ingest machinery
    // (EventPipelines.ccMaintainAvailableNow): the whole corpus
    // arrives in THREE stream waves (the q144 arrival-hash majority
    // first — it bootstraps the assignment — then the bucket-9
    // arrivals split by parity), and cluster membership versions
    // forward on every ingest instead of queueing an offline rebuild.
    // The oracle is the full-corpus recompute (q68's SQL, third use):
    // the gate hash-proves that the assignment after any sequence of
    // ledgered micro-batches equals one batch CC over everything —
    // which holds because the LSH pair relation decomposes exactly
    // across waves (per-document signatures), and contraction
    // preserves connectivity batch over batch.
    "q228_stream_cc" -> ((s, d) => {
      import graft.functions.TextFunctions.hexNibble
      import graft.streaming.EventPipelines
      val wh = new graft.sources.Warehouse(graft.plans.EtlQueries.tmpWarehouse(), s)
      def bucket(c: org.apache.spark.sql.Column) =
        graft.functions.TextFunctions.md5Bucket10(c)
      val stream = s.readStream
        .schema(s.read.option("pathGlobFilter", "documents.parquet").parquet(d).schema)
        .option("pathGlobFilter", "documents.parquet").parquet(d)
      // per-wave sub-timing for the bench ledger: wave1 bootstraps
      // (90% of the corpus — one signature pass is inherent), waves
      // 2-3 are the O(arrivals) stored-key maintenance batches
      def wave(part: String)(pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
        graft.BenchProbes.timed("q228_stream_cc", part) {
          EventPipelines.ccMaintainAvailableNow(stream, wh, "bl_3nf", "cc_assign",
            idCol = "doc_id", textCol = "text",
            ngram = 3, k = K, bands = BANDS, minJaccard = MIN_JACCARD,
            prep = Some(b => b.filter(pred(col("doc_id")))
              .select(col("doc_id"), col("text"))))
        }
      wave("wave1_bootstrap")(c => bucket(c) < 9)
      wave("wave2_even")(c => bucket(c) === 9 && c % 2 === 0)
      wave("wave3_odd")(c => bucket(c) === 9 && c % 2 === 1)
      val assign = EventPipelines.ccAssignment(wh, "bl_3nf", "cc_assign")
        .select(col("doc_id"), col("cluster_id"))
      val sizes = assign.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("cluster_size"))
      assign.join(sizes, Seq("cluster_id"))
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"))
    }),

    // TEXT-RELEASE CAPSTONE — the whole corpus-release pipeline as ONE
    // DAG, the text twin of q200's multimodal funnel: quality gate
    // (q6 ≥ 0.5) → exact-dedup keeper (min-id per fingerprint) →
    // exact decontamination against the src0 benchmark corpus (≥ 3
    // shared 3-shingles drops, q83's rule) → 8/1/1 content-hash split
    // → per-source attrition accounting with released token mass. The
    // oracle recomputes EVERY stage from first principles, so the
    // green hash proves the COMPOSITION, not just the parts — the
    // "switch your release job to this engine" demonstration. Each
    // stage is a scan or one keyed shuffle; nothing here is new
    // machinery, which is the point.
    "q250_text_release" -> ((s, d) => {
      import graft.functions.TextFunctions.{fingerprint, hexNibble, qualityScore}
      val docs = Tables.documents(s, d)
      val uni = docs.filter(col("source") =!= "src0")
        .select(col("doc_id"), col("source"), col("text"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          (floor(qualityScore(col("text"), TextQueries.EN) * 1e6)
            .cast("long") >= 500000L).as("gated"))
        .localCheckpoint(true)
      val gated = uni.filter(col("gated"))
      val keeper = gated.groupBy(fingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
      val deduped = gated.join(keeper, Seq("doc_id"), "left_semi")
        .select(col("doc_id")).localCheckpoint(true)
      val sh = Dedup.shingleTable(docs, "text", "doc_id", 3)
      val ev = sh.join(docs.filter(col("source") === "src0")
          .select(col("doc_id")), Seq("doc_id"), "left_semi")
        .select(col("shingle")).distinct()
      val leaky = sh.join(deduped, Seq("doc_id"), "left_semi")
        .join(ev, Seq("shingle"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("ns"))
        .filter(col("ns") >= 3).select(col("doc_id"))
      val clean = deduped.join(leaky, Seq("doc_id"), "left_anti")
      val b = graft.functions.TextFunctions.md5Bucket10(col("doc_id"))
      val flags = uni
        .join(deduped.withColumn("is_dedup", lit(true)), Seq("doc_id"), "left")
        .join(clean.withColumn("is_clean", lit(true)), Seq("doc_id"), "left")
        .withColumn("split", when(!coalesce(col("is_clean"), lit(false)), lit(null))
          .otherwise(when(b < 8, "train").when(b === 8, "val").otherwise("test")))
      flags.groupBy(col("source"))
        .agg(count(lit(1)).as("n_raw"),
          sum(when(col("gated"), 1L).otherwise(0L)).as("n_gated"),
          sum(when(coalesce(col("is_dedup"), lit(false)), 1L).otherwise(0L))
            .as("n_deduped"),
          sum(when(coalesce(col("is_clean"), lit(false)), 1L).otherwise(0L))
            .as("n_clean"),
          sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
          sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"),
          sum(when(col("split") === "test", 1L).otherwise(0L)).as("n_test"),
          sum(when(coalesce(col("is_clean"), lit(false)), col("n_tokens"))
            .otherwise(0L)).as("tok_released"))
    }),

    // Cluster-aware train/val/test split — the LEAKAGE GUARD document-
    // level splitting cannot give: hashing doc ids sends near-dup
    // copies of the same content into train AND eval, which inflates
    // every eval metric (the q144 decontamination problem created by
    // the split itself). Splitting on the CLUSTER id keeps whole
    // near-dup clusters together by construction — and this query
    // MEASURES the difference: both modes' split sizes plus the number
    // of clusters spanning more than one split (cluster-aware: 0
    // provably; doc-level: the leak count that justifies the policy).
    // One CC pass (shared pairs cache) + hash arithmetic; 8/1/1 split.
    "q248_cluster_split" -> ((s, d) => {
      import graft.functions.TextFunctions.hexNibble
      val cc = Dedup.connectedComponents(
        nearDupPairs(s, d).select(col("id_1"), col("id_2")),
        Tables.documents(s, d).select(col("doc_id")), "doc_id")
      def bucket(c: org.apache.spark.sql.Column, salt: String) =
        graft.functions.TextFunctions.md5Bucket10(c, salt)
      def splitName(b: org.apache.spark.sql.Column) =
        when(b < 8, "train").when(b === 8, "val").otherwise("test")
      val assigned = cc.select(col("doc_id"), col("cluster_id"),
        splitName(bucket(col("cluster_id"), "cs1-")).as("s_cluster"),
        splitName(bucket(col("doc_id"), "")).as("s_doc"))
        .localCheckpoint(true)
      def report(mode: String, sCol: String) = {
        val spanning = assigned.groupBy(col("cluster_id"))
          .agg(count_distinct(col(sCol)).as("ns"))
          .agg(sum(when(col("ns") > 1, 1L).otherwise(0L)).as("n_spanning"))
        assigned.agg(
          sum(when(col(sCol) === "train", 1L).otherwise(0L)).as("n_train"),
          sum(when(col(sCol) === "val", 1L).otherwise(0L)).as("n_val"),
          sum(when(col(sCol) === "test", 1L).otherwise(0L)).as("n_test"))
          .crossJoin(broadcast(spanning))
          .select(lit(mode).as("mode"), col("n_train"), col("n_val"),
            col("n_test"), col("n_spanning"))
      }
      report("cluster_aware", "s_cluster").unionByName(report("doc_level", "s_doc"))
    }),

    // Containment vs Jaccard — the SUBSET-duplication audit symmetric
    // Jaccard is blind to: a short document engulfed by a long one has
    // containment |A∩B|/min(|A|,|B|) near 1 while Jaccard stays under
    // any admission threshold (the denominators diverge with the size
    // ratio). Candidates ride the same rare-shingle generator as q175;
    // both measures are integer bps from the same intersection count;
    // the top-20 pairs by (containment − Jaccard) GAP — the asymmetry
    // ranking, deterministic ties — are the engulfed-candidate review
    // queue a dedup pass misses. On corpora with real length spread
    // the gap hits ~8000 bps; this corpus's equal-length docs cap it
    // lower, which the relation simply reports.
    "q246_containment" -> ((s, d) => {
      val sh = shingles(s, d)
      // Candidates are the shared cached relation (see [[containCands]]
      // — same artifact class as [[nearDupPairs]]: one index build per
      // (session, corpus), attributed to its own warm_* bench row).
      val cands = containCands(s, d)
      // POSTING-LIST verification (the oracle's own iv-CTE shape): the
      // intersection count per candidate pair comes from joining the
      // pairs back to the (doc, shingle) relation twice and counting —
      // every shuffled row is (ids, one shingle). The previous form
      // attached each doc's FULL collect_set array to both sides of
      // the pair join, shuffling candidates × shingles STRING PAYLOADS
      // (the round-10 verdict's named cost in this query); same join
      // cardinality here, ~order-of-magnitude less bytes, and the
      // per-doc set sizes ride a count agg instead of arrays. Every
      // candidate pair shares ≥1 shingle by construction, so the inner
      // join drops nothing. The cap-bounded pair relation is pinned as
      // the broadcast side of the first join (candidates are ≤ CAP rows
      // at ANY corpus size — the posting table is not); the second join
      // is left declarative: size estimates + AQE runtime stats pick
      // the physical strategy, which at this scale is a hash build of
      // the ~15 MB posting table (cheap in-process) and at corpus
      // scale a co-partitioned shuffle join on (id_2, shingle) — a
      // forced shuffle_hash variant measured ~2 s MORE at sf0.1 (three
      // extra exchanges of the pairs×shingles intermediate) for the
      // small local build it avoided.
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      sh.select(col("doc_id").as("id_1"), col("shingle"))
        .join(broadcast(cands), Seq("id_1"))
        .join(sh.select(col("doc_id").as("id_2"), col("shingle")), Seq("id_2", "shingle"))
        .groupBy(col("id_1"), col("id_2")).agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("doc_id").as("id_1"), col("n").as("n1")), Seq("id_1"))
        .join(sizes.select(col("doc_id").as("id_2"), col("n").as("n2")), Seq("id_2"))
        .withColumn("cont_bps", expr("(inter * 10000) div least(n1, n2)"))
        .withColumn("jac_bps", expr("(inter * 10000) div (n1 + n2 - inter)"))
        .withColumn("gap_bps", col("cont_bps") - col("jac_bps"))
        .orderBy(col("gap_bps").desc, col("id_1"), col("id_2"))
        .limit(20)
        .select(col("id_1"), col("id_2"), col("inter"), col("n1"), col("n2"),
          col("cont_bps"), col("jac_bps"), col("gap_bps"))
    }),

    // Cluster edge-strength audit — the over-merge risk check a dedup
    // pass runs before dropping non-keepers: transitive closure can
    // chain A≈B≈C into one cluster even when A and C share nothing
    // (Lee et al.'s chain-collapse concern), and the tell is a cluster
    // held together by WEAK edges. Per cluster (≥2 members): edge
    // count, min/max verified-Jaccard (bps), and the number of weak
    // (< 0.3) edges — a cluster whose minimum is far below the 0.2
    // admission floor times its diameter is a review candidate. Rides
    // the shared cached pairs + one CC pass; the profile is one
    // cluster-keyed agg.
    "q244_cluster_strength" -> ((s, d) => {
      val pairs = nearDupPairs(s, d)
      val cc = Dedup.connectedComponents(
        pairs.select(col("id_1"), col("id_2")),
        Tables.documents(s, d).select(col("doc_id")), "doc_id")
      val sizes = cc.groupBy(col("cluster_id")).agg(count(lit(1)).as("n_members"))
      pairs
        .join(cc.select(col("doc_id").as("id_1"), col("cluster_id")), Seq("id_1"))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_edges"),
          min(floor(col("jaccard") * 10000).cast("long")).as("min_j_bps"),
          max(floor(col("jaccard") * 10000).cast("long")).as("max_j_bps"),
          sum(when(col("jaccard") < 0.3, 1L).otherwise(0L)).as("n_weak"))
        .join(sizes, Seq("cluster_id"))
        .select(col("cluster_id"), col("n_members"), col("n_edges"),
          col("min_j_bps"), col("max_j_bps"), col("n_weak"))
    }),

    // Dedup-ROI growth curve: exact-duplicate rate as the corpus grows
    // decile by decile (ingestion order) — Lee et al. 2022's
    // observation that duplication RISES with corpus size, measured on
    // this corpus so a roadmap can price the dedup pass before
    // scaling. Same one-pass cumulative device as q237: each
    // fingerprint's first decile is a min-agg, cumulative distincts a
    // 10-row running sum — no per-prefix recomputation.
    "q238_dup_growth" -> ((s, d) => {
      import graft.functions.TextFunctions.fingerprint
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      val ranked = Relational.orderedRanks(docs, Seq(col("doc_id").asc), "ord")
      val n = docs.count() // bounded scalar
      val dd = ranked.select(
        expr(s"CAST(((ord - 1) * 10) div $n + 1 AS INT)").as("dec"), col("fp"))
      val perDec = dd.groupBy(col("dec")).agg(count(lit(1)).as("n_docs"))
      val firsts = dd.groupBy(col("fp")).agg(min(col("dec")).as("fd"))
        .groupBy(col("fd").as("dec")).agg(count(lit(1)).as("n_new"))
      val w = Relational.tinyOrderedWindow(col("dec"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      perDec.join(firsts, Seq("dec"), "full_outer")
        .select(col("dec"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs"),
          coalesce(col("n_new"), lit(0L)).as("n_new"))
        .withColumn("n_docs_cum", sum(col("n_docs")).over(w))
        .withColumn("n_distinct_cum", sum(col("n_new")).over(w))
        .select(col("dec"), col("n_docs_cum"), col("n_distinct_cum"),
          (col("n_docs_cum") - col("n_distinct_cum")).as("n_dups_cum"),
          expr("((n_docs_cum - n_distinct_cum) * 10000) div n_docs_cum")
            .as("dup_rate_bps"))
    }),

    "q157_incremental_dedup" -> ((s, d) => {
      val bucket = graft.functions.TextFunctions.md5Bucket10(col("doc_id"))
      val tagged = KernelPar.spread(Tables.documents(s, d)
        .withColumn("split", when(bucket < 9, "idx").otherwise("new")))
      val vsIndex = Dedup.crossCorpusNearDups(tagged, "text", "doc_id",
        "split", "new", "idx", ngram = 3, k = K, bands = BANDS,
        minJaccard = MIN_JACCARD)
        .select(col("new_id").as("id_1"), col("idx_id").as("id_2"),
          col("jaccard"), lit(true).as("vs_index"))
      val withinBatch = Dedup.minhashLshNearDups(
        tagged.filter(col("split") === "new"), "text", "doc_id",
        ngram = 3, k = K, bands = BANDS, minJaccard = MIN_JACCARD)
        .withColumn("vs_index", lit(false))
      vsIndex.union(withinBatch)
    })
  )

  // ---- shared oracle fragments ----

  /** Distinct word-3-gram shingles per doc (1-based list indexing). */
  private val shinglesCte =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       raw AS (SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(ts) - 2),
                        i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS shingle
               FROM toks),
       sh AS (SELECT DISTINCT doc_id, shingle FROM raw)"""

  /** Pairwise Jaccard ≥ threshold over `rel`. Produces id_1,id_2,jaccard. */
  private def jaccardFrom(rel: String) =
    s"""SELECT id_1, id_2,
          CAST(inter AS DOUBLE) / CAST(n1 + n2 - inter AS DOUBLE) AS jaccard
        FROM (
          SELECT i.id_1, i.id_2, i.inter, s1.n AS n1, s2.n AS n2
          FROM (SELECT a.doc_id AS id_1, b.doc_id AS id_2, count(*) AS inter
                FROM $rel a JOIN $rel b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                GROUP BY 1, 2) i
          JOIN (SELECT doc_id, count(*) AS n FROM $rel GROUP BY 1) s1 ON i.id_1 = s1.doc_id
          JOIN (SELECT doc_id, count(*) AS n FROM $rel GROUP BY 1) s2 ON i.id_2 = s2.doc_id)
        WHERE CAST(inter AS DOUBLE) / CAST(n1 + n2 - inter AS DOUBLE) >= $MIN_JACCARD"""

  private val jaccardSelect = jaccardFrom("sh")

  private val minhashCols =
    (0 until K).map(i => s"min(md5('$i|' || shingle)) AS mh$i").mkString(", ")

  /** Band relation for an arbitrary band count over the k=8 minhash
    * columns (rows per band = K / bands).
    */
  private def bandUnionFor(bands: Int): String = (0 until bands).map { b =>
    val r = K / bands
    val key = (0 until r).map(j => s"mh${b * r + j}").mkString(" || '|' || ")
    s"SELECT doc_id, $b AS band, md5($key) AS bkey FROM mh"
  }.mkString(" UNION ALL ")

  private val bandUnion = bandUnionFor(BANDS)

  /** WITH-body of the full-corpus LSH→verify→CC derivation, ending at
    * the `cc` (doc_id, cluster_id) relation — shared by the q68/q220/
    * q228 full-recompute oracle and q248's split assignment.
    */
  private lazy val ccChainSql =
    s"""RECURSIVE $shinglesCte,
       mh AS (SELECT doc_id, $minhashCols FROM sh GROUP BY doc_id),
       bands AS ($bandUnion),
       cand AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
                FROM bands a JOIN bands b
                  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       verified AS ($jaccardSelect),
       pairs AS (SELECT c.id_1, c.id_2
                 FROM cand c JOIN verified v ON c.id_1 = v.id_1 AND c.id_2 = v.id_2),
       edges AS (SELECT id_1 AS src, id_2 AS dst FROM pairs
                 UNION ALL SELECT id_2, id_1 FROM pairs),
       walk(id, comp) AS (
         SELECT doc_id, doc_id FROM documents
         UNION
         SELECT e.dst, w.comp FROM walk w JOIN edges e ON w.id = e.src),
       cc AS (SELECT id AS doc_id, min(comp) AS cluster_id FROM walk GROUP BY id)"""

  /** Full-corpus LSH→verify→CC recompute — q68's oracle, and by design
    * q220's/q228's too (incremental/streamed maintenance must
    * reproduce it exactly).
    */
  private lazy val ccFullRecomputeSql =
    s"""WITH $ccChainSql
     SELECT cc.doc_id, cc.cluster_id, sz.cluster_size
     FROM cc JOIN (SELECT cluster_id, count(*) AS cluster_size
                   FROM cc GROUP BY 1) sz USING (cluster_id)"""

  /** SimHash bit-sum columns s0..s15 from md5 nibbles of each token. */
  private val simhashSums = (0 until 16).map { j =>
    s"SUM(((strpos('123456789abcdef', substr(md5(tok), ${j / 4 + 1}, 1)) >> ${j % 4}) & 1) * 2 - 1) AS s$j"
  }.mkString(", ")

  private val simhashValue = (0 until 16).map { j =>
    s"(CASE WHEN s$j > 0 THEN ${1 << j} ELSE 0 END)"
  }.mkString(" + ")

  private val simhashCte =
    s"""dtoks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents),
        sums AS (SELECT doc_id, $simhashSums FROM dtoks GROUP BY doc_id),
        simh AS (SELECT doc_id, CAST($simhashValue AS INT) AS simhash FROM sums)"""

  /** 60-bit analogs of the 16-bit fragments (BIGINT power-of-two
    * literals keep everything in signed-long range).
    */
  private val simhashWideSums = (0 until 60).map { j =>
    s"SUM(((strpos('123456789abcdef', substr(md5(tok), ${j / 4 + 1}, 1)) >> ${j % 4}) & 1) * 2 - 1) AS s$j"
  }.mkString(", ")

  private val simhashWideValue = (0 until 60).map { j =>
    s"(CASE WHEN s$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
  }.mkString(" + ")

  private val simhashWideCte =
    s"""dtoks AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
                  FROM documents),
        sums AS (SELECT doc_id, $simhashWideSums FROM dtoks GROUP BY doc_id),
        simh AS (SELECT doc_id, CAST($simhashWideValue AS BIGINT) AS simhash FROM sums)"""

  /** One integer-PageRank round: documents LEFT JOIN the aggregated
    * in-mass (r div deg per in-edge) of the previous round's relation.
    */
  private def prRound(i: Int): String =
    s"""r$i AS (
       |  SELECT d.doc_id,
       |         CAST((15 * (SELECT b FROM base) + 85 * COALESCE(s.s, 0)) // 100 AS BIGINT) AS r
       |  FROM documents d LEFT JOIN (
       |    SELECT e.dst AS doc_id, SUM(r.r // g.deg) AS s
       |    FROM r${i - 1} r JOIN edges e ON r.doc_id = e.src
       |         JOIN deg g ON g.src = e.src
       |    GROUP BY 1) s ON d.doc_id = s.doc_id)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q139_pagerank" ->
      s"""WITH $simhashCte,
         |prs AS (SELECT a.doc_id AS i, b.doc_id AS j
         |        FROM simh a JOIN simh b ON a.doc_id < b.doc_id
         |        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         |edges AS (SELECT i AS src, j AS dst FROM prs
         |          UNION ALL SELECT j AS src, i AS dst FROM prs),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
         |base AS (SELECT 1000000000000 // count(*) AS b FROM documents),
         |r0 AS (SELECT doc_id, CAST((SELECT b FROM base) AS BIGINT) AS r
         |       FROM documents),
         |${prRound(1)},
         |${prRound(2)},
         |${prRound(3)}
         |SELECT d.doc_id, CAST(COALESCE(g.deg, 0) AS BIGINT) AS degree,
         |       r3.r AS rank_q
         |FROM documents d LEFT JOIN deg g ON g.src = d.doc_id
         |JOIN r3 ON r3.doc_id = d.doc_id""".stripMargin,
    "q112_fuzzy_match" ->
      """WITH g AS (
           SELECT p_name, MIN(p_partkey) AS rep, count(*) AS cnt,
             string_split(p_name, ' ')[len(string_split(p_name, ' '))] AS noun
           FROM part GROUP BY p_name),
         pairs AS (
           SELECT a.p_name AS name_a, b.p_name AS name_b,
             levenshtein(a.p_name, b.p_name) AS dist,
             a.rep AS rep_a, b.rep AS rep_b, a.cnt AS n_a, b.cnt AS n_b
           FROM g a JOIN g b ON a.noun = b.noun AND a.p_name < b.p_name)
         SELECT name_a, name_b, CAST(dist AS INT) AS dist,
                rep_a, rep_b, n_a, n_b
         FROM pairs WHERE dist <= 2""",
    "q65_simhash_wide_pairs" ->
      s"""WITH $simhashWideCte
       SELECT a.doc_id AS id_1, b.doc_id AS id_2,
              CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       FROM simh a JOIN simh b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""",
    "q49_embedding_neardup" -> {
      val cos = SimilarityQueries.cosSql("a.embedding", "b.embedding")
      s"""WITH bk AS (SELECT vec_id, embedding, ${SimilarityQueries.bucketSql} AS bucket
                      FROM embeddings),
         pairs AS (
           SELECT a.vec_id AS id_1, b.vec_id AS id_2, $cos AS cos
           FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
           WHERE $cos >= 0.35)
       SELECT p.id_1 AS keep_id, p.id_2 AS dup_id, p.cos,
              (d1.source = d2.source) AS same_source
       FROM pairs p
       JOIN documents d1 ON p.id_1 = d1.doc_id
       JOIN documents d2 ON p.id_2 = d2.doc_id"""
    },
    "q44_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
         min(doc_id) AS keep_id, count(*) AS n_docs
         FROM documents GROUP BY 1""",
    "q45_ngram_jaccard" ->
      s"WITH $shinglesCte $jaccardSelect",
    "q58_jaccard_capped" ->
      s"""WITH $shinglesCte,
         shc AS (SELECT doc_id, shingle FROM sh
                 WHERE NOT EXISTS (
                   SELECT 1 FROM (SELECT shingle FROM sh GROUP BY shingle
                                  HAVING count(*) > $MAX_SHINGLE_DF) hot
                   WHERE hot.shingle = sh.shingle))
       ${jaccardFrom("shc")}""",
    "q46_minhash_lsh" ->
      s"""WITH $shinglesCte,
         mh AS (SELECT doc_id, $minhashCols FROM sh GROUP BY doc_id),
         bands AS ($bandUnion),
         cand AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         verified AS ($jaccardSelect)
       SELECT c.id_1, c.id_2, v.jaccard
       FROM cand c JOIN verified v ON c.id_1 = v.id_1 AND c.id_2 = v.id_2""",
    "q175_exact_substring" ->
      s"""WITH $shinglesCte,
         sdf AS (SELECT shingle, count(*) AS nd FROM sh GROUP BY 1),
         cand AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
                  FROM sh a
                  JOIN sdf ON sdf.shingle = a.shingle AND sdf.nd <= $MAX_SHINGLE_DF
                  JOIN sh b ON b.shingle = a.shingle AND a.doc_id < b.doc_id),
         praw AS (SELECT doc_id, ts,
                    unnest(generate_series(1, len(ts) - 2)) AS pos
                  FROM toks),
         ps AS (SELECT doc_id, pos,
                  ts[pos] || ' ' || ts[pos+1] || ' ' || ts[pos+2] AS shingle
                FROM praw),
         m AS (SELECT c.id_1, c.id_2, a.pos AS p1, b.pos AS p2
               FROM cand c
               JOIN ps a ON a.doc_id = c.id_1
               JOIN ps b ON b.doc_id = c.id_2 AND b.shingle = a.shingle),
         runs AS (SELECT id_1, id_2, p1 - p2 AS diag,
                    p1 - row_number() OVER (PARTITION BY id_1, id_2, p1 - p2
                                            ORDER BY p1) AS grp
                  FROM m),
         r2 AS (SELECT id_1, id_2, count(*) AS run
                FROM runs GROUP BY id_1, id_2, diag, grp)
       SELECT id_1, id_2, CAST(max(run) + 2 AS BIGINT) AS longest_tokens,
              CAST(sum(run) AS BIGINT) AS n_matched_positions
       FROM r2 GROUP BY 1, 2 HAVING max(run) + 2 >= $MIN_RUN_TOKENS""",
    "q204_keeper_flow" ->
      s"""WITH RECURSIVE $shinglesCte,
         mh AS (SELECT doc_id, $minhashCols FROM sh GROUP BY doc_id),
         bands AS ($bandUnion),
         cand AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         verified AS ($jaccardSelect),
         pairs AS (SELECT c.id_1, c.id_2
                   FROM cand c JOIN verified v ON c.id_1 = v.id_1 AND c.id_2 = v.id_2),
         edges AS (SELECT id_1 AS src, id_2 AS dst FROM pairs
                   UNION ALL SELECT id_2, id_1 FROM pairs),
         walk(id, comp) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.dst, w.comp FROM walk w JOIN edges e ON w.id = e.src),
         cc AS (SELECT id AS doc_id, min(comp) AS cluster_id FROM walk GROUP BY id),
         ks AS (SELECT doc_id AS cluster_id, source AS keeper_source FROM documents)
       SELECT d.source AS loser_source, ks.keeper_source,
              CAST(count(*) AS BIGINT) AS n_lost
       FROM cc JOIN documents d ON d.doc_id = cc.doc_id
       JOIN ks ON ks.cluster_id = cc.cluster_id
       WHERE cc.doc_id <> cc.cluster_id
       GROUP BY 1, 2""",
    "q199_triangle_count" ->
      s"""WITH $simhashWideCte,
         nodes AS (SELECT simhash, CAST(count(*) AS BIGINT) AS n_members,
                     min(doc_id) AS rep_id
                   FROM simh GROUP BY 1),
         e AS (SELECT a.simhash AS id_1, b.simhash AS id_2
               FROM nodes a JOIN nodes b ON a.simhash < b.simhash
               WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         deg AS (SELECT id, CAST(count(*) AS BIGINT) AS degree
                 FROM (SELECT id_1 AS id FROM e
                       UNION ALL SELECT id_2 FROM e) GROUP BY 1),
         tri AS (SELECT w1.id_1 AS a, w1.id_2 AS b, w2.id_2 AS c
                 FROM e w1 JOIN e w2 ON w2.id_1 = w1.id_2
                 JOIN e w3 ON w3.id_1 = w1.id_1 AND w3.id_2 = w2.id_2),
         pn AS (SELECT id, CAST(count(*) AS BIGINT) AS n_triangles
                FROM (SELECT a AS id FROM tri UNION ALL SELECT b FROM tri
                      UNION ALL SELECT c FROM tri) GROUP BY 1)
       SELECT n.rep_id, n.n_members, COALESCE(d.degree, 0) AS degree,
              COALESCE(p.n_triangles, 0) AS n_triangles
       FROM nodes n LEFT JOIN deg d ON d.id = n.simhash
       LEFT JOIN pn p ON p.id = n.simhash""",
    "q196_decontaminate_scrub" ->
      """WITH te AS (SELECT string_split(text, ' ') AS ts FROM documents
         |           WHERE source = 'src0'),
         |ev AS (SELECT DISTINCT
         |         unnest(list_transform(generate_series(1, len(ts) - 2),
         |           i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS shingle
         |       FROM te),
         |tt AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents
         |       WHERE source <> 'src0'),
         |ps AS (SELECT doc_id, pos,
         |         ts[pos] || ' ' || ts[pos+1] || ' ' || ts[pos+2] AS shingle
         |       FROM (SELECT doc_id, ts,
         |               unnest(generate_series(1, len(ts) - 2)) AS pos
         |             FROM tt)),
         |hits AS (SELECT p.doc_id, p.pos FROM ps p
         |         WHERE p.shingle IN (SELECT shingle FROM ev)),
         |cov AS (SELECT DISTINCT doc_id, pos + i AS p
         |        FROM (SELECT doc_id, pos, unnest(generate_series(0, 2)) AS i
         |              FROM hits)),
         |toks AS (SELECT doc_id, unnest(generate_series(1, len(ts))) AS p, ts
         |         FROM tt),
         |tk AS (SELECT t.doc_id, t.p, t.ts[t.p] AS tok,
         |         EXISTS (SELECT 1 FROM cov c
         |                 WHERE c.doc_id = t.doc_id AND c.p = t.p) AS cut
         |       FROM toks t)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |       CAST(sum(CASE WHEN cut THEN 1 ELSE 0 END) AS BIGINT) AS n_scrubbed,
         |       COALESCE(string_agg(CASE WHEN NOT cut THEN tok END, ' ' ORDER BY p),
         |                '') AS clean_text
         |FROM tk GROUP BY doc_id
         |HAVING sum(CASE WHEN cut THEN 1 ELSE 0 END) > 0""".stripMargin,
    "q195_crossmodal_clusters" -> {
      // q185's fake-twin dHash regenerated for the union (6×11 grid,
      // 60 gradient bits — keep in lockstep with MultimodalQueries)
      val lumaExpr = "list_transform(generate_series(0, 65), " +
        "i -> ord(substr(text, ((7*i+3) % nb) + 1, 1)))"
      val dhBits = (0 until 6).flatMap { r =>
        (0 until 10).map { c =>
          val j = r * 10 + c
          s"(CASE WHEN luma[${r * 11 + c + 2}] > luma[${r * 11 + c + 1}] " +
            s"THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)"
        }
      }.mkString(" + ")
      s"""WITH RECURSIVE $simhashWideCte,
         p AS (SELECT doc_id, text, octet_length(encode(text)) AS nb FROM documents),
         g AS (SELECT doc_id, $lumaExpr AS luma FROM p),
         dh AS (SELECT doc_id, CAST($dhBits AS BIGINT) AS dhash FROM g),
         tpr AS (SELECT a.doc_id AS id_1, b.doc_id AS id_2, 1 AS is_text
                 FROM simh a JOIN simh b ON a.doc_id < b.doc_id
                 WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
         ipr AS (SELECT a.doc_id AS id_1, b.doc_id AS id_2, 0 AS is_text
                 FROM dh a JOIN dh b ON a.doc_id < b.doc_id
                 WHERE bit_count(xor(a.dhash, b.dhash)) <= 3),
         pr AS (SELECT * FROM tpr UNION ALL SELECT * FROM ipr),
         edges AS (SELECT id_1 AS src, id_2 AS dst FROM pr
                   UNION SELECT id_2, id_1 FROM pr),
         walk(id, comp) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.dst, w.comp FROM walk w JOIN edges e ON w.id = e.src),
         cc AS (SELECT id AS doc_id, min(comp) AS cluster_id FROM walk GROUP BY id),
         cs AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size,
                  min(doc_id) AS keeper_id
                FROM cc GROUP BY 1 HAVING count(*) > 1),
         es AS (SELECT c.cluster_id,
                  CAST(sum(p.is_text) AS BIGINT) AS n_text_edges,
                  CAST(sum(1 - p.is_text) AS BIGINT) AS n_image_edges
                FROM pr p JOIN cc c ON p.id_1 = c.doc_id GROUP BY 1)
       SELECT cs.cluster_id, cs.cluster_size, cs.keeper_id,
              COALESCE(es.n_text_edges, 0) AS n_text_edges,
              COALESCE(es.n_image_edges, 0) AS n_image_edges
       FROM cs LEFT JOIN es USING (cluster_id)""".stripMargin
    },
    "q192_bloom_fpr" -> {
      def nib(key: String, i: Int) =
        s"strpos('123456789abcdef', substr(md5($key), $i, 1))"
      def u16(key: String) =
        s"(${nib(key, 1)} * 4096 + ${nib(key, 2)} * 256 + ${nib(key, 3)} * 16 + ${nib(key, 4)})"
      val posSql = u16("'bf' || CAST(r.r AS VARCHAR) || shingle") + " % 32768"
      s"""WITH te AS (SELECT string_split(text, ' ') AS ts FROM documents
         |           WHERE source = 'src0'),
         |ev AS (SELECT DISTINCT
         |         unnest(list_transform(generate_series(1, len(ts) - 2),
         |           i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS shingle
         |       FROM te),
         |tt AS (SELECT string_split(text, ' ') AS ts FROM documents
         |       WHERE source <> 'src0'),
         |tr AS (SELECT DISTINCT
         |         unnest(list_transform(generate_series(1, len(ts) - 2),
         |           i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS shingle
         |       FROM tt),
         |evp AS (SELECT DISTINCT $posSql AS pos
         |        FROM ev, (VALUES (0), (1), (2), (3)) r(r)),
         |hits AS (SELECT shingle,
         |           sum(CASE WHEN $posSql IN (SELECT pos FROM evp)
         |               THEN 1 ELSE 0 END) AS hits
         |         FROM tr, (VALUES (0), (1), (2), (3)) r(r) GROUP BY 1),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_probes,
         |         CAST(sum(CASE WHEN hits = 4 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_pass,
         |         CAST(sum(CASE WHEN shingle IN (SELECT shingle FROM ev)
         |             THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
         |         CAST(sum(CASE WHEN hits = 4 AND shingle NOT IN
         |             (SELECT shingle FROM ev) THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_false_pos
         |       FROM hits),
         |nb AS (SELECT CAST(count(*) AS BIGINT) AS n_bits_set FROM evp),
         |ni AS (SELECT CAST(count(*) AS BIGINT) AS n_items FROM ev)
         |SELECT ni.n_items, nb.n_bits_set, st.n_probes, st.n_pass, st.n_true,
         |       st.n_false_pos,
         |       (st.n_false_pos * 10000) // (st.n_probes - st.n_true)
         |         AS fpr_measured_bps,
         |       (((nb.n_bits_set * nb.n_bits_set * 10000) // 1073741824) *
         |        ((nb.n_bits_set * nb.n_bits_set * 10000) // 1073741824)) // 10000
         |         AS fpr_theory_bps
         |FROM st, nb, ni""".stripMargin
    },
    "q184_minhash_calibration" ->
      s"""WITH $shinglesCte,
         mh AS (SELECT doc_id, $minhashCols FROM sh GROUP BY doc_id),
         bands AS ($bandUnion),
         cand AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
         inter AS (SELECT c.id_1, c.id_2, CAST(count(*) AS BIGINT) AS inter
                   FROM cand c
                   JOIN sh a ON a.doc_id = c.id_1
                   JOIN sh b ON b.doc_id = c.id_2 AND b.shingle = a.shingle
                   GROUP BY 1, 2),
         tj AS (SELECT i.id_1, i.id_2,
                  (10000 * i.inter) // (s1.n + s2.n - i.inter) AS true_bps
                FROM inter i
                JOIN sizes s1 ON s1.doc_id = i.id_1
                JOIN sizes s2 ON s2.doc_id = i.id_2),
         mm AS (SELECT c.id_1, c.id_2,
                  CAST(${(0 until K).map(i =>
                    s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)").mkString(" + ")}
                    AS BIGINT) AS m
                FROM cand c
                JOIN mh a ON a.doc_id = c.id_1
                JOIN mh b ON b.doc_id = c.id_2)
       SELECT m AS n_matching, (m * 10000) // $K AS est_bps,
              CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(CAST(sum(true_bps) AS BIGINT) // count(*) AS BIGINT)
                AS mean_true_bps
       FROM mm JOIN tj USING (id_1, id_2) GROUP BY 1, 2""",
    "q144_near_decontaminate" ->
      s"""WITH $shinglesCte,
         mh AS (SELECT doc_id, $minhashCols FROM sh GROUP BY doc_id),
         bands AS ($bandUnion),
         sp AS (SELECT doc_id,
                  CASE WHEN ${graft.QueryPack.md5Bucket10Sql("CAST(doc_id AS VARCHAR)")} < 9
                       THEN 'train' ELSE 'eval' END AS split
                FROM documents),
         cand AS (SELECT DISTINCT a.doc_id AS lid, b.doc_id AS rid
                  FROM bands a
                  JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
                  JOIN sp sa ON sa.doc_id = a.doc_id
                  JOIN sp sb ON sb.doc_id = b.doc_id
                  WHERE sa.split = 'train' AND sb.split = 'eval'),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT c.lid, c.rid, count(*) AS inter
                   FROM cand c
                   JOIN sh a ON a.doc_id = c.lid
                   JOIN sh b ON b.doc_id = c.rid AND b.shingle = a.shingle
                   GROUP BY 1, 2)
       SELECT lid AS train_id, rid AS eval_id, jaccard FROM (
         SELECT i.lid, i.rid,
                CAST(i.inter AS DOUBLE) / CAST(s1.n + s2.n - i.inter AS DOUBLE) AS jaccard
         FROM inter i
         JOIN sizes s1 ON s1.doc_id = i.lid
         JOIN sizes s2 ON s2.doc_id = i.rid)
       WHERE jaccard >= $MIN_JACCARD""",
    "q68_dedup_clusters" -> ccFullRecomputeSql,
    // q220's gate IS the equality proof: the incremental maintenance
    // path must hash-match the full-corpus CC recompute, so its oracle
    // is q68's verbatim. q228 makes the same claim for the STREAMED
    // fold of ledgered micro-batches.
    "q220_incremental_cc" -> ccFullRecomputeSql,
    "q228_stream_cc" -> ccFullRecomputeSql,
    "q250_text_release" -> {
      import TextQueries.{nTokensSql, stopRatioSql}
      val q6Sql = s"CAST(floor((least(1.0, CAST($nTokensSql AS DOUBLE) / 50.0)" +
        s" * (1.0 - $stopRatioSql)) * 1000000.0) AS BIGINT)"
      val bkt = graft.QueryPack.md5Bucket10Sql("CAST(u.doc_id AS VARCHAR)")
      s"""WITH $shinglesCte,
         |uni AS (SELECT doc_id, source, text,
         |          CAST($nTokensSql AS BIGINT) AS n_tokens,
         |          $q6Sql >= 500000 AS gated
         |        FROM documents WHERE source != 'src0'),
         |g AS (SELECT * FROM uni WHERE gated),
         |k AS (SELECT min(doc_id) AS doc_id FROM g
         |      GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
         |dd AS (SELECT g.doc_id FROM g JOIN k USING (doc_id)),
         |ev AS (SELECT DISTINCT shingle FROM sh JOIN documents USING (doc_id)
         |       WHERE source = 'src0'),
         |lk AS (SELECT sh.doc_id FROM sh JOIN dd ON dd.doc_id = sh.doc_id
         |       JOIN ev USING (shingle) GROUP BY sh.doc_id HAVING count(*) >= 3),
         |cl AS (SELECT dd.doc_id FROM dd LEFT JOIN lk ON lk.doc_id = dd.doc_id
         |       WHERE lk.doc_id IS NULL),
         |f AS (SELECT u.source, u.n_tokens, u.gated,
         |        dd.doc_id IS NOT NULL AS is_dedup,
         |        cl.doc_id IS NOT NULL AS is_clean,
         |        CASE WHEN cl.doc_id IS NULL THEN NULL
         |             WHEN $bkt < 8 THEN 'train'
         |             WHEN $bkt = 8 THEN 'val' ELSE 'test' END AS split
         |      FROM uni u
         |      LEFT JOIN dd ON dd.doc_id = u.doc_id
         |      LEFT JOIN cl ON cl.doc_id = u.doc_id)
         |SELECT source, count(*) AS n_raw,
         |  CAST(SUM(CASE WHEN gated THEN 1 ELSE 0 END) AS BIGINT) AS n_gated,
         |  CAST(SUM(CASE WHEN is_dedup THEN 1 ELSE 0 END) AS BIGINT) AS n_deduped,
         |  CAST(SUM(CASE WHEN is_clean THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
         |  CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
         |  CAST(SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
         |  CAST(SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
         |  CAST(SUM(CASE WHEN is_clean THEN n_tokens ELSE 0 END) AS BIGINT)
         |    AS tok_released
         |FROM f GROUP BY 1""".stripMargin
    },
    "q248_cluster_split" -> {
      def split(b: String) =
        s"CASE WHEN $b < 8 THEN 'train' WHEN $b = 8 THEN 'val' ELSE 'test' END"
      val bc = graft.QueryPack.md5Bucket10Sql("CAST(cluster_id AS VARCHAR)", "cs1-")
      val bd = graft.QueryPack.md5Bucket10Sql("CAST(doc_id AS VARCHAR)")
      def report(mode: String, sCol: String) =
        s"""SELECT '$mode' AS mode,
           |  CAST(SUM(CASE WHEN $sCol = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
           |  CAST(SUM(CASE WHEN $sCol = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
           |  CAST(SUM(CASE WHEN $sCol = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
           |  (SELECT CAST(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
           |   FROM (SELECT cluster_id, count(DISTINCT $sCol) AS ns
           |         FROM a GROUP BY 1)) AS n_spanning
           |FROM a""".stripMargin
      s"""WITH $ccChainSql,
         |a AS (SELECT doc_id, cluster_id,
         |        ${split(bc)} AS s_cluster,
         |        ${split(bd)} AS s_doc
         |      FROM cc)
         |${report("cluster_aware", "s_cluster")}
         |UNION ALL
         |${report("doc_level", "s_doc")}""".stripMargin
    },
    "q246_containment" ->
      s"""WITH $shinglesCte,
         df0 AS (SELECT shingle, CAST(count(*) AS BIGINT) AS nd
                 FROM sh GROUP BY 1),
         sdf AS (SELECT shingle FROM df0 WHERE nd BETWEEN 2 AND $MAX_SHINGLE_DF),
         kk AS (SELECT GREATEST(1, (CAST(COALESCE(SUM(nd * (nd - 1) // 2), 0) AS BIGINT)
                         + $CONTAIN_CAND_CAP - 1) // $CONTAIN_CAND_CAP) AS k
                FROM df0 WHERE nd BETWEEN 2 AND $MAX_SHINGLE_DF),
         cs AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
                FROM sh a JOIN sdf USING (shingle)
                JOIN sh b ON b.shingle = a.shingle AND a.doc_id < b.doc_id
                CROSS JOIN kk
                WHERE ((CAST(a.doc_id AS BIGINT) % ${Dedup.SAMPLE_P}) * ${Dedup.SAMPLE_A}
                       + (CAST(b.doc_id AS BIGINT) % ${Dedup.SAMPLE_P}) * ${Dedup.SAMPLE_B})
                      % ${Dedup.SAMPLE_P} % k = 0),
         sets AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
         iv AS (SELECT c.id_1, c.id_2, CAST(count(*) AS BIGINT) AS inter
                FROM cs c JOIN sh a ON a.doc_id = c.id_1
                JOIN sh b ON b.doc_id = c.id_2 AND b.shingle = a.shingle
                GROUP BY 1, 2),
         m AS (SELECT iv.id_1, iv.id_2, inter, s1.n AS n1, s2.n AS n2,
                 (inter * 10000) // LEAST(s1.n, s2.n) AS cont_bps,
                 (inter * 10000) // (s1.n + s2.n - inter) AS jac_bps
               FROM iv JOIN sets s1 ON s1.doc_id = iv.id_1
               JOIN sets s2 ON s2.doc_id = iv.id_2)
       SELECT id_1, id_2, inter, n1, n2, cont_bps, jac_bps,
              cont_bps - jac_bps AS gap_bps
       FROM m ORDER BY gap_bps DESC, id_1, id_2 LIMIT 20""",
    "q244_cluster_strength" ->
      s"""WITH RECURSIVE $shinglesCte,
         mh AS (SELECT doc_id, $minhashCols FROM sh GROUP BY doc_id),
         bands AS ($bandUnion),
         cand AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         verified AS ($jaccardSelect),
         pairs AS (SELECT c.id_1, c.id_2, v.jaccard
                   FROM cand c JOIN verified v ON c.id_1 = v.id_1 AND c.id_2 = v.id_2),
         edges AS (SELECT id_1 AS src, id_2 AS dst FROM pairs
                   UNION ALL SELECT id_2, id_1 FROM pairs),
         walk(id, comp) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.dst, w.comp FROM walk w JOIN edges e ON w.id = e.src),
         cc AS (SELECT id AS doc_id, min(comp) AS cluster_id FROM walk GROUP BY id),
         sz AS (SELECT cluster_id, count(*) AS n_members FROM cc GROUP BY 1)
       SELECT c1.cluster_id, sz.n_members,
              count(*) AS n_edges,
              CAST(MIN(CAST(floor(p.jaccard * 10000) AS BIGINT)) AS BIGINT) AS min_j_bps,
              CAST(MAX(CAST(floor(p.jaccard * 10000) AS BIGINT)) AS BIGINT) AS max_j_bps,
              CAST(SUM(CASE WHEN p.jaccard < 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS n_weak
       FROM pairs p
       JOIN cc c1 ON c1.doc_id = p.id_1
       JOIN sz ON sz.cluster_id = c1.cluster_id
       GROUP BY 1, 2""",
    "q238_dup_growth" ->
      """WITH r AS (SELECT doc_id,
         |            md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
         |            row_number() OVER (ORDER BY doc_id) AS ord,
         |            count(*) OVER () AS n
         |          FROM documents),
         |dd AS (SELECT CAST(((ord - 1) * 10) // n + 1 AS INT) AS dec, fp FROM r),
         |pd AS (SELECT dec, count(*) AS n_docs FROM dd GROUP BY 1),
         |fst AS (SELECT fd AS dec, count(*) AS n_new
         |        FROM (SELECT fp, MIN(dec) AS fd FROM dd GROUP BY 1) GROUP BY 1),
         |j AS (SELECT COALESCE(pd.dec, fst.dec) AS dec,
         |        COALESCE(n_docs, 0) AS n_docs, COALESCE(n_new, 0) AS n_new
         |      FROM pd FULL OUTER JOIN fst ON pd.dec = fst.dec),
         |c AS (SELECT dec,
         |        CAST(SUM(n_docs) OVER (ORDER BY dec
         |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_docs_cum,
         |        CAST(SUM(n_new) OVER (ORDER BY dec
         |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_distinct_cum
         |      FROM j)
         |SELECT dec, n_docs_cum, n_distinct_cum,
         |       n_docs_cum - n_distinct_cum AS n_dups_cum,
         |       CAST(((n_docs_cum - n_distinct_cum) * 10000) // n_docs_cum
         |            AS BIGINT) AS dup_rate_bps
         |FROM c""".stripMargin,
    "q219_lsh_autotune" -> {
      val thr = (MIN_JACCARD * 1000000).toLong
      val curveUnion = LSH_CONFIGS.map { case (b, r) =>
        val sr = powPpmExpr("s_ppm", r, "//")
        val qb = powPpmExpr(s"(1000000 - $sr)", b, "//")
        s"""SELECT $b AS bands, $r AS rows_per_band, s_ppm,
           |       1000000 - $qb AS p_ppm FROM grid""".stripMargin
      }.mkString("\n UNION ALL\n")
      s"""WITH grid AS (SELECT unnest(generate_series(0, 20)) * 50000 AS s_ppm),
         |c AS ($curveUnion),
         |e AS (SELECT bands, rows_per_band,
         |        CAST(sum(abs(p_ppm - CASE WHEN s_ppm >= $thr
         |                                  THEN 1000000 ELSE 0 END)) AS BIGINT)
         |          AS err_sum
         |      FROM c GROUP BY 1, 2),
         |m AS (SELECT min(err_sum) AS me FROM e),
         |mb AS (SELECT min(bands) AS mbnd FROM e WHERE err_sum = (SELECT me FROM m))
         |SELECT bands, rows_per_band, err_sum,
         |       (err_sum = (SELECT me FROM m)
         |        AND bands = (SELECT mbnd FROM mb)) AS chosen
         |FROM e""".stripMargin
    },
    "q217_seed_distance" ->
      s"""WITH RECURSIVE $shinglesCte,
         mh AS (SELECT doc_id, $minhashCols FROM sh GROUP BY doc_id),
         bands AS ($bandUnion),
         cand AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         verified AS ($jaccardSelect),
         pairs AS (SELECT c.id_1, c.id_2
                   FROM cand c JOIN verified v ON c.id_1 = v.id_1 AND c.id_2 = v.id_2),
         edges AS (SELECT id_1 AS src, id_2 AS dst FROM pairs
                   UNION ALL SELECT id_2, id_1 FROM pairs),
         walk(id, dist) AS (
           SELECT doc_id, 0 FROM documents WHERE source = 'src0'
           UNION
           SELECT e.dst, w.dist + 1 FROM walk w JOIN edges e ON w.id = e.src
           WHERE w.dist < 4)
       SELECT id AS doc_id, CAST(min(dist) AS BIGINT) AS hops
       FROM walk GROUP BY id""",
    "q158_cc_hash_to_min" ->
      """SELECT doc_id,
                min(doc_id) OVER (PARTITION BY lang) AS cluster_id,
                count(*)    OVER (PARTITION BY lang) AS cluster_size
         FROM documents""",
    // same chain graph, same min-label contract as q158 — the chain's
    // components ARE the languages, so the oracle is the same window
    "q255_cc_alternating_star" ->
      """SELECT doc_id,
                min(doc_id) OVER (PARTITION BY lang) AS cluster_id,
                count(*)    OVER (PARTITION BY lang) AS cluster_size
         FROM documents""",
    "q84_vocab_topk" ->
      s"""WITH $shinglesCte
         SELECT shingle, count(*) AS df FROM sh
         GROUP BY shingle ORDER BY df DESC, shingle LIMIT 100""",
    "q83_decontaminate" ->
      s"""WITH $shinglesCte,
         ev AS (SELECT DISTINCT shingle FROM sh
                JOIN documents USING (doc_id) WHERE source = 'src0'),
         tr AS (SELECT sh.doc_id, sh.shingle FROM sh
                JOIN documents USING (doc_id) WHERE source != 'src0')
       SELECT doc_id, count(*) AS n_shared
       FROM tr JOIN ev USING (shingle)
       GROUP BY doc_id
       HAVING count(*) >= 3""",
    "q92_bloom_decontaminate" ->
      s"""WITH $shinglesCte,
         ev AS (SELECT DISTINCT shingle FROM sh
                JOIN documents USING (doc_id) WHERE source = 'src0'),
         tr AS (SELECT sh.doc_id, sh.shingle FROM sh
                JOIN documents USING (doc_id) WHERE source != 'src0')
       SELECT doc_id, count(*) AS n_shared
       FROM tr JOIN ev USING (shingle)
       GROUP BY doc_id
       HAVING count(*) >= 2""",
    "q80_dedup_filter" ->
      s"""WITH RECURSIVE $shinglesCte,
         mh AS (SELECT doc_id, $minhashCols FROM sh GROUP BY doc_id),
         bands AS ($bandUnion),
         cand AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         verified AS ($jaccardSelect),
         pairs AS (SELECT c.id_1, c.id_2
                   FROM cand c JOIN verified v ON c.id_1 = v.id_1 AND c.id_2 = v.id_2),
         edges AS (SELECT id_1 AS src, id_2 AS dst FROM pairs
                   UNION ALL SELECT id_2, id_1 FROM pairs),
         walk(id, comp) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.dst, w.comp FROM walk w JOIN edges e ON w.id = e.src),
         cc AS (SELECT id AS doc_id, min(comp) AS cluster_id FROM walk GROUP BY id),
         keep AS (SELECT min(doc_id) AS doc_id FROM cc GROUP BY cluster_id)
       SELECT d.doc_id, d.source, d.lang
       FROM documents d JOIN keep USING (doc_id)""",
    "q145_dedup_keep_best" ->
      s"""WITH RECURSIVE $shinglesCte,
         mh AS (SELECT doc_id, $minhashCols FROM sh GROUP BY doc_id),
         bands AS ($bandUnion),
         cand AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
                  FROM bands a JOIN bands b
                    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         verified AS ($jaccardSelect),
         pairs AS (SELECT c.id_1, c.id_2
                   FROM cand c JOIN verified v ON c.id_1 = v.id_1 AND c.id_2 = v.id_2),
         edges AS (SELECT id_1 AS src, id_2 AS dst FROM pairs
                   UNION ALL SELECT id_2, id_1 FROM pairs),
         walk(id, comp) AS (
           SELECT doc_id, doc_id FROM documents
           UNION
           SELECT e.dst, w.comp FROM walk w JOIN edges e ON w.id = e.src),
         cc AS (SELECT id AS doc_id, min(comp) AS cluster_id FROM walk GROUP BY id),
         q AS (SELECT doc_id,
                 least(1.0, CAST(${TextQueries.nTokensSql} AS DOUBLE) / 50.0)
                   * (1.0 - ${TextQueries.stopRatioSql}) AS quality
               FROM documents),
         keep AS (SELECT doc_id FROM (
                    SELECT cc.doc_id,
                           row_number() OVER (PARTITION BY cc.cluster_id
                                ORDER BY q.quality DESC, cc.doc_id) AS rn
                    FROM cc JOIN q USING (doc_id))
                  WHERE rn = 1)
       SELECT d.doc_id, d.source, d.lang
       FROM documents d JOIN keep USING (doc_id)""",
    // Mirrors Dedup.groupOverlapMatrix: distinct (source, shingle),
    // pairwise intersection, full matrix from the sizes cross with
    // zero-overlap coalesce; jaccard floor-quantized to bps in pure
    // integer division (NULL only if both sides are shingle-free).
    "q128_source_overlap" ->
      s"""WITH toks AS (SELECT source, string_split(text, ' ') AS ts FROM documents),
         raw AS (SELECT source,
                   unnest(list_transform(generate_series(1, len(ts) - 2),
                          i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS shingle
                 FROM toks),
         gsh AS (SELECT DISTINCT source, shingle FROM raw),
         sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS m FROM gsh GROUP BY 1),
         inter AS (SELECT a.source AS grp_1, b.source AS grp_2,
                     CAST(count(*) AS BIGINT) AS n_shared
                   FROM gsh a JOIN gsh b
                     ON a.shingle = b.shingle AND a.source < b.source
                   GROUP BY 1, 2)
         SELECT s1.source AS grp_1, s2.source AS grp_2, s1.m AS m1, s2.m AS m2,
           COALESCE(n_shared, 0) AS n_shared,
           CASE WHEN s1.m + s2.m - COALESCE(n_shared, 0) != 0
                THEN (10000 * COALESCE(n_shared, 0))
                     // (s1.m + s2.m - COALESCE(n_shared, 0))
           END AS jaccard_bps
         FROM sizes s1 JOIN sizes s2 ON s1.source < s2.source
         LEFT JOIN inter ON inter.grp_1 = s1.source AND inter.grp_2 = s2.source""",
    "q47_simhash" ->
      s"WITH $simhashCte SELECT doc_id, simhash FROM simh",
    "q48_simhash_pairs" ->
      s"""WITH $simhashCte
       SELECT a.doc_id AS id_1, b.doc_id AS id_2,
              CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       FROM simh a JOIN simh b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""",
    "q152_lsh_curve" -> {
      val configs = Seq(2, 4, 8)
      val perConfig = configs.map { b =>
        s"""bands$b AS (${bandUnionFor(b)}),
           cand$b AS (SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
                      FROM bands$b a JOIN bands$b b
                        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)"""
      }.mkString(",\n         ")
      val rows = configs.map { b =>
        s"""SELECT $b AS bands, ${K / b} AS rows_per_band,
             (SELECT count(*) FROM cand$b) AS n_candidates,
             (SELECT count(*) FROM truth) AS n_true_pairs,
             (SELECT count(*) FROM truth t JOIN cand$b c
                ON t.id_1 = c.id_1 AND t.id_2 = c.id_2) AS n_detected"""
      }.mkString(" UNION ALL ")
      s"""WITH $shinglesCte,
         mh AS (SELECT doc_id, $minhashCols FROM sh GROUP BY doc_id),
         truth AS (SELECT id_1, id_2 FROM ($jaccardSelect)),
         $perConfig
       SELECT bands, rows_per_band, n_candidates, n_true_pairs, n_detected,
         CASE WHEN n_true_pairs = 0 THEN 0
              ELSE CAST(floor(10000.0 * n_detected / n_true_pairs) AS BIGINT)
         END AS recall_bps
       FROM ($rows)"""
    },
    // Same verified-pair CTEs as q157; the landed set is idx plus the
    // new docs untouched by either pair class (any-idx hit, or a
    // smaller-id new pair).
    "q166_stream_dedup_ingest" ->
      s"""WITH $shinglesCte,
         mh AS (SELECT doc_id, $minhashCols FROM sh GROUP BY doc_id),
         bands AS ($bandUnion),
         sp AS (SELECT doc_id,
                  CASE WHEN ${graft.QueryPack.md5Bucket10Sql("CAST(doc_id AS VARCHAR)")} < 9
                       THEN 'idx' ELSE 'new' END AS split
                FROM documents),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2, TRUE AS vs_index
           FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
           JOIN sp sa ON sa.doc_id = a.doc_id
           JOIN sp sb ON sb.doc_id = b.doc_id
           WHERE sa.split = 'new' AND sb.split = 'idx'
           UNION
           SELECT DISTINCT a.doc_id, b.doc_id, FALSE
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
           JOIN sp sa ON sa.doc_id = a.doc_id
           JOIN sp sb ON sb.doc_id = b.doc_id
           WHERE sa.split = 'new' AND sb.split = 'new'),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT c.id_1, c.id_2, c.vs_index, count(*) AS inter
                   FROM cand c
                   JOIN sh a ON a.doc_id = c.id_1
                   JOIN sh b ON b.doc_id = c.id_2 AND b.shingle = a.shingle
                   GROUP BY 1, 2, 3),
         p AS (SELECT id_1, id_2, vs_index FROM (
                 SELECT i.id_1, i.id_2, i.vs_index,
                        CAST(i.inter AS DOUBLE) / CAST(s1.n + s2.n - i.inter AS DOUBLE) AS jaccard
                 FROM inter i
                 JOIN sizes s1 ON s1.doc_id = i.id_1
                 JOIN sizes s2 ON s2.doc_id = i.id_2)
               WHERE jaccard >= $MIN_JACCARD),
         dropped AS (SELECT id_1 AS doc_id FROM p WHERE vs_index
                     UNION SELECT id_2 FROM p WHERE NOT vs_index)
       SELECT d.doc_id, d.source
       FROM documents d JOIN sp USING (doc_id)
       WHERE sp.split = 'idx'
          OR d.doc_id NOT IN (SELECT doc_id FROM dropped)""",
    "q157_incremental_dedup" ->
      s"""WITH $shinglesCte,
         mh AS (SELECT doc_id, $minhashCols FROM sh GROUP BY doc_id),
         bands AS ($bandUnion),
         sp AS (SELECT doc_id,
                  CASE WHEN ${graft.QueryPack.md5Bucket10Sql("CAST(doc_id AS VARCHAR)")} < 9
                       THEN 'idx' ELSE 'new' END AS split
                FROM documents),
         cand AS (
           SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2, TRUE AS vs_index
           FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
           JOIN sp sa ON sa.doc_id = a.doc_id
           JOIN sp sb ON sb.doc_id = b.doc_id
           WHERE sa.split = 'new' AND sb.split = 'idx'
           UNION
           SELECT DISTINCT a.doc_id, b.doc_id, FALSE
           FROM bands a JOIN bands b
             ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
           JOIN sp sa ON sa.doc_id = a.doc_id
           JOIN sp sb ON sb.doc_id = b.doc_id
           WHERE sa.split = 'new' AND sb.split = 'new'),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         inter AS (SELECT c.id_1, c.id_2, c.vs_index, count(*) AS inter
                   FROM cand c
                   JOIN sh a ON a.doc_id = c.id_1
                   JOIN sh b ON b.doc_id = c.id_2 AND b.shingle = a.shingle
                   GROUP BY 1, 2, 3)
       SELECT id_1, id_2, jaccard, vs_index FROM (
         SELECT i.id_1, i.id_2, i.vs_index,
                CAST(i.inter AS DOUBLE) / CAST(s1.n + s2.n - i.inter AS DOUBLE) AS jaccard
         FROM inter i
         JOIN sizes s1 ON s1.doc_id = i.id_1
         JOIN sizes s2 ON s2.doc_id = i.id_2)
       WHERE jaccard >= $MIN_JACCARD"""
  )
}
