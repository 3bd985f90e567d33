package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomFunctions

/** Document deduplication operators for training-data pipelines:
  * exact (fingerprint group-by), n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (the part that matters at 100 TB):
  *  - exact dedup is one hash-aggregate on a 128-bit fingerprint — the
  *    shuffle key is the fingerprint, perfectly balanced.
  *  - pairwise Jaccard is NEVER run all-pairs at scale: candidates come
  *    from the LSH band-bucket join, and the exact Jaccard only verifies
  *    candidates. `maxShingleDf` caps hot-shingle fan-out (a shingle in
  *    k docs produces k² candidate rows — stopword-like shingles must be
  *    dropped, they carry no signal).
  *  - MinHash signatures are one group-by over the shingle table; LSH
  *    banding turns near-dup search into an equi-join on (band, key) —
  *    the classic shuffle-friendly formulation.
  */
object Dedup {

  /** Exact dedup: one row per distinct fingerprint with the kept doc id
    * (min) and the duplicate count.
    */
  def exactGroups(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.select(TextFunctions.fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))

  /** (id, shingle) table — distinct word n-gram shingles per document.
    * Tokenizes in its own projection so the shingle expression references
    * the token ARRAY attribute (one split per doc, not per element_at).
    */
  def shingleTable(docs: DataFrame, textCol: String, idCol: String, n: Int): DataFrame =
    docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__ts"))
      .select(col(idCol), explode(TextFunctions.shinglesOfTokens(col("__ts"), n)).as("shingle"))

  /** Every ordered pair (x before y) from the SORTED array `ids`, as
    * structs (f1, f2) — the pair-emission idiom all grouped-postings
    * operators share ([[jaccardPairs]], [[sharedShingleCandidates]],
    * [[groupOverlapMatrix]], [[simhashPairs]]' Hamming-0 branch). One
    * home because the slice offset is the classic off-by-one site:
    * `slice` is 1-based and the lambda index 0-based, so "everything
    * after x" starts at i + 2.
    */
  private[operators] def orderedPairsOf(ids: Column, f1: String, f2: String): Column =
    flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + lit(2), size(ids)),
        y => struct(x.as(f1), y.as(f2)))))

  /** Exact pairwise n-gram Jaccard ≥ minJaccard via shingle self-join.
    * `maxShingleDf` (optional) drops shingles occurring in more docs —
    * required at scale, off by default for oracle parity.
    */
  def jaccardPairs(shingles: DataFrame, idCol: String, minJaccard: Double,
                   maxShingleDf: Option[Int] = None): DataFrame = {
    // ONE user-pinned shingle exchange at the top ([[KernelPar]]): the
    // pair EXPLOSION below runs in this exchange's reduce stage, and
    // its Σ df·(df−1)/2 output rows are invisible to AQE's byte-based
    // coalescing of the (small) shingle input — left alone the whole
    // explosion lands on 1-4 tasks. In capped mode the hot-df aggregate
    // and the anti-join probe are subtrees of the SAME pinned exchange
    // (ReuseExchange), so the pin adds no shuffle on either branch.
    // Per-group results are partition-independent (count aggregates),
    // so the relation is unchanged under any partitioning.
    val shP = shingles.repartition(
      KernelPar.partitions(shingles.sparkSession), col("shingle"))
    val sh = maxShingleDf match {
      case Some(cap) =>
        val hot = shP.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select("shingle")
        shP.join(hot, Seq("shingle"), "left_anti")
      case None => shP
    }
    // Intersection counting WITHOUT a self-join: group each shingle's
    // (sorted) doc list, emit its ordered pairs set-based, count pairs.
    // One shuffle on the shingle key instead of a join shuffle + fan-out;
    // rows produced = Σ df·(df−1)/2, half the join's Σ df². Hot shingles
    // still need the `maxShingleDf` cap at scale — a df-k shingle emits
    // k²/2 pairs either way.
    val grouped = sh.groupBy(col("shingle"))
      .agg(sort_array(collect_set(col(idCol))).as("ids"))
    // Doc sizes derived from the SAME grouped relation (not from `sh`
    // again): both branches sit on one Exchange(shingle), so Spark's
    // ReuseExchange evaluates the shingle generation once.
    val sizes = grouped.select(explode(col("ids")).as(idCol))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n"))
    val inter = grouped
      .filter(size(col("ids")) > 1)
      .select(explode(orderedPairsOf(col("ids"), "id_1", "id_2")).as("p"))
      .groupBy(col("p.id_1").as("id_1"), col("p.id_2").as("id_2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("id_1", "n1"), "id_1")
      .join(sizes.toDF("id_2", "n2"), "id_2")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n1") + col("n2") - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("id_1"), col("id_2"), col("jaccard"))
  }

  /** Position-preserving shingle relation (id, pos, shingle) — pos is
    * the 1-based token index the n-gram starts at, one row per START
    * POSITION (repeated shingles keep every occurrence; [[shingleTable]]
    * dedups, which destroys the run structure exact-substring matching
    * reads). Row count = Σ max(0, len−n+1) — same order as the token
    * explosion every other shingle consumer already pays.
    */
  def positionalShingleTable(docs: DataFrame, textCol: String, idCol: String,
                             n: Int): DataFrame =
    docs.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__ts"))
      .select(col(idCol),
        posexplode(TextFunctions.positionalShinglesOfTokens(col("__ts"), n)))
      .select(col(idCol), (col("pos") + 1).as("pos"), col("col").as("shingle"))

  /** Exact-substring near-dup detection (the "ExactSubstr" pass of Lee
    * et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better", arXiv:2107.06499): for each CANDIDATE pair, the length in
    * tokens of the longest verbatim shared token run — the signal that
    * catches a quoted paragraph inside two otherwise-different pages,
    * which whole-document Jaccard dilutes below any threshold.
    *
    * Not a suffix array: a shared run of length L ≥ n is exactly a
    * maximal chain of L−n+1 consecutive positional-shingle matches on
    * one diagonal d = p1−p2. So: join the two sides' positional
    * shingles (id_1, p1) × (id_2, p2) on shingle equality restricted to
    * the candidate pairs, group matches by (pair, diagonal), and find
    * the longest consecutive-p1 island via the classic gaps-and-islands
    * grouping key p1 − row_number(). (pair, diag, p1) is unique — p2 is
    * determined by the diagonal — so the window order is total and the
    * result deterministic.
    *
    * Scale: work is Σ over candidate pairs of matched positions — LSH
    * candidates bound the pair set, document length bounds the match
    * fan-out, and the island window partitions by (pair, diagonal),
    * every partition ≤ min(len_1, len_2) rows. Nothing is quadratic in
    * the corpus; all-pairs mode is exactly what this operator exists to
    * avoid.
    *
    * Returns (id_1, id_2, longest_tokens, n_matched_positions) for
    * pairs whose longest run ≥ `minTokens` (must be ≥ n).
    */
  def longestSharedRuns(posShingles: DataFrame, pairs: DataFrame,
                        n: Int, minTokens: Int): DataFrame = {
    require(minTokens >= n,
      s"minTokens=$minTokens below the shingle width $n is unobservable: " +
        "the shortest detectable run is one shingle = n tokens")
    val a = posShingles.toDF("id_1", "p1", "shingle")
    val b = posShingles.toDF("id_2", "p2", "shingle")
    // distinct, not a documented precondition: a duplicated (id_1,id_2)
    // row would fragment the p1 − row_number() islands and double-count
    // matches — cheap to guard here (candidate-bounded relation).
    val m = pairs.select(col("id_1"), col("id_2")).distinct()
      .join(a, Seq("id_1"))
      .join(b, Seq("id_2", "shingle"))
    runsFromMatches(m, n, minTokens)
  }

  /** Gaps-and-islands fold shared by [[longestSharedRuns]] and
    * [[exactSubstrRuns]]: matches (id_1, p1, id_2, p2, …) → per-pair
    * longest diagonal run. Window partitions by (pair, diagonal), every
    * partition ≤ min(len_1, len_2) rows — never corpus-sized.
    */
  private def runsFromMatches(m: DataFrame, n: Int, minTokens: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("id_1"), col("id_2"), col("diag"))
      .orderBy(col("p1"))
    m.withColumn("diag", col("p1") - col("p2"))
      .withColumn("grp", col("p1") - row_number().over(w))
      .groupBy(col("id_1"), col("id_2"), col("diag"), col("grp"))
      .agg(count(lit(1)).as("run"))
      .groupBy(col("id_1"), col("id_2"))
      .agg((max(col("run")) + lit(n - 1)).as("longest_tokens"),
        sum(col("run")).as("n_matched_positions"))
      .filter(col("longest_tokens") >= minTokens)
  }

  /** [[longestSharedRuns]] ∘ [[sharedShingleCandidates]] fused into one
    * posting-list pass — same result relation, an order of magnitude
    * less shuffle. The composed form first materializes candidate
    * pairs, then re-joins BOTH full positional-shingle sides against
    * them: the a-side inflates to |pairs| × positions(id_1) rows (tens
    * of millions at sf0.1) before the (id_2, shingle) join prunes
    * non-matches. But a match IS two occurrences of the same shingle in
    * different documents — so this operator groups the positional table
    * by shingle once and emits cross-document occurrence pairs straight
    * off each rare shingle's posting list: exactly the match relation,
    * no candidate×position blow-up, cost Σ_shingle occ² bounded by the
    * df cap (occ ≤ maxDf docs × per-doc repeats, both bounded).
    *
    * Hot shingles (df > maxDf) still contribute MATCHES (a quoted run's
    * interior may cross corpus-hot trigrams) without generating
    * candidates, via the old join shape restricted to the hot slice and
    * the rare-derived pairs — both sides small by construction.
    * Candidate semantics are [[sharedShingleCandidates]]' verbatim:
    * a pair qualifies iff it shares ≥ 1 shingle with doc-df in
    * [2, maxDf]. TextDedupSpec pins the ≡ on a hot-shingle corpus.
    */
  def exactSubstrRuns(posShingles: DataFrame, maxDf: Int,
                      n: Int, minTokens: Int): DataFrame = {
    require(minTokens >= n,
      s"minTokens=$minTokens below the shingle width $n is unobservable: " +
        "the shortest detectable run is one shingle = n tokens")
    require(maxDf >= 2, s"maxDf=$maxDf must be >= 2 (a df-1 shingle has no pair)")
    val ps = posShingles.toDF("__id", "__p", "shingle")
    val dfs = ps.groupBy(col("shingle"))
      .agg(count_distinct(col("__id")).as("nd"))
    val rare = dfs.filter(col("nd").between(2, maxDf)).select(col("shingle"))
    val hot = dfs.filter(col("nd") > maxDf).select(col("shingle"))
    // rare matches straight off the posting lists: sort occurrences by
    // (doc, pos), pair each with every LATER occurrence in a different
    // document — sortedness makes id_1 < id_2 hold by construction
    val os = col("os")
    val rareMatches = ps.join(rare, "shingle")
      .groupBy(col("shingle"))
      .agg(sort_array(collect_list(
        struct(col("__id").as("i"), col("__p").as("p")))).as("os"))
      .select(explode(flatten(transform(os, (x, i) =>
        filter(
          transform(slice(os, i + lit(2), size(os)), y =>
            struct(x.getField("i").as("id_1"), x.getField("p").as("p1"),
              y.getField("i").as("id_2"), y.getField("p").as("p2"))),
          s => s.getField("id_1") =!= s.getField("id_2"))))).as("m"))
      .select(col("m.id_1").as("id_1"), col("m.p1").as("p1"),
        col("m.id_2").as("id_2"), col("m.p2").as("p2"))
    val cands = rareMatches.select(col("id_1"), col("id_2")).distinct()
    val hotOcc = ps.join(hot, "shingle")
    val hotA = hotOcc
      .select(col("__id").as("id_1"), col("__p").as("p1"), col("shingle"))
    val hotB = hotOcc
      .select(col("__id").as("id_2"), col("__p").as("p2"), col("shingle"))
    val hotMatches = cands.join(hotA, Seq("id_1")).join(hotB, Seq("id_2", "shingle"))
      .select(col("id_1"), col("p1"), col("id_2"), col("p2"))
    runsFromMatches(rareMatches.unionByName(hotMatches), n, minTokens)
  }

  /** Candidate pairs for [[longestSharedRuns]] drawn from the shingle
    * relation ITSELF: two documents are candidates iff they share at
    * least one RARE shingle (document frequency ≤ `maxDf`). This is
    * the right candidate generator for exact-substring detection —
    * a quoted run of L ≥ n tokens contributes L−n+1 shared shingles,
    * so the pair surfaces unless every one of them is corpus-hot
    * (boilerplate), whereas document-LEVEL MinHash LSH only collides
    * pairs whose whole-document Jaccard clears the band threshold —
    * exactly the pairs a quoted paragraph between otherwise-different
    * pages does NOT produce (P ≈ 1−(1−j²)⁴ ≈ 1% at j = 0.05).
    *
    * Scale: df is computed first and the hot tail dropped BEFORE any
    * id list materializes, so each surviving shingle groups ≤ maxDf
    * ids and emits ≤ maxDf·(maxDf−1)/2 ordered pairs — total work
    * ≤ maxDf · |postings|, linear in the corpus at constant cap, the
    * same df-cap device as [[jaccardPairs]]. Recall loss is confined
    * to runs made ENTIRELY of above-cap shingles, which at any corpus
    * size means corpus-pervasive boilerplate — the content
    * ExactSubstr passes deliberately ignore (Lee et al. 2022 §4.1
    * drop their hottest suffixes for the same reason).
    *
    * Input: a distinct (idCol, shingle) relation ([[shingleTable]] or
    * the distinct projection of [[positionalShingleTable]] — both
    * tokenize identically). Returns distinct (id_1 < id_2) pairs.
    */
  def sharedShingleCandidates(shingles: DataFrame, idCol: String,
                              maxDf: Int): DataFrame =
    sharedShingleCandidatesSampled(shingles, idCol, maxDf, Long.MaxValue)

  /** [[sharedShingleCandidates]] with a deterministic volume bound for
    * adversarial corpora (tiny shared vocabularies make "shares a rare
    * shingle" hold for a large share of ALL doc pairs — 9% at sf0.1,
    * SURVEY §4). The sample rate derives from the PAIR-SLOT count
    * Σ nd·(nd−1)/2 over the df relation — known BEFORE any pair is
    * generated — so the bound applies to the generated pair volume
    * itself: k = ⌈slots / capPairSlots⌉, and a pair survives iff its
    * mixed id hash ≡ 0 (mod k), applied INSIDE the per-shingle pair
    * array (the dropped pairs are never even exploded into rows). The
    * hash is plain BIGINT arithmetic — (id₁·A + id₂·B) mod a prime —
    * deliberately NOT md5: a volume cap needs determinism and rough
    * uniformity, not hash quality, and the integer form runs at
    * codegen speed where the md5 ring measured ~3 µs/row on the 1.3M
    * pre-sample pairs (q246). A DuckDB oracle computing the same slot
    * count and the same overflow-free arithmetic lands on the same k
    * and the same subset — hash-identical results. k = 1 (slots under
    * the cap) reproduces the exact unsampled relation. Integral id
    * columns only in capped mode (the mixer is integer arithmetic).
    */
  def sharedShingleCandidatesSampled(shingles: DataFrame, idCol: String,
                                     maxDf: Int, capPairSlots: Long): DataFrame = {
    require(maxDf >= 2, s"maxDf=$maxDf must be >= 2 (a df-1 shingle has no pair)")
    require(capPairSlots >= 1, s"capPairSlots=$capPairSlots must be >= 1")
    // Capped mode samples on integer id arithmetic shared verbatim with
    // the DuckDB oracle (pairSampleHash). A non-integral id would cast
    // to NULL, NULL % k === 0 is NULL, and the filter would silently
    // drop EVERY pair — enforce the documented precondition loudly.
    if (capPairSlots != Long.MaxValue) {
      val idType = shingles.schema(idCol).dataType
      require(Set("byte", "short", "integer", "long")(idType.typeName),
        s"sharedShingleCandidatesSampled: capped mode needs an integral id " +
          s"column; '$idCol' is ${idType.typeName} — cast it or pass " +
          "capPairSlots=Long.MaxValue (exact mode)")
    }
    // CONTRACT: the input relation is already distinct per (id,
    // shingle) — shingleTable's per-doc array_distinct guarantees it —
    // so no defensive re-distinct here (it cost a full extra shuffle
    // of the corpus-sized posting relation per call, measured 3 s of
    // q246's 5 s at sf0.1). A non-distinct input would only OVERcount
    // nd, which tightens the df cap — never emits a wrong pair
    // (collect_set dedups ids regardless).
    // NOT [[KernelPar]]-pinned, deliberately: the capped candidate
    // build's total compute is bounded by capPairSlots (the explosion
    // is sampled down BEFORE it materializes), so the whole build is
    // ~2.5 s of work at bench scale — a pinned exchange only added a
    // shuffle hop and task overhead (measured: +13% at pin=8, +57% at
    // pin=32 vs the byte-derived baseline; every other shingle kernel
    // won from the pin, this one lost at every setting).
    val docSh = shingles.select(col(idCol), col("shingle"))
    val dfRel0 = docSh.groupBy(col("shingle"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd").between(2, maxDf))
    // unbounded cap = exact relation, single pass — no checkpoint; a
    // real cap reads the df relation twice (slot count + join), so pin
    // it (bounded: rare shingles only)
    val dfRel =
      if (capPairSlots == Long.MaxValue) dfRel0 else dfRel0.localCheckpoint(true)
    val k =
      if (capPairSlots == Long.MaxValue) 1L
      else {
        val slots = dfRel.agg(coalesce(sum(expr("nd * (nd - 1) div 2")), lit(0L)))
          .head().getLong(0)
        math.max(1L, (slots + capPairSlots - 1) / capPairSlots)
      }
    val pairsArr = orderedPairsOf(col("ids"), "id_1", "id_2")
    val keptArr =
      if (k == 1L) pairsArr
      else filter(pairsArr, p => pairSampleHash(
        p.getField("id_1"), p.getField("id_2")) % k === 0)
    docSh.join(dfRel.select(col("shingle")), "shingle")
      .groupBy(col("shingle"))
      .agg(sort_array(collect_set(col(idCol))).as("ids"))
      .select(explode(keptArr).as("p"))
      .select(col("p.id_1").as("id_1"), col("p.id_2").as("id_2"))
      .distinct()
  }

  // Pair-sampling mixer shared VERBATIM with the DuckDB oracle (q246):
  // overflow-free for |id| < ~1e9·scale — (id mod P) ≤ P−1 ≈ 1e9, times
  // A/B < 1e6 stays far inside BIGINT, so both engines compute the
  // identical value. Same-sign % semantics in Java and DuckDB.
  private[operators] val SAMPLE_P = 1000000007L
  private[operators] val SAMPLE_A = 912839L
  private[operators] val SAMPLE_B = 273647L
  private def pairSampleHash(id1: Column, id2: Column): Column =
    ((id1.cast("long") % SAMPLE_P) * SAMPLE_A +
      (id2.cast("long") % SAMPLE_P) * SAMPLE_B) % SAMPLE_P

  /** Pairwise shingle-overlap (Jaccard) matrix BETWEEN document groups
    * (sources) — the corpus-curation analytic that tells you which
    * sources are crawling the same underlying content before you spend
    * a dedup pass on them, and which eval source is contaminated by
    * which train source. Distinct (group, shingle) is one shuffle;
    * intersections use [[jaccardPairs]]' grouped-pairs form (collect
    * the ≤|groups| group list per shingle, emit ordered pairs — never
    * a self-join fan-out). The full matrix including zero-overlap
    * pairs comes from a |groups|²-row broadcast cross of the size
    * relation — bounded by construction.
    *
    * Returns (grp_1, grp_2, m1, m2, n_shared, jaccard_bps) for every
    * unordered group pair, jaccard floor-quantized to basis points
    * (NULL only if both groups have zero shingles).
    */
  def groupOverlapMatrix(docs: DataFrame, textCol: String, groupCol: String,
                         n: Int): DataFrame = {
    val sh = docs
      .select(col(groupCol).as("grp"), TextFunctions.tokens(col(textCol)).as("__ts"))
      .select(col("grp"), explode(TextFunctions.shinglesOfTokens(col("__ts"), n)).as("shingle"))
      .distinct()
    val sizes = sh.groupBy(col("grp")).agg(count(lit(1)).as("m"))
    val grouped = sh.groupBy(col("shingle"))
      .agg(sort_array(collect_set(col("grp"))).as("grps"))
    val inter = grouped
      .filter(size(col("grps")) > 1)
      .select(explode(orderedPairsOf(col("grps"), "grp_1", "grp_2")).as("p"))
      .groupBy(col("p.grp_1").as("grp_1"), col("p.grp_2").as("grp_2"))
      .agg(count(lit(1)).as("n_shared"))
    val allPairs = sizes.toDF("grp_1", "m1")
      .crossJoin(broadcast(sizes.toDF("grp_2", "m2"))) // |groups| rows
      .where(col("grp_1") < col("grp_2"))
    allPairs.join(inter, Seq("grp_1", "grp_2"), "left")
      .withColumn("n_shared", coalesce(col("n_shared"), lit(0L)))
      .withColumn("jaccard_bps", // ANSI guard: both-empty pair → NULL
        when(col("m1") + col("m2") - col("n_shared") =!= 0,
          expr("(10000 * n_shared) div (m1 + m2 - n_shared)")))
      .select(col("grp_1"), col("grp_2"), col("m1"), col("m2"),
        col("n_shared"), col("jaccard_bps"))
  }

  /** MinHash signatures: mh_i = min over shingles of md5(i || '|' || s).
    * md5-as-permutation gives a uniform, engine-portable hash family;
    * lexicographic min over the hex strings is a valid min-hash.
    */
  def minhashSignatures(shingles: DataFrame, idCol: String, k: Int): DataFrame = {
    val exprs = (0 until k).map(i =>
      min(md5(concat(lit(s"$i|"), col("shingle")))).as(s"mh$i"))
    shingles.groupBy(col(idCol)).agg(exprs.head, exprs.tail: _*)
  }

  /** LSH banding: band key b = md5(mh_{b·r} || … || mh_{b·r+r−1});
    * candidate pairs share at least one (band, key). Returns distinct
    * (id_1 < id_2) candidate pairs.
    */
  /** The banding relation (id, band, bkey) both candidate joins build
    * on — one row per (doc, band).
    */
  /** Band b's key expression over signature columns mh0..mh{k−1}:
    * md5(mh_{b·r} ‖ '|' ‖ … ‖ mh_{b·r+r−1}). ONE definition shared by
    * the on-the-fly banding relation and the persisted key arrays
    * ([[bandKeyArrays]]) — if the two recipes ever desynchronized,
    * stored-key candidate joins would silently stop matching
    * recomputed ones (missed near-dups, wrong dedup decisions, with
    * only IndexedDedupSpec's equality pins standing in the way).
    */
  private def bandKeyExprs(bands: Int, rowsPerBand: Int): Seq[Column] =
    (0 until bands).map { b =>
      md5(concat_ws("|",
        (0 until rowsPerBand).map(j => col(s"mh${b * rowsPerBand + j}")): _*))
    }

  /** The exact-Jaccard verification every near-dup operator ends with:
    * attach each side's distinct-shingle set to the candidate pairs,
    * compute |∩| / |∪| via array_intersect, keep pairs ≥ `minJaccard`.
    * `sets1`/`sets2` are 2-column (id, shingle-set) relations for the
    * `id1`/`id2` roles of `cands`. One definition so a threshold or
    * null-semantics change can't fork across the five operators.
    */
  private def jaccardVerified(cands: DataFrame, sets1: DataFrame,
                              sets2: DataFrame, id1: String, id2: String,
                              minJaccard: Double): DataFrame =
    cands
      .join(sets1.toDF(id1, "s1"), id1)
      .join(sets2.toDF(id2, "s2"), id2)
      .withColumn("inter", size(array_intersect(col("s1"), col("s2"))))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("s1")) + size(col("s2")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col(id1), col(id2), col("jaccard"))

  private def bandRelation(signatures: DataFrame, idCol: String,
                           bands: Int, rowsPerBand: Int): DataFrame = {
    require(bands >= 1 && rowsPerBand >= 1,
      s"bands=$bands rowsPerBand=$rowsPerBand: rowsPerBand of 0 would give every doc " +
        "the same band key and materialize the all-pairs cross product")
    val bandStructs = bandKeyExprs(bands, rowsPerBand).zipWithIndex.map {
      case (key, b) => struct(lit(b).as("band"), key.as("bkey"))
    }
    signatures
      .select(col(idCol), explode(array(bandStructs: _*)).as("bk"))
      .select(col(idCol).as("id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
  }

  def lshCandidatePairs(signatures: DataFrame, idCol: String, bands: Int, rowsPerBand: Int): DataFrame = {
    val exploded = bandRelation(signatures, idCol, bands, rowsPerBand)
    val l = exploded.toDF("id_1", "band", "bkey")
    val r = exploded.toDF("id_2", "band", "bkey")
    l.join(r, Seq("band", "bkey"))
      .filter(col("id_1") < col("id_2"))
      .select("id_1", "id_2").distinct()
  }

  /** MinHash+LSH near-dup pipeline: LSH candidates verified with exact
    * Jaccard. The all-pairs cost is gone; work ∝ true-near-dup density.
    */
  def minhashLshNearDups(docs: DataFrame, textCol: String, idCol: String,
                         ngram: Int, k: Int, bands: Int, minJaccard: Double): DataFrame = {
    require(k % bands == 0, s"k=$k must divide evenly into bands=$bands " +
      "(trailing minhashes would be silently ignored)")
    // NB on parallelism: the k md5 evaluations per shingle row run
    // MAP-SIDE of the signature aggregate's exchange, so their
    // parallelism is `docs`' split count. Batch callers with a
    // byte-tiny scan input spread it first ([[KernelPar.spread]] at the
    // call site — kept OUT of this operator so streaming callers with
    // shuffle-rooted inputs never pay spread's `.rdd` plan probe).
    val sh = shingleTable(docs, textCol, idCol, ngram)
    val cands = lshCandidatePairs(minhashSignatures(sh, idCol, k), idCol, bands, k / bands)
    // Verify ONLY the candidates (work ∝ candidate density, never all
    // pairs): attach each side's distinct-shingle set and compute exact
    // Jaccard via array intersection. Equivalent to joining the all-pairs
    // jaccard table — a pair sharing no shingle has jaccard 0 and is
    // filtered either way.
    val sets = sh.groupBy(col(idCol)).agg(collect_set(col("shingle")).as("sset"))
    jaccardVerified(cands, sets, sets, "id_1", "id_2", minJaccard)
  }

  /** Fuzzy decontamination BETWEEN corpora: near-dup (left, right) doc
    * pairs through ONE shared MinHash/LSH index over the union — the
    * fuzzy twin of the exact-shingle decontamination operator. The
    * banding relation is split by side BEFORE the candidate join, so
    * same-side pairs never materialize and verification work is ∝
    * cross-corpus near-dup density, never within-corpus density (the
    * dominant term when the train side has heavy internal duplication,
    * as web corpora do). Ids must be unique across both sides.
    *
    * Returns (<leftSide>_id, <rightSide>_id, jaccard) for pairs with
    * exact shingle-Jaccard ≥ `minJaccard`.
    */
  def crossCorpusNearDups(docs: DataFrame, textCol: String, idCol: String,
                          sideCol: String, leftSide: String, rightSide: String,
                          ngram: Int, k: Int, bands: Int,
                          minJaccard: Double): DataFrame = {
    require(k % bands == 0, s"k=$k must divide evenly into bands=$bands " +
      "(trailing minhashes would be silently ignored)")
    require(leftSide != rightSide, "crossCorpusNearDups: leftSide == " +
      s"rightSide ('$leftSide') — the output would carry two ambiguous " +
      s"'${leftSide}_id' columns and unordered same-side pairs; use " +
      "minhashLshNearDups for within-corpus dedup")
    // same map-side parallelism note as [[minhashLshNearDups]]: batch
    // callers spread a byte-tiny scan input at the call site
    val sh = shingleTable(docs, textCol, idCol, ngram)
    val bk = bandRelation(minhashSignatures(sh, idCol, k), idCol, bands, k / bands)
      .join(docs.select(col(idCol).as("id"), col(sideCol).as("side")), Seq("id"))
    val l = bk.filter(col("side") === leftSide)
      .select(col("id").as("lid"), col("band"), col("bkey"))
    val r = bk.filter(col("side") === rightSide)
      .select(col("id").as("rid"), col("band"), col("bkey"))
    val cands = l.join(r, Seq("band", "bkey")).select(col("lid"), col("rid")).distinct()
    val sets = sh.groupBy(col(idCol)).agg(collect_set(col("shingle")).as("sset"))
    jaccardVerified(cands, sets, sets, "lid", "rid", minJaccard)
      .select(col("lid").as(s"${leftSide}_id"), col("rid").as(s"${rightSide}_id"),
        col("jaccard"))
  }

  /** Column name of the stored per-doc band-key array ([[withBandKeys]])
    * — the landed-index contract the streaming maintenance paths probe
    * ([[graft.streaming.EventPipelines]] ccBatch /
    * dedupIngestAvailableNow).
    */
  val BAND_KEYS_COL = "__mh_bands"

  /** Secondary partition column of a BUCKETED landed index: id-hash
    * dir under each wave/day partition, so point-set fetches (the
    * verify stage's candidate docs, the landing anti-join's replay
    * guard) prune to O(touched buckets) FILES instead of scanning the
    * corpus — the 100 TB contract [[storedKeyCrossNearDups]]'s
    * scaladoc prescribes. Bucket counts are fixed at table creation
    * (`graft.dedup.idBuckets`, default 8 on this rig — size it so one bucket ≈
    * one task's worth of docs at your corpus scale) and pinned in
    * table meta; the swap unit stays the top-level partition dir, so
    * the atomic-rename crash story is unchanged.
    */
  val ID_BUCKET_COL = "__bucket"

  /** Key-hash partition column of the landed KEY-POSTING table
    * (`<table>__keys`, the [[keyPostings]] relation written per wave):
    * the probe reads only the arrivals' key buckets
    * (`graft.dedup.keyBuckets`, default 8), so per-batch probe I/O is
    * O(arrival keys × bucket size), never a full key-column scan of
    * the corpus.
    */
  val KEY_BUCKET_COL = "__kb"

  /** The id-hash bucket expression — ONE definition shared by every
    * writer and reader of a bucketed layout (a drifted copy would
    * silently prune the wrong files: missed candidates, wrong dedup
    * decisions).
    */
  private[graft] def idBucket(c: Column, n: Int): Column =
    pmod(xxhash64(c), lit(n)).cast("int")

  /** Distinct bucket values of `c` under `n` buckets, collected —
    * bounded by `n` regardless of row count, so the collect is always
    * driver-safe; the values feed an `isin` predicate that statically
    * prunes the bucketed table's file listing.
    */
  private[graft] def bucketValuesOf(df: DataFrame, c: Column, n: Int): Seq[Int] =
    df.select(idBucket(c, n).as("__b")).distinct().collect()
      .map(_.getInt(0)).toIndexedSeq

  /** [[bucketValuesOf]] as an `observe` aggregate, so the bucket set
    * rides an EXISTING materialization job (a [[cutTracked]] cut)
    * instead of scheduling its own collect — the streaming maintenance
    * path is latency-bound at ~10 small jobs per micro-batch, and each
    * saved driver round-trip is real wall time there. Bounded by `n`
    * like the collect form.
    */
  private[graft] def bucketSetExpr(c: Column, n: Int): Column =
    collect_set(idBucket(c, n))

  /** Distinct KEY-bucket values of a stored band-key ARRAY column as
    * `observe` aggregates — one BOUNDED `collect_set` per band position
    * (element i of every row's array), plus a max-array-size guard.
    * A single `collect_list` of the per-row bucket arrays would be the
    * obvious one-expression form, but its aggregation state is
    * O(rows × bands) — a million-doc micro-batch would ship hundreds of
    * MB of per-row arrays through the observe accumulator to the driver
    * before the final distinct ran. Per-band `collect_set`s dedup
    * incrementally, so total state is ≤ nBands × n ints regardless of
    * batch size. NULL arrays and missing positions contribute nothing
    * (`try_element_at` → NULL, guarded before hashing — `xxhash64` of a
    * NULL input is NOT null, it degenerates to the seed's hash).
    * `nBands` is the writer-side band count the stored arrays were
    * landed with; should a longer array ever appear (a mis-paired
    * seed), the size guard makes [[observedKeyBuckets]] fall back to
    * ALL n buckets — a lossless over-read, never a missed candidate.
    */
  private[graft] def keyBucketSetExprs(bands: Column, n: Int, nBands: Int,
                                       prefix: String): Seq[Column] =
    max(coalesce(size(bands), lit(0))).as(s"${prefix}_sz") +:
      (0 until nBands).map { i =>
        val e = try_element_at(bands, lit(i + 1))
        collect_set(when(e.isNotNull, idBucket(e, n))).as(s"$prefix$i")
      }

  /** Union of the per-band sets [[keyBucketSetExprs]] observed, with
    * the size-guard fallback (stored arrays wider than the declared
    * band count ⇒ every bucket). */
  private[graft] def observedKeyBuckets(obs: org.apache.spark.sql.Observation,
                                        prefix: String, n: Int,
                                        nBands: Int): Seq[Int] = {
    val sz = Option(obs.get(s"${prefix}_sz")).map(_.toString.toInt).getOrElse(0)
    if (sz > nBands) 0 until n
    else (0 until nBands).flatMap(i => observedBuckets(obs.get(s"$prefix$i")))
      .distinct
  }

  /** Decode an observed bucket set back to ints (Observation hands the
    * aggregate over as a generic Seq). */
  private[graft] def observedBuckets(v: Any): Seq[Int] = v match {
    case null => Nil
    case s: scala.collection.Seq[_] => s.toSeq.map {
      case i: Int => i
      case l: Long => l.toInt
      case x => x.toString.toInt
    }
    case x => throw new IllegalStateException(
      s"observed bucket set has unexpected shape: ${x.getClass}")
  }

  /** Per-doc LSH band-key ARRAY (length = bands; element b is band b's
    * key, exactly [[lshCandidatePairs]]' banding relation pivoted wide):
    * the PERSISTABLE form of a document's LSH state. Band keys are a
    * deterministic function of the text (md5 minhashes, lexicographic
    * min), so a dedup/CC index table landed WITH this column lets every
    * later maintenance batch equi-join arrivals' keys against the
    * STORED relation instead of re-shingling and re-minhashing the
    * landed corpus — per-batch signature work O(arrivals), never
    * O(corpus). At 100 TB a per-batch corpus re-signature is an index
    * rebuild in all but name; storing ~`bands` hex strings per doc
    * (amortized once, at landing time, when the signatures exist
    * anyway) is what makes streaming dedup/CC maintenance actually
    * incremental.
    *
    * Docs with no shingles (shorter than the n-gram) produce no row
    * here — [[withBandKeys]] leaves their array NULL, and a NULL array
    * explodes to no band rows, matching the on-the-fly semantics
    * (the banding relation has no row for them either).
    */
  def bandKeyArrays(docs: DataFrame, textCol: String, idCol: String,
                    ngram: Int, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k must divide evenly into bands=$bands " +
      "(trailing minhashes would be silently ignored)")
    val sig = minhashSignatures(shingleTable(docs, textCol, idCol, ngram), idCol, k)
    sig.select(col(idCol),
      array(bandKeyExprs(bands, k / bands): _*).as(BAND_KEYS_COL))
  }

  /** `docs` plus the stored band-key column ([[bandKeyArrays]]) — the
    * shape a landed dedup/CC index table should be written in so that
    * maintenance batches stay O(arrivals + collisions).
    */
  def withBandKeys(docs: DataFrame, textCol: String, idCol: String,
                   ngram: Int, k: Int, bands: Int): DataFrame =
    docs.join(bandKeyArrays(docs, textCol, idCol, ngram, k, bands),
      Seq(idCol), "left")

  /** [[crossCorpusNearDups]] for the streaming-maintenance case where
    * the index side's band keys are PRE-COMPUTED and stored with the
    * landed table ([[withBandKeys]]): shingles and minhash signatures
    * are computed for `arrivals` ONLY. The landed side contributes its
    * stored key arrays through a (band, bkey) equi-join, and only the
    * candidate-MATCHED landed docs are shingled for the exact-Jaccard
    * verify — a semi-join-pruned fetch, collision-sized, never
    * corpus-sized. Band keys are deterministic functions of the text,
    * so the result relation is identical to [[crossCorpusNearDups]]
    * over the same two sides; IndexedDedupSpec pins the equality AND
    * that a poisoned stored key CHANGES the candidates — proof the
    * stored relation, not a recomputation, drives the probe.
    *
    * Per-batch landed-side cost: one narrow scan of (id, keys) for the
    * probe join, one column-pruned scan of (id, text) filtered by the
    * candidate semi-join for the verify fetch. Zero landed-side
    * shingling or hashing outside the candidate set. At cluster scale,
    * bucket the landed table by id so the verify fetch prunes to
    * O(candidates) FILES as well — that is exactly what the streaming
    * index's bucketed layout does ([[graft.streaming.EventPipelines]]:
    * [[ID_BUCKET_COL]] dirs + the [[KEY_BUCKET_COL]]-partitioned
    * posting sibling); this entry point remains the flat-layout /
    * ad-hoc form, row-pruned but not file-pruned.
    *
    * `idx` must carry (idCol, textCol, [[BAND_KEYS_COL]]). Returns
    * (idx_id, new_id, jaccard), exact shingle-Jaccard ≥ `minJaccard` —
    * the same column names [[crossCorpusNearDups]] emits for sides
    * ("idx", "new").
    */
  def indexedCrossNearDups(arrivals: DataFrame, idx: DataFrame,
                           textCol: String, idCol: String,
                           ngram: Int, k: Int, bands: Int,
                           minJaccard: Double): DataFrame =
    storedKeyCrossNearDups(
      withBandKeys(arrivals, textCol, idCol, ngram, k, bands), idx,
      textCol, idCol, ngram, minJaccard)

  /** [[indexedCrossNearDups]] when BOTH sides carry stored band keys
    * (the streaming-CC layout, where arrivals' keys were computed at
    * doc-landing time): zero signature work anywhere — candidates come
    * from a (band, bkey) equi-join of the two stored relations, and
    * ONLY candidate-matched docs on either side are shingled for the
    * exact-Jaccard verify. Returns (idx_id, new_id, jaccard). */
  def storedKeyCrossNearDups(arrivals: DataFrame, idx: DataFrame,
                             textCol: String, idCol: String,
                             ngram: Int, minJaccard: Double): DataFrame = {
    Seq("arrivals" -> arrivals, "index" -> idx).foreach { case (side, df) =>
      require(df.columns.contains(BAND_KEYS_COL),
        s"storedKeyCrossNearDups: $side side lacks the stored band-key " +
          s"column '$BAND_KEYS_COL' — land it through withBandKeys, " +
          "or use crossCorpusNearDups (which re-signatures both sides)")
    }
    val cands = postingCandidates(keyPostings(idx, idCol, "idx_id"),
      keyPostings(arrivals, idCol, "new_id"))
    verifyCrossCandidates(cands, idx, arrivals, textCol, idCol, ngram, minJaccard)
  }

  /** The (id-as-`as`, band, bkey) POSTING relation of a stored band-key
    * column — [[lshCandidatePairs]]' banding relation read back from
    * the persisted arrays instead of recomputed. The same relation,
    * exploded at LANDING time and written as its own bucketed table,
    * is what lets a streaming maintenance batch prune the probe to the
    * arrivals' key buckets (see [[graft.streaming.EventPipelines]]).
    */
  private[graft] def keyPostings(df: DataFrame, idCol: String, as: String): DataFrame =
    df.select(col(idCol).as(as), posexplode(col(BAND_KEYS_COL)))
      .select(col(as), col("pos").as("band"), col("col").as("bkey"))

  /** Candidate (idx_id, new_id) pairs from two key-posting relations —
    * one (band, bkey) equi-join, zero signature work. Either side may
    * be PRUNED to a superset of the matching keys (e.g. by key-hash
    * bucket) without changing the result: a match implies equal bkey,
    * so any pruning that keeps every key equal to some opposite-side
    * key is lossless.
    */
  private[graft] def postingCandidates(idxKeys: DataFrame, newKeys: DataFrame): DataFrame =
    idxKeys.join(newKeys, Seq("band", "bkey"))
      .select(col("idx_id"), col("new_id")).distinct()

  /** The exact-Jaccard verify stage over candidate (idx_id, new_id)
    * pairs: shingle ONLY docs some candidate touches — the semi-joins
    * bound the shingled set to the collision volume. `idxDocs` /
    * `newDocs` are (idCol, textCol, …) relations that must CONTAIN the
    * candidate-touched docs of their role; a superset is fine (the
    * semi-join prunes rows), and a caller holding a physically
    * bucketed index passes a file-pruned superset so the text scan is
    * O(candidates) files, not O(corpus).
    */
  private[graft] def verifyCrossCandidates(cands: DataFrame, idxDocs: DataFrame,
                                           newDocs: DataFrame, textCol: String,
                                           idCol: String, ngram: Int,
                                           minJaccard: Double): DataFrame = {
    def setsOf(df: DataFrame, role: String): DataFrame =
      shingleTable(df.select(col(idCol), col(textCol))
          .join(cands.select(col(role).as(idCol)), Seq(idCol), "left_semi"),
        textCol, idCol, ngram)
        .groupBy(col(idCol)).agg(collect_set(col("shingle")).as("sset"))
    jaccardVerified(cands, setsOf(idxDocs, "idx_id"), setsOf(newDocs, "new_id"),
      "idx_id", "new_id", minJaccard)
  }

  /** WITHIN-set near-dup pairs over stored band keys — the arrivals'
    * internal pair relation in the streaming-CC fold, computed without
    * re-deriving signatures ([[minhashLshNearDups]]' result relation
    * whenever the stored keys came from [[bandKeyArrays]] with the same
    * (ngram, k, bands); IndexedDedupSpec pins the equality). Candidates
    * are the stored-key self-join (id_1 < id_2); only candidate-touched
    * docs are shingled for the exact-Jaccard verify.
    * Returns (id_1, id_2, jaccard). */
  def storedKeySelfNearDups(docs: DataFrame, textCol: String, idCol: String,
                            ngram: Int, minJaccard: Double): DataFrame = {
    require(docs.columns.contains(BAND_KEYS_COL),
      s"storedKeySelfNearDups: input lacks the stored band-key column " +
        s"'$BAND_KEYS_COL' — land it through withBandKeys, or use " +
        "minhashLshNearDups (which derives signatures from the text)")
    val bk = docs.select(col(idCol).as("id"), posexplode(col(BAND_KEYS_COL)))
      .select(col("id"), col("pos").as("band"), col("col").as("bkey"))
    val cands = bk.toDF("id_1", "band", "bkey")
      .join(bk.toDF("id_2", "band", "bkey"), Seq("band", "bkey"))
      .filter(col("id_1") < col("id_2"))
      .select(col("id_1"), col("id_2")).distinct()
    val touched = cands.select(col("id_1").as(idCol))
      .unionByName(cands.select(col("id_2").as(idCol)))
    val sets = shingleTable(docs.select(col(idCol), col(textCol))
        .join(touched, Seq(idCol), "left_semi"), textCol, idCol, ngram)
      .groupBy(col(idCol)).agg(collect_set(col("shingle")).as("sset"))
    jaccardVerified(cands, sets, sets, "id_1", "id_2", minJaccard)
  }

  /** 16-bit SimHash over the distinct token set, built from the first 4
    * hex nibbles of md5(token). Returns (id, simhash INT).
    */
  def simhash16(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("tok"))
    val h = md5(col("tok"))
    val bitSums = (0 until 16).map { j =>
      val nibble = TextFunctions.hexNibble(substring(h, j / 4 + 1, 1))
      val bit = shiftright(nibble, j % 4).bitwiseAND(lit(1))
      sum(bit * 2 - 1).as(s"s$j")
    }
    val sums = toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until 16).map(j =>
      when(col(s"s$j") > 0, lit(1 << j)).otherwise(lit(0))).reduce(_ + _)
    sums.select(col(idCol), fp.cast("int").as("simhash"))
  }

  /** Numeric session conf with a LOUD parse failure: a malformed value
    * (e.g. "500_000", "1e6") must not silently fall back to the default
    * and re-enable the very behavior the user was tuning away.
    */
  private[graft] def longConf(spark: org.apache.spark.sql.SparkSession,
                              key: String, default: Long): Long =
    spark.conf.getOption(key).map { v =>
      v.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"$key='$v' is not a long integer (no underscores/exponents)"))
    }.getOrElse(default)

  /** Boolean session conf, as loud as [[longConf]]: only "true"/"false"
    * parse ("1", "yes", a typo'd "flase" must not silently pick either
    * side of a physical-strategy switch).
    */
  private[graft] def boolConf(spark: org.apache.spark.sql.SparkSession,
                              key: String, default: Boolean): Boolean =
    spark.conf.getOption(key).map {
      case "true" => true
      case "false" => false
      case v => throw new IllegalArgumentException(
        s"$key='$v' is not 'true' or 'false'")
    }.getOrElse(default)

  /** [[connectedComponents]]' small-graph fast path: solve the
    * (materialized, undirected) edge relation with a driver union-find
    * and return the labelled `nodes` through one broadcast join — or
    * None when the graph is too big / ids aren't integral / ids are
    * nullable-with-nulls, in which case the caller falls back to the
    * distributed fixpoint. Union always points the larger root at the
    * smaller, so every tree's root IS the minimum member — the exact
    * label contract of the distributed path. The broadcast map holds
    * only edge-TOUCHED ids (≤ 2·edge-limit entries); nodes absent from
    * it are singletons and label themselves via coalesce, so |nodes|
    * never bounds driver memory. `graft.cc.driverEdgeLimit` (session
    * conf, documented in the README's scale-conf list; a malformed
    * value fails loudly via [[longConf]]) caps the UNDIRECTED edge
    * relation's ROW count (≈ 2× the distinct edges), default 100,000
    * rows ≈ 50k edges — order 10 MB transient on the driver (collected
    * rows + the boxed union-find maps), sized so existing distributed
    * callers can never silently acquire a ~100 MB driver dependency;
    * raise it on a fat driver, 0 disables the path (the fixpoint specs
    * pin the distributed algorithm that way). The intended regime is
    * the contraction fold's collision-sized graphs, thousands of
    * edges, where the cost is KB.
    */
  private def driverUnionFind(und: DataFrame, undCount: Long, nodes: DataFrame,
                              idCol: String): Option[DataFrame] = {
    import org.apache.spark.sql.types._
    val spark = und.sparkSession
    // resolve through the analyzer (no job), so idCol follows the same
    // case-sensitivity rules as every col(idCol) below
    val idType = nodes.select(col(idCol)).schema.head.dataType
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    // same-type gate: the distributed path's unionByName would coerce
    // mixed node/edge id types to their common type in the OUTPUT
    // schema — rather than replicate the coercion rules, fall back
    if (!integral.contains(idType) ||
        und.schema.fields.exists(_.dataType != idType)) return None
    val limit = longConf(spark, "graft.cc.driverEdgeLimit", 100000L)
    // undCount rode the caller's cut job as an observe — the gate costs
    // zero extra jobs on either path
    if (limit <= 0L || undCount > limit) return None
    val rows = und.select(col("src").cast("long"), col("dst").cast("long")).collect()
    if (rows.exists(r => r.isNullAt(0) || r.isNullAt(1))) return None
    val parent = new java.util.HashMap[java.lang.Long, java.lang.Long]
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x): Long
      while (p != x) { // path-halving
        val gp = parent.getOrDefault(p, p): Long
        parent.put(x, gp): Unit
        x = gp
        p = parent.getOrDefault(x, x)
      }
      x
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]
    rows.foreach { r =>
      val a = r.getLong(0); val b = r.getLong(1)
      seen.add(a): Unit; seen.add(b): Unit
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (ra < rb) parent.put(rb, ra): Unit else parent.put(ra, rb): Unit
      }
    }
    val entries = new java.util.ArrayList[org.apache.spark.sql.Row](seen.size)
    seen.forEach(id => entries.add(
      org.apache.spark.sql.Row(id.longValue, find(id.longValue))): Unit)
    val mapDf = spark.createDataFrame(entries, StructType(Seq(
        StructField("id", LongType), StructField("__cc_comp", LongType))))
      .select(col("id").cast(idType).as("id"),
        col("__cc_comp").cast(idType).as("__cc_comp"))
    // parity with the distributed path's final left_semi join, whose
    // null-rejecting equality silently drops a NULL node id — without
    // this filter the two paths would differ by exactly that row
    Some(nodes.select(col(idCol).as("id")).distinct()
      .where(col("id").isNotNull)
      .join(broadcast(mapDf), Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("__cc_comp"), col("id")).as("cluster_id")))
  }

  /** Near-dup CLUSTERS: connected components over a pair-edge relation,
    * labelling every node with the minimum id reachable from it — the
    * step after pair generation in a dedup pipeline (one keeper per
    * cluster, everything else dropped).
    *
    * Iterative min-label propagation: each round every node adopts the
    * smallest label among itself and its neighbours — one shuffle
    * (join + min-agg) per round, lineage cut with localCheckpoint so
    * the plan doesn't grow with iterations. Rounds needed = graph
    * diameter; near-dup graphs are overwhelmingly tiny cliques
    * (diameter ≤ 2-3). At 100 TB swap the per-round `least` for the
    * hash-to-min variant (propagate the full min-set) to converge in
    * O(log d) rounds, and localCheckpoint → reliable checkpoint dir.
    *
    * Throws if `maxIters` rounds don't converge — a wrong-but-plausible
    * result is worse than a loud failure.
    *
    * Physical strategy by SIZE, like Spark's own broadcast threshold:
    * when the (materialized) undirected edge relation is at most
    * `graft.cc.driverEdgeLimit` ROWS (≈ 2× the distinct edges; default
    * 100k rows ≈ 50k edges, order 10 MB transient on the driver at
    * that cap) and ids are integral, the components are solved by
    * a driver union-find and re-applied to `nodes` through ONE
    * broadcast join; otherwise the distributed min-label fixpoint
    * below runs. The fast path exists for the contraction fold
    * ([[contractedCcMerge]]): its graph is O(components touched +
    * arrivals) — collision-sized by design — where a multi-round
    * distributed fixpoint pays per-round scheduling latency orders of
    * magnitude above the actual work (measured 3.0 s of a 3.6 s
    * streaming-CC wave at sf0.1 for a 5k-edge graph). Labels are
    * identical by construction (min id per component, same integral
    * ordering), so which path ran is invisible in any result —
    * TextDedupSpec pins the equality. The broadcast map is bounded by
    * the edge limit, never by |nodes|, so the fast path stays safe
    * when `nodes` is corpus-sized and the fallback covers the rest.
    *
    * `cluster_id` is the minimum id in the component of the edge graph
    * (dangling edge endpoints included — they bridge their neighbours
    * even when absent from `nodes`); when the minimum is a dangling id,
    * pick a surviving keeper downstream via min(id) per cluster_id.
    */
  def connectedComponents(edges: DataFrame, nodes: DataFrame, idCol: String,
                          maxIters: Int = 25): DataFrame =
    connectedComponentsTracked(edges, nodes, idCol, maxIters)._1

  /** [[connectedComponents]] returning ALSO the persisted-RDD ids the
    * returned plan still reads (the distributed fixpoint's final label
    * generation; empty on the driver fast path). The function itself
    * cannot retire them — the result would throw missing-block on its
    * next read — so a caller that fully consumes the result (e.g. the
    * streaming fold, which lands it as a snapshot version) retires
    * them afterwards via [[retireTracked]]; batch callers may ignore
    * the ids and let session teardown reclaim the blocks.
    */
  private[graft] def connectedComponentsTracked(
      edges: DataFrame, nodes: DataFrame, idCol: String,
      maxIters: Int = 25): (DataFrame, Set[Int]) = {
    // generation retirement at the RDD level ([[cutTracked]]): without
    // it a d-diameter run strands d label generations in the block
    // manager until context GC
    val spark = edges.sparkSession
    def cut(df: DataFrame): (DataFrame, Set[Int]) = cutTracked(df)
    def retire(ids: Set[Int]): Unit = retireTracked(spark, ids)
    val e = edges.toDF("src", "dst")
    // the undirected row count (the fast-path gate) rides the cut job
    val obsUnd = org.apache.spark.sql.Observation()
    val (und, undIds) = cut(
      e.unionByName(e.select(col("dst").as("src"), col("src").as("dst"))).distinct()
        .observe(obsUnd, count(lit(1)).as("n")))
    val undCount = Option(obsUnd.get("n")).map(_.asInstanceOf[Long]).getOrElse(0L)
    // an exception below (maxIters throw, analysis error) must not
    // strand the cuts made so far — retire everything still live
    // except, on success, the final label generation the returned
    // plan reads
    var labelIds = Set.empty[Int]
    try {
      driverUnionFind(und, undCount, nodes, idCol) match {
        case Some(labelled) =>
          // the labelled plan reads only `nodes` + the broadcast map —
          // the edge blocks are dead weight from here
          retire(undIds)
          return (labelled, Set.empty)
        case None => ()
      }
      // propagate over EVERY edge endpoint, even ids missing from `nodes`
      // (e.g. a doc dropped by an upstream filter after pair generation):
      // a dangling endpoint must still bridge its neighbours, or the
      // component silently splits. Output is restricted back to `nodes`.
      val nodeIds = nodes.select(col(idCol).as("id"))
      val seeds = nodeIds.unionByName(und.select(col("src").as("id"))).distinct()
      val (labels0, labelIds0) = cut(seeds.select(col("id"), col("id").as("comp")))
      var labels = labels0
      labelIds = labelIds0
      var iter = 0
      var changed = 1L
      while (changed > 0) {
        iter += 1
        if (iter > maxIters) throw new IllegalStateException(
          s"connectedComponents: no convergence after $maxIters rounds — " +
            "graph diameter exceeds the bound; raise maxIters")
        val contrib = und.join(labels.select(col("id").as("src"), col("comp")), "src")
          .groupBy(col("dst").as("id")).agg(min(col("comp")).as("nmin"))
        // the changed-count rides the checkpoint job itself (observe):
        // one job per round, not a propagate job plus a count job — at
        // diameter d that halves the driver round-trips
        val obs = org.apache.spark.sql.Observation()
        val (joined, joinedIds) = cut(labels.join(contrib, Seq("id"), "left")
          .select(col("id"), col("comp"),
            least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp2"))
          .observe(obs, sum(when(col("comp2") < col("comp"), 1L).otherwise(0L)).as("n")))
        changed = Option(obs.get("n")).map(_.asInstanceOf[Long]).getOrElse(0L)
        retire(labelIds) // joined is eagerly materialized above
        labels = joined.select(col("id"), col("comp2").as("comp"))
        labelIds = joinedIds
      }
      retire(undIds) // the returned plan reads only the final generation
      (labels.join(nodeIds, Seq("id"), "left_semi")
        .select(col("id").as(idCol), col("comp").as("cluster_id")), labelIds)
    } catch {
      case scala.util.control.NonFatal(t) =>
        retire(undIds ++ labelIds)
        throw t
    }
  }

  /** The contraction fold shared by incremental (q220) and streaming
    * ([[graft.streaming.EventPipelines]] ccBatch) CC maintenance —
    * written ONCE so a connectivity fix reaches both paths: existing
    * components CONTRACT to their label (connectivity-preserving),
    * arrivals fold in via the cross-corpus probe edges plus the
    * arrival-internal pair relation, CC runs on the CONTRACTED graph,
    * and the merged labels re-expand onto every document. Cost is
    * O(components touched + arrivals), never O(corpus).
    *
    * `assign`: the landed (idCol, cluster_id) assignment. `arrivalIds`:
    * new documents (idCol). `crossEdges`: (idxCol, newCol) probe hits
    * landed×new. `newPairs`: (id_1, id_2) among arrivals. Returns the
    * updated (idCol, cluster_id) over landed ∪ arrivals. Label values
    * follow [[connectedComponents]] over the contracted graph: stable
    * for untouched components (their label is the only member of its
    * contracted component), min-of-merged-labels-and-arrival-ids where
    * components merge — which is why the maintained assignment
    * hash-matches a from-scratch recompute whenever labels are min-ids.
    */
  def contractedCcMerge(assign: DataFrame, arrivalIds: DataFrame, idCol: String,
                        crossEdges: DataFrame, idxCol: String, newCol: String,
                        newPairs: DataFrame): DataFrame =
    contractedCcMergeTracked(assign, arrivalIds, idCol, crossEdges, idxCol,
      newCol, newPairs)._1

  /** [[contractedCcMerge]] returning ALSO the persisted-RDD ids its
    * result plan still reads (passed through from
    * [[connectedComponentsTracked]]) — the streaming fold retires them
    * precisely once its snapshot version is landed, instead of diffing
    * the session-global persisted-RDD key set around the call (which
    * could capture and kill a concurrent thread's persists).
    */
  private[graft] def contractedCcMergeTracked(
      assign: DataFrame, arrivalIds: DataFrame, idCol: String,
      crossEdges: DataFrame, idxCol: String, newCol: String,
      newPairs: DataFrame): (DataFrame, Set[Int]) = {
    val cEdges = crossEdges
      .join(assign.withColumnRenamed(idCol, idxCol), Seq(idxCol))
      .select(col("cluster_id").as("src"), col(newCol).as("dst"))
      .unionByName(newPairs.select(col("id_1").as("src"), col("id_2").as("dst")))
    val cNodes = assign.select(col("cluster_id").as("id")).distinct()
      .unionByName(arrivalIds.select(col(idCol).as("id")))
    val (cc, ccIds) = connectedComponentsTracked(cEdges, cNodes, "id")
    val merged = cc.select(col("id"), col("cluster_id").as("__merged"))
    (assign.select(col(idCol), col("cluster_id").as("id"))
      .unionByName(arrivalIds.select(col(idCol), col(idCol).as("id")))
      .join(merged, Seq("id"))
      .select(col(idCol), col("__merged").as("cluster_id")), ccIds)
  }

  /** [[connectedComponents]]'s long-diameter twin: Hash-to-Min
    * (Rastogi et al., "Finding Connected Components in Map-Reduce in
    * Logarithmic Rounds", ICDE 2013) converges in O(log d) rounds
    * where min-label propagation needs d — the variant
    * [[connectedComponents]]'s scaladoc promises for 100 TB graphs
    * whose components are chains, not cliques.
    *
    * State is the cluster-set relation (id, member): member ∈ C(id),
    * seeded with C(v) = {v} ∪ N(v). Each round every node v sends
    * min C(v) to every member of C(v) and ALL of C(v) to that min —
    * two projections of one (id → min) join, one distinct shuffle per
    * round. TWO rounds are batched per materialized job: at the scale
    * where round count dominates (each round's data is small but the
    * checkpoint/schedule round-trip is fixed latency), batching halves
    * the number of jobs without changing any intermediate relation —
    * the lineage between checkpoints is two H2M steps instead of one,
    * still bounded. Two and NOT more: step() reads its input twice
    * (the min agg and the re-join), so every un-materialized step
    * re-evaluates the previous step's lineage ~2× — batching k steps
    * costs ~2^(k−1) recomputations of the early steps, and k = 4
    * measured 2× SLOWER than k = 2 at sf0.1. Fixed point: C(v) = {m}
    * for every non-min v and
    * C(m) = the whole component; detected by a (count, xxhash-sum)
    * signature observed on the checkpoint job itself, so each batch
    * stays one Spark job (a batch whose two steps are both no-ops
    * reproduces the signature exactly). Labels are then min C(v).
    *
    * `checkpointDir`: None → localCheckpoint (executor-local blocks,
    * fine single-JVM); Some(dir) → reliable HDFS-style checkpoints so
    * a thousand-executor run survives executor loss mid-iteration —
    * the other half of the 100 TB promise.
    *
    * Same dangling-endpoint and output contract as
    * [[connectedComponents]]; spec-proved equivalent on inputs where
    * both converge ([[graft.operators.TextDedupSpec]]).
    */
  def connectedComponentsHashToMin(edges: DataFrame, nodes: DataFrame,
                                   idCol: String, maxIters: Int = 40,
                                   checkpointDir: Option[String] = None): DataFrame = {
    val e = edges.toDF("src", "dst")
    val und = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
    val nodeIds = nodes.select(col(idCol).as("id"))
    // C(v) = {v} ∪ N(v), over every edge endpoint plus every node
    val seed = nodeIds.select(col("id"), col("id").as("member"))
      .unionByName(und.select(col("src").as("id"), col("src").as("member")))
      .unionByName(und.select(col("src").as("id"), col("dst").as("member")))
      .distinct()
    def step(cur: DataFrame): DataFrame = {
      val mins = cur.groupBy(col("id")).agg(min(col("member")).as("m"))
      val withMin = cur.join(mins, Seq("id"))
      withMin.select(col("member").as("id"), col("m").as("member"))
        .unionByName(withMin.select(col("m").as("id"), col("member")))
        .distinct()
    }
    // two H2M steps per materialized batch; odd maxIters rounds DOWN
    // to even — the guard must never exceed the stated bound, so the
    // last un-runnable half-batch is skipped
    val fixed = iterateToFixpoint(seed, cur => step(step(cur)),
      sigCols = ("id", "member"), maxIters = maxIters, itersPerBatch = 2,
      name = "connectedComponentsHashToMin", checkpointDir = checkpointDir)
    fixed.groupBy(col("id")).agg(min(col("member")).as("cluster_id"))
      .join(nodeIds, Seq("id"), "left_semi")
      .select(col("id").as(idCol), col("cluster_id"))
  }

  /** Eagerly materialize `df` and return it with the set of
    * persistent-RDD ids the materialization registered — the ONE
    * tracked-cut implementation behind every generation-retirement
    * site (the fixpoint loops, [[connectedComponents]], the streaming
    * per-batch cuts in [[graft.streaming.EventPipelines]]).
    *
    * Why tracking exists: Dataset.unpersist is a NO-OP for a
    * localCheckpointed DataFrame — it clears CacheManager
    * (InMemoryRelation) entries, but localCheckpoint persists at the
    * RDD level, invisible to the CacheManager — so superseded
    * generations would only die when the ContextCleaner GC'd the old
    * RDD, nondeterministically. Attribution is PRECISE, not a time
    * window: the cut Dataset's plan is a `LogicalRDD` wrapping exactly
    * the RDD the localCheckpoint persisted, so the id is read off the
    * plan itself — an RDD persisted CONCURRENTLY by another thread of
    * the session (serving reads during a maintenance drain, a
    * QueryCaches training) can never be captured and wrongly retired.
    * The window diff survives only as (a) the fallback for an
    * unexpected plan shape and (b) the failure-path cleanup, where
    * over-capture at worst frees blocks a failed job abandoned. With
    * `reliable = true` the cut is a reliable checkpoint instead
    * (survives executor loss; recovery lives in the checkpoint files),
    * which persists nothing in the block manager — its id set is
    * empty by construction.
    */
  private[graft] def cutTracked(df: DataFrame,
                                reliable: Boolean = false): (DataFrame, Set[Int]) = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    try {
      val ck = if (reliable) df.checkpoint(true) else df.localCheckpoint(true)
      val ids: Set[Int] =
        if (reliable) Set.empty
        else ck.queryExecution.analyzed match {
          // Dataset.checkpoint returns ofRows(LogicalRDD(output, rdd))
          // over the freshly persisted internal RDD — its id IS the cut
          case l: org.apache.spark.sql.execution.LogicalRDD => Set(l.rdd.id)
          case _ => (sc.getPersistentRDDs.keySet -- before).toSet
        }
      (ck, ids)
    } catch {
      // a failed materialization job registered its RDD as persisted
      // BEFORE the job ran — the ids never reach the caller, so no
      // catch out there can free them; clean up the half-cut here
      case scala.util.control.NonFatal(t) =>
        retireTracked(spark, (sc.getPersistentRDDs.keySet -- before).toSet)
        throw t
    }
  }

  /** Unpersist the RDD ids a [[cutTracked]] returned — call once the
    * generation is superseded (its replacement materialized) or fully
    * consumed (its last reader's job finished). Ids are plan-extracted
    * ([[cutTracked]]), so retiring can only ever free the cut's own
    * blocks. */
  private[graft] def retireTracked(spark: org.apache.spark.sql.SparkSession,
                                   ids: Set[Int]): Unit =
    ids.foreach(id =>
      spark.sparkContext.getPersistentRDDs.get(id)
        .foreach(_.unpersist(blocking = false)))

  /** The iterate-to-fixpoint scaffolding shared by the batched CC
    * loops ([[connectedComponentsHashToMin]],
    * [[connectedComponentsAlternatingStar]]): per batch apply `step`,
    * materialize through an EAGER cut (localCheckpoint; or a reliable
    * checkpoint when `checkpointDir` is set, so a thousand-executor run
    * survives executor loss mid-iteration), and detect the fixed point
    * by a (count, bit_xor(xxhash64(sigCols))) signature OBSERVED on the
    * checkpoint job itself — one Spark job per batch, no extra action.
    * bit_xor, not sum: a set signature that can't overflow under ANSI;
    * a batch of pure no-op steps reproduces it exactly. The PREVIOUS
    * generation is unpersisted as soon as the new one is materialized —
    * without that, a d-diameter run pins O(log d) full copies of the
    * relation in the block manager, the same k×O(n+m) blowup class the
    * star algorithm exists to avoid. (On the reliable-checkpoint path
    * the files outlive the unpersisted cache until application end —
    * they are the recovery story.) Throws after `maxIters` accounted
    * iterations (`itersPerBatch` per batch).
    */
  private def iterateToFixpoint(seed: DataFrame, step: DataFrame => DataFrame,
                                sigCols: (String, String), maxIters: Int,
                                itersPerBatch: Int, name: String,
                                checkpointDir: Option[String]): DataFrame = {
    val spark = seed.sparkSession
    val sc = spark.sparkContext
    checkpointDir.foreach(sc.setCheckpointDir)
    def cut(df: DataFrame): (DataFrame, Set[Int]) =
      cutTracked(df, reliable = checkpointDir.isDefined)
    def retire(ids: Set[Int]): Unit = retireTracked(spark, ids)
    var (cur, curIds) = cut(seed)
    var iter = 0
    var prevSig: (Long, Long) = (-1L, -1L)
    var converged = false
    while (!converged) {
      iter += itersPerBatch
      if (iter > maxIters) throw new IllegalStateException(
        s"$name: no convergence after $maxIters rounds — raise maxIters")
      val next = step(cur)
      val obs = org.apache.spark.sql.Observation()
      val (ck, ckIds) = cut(next.observe(obs, count(lit(1)).as("n"),
        bit_xor(xxhash64(col(sigCols._1), col(sigCols._2))).as("h")))
      val sig = (Option(obs.get("n")).map(_.asInstanceOf[Long]).getOrElse(0L),
        Option(obs.get("h")).map(_.asInstanceOf[Long]).getOrElse(0L))
      converged = sig == prevSig
      prevSig = sig
      retire(curIds) // ck is eagerly materialized above
      cur = ck
      curIds = ckIds
    }
    cur
  }

  /** Alternating large-star / small-star connected components (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC
    * 2014) — the O(n+m)-PER-ROUND long-diameter algorithm, and the one
    * to reach for at 100 TB. [[connectedComponentsHashToMin]] also
    * converges in O(log d) batches, but its cluster-SET state has a
    * measured quadratic-ish transient on long chains: on q158's chain
    * graph at sf0.1 (14,990 seed rows, max diameter ~10³) the relation
    * inflates 14,990 → 44,870 → 163k → 614k → 2.07M → 3.05M before
    * collapsing to 10,205 at convergence — a 200× midpoint blowup that
    * IS the query's task time, and at petabyte chain scale an OOM. The
    * star operations never materialize member sets, only parent-pointer
    * edges, so every round's relation is ≤ the seed's O(n+m):
    *
    *  - large-star: every node points its LARGER neighbours at the
    *    minimum of its neighbourhood (incl. itself) — long tails fold
    *    in half;
    *  - small-star: every node re-points its smaller-or-equal
    *    neighbours (and itself) at that minimum — stars flatten.
    *
    * Both preserve connectivity and the component minimum; the unique
    * fixpoint is the star forest rooted at each component's min, so
    * labels match [[connectedComponents]] / [[connectedComponentsHashToMin]]
    * bit for bit (TextDedupSpec pins all three equal on chains,
    * cliques, bridges, and random graphs). One LS + one SS per
    * materialized batch, convergence by the same observed
    * (count, bit_xor) signature on the checkpoint job — one Spark job
    * per batch, no extra action. Edges stay canonically (big, small)
    * between rounds: LS emits (v, m) with m ≤ u < v, SS emits (x, m)
    * with m = min of a ≤-neighbourhood, so orientation is free and
    * `distinct` dedupes globally.
    *
    * `checkpointDir`: as in [[connectedComponentsHashToMin]] — None →
    * localCheckpoint; Some(dir) → reliable checkpoints for executor
    * loss at cluster scale.
    */
  def connectedComponentsAlternatingStar(edges: DataFrame, nodes: DataFrame,
                                         idCol: String, maxIters: Int = 60,
                                         checkpointDir: Option[String] = None): DataFrame = {
    val nodeIds = nodes.select(col(idCol).as("id"))
    // canonical (a > b) undirected edge relation, self-loops dropped
    val seed = edges.toDF("u", "v").where(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("a"),
        least(col("u"), col("v")).as("b"))
      .distinct()
    def largeStar(cur: DataFrame): DataFrame = {
      // both directions: Γ(u) for every endpoint
      val bidir = cur.select(col("a").as("x"), col("b").as("y"))
        .unionByName(cur.select(col("b").as("x"), col("a").as("y")))
      val mins = bidir.groupBy(col("x"))
        .agg(least(min(col("y")), first(col("x"))).as("m"))
      // v > u points at m(u); m ≤ u < v keeps (big, small) canonical
      bidir.join(mins, Seq("x")).where(col("y") > col("x"))
        .select(col("y").as("a"), col("m").as("b"))
        .where(col("a") =!= col("b")).distinct()
    }
    def smallStar(cur: DataFrame): DataFrame = {
      // cur is canonical (a > b): the ≤-neighbourhood of a IS its b-list
      val mins = cur.groupBy(col("a")).agg(min(col("b")).as("m"))
      val withM = cur.join(mins, Seq("a"))
      withM.where(col("b") =!= col("m"))
        .select(col("b").as("a"), col("m").as("b"))
        .unionByName(mins.select(col("a"), col("m").as("b")))
        .where(col("a") =!= col("b")).distinct()
    }
    val fixed = iterateToFixpoint(seed, cur => smallStar(largeStar(cur)),
      sigCols = ("a", "b"), maxIters = maxIters, itersPerBatch = 1,
      name = "connectedComponentsAlternatingStar", checkpointDir = checkpointDir)
    // fixpoint is the star forest (v, component min); absent = singleton
    nodeIds.join(fixed.select(col("a").as("id"), col("b").as("lab")), Seq("id"), "left")
      .select(col("id").as(idCol), coalesce(col("lab"), col("id")).as("cluster_id"))
  }

  /** The keep-one pass that ends every dedup pipeline: label clusters
    * over the near-dup pair graph ([[connectedComponents]]), keep the
    * minimum id per cluster, and return the surviving rows of `docs`.
    * Docs untouched by any pair are their own singleton cluster and
    * always survive. One extra shuffle (cluster group-by) + a semi-join
    * on the id — the filtered corpus never materializes the drop set.
    */
  def keepOnePerCluster(docs: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    val cc = connectedComponents(pairs, docs.select(col(idCol)), idCol)
    val keepers = cc.groupBy(col("cluster_id")).agg(min(col(idCol)).as(idCol))
    docs.join(keepers.select(idCol), Seq(idCol), "left_semi")
  }

  /** Keeper policy "best copy, not first copy": per near-dup cluster,
    * keep the doc maximizing (`score`, then smallest id on ties) —
    * production dedup keeps the cleanest duplicate, where min-id keeps
    * whichever copy happened to crawl first. Same shuffle shape as
    * [[keepOnePerCluster]]: the argmax is max(struct(score, −id)), an
    * associative partial agg — no per-cluster window.
    *
    * Contract: `idCol` must be NUMERIC (the argmax negates it for the
    * tie-break; validated here so misuse fails with a clear message,
    * not an opaque analysis error). A NULL `score` orders below every
    * non-null score in struct comparison, so null-scored copies lose to
    * any scored copy; a cluster whose scores are ALL null falls through
    * to the min-id tie-break — i.e. NULL means "no quality opinion",
    * never "best".
    */
  def keepBestPerCluster(docs: DataFrame, pairs: DataFrame, idCol: String,
                         score: Column): DataFrame = {
    require(docs.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"keepBestPerCluster: id column '$idCol' must be numeric for the " +
        s"negated-id tie-break, got ${docs.schema(idCol).dataType.simpleString}")
    val cc = connectedComponents(pairs, docs.select(col(idCol)), idCol)
    val scored = docs.select(col(idCol), score.as("__q")).join(cc, Seq(idCol))
    val keepers = scored.groupBy(col("cluster_id"))
      .agg(max(struct(col("__q"), (-col(idCol)).as("__nid"))).as("__k"))
      .select((-col("__k.__nid")).as(idCol))
    docs.join(keepers, Seq(idCol), "left_semi")
  }

  /** Benchmark decontamination: flag training docs sharing at least
    * `minShared` distinct word n-gram shingles with ANY doc of the
    * (much smaller) eval/benchmark set. The eval shingle set is
    * broadcast — the classic shape: benchmark n-grams are a bounded
    * relation (thousands of docs) even when the train side is 100 TB,
    * so the scan stays shuffle-free on the train side except the final
    * per-doc count. Returns (idCol, n_shared) for flagged docs.
    */
  def contaminatedDocs(train: DataFrame, evalDocs: DataFrame, textCol: String,
                       idCol: String, n: Int, minShared: Int): DataFrame = {
    val evalShingles = shingleTable(evalDocs, textCol, idCol, n)
      .select(col("shingle")).distinct()
    shingleTable(train, textCol, idCol, n)
      .join(broadcast(evalShingles), Seq("shingle"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** [[contaminatedDocs]] with a bloom-filter prefilter — the 100 TB
    * form. The bloom over xxhash64(shingle) stays a few MB at any eval
    * cardinality and its probe runs inside the train-side scan, so
    * ~every clean shingle dies at scan speed BEFORE any join — that
    * scan-speed kill is the win over the exact operator, whose
    * broadcast join still reads and hashes every train shingle. The
    * exact confirm join (broadcast, like the exact operator — swap the
    * hint for a shuffle if the eval set outgrows broadcast; the
    * survivor side is tiny either way) touches only prefilter
    * survivors, so false positives never reach the output: the result
    * is bit-identical to the exact operator regardless of FPP
    * (asserted in TextDedupSpec, oracle-checked as q92).
    *
    * The filter build is one tiny aggregate collected to the driver and
    * re-shipped as a literal — exactly how Catalyst's own
    * InjectRuntimeFilter moves its bloom from build side to probe side
    * (via a reused subquery broadcast).
    */
  def contaminatedDocsBloom(train: DataFrame, evalDocs: DataFrame, textCol: String,
                            idCol: String, n: Int, minShared: Int,
                            expectedItems: Long = 4_000_000L): DataFrame = {
    // Materialized once (localCheckpoint): the bloom build is an action
    // and the confirm join reads it again — without the cut, the eval
    // scan + shingle explosion + distinct would run twice. The set is
    // bounded (eval suites are), so local blocks are fine.
    val evalShingles = shingleTable(evalDocs, textCol, idCol, n)
      .select(col("shingle")).distinct().localCheckpoint(true)
    val bloom = evalShingles
      .agg(BloomFunctions.bloomAgg(xxhash64(col("shingle")), expectedItems).as("bf"))
      .head().getAs[Array[Byte]](0)
    val trainShingles = shingleTable(train, textCol, idCol, n)
    // NULL filter = empty eval set: nothing can be contaminated.
    val prefiltered =
      if (bloom == null) trainShingles.where(lit(false))
      else trainShingles.where(BloomFunctions.mightContain(lit(bloom), xxhash64(col("shingle"))))
    prefiltered
      .join(broadcast(evalShingles), Seq("shingle"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Wide SimHash over the distinct token set: `bits` (≤ 60) bits drawn
    * from md5(token) nibbles. 60 bits keeps every intermediate positive
    * in BOTH engines (no 1<<63 sign wrap, no ANSI overflow) while giving
    * pigeonhole blocks of 15 bits — 32k distinct values per block, so
    * the candidate join stays sparse at corpus scale where the 16-bit
    * fingerprint's 4-bit blocks (16 values) congest.
    */
  def simhashWide(docs: DataFrame, textCol: String, idCol: String,
                  bits: Int = 60): DataFrame = {
    require(bits <= 60, "bits > 60 would overflow signed-long arithmetic")
    val toks = docs.select(col(idCol),
      explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("tok"))
    val h = md5(col("tok"))
    val bitSums = (0 until bits).map { j =>
      val nibble = TextFunctions.hexNibble(substring(h, j / 4 + 1, 1))
      val bit = shiftright(nibble, j % 4).bitwiseAND(lit(1))
      sum(bit * 2 - 1).as(s"s$j")
    }
    val sums = toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val fp = (0 until bits).map(j =>
      when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    sums.select(col(idCol), fp.cast("long").as("simhash"))
  }

  /** SimHash near-dup pairs: Hamming distance ≤ maxHamming, via
    * pigeonhole blocking — the fingerprint splits into `maxHamming + 1`
    * contiguous bit blocks; any pair within Hamming ≤ h differs in at
    * most h blocks, so it must agree EXACTLY on at least one block.
    * Candidates come from an equi-join on (block_idx, block_value) and
    * only candidates pay the `bit_count` verification — the all-pairs
    * cross product never materializes.
    *
    * Identical fingerprints are collapsed BEFORE the block join: the
    * join runs over DISTINCT fingerprint values and id pairs re-expand
    * from the per-fingerprint id lists afterwards. Hamming-0 pairs come
    * straight from the groups without touching the join at all. On a
    * duplicate-heavy corpus (the norm in dedup) this shrinks the block
    * join from O(n²/blocks) to O(d²/blocks), d = distinct fingerprints,
    * and the expansion emits only true result rows. Work per block still
    * shrinks with the fingerprint width (`bits`): 16-bit fingerprints
    * give 2^4-value blocks (coarse); at corpus scale pair this with a
    * 60-bit simhash so each block carries 2^15 values.
    */
  def simhashPairs(sim: DataFrame, idCol: String, maxHamming: Int,
                   bits: Int = 16): DataFrame = {
    val (groups, fpPairs) = simhashFpRelations(sim, maxHamming, bits)
    // Hamming-0: every ordered pair within one fingerprint group.
    val intra = groups.filter(size(col("ids")) > 1)
      .select(explode(orderedPairsOf(col("ids"), "id_1", "id_2")).as("p"))
      .select(col("p.id_1").as("id_1"), col("p.id_2").as("id_2"),
        lit(0).cast("int").as("hamming"))
    val cross = fpPairs
      .join(groups.select(col("__sh").as("sh_1"), col("ids").as("ids_1")), Seq("sh_1"))
      .join(groups.select(col("__sh").as("sh_2"), col("ids").as("ids_2")), Seq("sh_2"))
      .select(explode(col("ids_1")).as("id_a"), col("ids_2"), col("hamming"))
      .select(col("id_a"), explode(col("ids_2")).as("id_b"), col("hamming"))
      .select(least(col("id_a"), col("id_b")).as("id_1"),
        greatest(col("id_a"), col("id_b")).as("id_2"),
        col("hamming").cast("int").as("hamming"))
    intra.unionByName(cross)
  }

  /** The shared fingerprint-level stage of [[simhashPairs]] /
    * [[simhashConnectivityEdges]]: (groups, fpPairs) where `groups` is
    * one row per DISTINCT fingerprint (__sh, sorted id list) and
    * `fpPairs` the hamming-verified distinct fingerprint pairs
    * (sh_1 < sh_2, hamming ≤ maxHamming). The quadratic block join
    * runs over COMPACT (block, value, fingerprint) keys only — the id
    * lists never ride the candidate stream (guide §2.3/§8: decide on
    * lightweight proxies, attach payloads once after the distinct);
    * they re-attach via two fingerprint-keyed joins against `groups`.
    */
  private[operators] def simhashFpRelations(sim: DataFrame, maxHamming: Int,
                                            bits: Int): (DataFrame, DataFrame) = {
    val nBlocks = maxHamming + 1
    require(nBlocks <= bits,
      s"maxHamming=$maxHamming needs $nBlocks pigeonhole blocks but the " +
        s"fingerprint has only $bits bits; at maxHamming >= bits every pair " +
        "qualifies anyway — use a wider simhash")
    val groups = sim.toDF("__id", "__sh")
      .groupBy(col("__sh")).agg(sort_array(collect_set(col("__id"))).as("ids"))
    // Block j covers bit range [j*bits/n, (j+1)*bits/n) — near-equal widths.
    val blockStructs = (0 until nBlocks).map { j =>
      val lo = j * bits / nBlocks
      val hi = (j + 1) * bits / nBlocks
      struct(lit(j).as("blk"),
        shiftright(col("__sh"), lo).bitwiseAND(lit((1L << (hi - lo)) - 1)).as("bval"))
    }
    val exploded = groups
      .select(col("__sh"), explode(array(blockStructs: _*)).as("b"))
      .select(col("__sh"), col("b.blk").as("blk"), col("b.bval").as("bval"))
    val a = exploded.toDF("sh_1", "blk", "bval")
    val b = exploded.toDF("sh_2", "blk", "bval")
    // sh_1 < sh_2 dedups the symmetric candidate, distinct() the
    // pair agreeing on >1 block.
    val fpPairs = a.join(b, Seq("blk", "bval"))
      .filter(col("sh_1") < col("sh_2"))
      .withColumn("hamming", bit_count(col("sh_1").bitwiseXOR(col("sh_2"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("sh_1"), col("sh_2"), col("hamming"))
      .distinct()
    (groups, fpPairs)
  }

  /** CONNECTIVITY-equivalent reduction of [[simhashPairs]]' edge set,
    * for consumers that feed the pairs into connected components and
    * never read per-pair rows: an identical-fingerprint group is a
    * clique — a STAR (min id → every other member, g−1 edges instead
    * of g·(g−1)/2) preserves its connectivity exactly — and a
    * qualifying fingerprint pair fully links two groups, so ONE
    * representative edge (min id of each side) replaces the |g_1|·|g_2|
    * bipartite expansion. Components (and therefore min-id labels) of
    * the reduced relation equal the full relation's bit for bit —
    * TextDedupSpec pins the equality — while the edge count drops from
    * quadratic in group sizes to O(docs + fingerprint pairs). At dedup
    * corpus scale this is the difference between a CC input that fits
    * the driver union-find fast path and a multi-round distributed
    * fixpoint over clique blow-up.
    */
  def simhashConnectivityEdges(sim: DataFrame, idCol: String, maxHamming: Int,
                               bits: Int = 16): DataFrame = {
    val (groups, fpPairs) = simhashFpRelations(sim, maxHamming, bits)
    val star = groups.filter(size(col("ids")) > 1)
      .select(element_at(col("ids"), 1).as("id_1"),
        explode(slice(col("ids"), lit(2), size(col("ids")) - 1)).as("id_2"))
    val reps = groups.select(col("__sh"), element_at(col("ids"), 1).as("rep"))
    val cross = fpPairs
      .join(reps.select(col("__sh").as("sh_1"), col("rep").as("id_1")), Seq("sh_1"))
      .join(reps.select(col("__sh").as("sh_2"), col("rep").as("id_2")), Seq("sh_2"))
      .select(col("id_1"), col("id_2"))
    star.unionByName(cross)
  }
}
