package graft.operators

import graft.QueryPack
import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-retrieval surface over `documents`: BM25 relevance ranking and
  * corpus-wide heavy-hitter token statistics — the query-side and
  * profiling-side primitives a training-data pipeline needs once a
  * corpus is big enough that "grep" is a distributed job.
  *
  * Numeric contract: every double in the BM25 score is derived from
  * exact integer aggregates (tf, df, N, Σlen) through +,-,*,/ only, in
  * a FIXED association order mirrored literally by the oracle SQL —
  * IEEE 754 rounds those identically in every engine, where log()-based
  * idf would not be bit-stable. The classic `ln` idf is monotone in the
  * rational (N − df + ½)/(df + ½) used here, so rankings are identical.
  */
object RetrievalQueries extends QueryPack {

  /** Fixed query terms (the reference corpus is synthetic word-salad;
    * any real deployment parameterizes these).
    */
  private val TERMS = Seq("spark", "join", "fast")
  private val K1 = 1.2   // term-frequency saturation
  private val B = 0.75   // length normalization strength
  private val K1P1 = 2.2 // k1 + 1 as a literal: 1.2+1 in doubles is a
                         // round-to-even tie, so both engines parse the
                         // SAME literal instead of computing it
  private val TOPK = 20
  private val RRF_K = 60 // the canonical RRF smoothing constant
  private val RRF_R = 50 // per-leg candidate-list depth for fusion

  // q222: feedback depth, expansion width, and the RM3 interpolation λ
  // (original query mass 0.6, split uniformly over |TERMS|; expansion
  // mass 0.4, split by relative term weight)
  private val RM3_FDOCS = 10
  private val RM3_EXP = 3
  private val RM3_ORIG_W = 200000L // 600000 div |TERMS|

  /** Integer fixed-point BM25 contribution for a (tf, df, len) triple
    * against corpus stats (n, sumlen), emitted as an expression string
    * shared verbatim by Spark (`div`) and DuckDB (`//`): idf as the
    * exact rational ((2n−2df+1)·1e6) div (2df+1) — the argument of the
    * classic ln-idf, monotone-equal for ranking — and saturation
    * (tf·(k1+1)·1e12) div (tf·1e6 + 1.2·bnorm_ppm) with
    * bnorm_ppm = 0.25e6 + (0.75e6·len·n) div sumlen. Truncating
    * integer division throughout, so scores are engine-exact and sums
    * over terms are order-free (the double-BM25 q98 keeps a FIXED
    * association order instead; a data-dependent term set can't).
    */
  private def bm25IntExpr(div: String): String = {
    val bnorm = s"(250000 + (750000 * len * n) $div sumlen)"
    val sat = s"((tf * 2200000000000) $div (tf * 1000000 + (12 * $bnorm) $div 10))"
    val idf = s"(((2 * n - 2 * df + 1) * 1000000) $div (2 * df + 1))"
    s"((((w * $idf) $div 1000000) * $sat) $div 1000000)"
  }

  val queries: Map[String, Q] = Map(
    // RM3 pseudo-relevance feedback (Lavrenko & Croft's relevance
    // model, the Anserini/Lucene default expansion): rank with the
    // fixed query, take the top-10 as the feedback set, pick the 3
    // heaviest non-query terms by per-doc ppm mass, interpolate
    // (λ=0.6) into an expanded weighted query, re-rank, top-20. Every
    // stage is relational — term weights and dfs are computed by
    // joins, never collected — and every score is integer fixed-point
    // ([[bm25IntExpr]]), so the data-dependent expansion still hashes
    // identically. Shape at 100 TB: two scans of the token relation
    // (one per pass), each a query-term semi-join (tiny broadcast) +
    // partial aggs; the feedback/expansion relations are 10- and
    // 3-row broadcasts.
    "q222_rm3_expansion" -> ((s, d) => {
      import s.implicits._
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val lens = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("len"))
      val st = lens.agg(count(lit(1)).as("n"), sum(col("len")).as("sumlen"))
      val q1 = TERMS.toDF("tok")
      def scorePass(q: org.apache.spark.sql.DataFrame) = {
        val tf = toks.join(broadcast(q), Seq("tok"))
          .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
        val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
        tf.join(broadcast(df.join(q, Seq("tok"))), Seq("tok"))
          .join(lens, Seq("doc_id"))
          .crossJoin(broadcast(st))
          .withColumn("c", expr(bm25IntExpr("div")))
          .groupBy(col("doc_id")).agg(sum(col("c")).as("score_q"))
      }
      val fb = scorePass(q1.withColumn("w", lit(1000000L)))
        .orderBy(col("score_q").desc, col("doc_id")).limit(RM3_FDOCS)
        .select(col("doc_id"))
      val cand = toks.join(broadcast(fb), Seq("doc_id"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))
        .join(lens, Seq("doc_id"))
        .select(col("tok"), expr("(cnt * 1000000) div len").as("m"))
        .groupBy(col("tok")).agg(sum(col("m")).as("w_raw"))
        .join(q1, Seq("tok"), "left_anti")
        .orderBy(col("w_raw").desc, col("tok")).limit(RM3_EXP)
      val sw = cand.agg(sum(col("w_raw")).as("sum_w"))
      val q2 = q1.withColumn("w", lit(RM3_ORIG_W)).unionByName(
        cand.crossJoin(broadcast(sw))
          .select(col("tok"), expr("(400000 * w_raw) div sum_w").as("w")))
      scorePass(q2)
        .orderBy(col("score_q").desc, col("doc_id")).limit(TOPK)
    }),

    // BM25 top-20 documents for a fixed 3-term query. Shape at 100 TB:
    // one scan computes per-doc (len, tf...) map-side; the corpus
    // stats (N, Σlen, df per term) partial-aggregate to ONE row that
    // broadcasts back; scoring is a codegen'd projection; the top-k is
    // TakeOrderedAndProject (no global sort materialization).
    "q98_bm25" -> ((s, d) =>
      bm25Scored(s, d)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(TOPK)),

    // Hybrid retrieval via reciprocal-rank fusion — the standard way a
    // modern retrieval stack combines a lexical (BM25) and a semantic
    // (embedding-cosine) ranking without score calibration: each leg
    // contributes 1/(60 + rank) for its top-R, summed. Here the fusion
    // score is kept INTEGER (1e9 div (60 + rank), parts-per-billion) so
    // the hash check pins the fused ranking exactly. The semantic leg
    // ranks the corpus against one designated query vector (vec_id 0 —
    // a real deployment parameterizes this): a scan + bounded top-R,
    // never a pairwise kernel. Each leg's rank assignment is a window
    // over its R-row candidate list (bounded — not a corpus-wide sort);
    // the fuse is an R-row full-outer join. Absent-from-a-leg
    // contributes rank 0 (= no score), the truncated-list RRF contract.
    "q131_hybrid_rrf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val lexTop = bm25Scored(s, d)
        .orderBy(col("score").desc, col("doc_id")).limit(RRF_R)
      val lex = lexTop.select(col("doc_id"),
        row_number().over(Relational.tinyOrderedWindow(col("score").desc, col("doc_id")))
          .as("r_lex"))
      val emb = Tables.embeddings(s, d)
      val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qemb"))
      val semTop = emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv)) // one-row query vector
        .withColumn("cos",
          graft.functions.VectorFunctions.cosine(col("embedding"), col("qemb")))
        .filter(col("cos").isNotNull)
        .orderBy(col("cos").desc, col("vec_id")).limit(RRF_R)
      val sem = semTop.select(col("vec_id").as("doc_id"),
        row_number().over(Relational.tinyOrderedWindow(col("cos").desc, col("vec_id")))
          .as("r_sem"))
      lex.join(sem, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          coalesce(col("r_lex"), lit(0)).as("r_lex"),
          coalesce(col("r_sem"), lit(0)).as("r_sem"))
        .withColumn("rrf_ppb",
          (when(col("r_lex") > 0, expr(s"1000000000 div ($RRF_K + r_lex)"))
            .otherwise(0) +
           when(col("r_sem") > 0, expr(s"1000000000 div ($RRF_K + r_sem)"))
             .otherwise(0)).cast(LongType))
        .orderBy(col("rrf_ppb").desc, col("doc_id"))
        .limit(TOPK)
    }),

    // Corpus heavy hitters: top-20 tokens by total occurrences, with
    // document frequency. explode → partial-aggregated groupBy →
    // TakeOrderedAndProject; at 100 TB the map-side combine collapses
    // each task's token stream before the single narrow shuffle.
    // (q84_vocab_topk ranks shingles by DOC frequency; this is the
    // occurrence-count twin over raw tokens.) The exact groupBy is the
    // oracle-checkable path; CountMinSketchSpec proves the sketch twin
    // for streams/one-pass settings against its ε·N error contract.
    "q99_token_topk" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n_occurrences"),
          count_distinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n_occurrences").desc, col("token"))
        .limit(TOPK)
    }),

    // "More like this" — search-by-document: for each of 5 probe
    // documents (lowest ids; a deployment parameterizes), the top-3
    // other documents by shared distinct-3-gram count, with the
    // overlap as bps of the probe's shingle set. The candidate
    // generator for citation/attribution review and the retrieval dual
    // of q45's symmetric pair mining: probe shingles are a bounded
    // broadcast, scoring is ONE equi-join on the shingle key + one
    // partial agg, top-3 is a per-probe bounded window — nothing
    // corpus-pairwise.
    "q197_more_like_this" -> ((s, d) => {
      val sh = Dedup.shingleTable(Tables.documents(s, d), "text", "doc_id", 3)
      val probes = Tables.documents(s, d).select(col("doc_id"))
        .orderBy(col("doc_id")).limit(5)
      val psh = sh.join(broadcast(probes), "doc_id")
        .select(col("doc_id").as("probe_id"), col("shingle"))
        .localCheckpoint(true)
      val psz = psh.groupBy(col("probe_id")).agg(count(lit(1)).as("n_probe"))
      val scored = psh.join(sh, "shingle")
        .filter(col("doc_id") =!= col("probe_id"))
        .groupBy(col("probe_id"), col("doc_id"))
        .agg(count(lit(1)).as("n_shared"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("n_shared").desc, col("doc_id"))
      scored.withColumn("rn", row_number().over(w).cast(LongType))
        .filter(col("rn") <= 3)
        .join(broadcast(psz), "probe_id")
        .select(col("probe_id"), col("rn"), col("doc_id"), col("n_shared"),
          expr("(n_shared * 10000) div n_probe").as("overlap_bps"))
    }),

    // Phrase search over a positional inverted index — the retrieval
    // primitive BM25's bag-of-words scoring cannot express ("exact
    // quote" queries, and the candidate generator for attribution /
    // memorization audits). The postings relation (token, doc, pos) is
    // one explode; a phrase of length L matches where all L (offset,
    // token) legs land on one (doc, start) key — a broadcast join of
    // the L-row phrase relation against the postings plus ONE group-by
    // on (doc, start) counting satisfied offsets, never L self-joins.
    // Overlapping occurrences count separately (positional-AND
    // semantics). The phrase itself is data-derived — the corpus's
    // top-1 3-gram (count desc, phrase asc) — so the query is
    // deterministic and non-empty at every scale factor; a deployment
    // parameterizes it.
    "q176_phrase_search" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val ps = Dedup.positionalShingleTable(docs, "text", "doc_id", 3)
      val top = ps.groupBy(col("shingle")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("shingle")).limit(1)
        .select(col("shingle").as("phrase"))
      // L-row (offset, token) legs of the phrase — bounded relation
      val legs = top.select(col("phrase"),
          posexplode(split(col("phrase"), " ")))
        .select(col("phrase"), col("pos").as("off"), col("col").as("w"))
      val post = docs
        .select(col("doc_id"), posexplode(tokens(col("text"))))
        .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok"))
      post.join(broadcast(legs), post("tok") === legs("w"))
        .select(col("phrase"), col("doc_id"), (col("pos") - col("off")).as("start"))
        .groupBy(col("phrase"), col("doc_id"), col("start"))
        .agg(count(lit(1)).as("n_legs"))
        .filter(col("n_legs") === 3)
        .groupBy(col("phrase"), col("doc_id"))
        .agg(count(lit(1)).as("n_occurrences"), min(col("start")).as("first_pos"))
    })
  )

  /** BM25-scored corpus: (doc_id, tf_<term>..., score) for the fixed
    * query. Shape at 100 TB: one scan computes per-doc (len, tf...)
    * map-side; the corpus stats (N, Σlen, df per term) partial-
    * aggregate to ONE row that broadcasts back; scoring is a codegen'd
    * projection. Shared by q98 (top-k) and q131 (lexical RRF leg).
    */
  private def bm25Scored(s: org.apache.spark.sql.SparkSession, d: String) = {
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id") +: size(col("toks")).as("len") +:
        TERMS.map(t =>
          size(filter(col("toks"), x => x === t)).as(s"tf_$t")): _*)
    val statCols =
      count(lit(1)).as("n") +: sum(col("len")).as("sumlen") +:
        TERMS.map(t =>
          sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = tf.agg(statCols.head, statCols.tail: _*)
    val nd = col("n").cast(DoubleType)
    val avgdl = col("sumlen").cast(DoubleType) / nd
    val bnorm = lit(1.0 - B) + lit(B) * (col("len").cast(DoubleType) / avgdl)
    val score = TERMS.map { t =>
      val tfd = col(s"tf_$t").cast(DoubleType)
      val dfd = col(s"df_$t").cast(DoubleType)
      ((nd - dfd + lit(0.5)) / (dfd + lit(0.5))) *
        ((tfd * lit(K1P1)) / (tfd + lit(K1) * bnorm))
    }.reduce(_ + _)
    tf.crossJoin(broadcast(stats))
      .select(col("doc_id") +: TERMS.map(t => col(s"tf_$t")) :+
        score.as("score"): _*)
  }

  /** The BM25 score as oracle SQL — the SAME association order as the
    * Column expression above, term by term.
    */
  private def scoreSql: String = {
    val bnorm =
      s"(0.25 + 0.75 * (CAST(len AS DOUBLE) / (CAST(sumlen AS DOUBLE) / CAST(n AS DOUBLE))))"
    TERMS.map { t =>
      s"""((CAST(n AS DOUBLE) - CAST(df_$t AS DOUBLE) + 0.5) / (CAST(df_$t AS DOUBLE) + 0.5)) *
         |   ((CAST(tf_$t AS DOUBLE) * $K1P1) / (CAST(tf_$t AS DOUBLE) + $K1 * $bnorm))""".stripMargin
    }.mkString("(", " + ", ")")
  }

  val oracleSql: Map[String, String] = Map(
    "q222_rm3_expansion" -> {
      val termList = TERMS.map(t => s"'$t'").mkString("[", ",", "]")
      val c = bm25IntExpr("//")
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |              FROM documents),
         |lens AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len FROM toks GROUP BY 1),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |              CAST(sum(len) AS BIGINT) AS sumlen FROM lens),
         |q1 AS (SELECT unnest($termList) AS tok),
         |tf1 AS (SELECT t.doc_id, t.tok, CAST(count(*) AS BIGINT) AS tf
         |        FROM toks t JOIN q1 USING (tok) GROUP BY 1, 2),
         |df1 AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf1 GROUP BY 1),
         |sc1 AS (SELECT f.doc_id, CAST(sum($c) AS BIGINT) AS score_q
         |        FROM (SELECT *, 1000000 AS w FROM tf1) f
         |        JOIN df1 USING (tok) JOIN lens USING (doc_id) CROSS JOIN st
         |        GROUP BY 1),
         |fb AS (SELECT doc_id FROM sc1 ORDER BY score_q DESC, doc_id LIMIT $RM3_FDOCS),
         |cm AS (SELECT t.doc_id, t.tok, CAST(count(*) AS BIGINT) AS cnt
         |       FROM toks t JOIN fb USING (doc_id) GROUP BY 1, 2),
         |cand AS (SELECT tok, CAST(sum((cnt * 1000000) // len) AS BIGINT) AS w_raw
         |         FROM cm JOIN lens USING (doc_id)
         |         WHERE tok NOT IN (SELECT tok FROM q1)
         |         GROUP BY 1
         |         ORDER BY w_raw DESC, tok LIMIT $RM3_EXP),
         |sw AS (SELECT CAST(sum(w_raw) AS BIGINT) AS sum_w FROM cand),
         |q2 AS (SELECT tok, $RM3_ORIG_W AS w FROM q1
         |       UNION ALL
         |       SELECT tok, (400000 * w_raw) // (SELECT sum_w FROM sw) FROM cand),
         |tf2 AS (SELECT t.doc_id, t.tok, CAST(count(*) AS BIGINT) AS tf
         |        FROM toks t JOIN (SELECT tok FROM q2) q USING (tok) GROUP BY 1, 2),
         |df2 AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf2 GROUP BY 1),
         |sc2 AS (SELECT f.doc_id, CAST(sum($c) AS BIGINT) AS score_q
         |        FROM tf2 f JOIN df2 USING (tok) JOIN q2 USING (tok)
         |        JOIN lens USING (doc_id) CROSS JOIN st
         |        GROUP BY 1)
         |SELECT doc_id, score_q FROM sc2
         |ORDER BY score_q DESC, doc_id LIMIT $TOPK""".stripMargin
    },
    "q98_bm25" -> {
      val tfCols = TERMS.map(t =>
        s"CAST(len(list_filter(toks, x -> x = '$t')) AS INT) AS tf_$t").mkString(",\n           ")
      val dfCols = TERMS.map(t =>
        s"SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t").mkString(",\n           ")
      val tfOut = TERMS.map(t => s"tf_$t").mkString(", ")
      s"""WITH tf AS (
         |  SELECT doc_id, CAST(len(toks) AS INT) AS len,
         |           $tfCols
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
         |st AS (
         |  SELECT count(*) AS n, SUM(len) AS sumlen,
         |           $dfCols
         |  FROM tf)
         |SELECT doc_id, $tfOut, score FROM (
         |  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rn FROM (
         |    SELECT doc_id, $tfOut, $scoreSql AS score
         |    FROM tf CROSS JOIN st))
         |WHERE rn <= $TOPK""".stripMargin
    },
    // Mirrors q131: per-leg rank within the top-R candidate list,
    // integer RRF (1e9 // (60 + rank)), absent leg contributes 0.
    "q131_hybrid_rrf" -> {
      val tfCols = TERMS.map(t =>
        s"CAST(len(list_filter(toks, x -> x = '$t')) AS INT) AS tf_$t").mkString(",\n           ")
      val dfCols = TERMS.map(t =>
        s"SUM(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t").mkString(",\n           ")
      val cos = SimilarityQueries.cosSql("q.embedding", "c.embedding")
      s"""WITH tf AS (
         |  SELECT doc_id, CAST(len(toks) AS INT) AS len,
         |           $tfCols
         |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)),
         |st AS (
         |  SELECT count(*) AS n, SUM(len) AS sumlen,
         |           $dfCols
         |  FROM tf),
         |lex AS (SELECT doc_id, CAST(rn AS INT) AS r_lex FROM (
         |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rn FROM (
         |    SELECT doc_id, $scoreSql AS score
         |    FROM tf CROSS JOIN st))
         |  WHERE rn <= $RRF_R),
         |sem AS (SELECT doc_id, CAST(rn AS INT) AS r_sem FROM (
         |  SELECT vec_id AS doc_id,
         |         row_number() OVER (ORDER BY cos DESC, vec_id) AS rn FROM (
         |    SELECT c.vec_id, $cos AS cos
         |    FROM embeddings q JOIN embeddings c ON c.vec_id != 0
         |    WHERE q.vec_id = 0 AND $cos IS NOT NULL))
         |  WHERE rn <= $RRF_R)
         |SELECT doc_id, COALESCE(r_lex, 0) AS r_lex, COALESCE(r_sem, 0) AS r_sem,
         |       CAST(CASE WHEN r_lex IS NULL THEN 0
         |                 ELSE 1000000000 // ($RRF_K + r_lex) END
         |          + CASE WHEN r_sem IS NULL THEN 0
         |                 ELSE 1000000000 // ($RRF_K + r_sem) END AS BIGINT) AS rrf_ppb
         |FROM lex FULL OUTER JOIN sem USING (doc_id)
         |ORDER BY rrf_ppb DESC, doc_id
         |LIMIT $TOPK""".stripMargin
    },
    "q99_token_topk" ->
      s"""SELECT token, count(*) AS n_occurrences,
         |       count(DISTINCT doc_id) AS n_docs
         |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
         |      FROM documents)
         |GROUP BY token
         |ORDER BY n_occurrences DESC, token
         |LIMIT $TOPK""".stripMargin,
    "q197_more_like_this" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         raw AS (SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(ts) - 2),
                          i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS shingle
                 FROM toks),
         sh AS (SELECT DISTINCT doc_id, shingle FROM raw),
         pr AS (SELECT doc_id AS probe_id FROM documents
                ORDER BY doc_id LIMIT 5),
         psh AS (SELECT p.probe_id, s.shingle FROM sh s
                 JOIN pr p ON p.probe_id = s.doc_id),
         psz AS (SELECT probe_id, CAST(count(*) AS BIGINT) AS n_probe
                 FROM psh GROUP BY 1),
         sc AS (SELECT q.probe_id, s.doc_id, CAST(count(*) AS BIGINT) AS n_shared
                FROM psh q JOIN sh s ON s.shingle = q.shingle
                WHERE s.doc_id <> q.probe_id
                GROUP BY 1, 2),
         rk AS (SELECT probe_id, doc_id, n_shared,
                  CAST(row_number() OVER (PARTITION BY probe_id
                       ORDER BY n_shared DESC, doc_id) AS BIGINT) AS rn
                FROM sc)
       SELECT r.probe_id, r.rn, r.doc_id, r.n_shared,
              (r.n_shared * 10000) // z.n_probe AS overlap_bps
       FROM rk r JOIN psz z USING (probe_id) WHERE r.rn <= 3""",
    "q176_phrase_search" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         praw AS (SELECT doc_id, ts,
                    unnest(generate_series(1, len(ts) - 2)) AS pos
                  FROM toks),
         ps AS (SELECT doc_id, pos,
                  ts[pos] || ' ' || ts[pos+1] || ' ' || ts[pos+2] AS shingle
                FROM praw),
         top1 AS (SELECT shingle AS phrase
                  FROM (SELECT shingle, count(*) AS n FROM ps GROUP BY 1
                        ORDER BY n DESC, shingle LIMIT 1)),
         legs AS (SELECT phrase, i - 1 AS off, string_split(phrase, ' ')[i] AS w
                  FROM (SELECT phrase, unnest(generate_series(1, 3)) AS i
                        FROM top1)),
         post AS (SELECT doc_id, pos, ts[pos] AS tok
                  FROM (SELECT doc_id, ts,
                          unnest(generate_series(1, len(ts))) AS pos
                        FROM toks)),
         occ AS (SELECT l.phrase, p.doc_id, p.pos - l.off AS start,
                        count(*) AS n_legs
                 FROM post p JOIN legs l ON p.tok = l.w
                 GROUP BY 1, 2, 3 HAVING count(*) = 3)
       SELECT phrase, doc_id, count(*) AS n_occurrences,
              CAST(min(start) AS INT) AS first_pos
       FROM occ GROUP BY 1, 2"""
  )
}
