package graft.operators

import graft.functions.TextFunctions.hexNibble
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation primitives a large-scale training-data pipeline runs
  * between raw ingest and tokenization: PII redaction, passage-level
  * dedup chunking, deterministic sampling, Morton (Z-order) clustering
  * keys. All pure `Column` expressions over codegen'd builtins — no
  * UDFs — so they run at scan speed and stay inside WholeStageCodegen.
  *
  * Everything here is deterministic BY CONSTRUCTION (md5-derived
  * uniforms, integer arithmetic): at 100 TB a curation pass must be
  * re-runnable to the byte — `rand()` and row-order-dependent ids
  * break resumability and make audits impossible.
  */
object Curation {

  /** Email / phone patterns shared verbatim with the SQL oracles —
    * restricted to syntax both Java regex and RE2 read identically
    * (character classes, `{m,}` counted repetition; no backrefs or
    * lookarounds, which RE2 lacks).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"

  /** Redact PII in place: emails first (a phone-looking suffix inside an
    * address must not survive as a partial match), then phone numbers.
    * Single projection, two codegen'd regex passes.
    */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))

  /** Fixed-size token chunks ("pseudo-paragraphs") from a STAGED token
    * array (same re-inlining hazard as shinglesOfTokens: pass a column,
    * not `split(...)` inline). Chunk i covers tokens [i·n+1, i·n+n]
    * 1-based; the last chunk may be short. Empty array for an empty
    * token list — the `when` guard matters because Spark's
    * `sequence(0, -1)` counts DOWN ([0, -1]), it is not empty.
    */
  def chunksOfTokens(ts: Column, n: Int): Column = {
    val make = transform(
      sequence(lit(0), ceil(size(ts).cast("double") / n).cast("int") - 1),
      i => concat_ws(" ", slice(ts, i * n + 1, lit(n))))
    when(size(ts) > 0, make).otherwise(array().cast("array<string>"))
  }

  /** Passage-level first-occurrence dedup (the CCNet/C4 paragraph-dedup
    * shape): split each document into `n`-token chunks, keep only the
    * FIRST corpus-wide occurrence of each distinct chunk (first =
    * smallest (id, pos)), reassemble documents from their surviving
    * chunks. One explode + one window partitioned by the chunk HASH —
    * dedup state shards across the cluster by content, never
    * concentrating — + one group-by. Tokenizes in its own projection
    * (the staged-array contract of [[chunksOfTokens]]). Returns
    * (idCol, n_kept, clean_text); fully-duplicate documents vanish.
    */
  def firstOccurrenceChunks(docs: DataFrame, textCol: String, idCol: String,
                            n: Int): DataFrame = {
    val toks = docs.select(col(idCol), split(col(textCol), " ").as("__ts"))
    val chunks = toks
      .select(col(idCol), posexplode(chunksOfTokens(col("__ts"), n)))
      .withColumnRenamed("col", "chunk")
    val firstSeen = Window.partitionBy(md5(col("chunk")))
      .orderBy(col(idCol), col("pos"))
    chunks
      .withColumn("rn", row_number().over(firstSeen))
      .where(col("rn") === 1)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_kept"),
        concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("chunk")))),
            x => x.getField("chunk"))).as("clean_text"))
  }

  /** Global-frequency chunk removal (the C4 "repeated line" rule,
    * reference-free extension — C4 drops every line occurring ≥ 3
    * times ANYWHERE in the corpus, including the first copy; contrast
    * [[firstOccurrenceChunks]], which keeps first copies): split each
    * document into `n`-token chunks, count corpus-wide occurrences per
    * chunk hash, drop all copies of any chunk with count > `maxFreq`,
    * reassemble. One explode + one partial-agg count + one shuffle
    * hash join keyed by the CONTENT hash — frequency state shards by
    * content across the cluster, nothing concentrates — + one per-doc
    * group-by. Returns (idCol, n_chunks, n_removed, clean_text);
    * clean_text is '' when every chunk was boilerplate.
    */
  def removeFrequentChunks(docs: DataFrame, textCol: String, idCol: String,
                           n: Int, maxFreq: Long): DataFrame = {
    val toks = docs.select(col(idCol), split(col(textCol), " ").as("__ts"))
    val chunks = toks
      .select(col(idCol), posexplode(chunksOfTokens(col("__ts"), n)))
      .withColumnRenamed("col", "chunk")
      .withColumn("__h", md5(col("chunk")))
    val freq = chunks.groupBy(col("__h")).agg(count(lit(1)).as("__c"))
    chunks.join(freq, Seq("__h"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("__c") > maxFreq, 1L).otherwise(0L)).as("n_removed"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(
              when(col("__c") <= maxFreq, struct(col("pos"), col("chunk"))))),
            x => x.getField("chunk"))).as("clean_text"))
  }

  /** Deterministic uniform in [0, 65536): the first four md5 nibbles of
    * salt‖id. Stable across runs, engines, cluster sizes and data
    * order — the reproducible replacement for `rand()` in sampling.
    * Change the salt to draw an independent sample.
    */
  def hashU16(id: Column, salt: String): Column = {
    // The four nibble references share one md5 subtree; whole-stage
    // codegen's subexpression elimination evaluates the digest once.
    val h = md5(concat(lit(salt), id.cast("string")))
    (hexNibble(substring(h, 1, 1)) * 4096 + hexNibble(substring(h, 2, 1)) * 256 +
      hexNibble(substring(h, 3, 1)) * 16 + hexNibble(substring(h, 4, 1))).cast("int")
  }

  /** Temperature-weighted (α = 1/2) mixing quotas per document group —
    * the multilingual-corpus sampling recipe (α-smoothed source
    * weights, as in XLM-R / mT5 data mixing): a source's share of the
    * training budget is proportional to n^α rather than n, so
    * long-tail sources are up-weighted relative to their raw counts
    * and head sources down-weighted. All the derivation is INTEGER
    * arithmetic so both engines agree bit-for-bit: the α = 1/2 weight
    * is `floor(sqrt(n_docs))` (IEEE sqrt is correctly rounded, floor
    * is exact), the budget is `n_total div budgetDenom` docs, and a
    * group's quota is its integer pro-rata share of that budget.
    * `rate_u16` re-expresses the quota as a keep-threshold against
    * [[hashU16]]'s 16-bit uniform — the whole mix then applies as a
    * STATELESS per-row filter (no window, no per-group rank), which
    * is the only shape that survives 100 TB: a global per-source rank
    * would funnel each source through one partition.
    *
    * Returns one row per group: (groupCol, n_docs, quota, rate_u16).
    * The aggregate input is one map-side-combined count per group;
    * everything downstream is a |groups|-row relation.
    */
  def temperatureQuotas(docs: DataFrame, groupCol: String,
                        budgetDenom: Int = 2): DataFrame = {
    val counts = docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("isq", floor(sqrt(col("n_docs").cast("double"))).cast("long"))
    val totals = counts.agg(
      sum(col("n_docs")).as("n_total"), sum(col("isq")).as("sum_isq"))
    counts.crossJoin(broadcast(totals)) // one-row totals — broadcast literal
      .withColumn("quota",
        expr(s"((n_total div $budgetDenom) * isq) div sum_isq"))
      .withColumn("rate_u16",
        least(lit(65536L), expr("(quota * 65536) div n_docs")))
      .select(col(groupCol), col("n_docs"), col("quota"), col("rate_u16"))
  }

  /** Materialize the α-mixed corpus: keep a row iff its salted 16-bit
    * hash uniform falls under its group's [[temperatureQuotas]] rate.
    * The quota relation broadcasts (|groups| rows); the data side is a
    * pure scan-speed filter — deterministic, resumable, and identical
    * on any cluster size. Change the salt for an independent draw.
    */
  def temperatureMix(docs: DataFrame, groupCol: String, idCol: String,
                     salt: String, budgetDenom: Int = 2): DataFrame =
    docs.join(broadcast(temperatureQuotas(docs, groupCol, budgetDenom)), groupCol)
      .where(hashU16(col(idCol), salt).cast("long") < col("rate_u16"))

  /** Budget-constrained waterfill (max-min fair) source allocation —
    * the OTHER standard mixing policy next to [[temperatureQuotas]]'
    * α-smoothing: given a total document budget B = n_total/budgetDenom,
    * every source keeps min(n_i, cap) where cap is the unique water
    * level exhausting the budget — small sources keep everything, the
    * long tail of big crawls is clipped to one common ceiling (the
    * C4/CCNet per-domain balancing shape).
    *
    * Entirely integer arithmetic: sources sorted by (n asc, name asc),
    * k* = the largest k whose full-keep is feasible, tested as
    * n_k·(m−k+1) + S_{k−1} ≤ B — the division-free form, so there is
    * no rounding ambiguity — then cap = (B − S_{k*}) div (m − k*)
    * (no cap when k* = m: the whole corpus fits the budget). Windows
    * run over the |sources|-row count relation (dimension-bounded —
    * [[Relational.tinyOrderedWindow]]'s audit contract), never the
    * corpus; the allocation result is a broadcastable |sources|-row
    * relation a scan-speed hash filter applies, exactly like
    * [[temperatureMix]].
    *
    * Returns (groupCol, n_docs, quota, capped); Σ quota ≤ B and the
    * allocation is the max-min-fair optimum for that budget.
    */
  def waterfillQuotas(docs: DataFrame, groupCol: String,
                      budgetDenom: Int = 2): DataFrame = {
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
    val totals = counts.agg(sum(col("n_docs")).as("n_total"),
      count(lit(1)).as("m"))
    val ord = Relational.tinyOrderedWindow(col("n_docs"), col(groupCol))
    val ranked = counts.crossJoin(broadcast(totals))
      .withColumn("k", row_number().over(ord).cast("long"))
      .withColumn("s_prev", coalesce(
        sum(col("n_docs")).over(ord.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("b", expr(s"n_total div $budgetDenom"))
    val kstar = ranked
      .filter(col("n_docs") * (col("m") - col("k") + 1) + col("s_prev") <= col("b"))
      .agg(max(struct(col("k"), (col("s_prev") + col("n_docs")).as("s_k"))).as("ks"))
      .select(coalesce(col("ks.k"), lit(0L)).as("kk"),
        coalesce(col("ks.s_k"), lit(0L)).as("ss"))
    ranked.crossJoin(broadcast(kstar))
      .withColumn("cap",
        when(col("kk") < col("m"), expr("(b - ss) div (m - kk)")))
      .withColumn("quota",
        when(col("cap").isNull, col("n_docs")).otherwise(least(col("n_docs"), col("cap"))))
      .select(col(groupCol), col("n_docs"), col("quota"),
        (col("quota") < col("n_docs")).as("capped"))
  }

  /** Morton (Z-order) interleave of the low `bits` bits of each of n
    * dimensions: bit i of dimension j lands at position i·n + j.
    * Sorting / range-partitioning by this key clusters ALL dimensions
    * at once, so per-file min/max stats prune n-D predicates — the
    * standard multi-dimensional layout trick for 100 TB scan pruning.
    * A training-data layout key is usually at least 3-D — (source,
    * quality, length) — which is why this is not hard-wired to two
    * dimensions. The terms touch disjoint bit positions, so `+` is
    * exact (no carries, any association) and compiles to a flat
    * codegen'd expression.
    */
  def zValueN(dims: Seq[Column], bits: Int): Column = {
    val n = dims.length
    require(n >= 2, s"zValueN needs >= 2 dimensions, got $n")
    require(n * bits <= 63, s"$n dims x $bits bits overflows a signed long key")
    (0 until bits).flatMap { i =>
      dims.zipWithIndex.map { case (d, j) =>
        shiftright(d, i).bitwiseAND(lit(1)).cast("long") * lit(1L << (i * n + j))
      }
    }.reduce(_ + _)
  }

  /** 2-D [[zValueN]] (bit i of x at 2i, of y at 2i+1) — the common case. */
  def zValue(x: Column, y: Column, bits: Int): Column =
    zValueN(Seq(x, y), bits)

  /** SQL text of [[zValueN]] for the DuckDB oracle — same bit terms,
    * dialect-portable `>>`/`&` plus exact integer multiplies.
    */
  def zValueSqlN(dims: Seq[String], bits: Int): String = {
    val n = dims.length
    (0 until bits).flatMap { i =>
      dims.zipWithIndex.map { case (d, j) =>
        s"((($d >> $i) & 1) * ${1L << (i * n + j)})"
      }
    }.mkString(" + ")
  }

  /** SQL text of the 2-D [[zValue]]. */
  def zValueSql(x: String, y: String, bits: Int): String =
    zValueSqlN(Seq(x, y), bits)
}
