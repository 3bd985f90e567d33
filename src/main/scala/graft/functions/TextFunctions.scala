package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale training-data
  * pipelines: tokenization, quality scoring, language-ID scoring,
  * fingerprinting, shingling. All are pure `Column` expressions built
  * from codegen'd builtins — no UDFs — so they stay inside
  * WholeStageCodegen and scale linearly with the scan.
  *
  * Determinism note: hashing uses md5 (available in every engine we
  * oracle against); per-row double arithmetic is IEEE-deterministic.
  */
object TextFunctions {

  /** Space-delimited tokens — deliberately a SINGLE-space split, the
    * exact cross-engine contract the oracles reproduce
    * (`string_split(text, ' ')`). Runs of whitespace/tabs produce empty
    * or glued tokens here; for real corpora normalize first or use
    * [[tokensNormalized]].
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace-robust tokens for real corpora: trims, splits on any
    * whitespace run, never yields empty tokens ('' → empty array).
    */
  def tokensNormalized(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** Canonical normalization (Unicode NFC + accent strip + lowercase)
    * as one codegen'd native expression — the pre-dedup pass that makes
    * NFC/NFD encodings of the same visible text hash identically
    * ([[org.apache.spark.sql.graft.NormalizeText]]).
    */
  def normText(text: Column): Column =
    org.apache.spark.sql.graft.TextNormalize.normText(text)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: alpha runs + digit runs + punct as one token
    * each (a cheap stand-in for a real tokenizer's token count).
    */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"))

  /** Fraction of tokens that appear in `stopwords`. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val hits = size(filter(tokens(text), t => t.isin(stopwords.map(lit(_)): _*)))
    hits.cast("double") / tokenCount(text).cast("double")
  }

  /** Number of tokens found in `vocab` — the language-ID score for one
    * language's stopword set (n-gram/stopword heuristic).
    */
  def langScore(text: Column, vocab: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(vocab.map(lit(_)): _*)))

  /** Fraction of characters that are punctuation (not alnum/space). */
  def punctRatio(text: Column): Column =
    regexp_count(text, lit("[^a-zA-Z0-9 ]")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  /** Composite quality score in [0,1]: length credit × (1 − stopword
    * share). Mirrors the usual length/stopword heuristics.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column =
    least(lit(1.0), tokenCount(text).cast("double") / lit(50.0)) *
      (lit(1.0) - stopwordRatio(text, stopwords))

  /** Polynomial rolling hash over the token stream:
    * h ← (h·31 + v(tok)) mod (2³¹−1), with v(tok) the value of the
    * first md5 nibble — engine-portable integer arithmetic (no 64-bit
    * overflow, same md5 on both sides), order-sensitive unlike the
    * md5-of-normalized-text fingerprint.
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (h, t) => (h * 31 + hexNibble(substring(md5(t), 1, 1)).cast("long")) % 2147483647L)

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased
    * text. Collision-safe enough for exact dedup at 100 TB (128-bit).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Word n-gram shingles (distinct) from a STAGED token-array column,
    * 1-based element_at so the same expression shape works in 1-based SQL
    * engines. Empty array when the document has fewer than n tokens.
    *
    * Takes the token array, not the text: every `element_at(ts, …)`
    * reference inlines its argument subtree, so passing `tokens(text)`
    * directly would re-split the whole document 3n× per shingle
    * (measured ~20× slowdown). Project the tokens into a column first.
    */
  def shinglesOfTokens(ts: Column, n: Int): Column = {
    val make = transform(sequence(lit(1), size(ts) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(ts, i + o)): _*))
    array_distinct(when(size(ts) >= n, make).otherwise(array()))
  }

  /** [[shinglesOfTokens]] WITHOUT the distinct: one shingle per start
    * position, in position order — the form run-detection needs (exact-
    * substring matching is about WHERE shingles sit, not which exist).
    * Element i (0-based) is the shingle starting at token i+1 (1-based).
    */
  def positionalShinglesOfTokens(ts: Column, n: Int): Column = {
    val make = transform(sequence(lit(1), size(ts) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(o => element_at(ts, i + o)): _*))
    when(size(ts) >= n, make).otherwise(array())
  }

  /** Value of a hex digit via position lookup — identical semantics to
    * SQL `strpos('123456789abcdef', ch)`: '0'→0, '1'→1 … 'f'→15.
    */
  def hexNibble(ch: Column): Column =
    call_function("instr", lit("123456789abcdef"), ch)

  /** Ten-way deterministic split from the first two md5 nibbles of
    * `salt ‖ key` — the arrival/holdout/split bucketing device shared
    * by the dedup-maintenance, streaming-ingest and release queries
    * (bucket < 9 ⇒ the 90% side, unless a caller says otherwise).
    * DuckDB twin: [[graft.QueryPack.md5Bucket10Sql]] — the two encode
    * ONE rule and must change together.
    */
  def md5Bucket10(key: Column, salt: String = ""): Column = {
    val h = md5(concat(lit(salt), key.cast("string")))
    (hexNibble(substring(h, 1, 1)) * 16 + hexNibble(substring(h, 2, 1))) % 10
  }

  /** 48-bit ring position from the first 12 md5 nibbles of
    * `salt ‖ key` — the consistent-hashing device (q251). 48 bits keeps
    * vnode collisions negligible (~10⁻¹¹ over a few hundred vnodes)
    * while every derived quantity (`dist·16 + shard` < 2⁵²) stays
    * BIGINT-exact on both engines. DuckDB twin:
    * [[graft.QueryPack.md5Ring48Sql]]; driver-side constant twin:
    * [[md5Ring48Const]] — the three encode ONE rule and must change
    * together.
    */
  val RING_M: Long = 1L << 48

  def md5Ring48(key: Column, salt: String = ""): Column = {
    val h = md5(concat(lit(salt), key.cast("string")))
    (1 to 12).map(i => hexNibble(substring(h, i, 1)).cast("long") *
      lit(1L << (4 * (12 - i)))).reduce(_ + _)
  }

  /** [[md5Ring48]] for a CONSTANT key, evaluated at plan-build time —
    * the vnode table of q251 is an algorithm constant (shards × vnodes,
    * a few hundred rows), so its positions embed as literals instead of
    * a joined relation. java.security md5 of the UTF-8 bytes ≡ Spark's
    * and DuckDB's `md5` on the same string.
    */
  def md5Ring48Const(key: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 12), 16)
  }
}
