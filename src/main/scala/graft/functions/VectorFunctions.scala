package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, as pure Catalyst
  * higher-order functions (zip_with/aggregate) — codegen-friendly, no
  * UDF/serialization cost, works on any array length.
  *
  * Floats are widened to double BEFORE multiplication and folded
  * strictly left-to-right, so the result is bit-identical across engines
  * that fold sequentially (the DuckDB oracle's list_reduce does).
  */
object VectorFunctions {

  /** Codegen'd native expression
    * ([[org.apache.spark.sql.graft.VectorExpressions.vecDot]]); same
    * strict left-to-right double fold as the previous
    * `aggregate(zip_with(...))` formulation, ~100× faster in joins.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorExpressions.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cos = dot/(‖a‖·‖b‖), NULL when either norm is 0. The guard is
    * load-bearing: under Spark 4's default ANSI mode a raw `/` THROWS
    * DIVIDE_BY_ZERO the moment a corpus contains a zero vector, killing
    * the whole job — while the DuckDB oracle's `/` yields NULL. NULL is
    * both the cross-engine contract and the right semantics (a zero
    * vector has no direction, hence no cosine).
    */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d =!= 0, dot(a, b) / d)
  }

  /** Sign-bit LSH bucket over the first `bits` dimensions: projection
    * onto the standard basis (a degenerate but deterministic random-
    * hyperplane family). Vectors in the same bucket are ANN candidates.
    * The size guard is load-bearing like [[cosine]]'s: under Spark 4's
    * default ANSI mode a raw element_at past the array end THROWS
    * INVALID_ARRAY_INDEX — one truncated embedding row would kill the
    * whole job. A short vector's missing dimensions read as sign 0.
    */
  def signBucket(a: Column, bits: Int): Column =
    concat((1 to bits).map(i =>
      when(size(a) >= i && element_at(a, i) >= 0f, "1").otherwise("0")): _*)
}
