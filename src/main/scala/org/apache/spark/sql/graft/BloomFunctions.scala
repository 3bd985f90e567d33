// Lives under org.apache.spark.sql to reach the private[sql] helpers
// (ExpressionUtils Column↔Expression bridge) — same hosting convention
// as VectorExpressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column wrappers over Spark's own bloom-filter expressions — the exact
  * pair Catalyst's runtime row-level filtering (`InjectRuntimeFilter`)
  * injects around large shuffle joins. Exposing them directly lets an
  * operator build a bloom filter over one relation's keys and push the
  * membership test into another relation's scan, which is the standard
  * way to pre-shrink a semi-join at 100 TB: the filter is a few MB
  * regardless of key count, while broadcasting the key set itself grows
  * without bound.
  *
  * Both sides must feed the SAME 64-bit hash of the key (use
  * `xxhash64`): the aggregate inserts hashed longs and the probe tests
  * hashed longs.
  */
object BloomFunctions {

  /** Aggregate: build a bloom filter (BINARY) over a LONG hash column,
    * sized for `expectedItems` insertions at Spark's default FPP.
    * Returns NULL on empty input — callers must guard (a NULL filter
    * means "nothing can match", not "everything matches").
    */
  def bloomAgg(hashed: Column, expectedItems: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(ExpressionUtils.expression(hashed), expectedItems)
        .toAggregateExpression())

  /** Membership probe: true if `hashed` MIGHT be in `bloom` (no false
    * negatives; false positives at the filter's FPP — follow with an
    * exact confirm join when exactness matters).
    */
  def mightContain(bloom: Column, hashed: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(bloom), ExpressionUtils.expression(hashed)))
}
