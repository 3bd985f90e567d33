// Lives under org.apache.spark.sql to reach private[sql] internals
// (Dataset.ofRows, UnsafeProjection plumbing) — same hosting convention
// as VectorExpressions/BloomFunctions.
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The whole-operator tier of the custom-operator ladder: as-of join as
  * a first-class Catalyst operator — a logical node ([[AsOfJoinNode]]),
  * a planner strategy ([[AsOfJoinStrategy]], registered through
  * `GraftExtensions.injectPlannerStrategy`), and a physical operator
  * ([[AsOfJoinExec]]) that declares hash distribution + (key, ts)
  * ordering requirements and runs a streaming two-pointer merge per
  * partition.
  *
  * Versus the composed union-carry-forward form
  * (`Relational.asOfJoin`, reference semantics
  * `sql/bl_3nf/load_fct_sales.sql` key-resolution-at-time): the same
  * single shuffle per side, but no union row inflation and no window
  * machinery — the right side is consumed once, the carry state is ONE
  * buffered row per key group, and EnsureRequirements can reuse an
  * existing hash partitioning or bucketing on either side because the
  * requirement is declared, not hand-built. Semantics: latest right row
  * with `rightTs <= leftTs` per key (inclusive, matching SQL
  * `ASOF LEFT JOIN ... ON l.k = r.k AND l.ts >= r.ts`); unmatched left
  * rows keep NULL right attributes. Right rows sharing an exact
  * (key, ts) resolve to whichever sorts last — make `rightTs` unique
  * per key (version tables are) for full determinism.
  *
  * Measured (sf0.1, 600k left × 60k right, local[32], warm): composed
  * 0.45 s vs native 1.08 s — the window form rides whole-stage codegen
  * while this merge is an interpreted iterator, and at shuffle-bound
  * shapes that wins. Use the native operator when a side is already
  * hash-distributed on the keys (bucketed fact, pre-partitioned
  * stream state): the declared ClusteredDistribution lets
  * EnsureRequirements elide that side's exchange entirely, which the
  * union trick structurally cannot (it must co-shuffle the union).
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightAttrs: Seq[Attribute]) extends BinaryNode {
  // Left-outer shape: every right attribute becomes nullable.
  override def output: Seq[Attribute] =
    left.output ++ rightAttrs.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, rattrs) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, rattrs) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    rightAttrs: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightAttrs.map(_.withNullability(true))

  /** Declared, not hand-built: EnsureRequirements co-partitions the
    * sides (or reuses an existing hash/bucket layout) and inserts the
    * per-partition sorts only where the child isn't already ordered.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  // The merge emits left rows in their incoming order.
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val rAttrsHere = rightAttrs
    val (lKeys, rKeys, lTs, rTs) = (leftKeys, rightKeys, leftTs, rightTs)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, lOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lTs), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rTs), rOut)
      val rAttrProj = UnsafeProjection.create(rAttrsHere, rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTs.dataType))
      val outProj = UnsafeProjection.create(
        lOut ++ rAttrsHere.map(_.withNullability(true)),
        lOut ++ rAttrsHere.map(_.withNullability(true)))
      val nullRight: InternalRow = new GenericInternalRow(rAttrsHere.length)
      val joined = new JoinedRow

      // Current un-consumed right row (copied out of the iterator's
      // reused buffer) and the carry: the last right row already
      // consumed, valid while the left key still equals carryKey.
      var rRow: InternalRow = null
      var rRowKey: UnsafeRow = null
      var carryKey: UnsafeRow = null
      var carryAttrs: UnsafeRow = null
      def advanceRight(): Unit =
        if (rIter.hasNext) {
          rRow = rIter.next().copy()
          rRowKey = rKeyProj(rRow).copy()
        } else { rRow = null; rRowKey = null }
      advanceRight()

      lIter.map { l =>
        val lKey = lKeyProj(l)
        // Right key groups with no more left rows: skip entirely.
        while (rRow != null && keyOrd.compare(rRowKey, lKey) < 0) advanceRight()
        // Consume this key group up through leftTs, keeping the latest.
        val lTsRow = lTsProj(l)
        while (rRow != null && keyOrd.compare(rRowKey, lKey) == 0 &&
          tsOrd.compare(rTsProj(rRow), lTsRow) <= 0) {
          carryAttrs = rAttrProj(rRow).copy()
          carryKey = rRowKey // advanceRight() re-copies, never mutates this
          advanceRight()
        }
        val m =
          if (carryKey != null && keyOrd.compare(carryKey, lKey) == 0) carryAttrs
          else nullRight
        outProj(joined(l, m))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  /** DataFrame entry point: as-of join `left` to the latest `right` row
    * with `rightTs <= leftTs` per `keys`. Output = all left columns,
    * then right's non-key non-ts attributes (nullable). Requires
    * disjoint non-key attribute names (rename first, as with
    * `Relational.asOfJoin`).
    */
  def asOfJoinNative(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String): DataFrame = {
    def attr(df: DataFrame, name: String): Attribute =
      df.queryExecution.analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asOfJoinNative: no column '$name' in [${df.columns.mkString(",")}]"))
    // SQL join semantics: a NULL key or NULL version timestamp never
    // matches anything. Dropping those right rows up front also keeps
    // the merge's NULLS-FIRST orderings from electing a NULL-ts row as
    // a carry for every left row.
    val rightClean = keys.foldLeft(
      right.where(org.apache.spark.sql.functions.col(rightTs).isNotNull)) {
      (df, k) => df.where(org.apache.spark.sql.functions.col(k).isNotNull)
    }
    val lPlan = left.queryExecution.analyzed
    val rPlan = rightClean.queryExecution.analyzed
    val rightAttrs = rPlan.output.filterNot(a => keys.contains(a.name) || a.name == rightTs)
    val collide = left.columns.toSet.intersect(rightAttrs.map(_.name).toSet)
    require(collide.isEmpty,
      s"asOfJoinNative: colliding attribute names ${collide.mkString(",")} — rename one side first")
    val (lKeys, rKeys) = (keys.map(attr(left, _)), keys.map(attr(rightClean, _)))
    val (lTsA, rTsA) = (attr(left, leftTs), attr(rightClean, rightTs))
    // Mismatched types would hash-partition each side differently
    // (equal keys land in different partitions → silent all-NULL
    // output) and make the ts ordering compare unlike units.
    lKeys.zip(rKeys).foreach { case (l, r) =>
      require(l.dataType == r.dataType,
        s"asOfJoinNative: key type mismatch ${l.name}: ${l.dataType} vs ${r.name}: ${r.dataType}")
    }
    require(lTsA.dataType == rTsA.dataType,
      s"asOfJoinNative: ts type mismatch $leftTs: ${lTsA.dataType} vs $rightTs: ${rTsA.dataType}")
    val node = AsOfJoinNode(lPlan, rPlan, lKeys, rKeys, lTsA, rTsA, rightAttrs)
    classic.Dataset.ofRows(
      left.sparkSession.asInstanceOf[classic.SparkSession], node)
  }
}
