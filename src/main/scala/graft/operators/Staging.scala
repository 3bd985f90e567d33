package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Staging-layer operators.
  *
  * The reference's staging layer casts every column to VARCHAR(255),
  * deduplicates, and appends only rows absent from the target
  * (reference: sql/staging/load_staging_sales_table.sql:23-33 cast-project,
  * :23 DISTINCT, :116-121 NOT EXISTS insert-dedup). All three are pure
  * narrow/shuffle-light DataFrame ops here:
  *
  *  - castAllToString / clean: narrow projection, stays inside one
  *    WholeStageCodegen span, columns pruned at the scan.
  *  - antiJoinAppend: `left_anti` join on the business key. At scale the
  *    target side is usually the bigger one; Spark + AQE picks
  *    broadcast/SMJ per stats. For the steady-state incremental case
  *    (small new batch vs huge target) combine with a watermark filter
  *    first (Relational.newerThanWatermark) so the anti-join input is
  *    already pruned to recent partitions.
  */
object Staging {

  /** P1: project the given columns, casting each to string. */
  def castAllToString(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(c => col(c).cast(StringType).as(c)): _*)

  /** P1+P2: the reference's fn_clean_* shape — cast-project + DISTINCT. */
  def clean(df: DataFrame, cols: Seq[String]): DataFrame =
    castAllToString(df, cols).distinct()

  /** J8: rows of `src` whose business key is absent from `target`.
    * The "insert only new rows" half of every reference loader.
    */
  def newRowsOnly(src: DataFrame, target: DataFrame, keys: Seq[String]): DataFrame =
    src.join(target.select(keys.map(col): _*), keys, "left_anti")

  /** J8 applied: idempotent append — union target with the new rows.
    * Re-running with the same src yields the identical result.
    */
  def antiJoinAppend(src: DataFrame, target: DataFrame, keys: Seq[String]): DataFrame =
    target.unionByName(
      newRowsOnly(src, target, keys).select(target.columns.toIndexedSeq.map(col): _*))

  /** [[antiJoinAppend]] with additive schema evolution — shared by the
    * staging loaders and the 3NF insert-only path. Same columns →
    * plain append. Target columns a subset of src's → the target's
    * history is padded with typed NULLs and kept (the reference's
    * CREATE TABLE IF NOT EXISTS + INSERT tolerance; antiJoinAppend
    * alone would silently project the new column away). Any
    * non-additive mismatch (removed/renamed column) → rebuild from
    * src: appending would silently drop data instead.
    */
  def evolveAppend(src: DataFrame, target: DataFrame, keys: Seq[String]): DataFrame =
    if (target.columns.sameElements(src.columns)) antiJoinAppend(src, target, keys)
    else if (target.columns.toSet.subsetOf(src.columns.toSet)) {
      val padded = src.columns.foldLeft(target) { (df, c) =>
        if (df.columns.contains(c)) df
        else df.withColumn(c, lit(null).cast(src.schema(c).dataType))
      }.select(src.columns.toIndexedSeq.map(col): _*)
      antiJoinAppend(src, padded, keys)
    } else src

  /** First-row-wins within a batch (SURVEY §3.4.1): deterministic
    * tie-break instead of the reference's arbitrary loop order.
    */
  def dedupFirstWins(df: DataFrame, keys: Seq[String], tieBreak: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tieBreak: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
