package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension merges on immutable storage (SURVEY §2.9).
  *
  * The reference implements these as row-at-a-time PL/pgSQL upserts
  * (reference: sql/3nf/load_3nf_ce_customers_scd_table_type1.sql:98-144,
  * sql/3nf/load_3nf_ce_products_scd_table_type2.sql:111-222). Here each
  * is ONE set-based plan: a single full-outer shuffle join on the
  * business key, then narrow projections — no driver loops, no
  * per-row statements. At 100 TB the join is the only shuffle; bucket
  * both target and source on the business key to make it co-located,
  * and AQE handles skewed keys.
  */
object Scd {

  /** SCD Type 1 upsert: new keys are inserted; existing keys get their
    * `tracked` columns overwritten only when a tracked value actually
    * changed (null-safe, the reference's IS DISTINCT FROM); untracked
    * columns are never updated
    * (reference: load_3nf_ce_customers_scd_table_type1.sql:128-138).
    *
    * `target` carries `insert_dt`/`update_dt` audit columns; attribute
    * columns are `source`'s columns minus the key.
    * Adds a `scd_status` column ('new'/'updated'/'unchanged').
    */
  def scd1Merge(target: DataFrame, source: DataFrame, key: Seq[String],
                tracked: Seq[String], runDt: Column): DataFrame = {
    val attrs = source.columns.filterNot(key.contains).toSeq
    val untracked = attrs.filterNot(tracked.contains)
    val t = target.alias("t")
    val s = source.alias("s")
    val cond = key.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val j = t.join(s, cond, "full_outer")
    val isNew = key.map(k => col(s"t.$k").isNull).reduce(_ && _)
    val inSrc = key.map(k => col(s"s.$k").isNotNull).reduce(_ && _)
    val changed = inSrc && !isNew &&
      tracked.map(c => !(col(s"s.$c") <=> col(s"t.$c"))).reduce(_ || _)
    j.select(
      key.map(k => coalesce(col(s"t.$k"), col(s"s.$k")).as(k)) ++
      tracked.map(c => when(isNew || changed, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)) ++
      untracked.map(c => when(isNew, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)) :+
      when(isNew, runDt).otherwise(col("t.insert_dt")).as("insert_dt") :+
      when(isNew || changed, runDt).otherwise(col("t.update_dt")).as("update_dt") :+
      when(isNew, lit("new")).when(changed, lit("updated"))
        .otherwise(lit("unchanged")).as("scd_status"): _*)
  }

  /** SCD Type 2 versioning: a change in any `changeCols` value closes the
    * active version (`end_ts = runTs − 1s`, `is_active = 'N'`) and opens a
    * new one (`start_ts = runTs`, far-future end, 'Y'); brand-new keys get
    * a first version; inactive history and unchanged actives pass through
    * (reference: load_3nf_ce_products_scd_table_type2.sql:111-222).
    *
    * Single pass: the active slice full-outer-joins the source once, and
    * the 0/1/2 output rows per key are produced with an
    * explode(array(structs)) — not three re-computations of the join.
    *
    * `target` schema: key ++ attrs ++ (start_ts, end_ts, is_active).
    * `source` schema: key ++ attrs.
    */
  def scd2Merge(target: DataFrame, source: DataFrame, key: Seq[String],
                changeCols: Seq[String], runTs: Column,
                farFuture: Column = lit("9999-12-31 00:00:00").cast("timestamp")): DataFrame = {
    val attrs = source.columns.filterNot(key.contains).toSeq
    val outCols = key ++ attrs ++ Seq("start_ts", "end_ts", "is_active")
    val inactive = target.filter(col("is_active") === "N").select(outCols.map(col): _*)
    val active = target.filter(col("is_active") === "Y")

    val a = active.alias("a")
    val s = source.alias("s")
    val cond = key.map(k => col(s"a.$k") <=> col(s"s.$k")).reduce(_ && _)
    val j = a.join(s, cond, "full_outer")
    val isNew = key.map(k => col(s"a.$k").isNull).reduce(_ && _)
    val inSrc = key.map(k => col(s"s.$k").isNotNull).reduce(_ && _)
    val changed = inSrc && !isNew &&
      changeCols.map(c => !(col(s"s.$c") <=> col(s"a.$c"))).reduce(_ || _)

    def asRow(keySide: String, attrSide: String, start: Column, end: Column, act: Column) =
      struct(
        key.map(k => col(s"$keySide.$k").as(k)) ++
        attrs.map(c => col(s"$attrSide.$c").as(c)) :+
        start.as("start_ts") :+ end.as("end_ts") :+ act.as("is_active"): _*)

    val keptOld = asRow("a", "a", col("a.start_ts"), col("a.end_ts"), col("a.is_active"))
    val closedOld = asRow("a", "a", col("a.start_ts"),
      runTs - expr("INTERVAL 1 SECOND"), lit("N"))
    val newVersion = asRow("s", "s", runTs, farFuture, lit("Y"))

    val rows = when(isNew, array(newVersion))
      .when(changed, array(closedOld, newVersion))
      .otherwise(array(keptOld))
    val merged = j.select(explode(rows).as("r")).select(col("r.*"))
    inactive.unionByName(merged)
  }

  /** CDC apply — the third merge verb: an insert/update/DELETE change
    * feed folded into a snapshot with last-writer-wins per key. Both
    * inputs carry a monotonic `seqCol` (CDC offset; give base rows the
    * lowest) and an `opCol` ('U' upsert / 'D' delete); (key, seq) must
    * be unique — ties break on op for determinism, but a feed with
    * duplicate offsets per key is a broken CDC source. The winning
    * version is picked by ONE key-partitioned window over base ∪ feed
    * (no full-outer juggling, no driver state); deletes win by
    * vanishing. At 100 TB: a single shuffle on the key — bucket base
    * and feed on it to make the pick co-located.
    */
  def cdcMerge(base: DataFrame, feed: DataFrame, keys: Seq[String],
               seqCol: String = "seq", opCol: String = "op"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(seqCol).desc, col(opCol).desc)
    base.unionByName(feed)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col(opCol) =!= "D")
      .drop("__rn", opCol)
  }
}
