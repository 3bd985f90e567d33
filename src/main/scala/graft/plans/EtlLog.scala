package graft.plans

import graft.sources.Warehouse
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Centralized ETL logging — the reference's bl_cl.etl_log + logging
  * procedure (reference: sql/utils/create_log_table_and_procedure.sql:7-44):
  * one append-only row per loader event (message, affected rows, error).
  * Append-mode parquet: each event is a small file; compact if it ever
  * matters (it's control-plane data, not data-plane).
  */
class EtlLog(wh: Warehouse, spark: SparkSession) {

  def append(procedure: String, message: String, rows: Long, error: String = null): Unit = {
    import spark.implicits._
    Seq((procedure, message, rows, Option(error)))
      .toDF("procedure", "message", "rows_affected", "error")
      .withColumn("log_ts", current_timestamp())
      .write.mode("append").parquet(wh.path("bl_cl", "etl_log"))
  }

  /** O3: run a stage with start/success/error logging + re-raise. */
  def logged[A](procedure: String)(body: => Long): Long =
    try {
      val rows = body
      append(procedure, "completed", rows)
      rows
    } catch {
      case e: Throwable =>
        append(procedure, "failed", -1, e.toString.take(500))
        throw e
    }
}
