package graft.plans

import graft.sources.Warehouse
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Centralized ETL logging — the reference's bl_cl.etl_log + logging
  * procedure (reference: sql/utils/create_log_table_and_procedure.sql:7-44):
  * one append-only row per loader event (message, affected rows, error).
  *
  * Events are buffered in memory and flushed as ONE appended parquet
  * batch per pipeline run — a per-event write would cost a Spark job
  * each (measured ~0.3 s × 15 loaders of pure overhead). The buffer is
  * control-plane-tiny; [[flush]] is called at pipeline end and on the
  * error path, so failure events still land.
  */
class EtlLog(wh: Warehouse, spark: SparkSession) {

  private val buf = scala.collection.mutable.ArrayBuffer
    .empty[(String, String, Long, Option[String], java.sql.Timestamp)]

  def append(procedure: String, message: String, rows: Long, error: String = null): Unit =
    buf.synchronized {
      buf += ((procedure, message, rows, Option(error),
        new java.sql.Timestamp(System.currentTimeMillis())))
    }

  /** Write all buffered events as one appended batch. */
  def flush(): Unit = buf.synchronized {
    if (buf.nonEmpty) {
      import spark.implicits._
      buf.toSeq.toDF("procedure", "message", "rows_affected", "error", "log_ts")
        .coalesce(1)
        .write.mode("append").parquet(wh.path("bl_cl", "etl_log"))
      buf.clear()
    }
  }

  /** O3: run a stage with success/error logging (+ duration) + re-raise
    * (the reference's per-procedure log calls + CLOCK_TIMESTAMP timing,
    * reference: run_full_etl_process.sql:112-129).
    */
  def logged[A](procedure: String)(body: => Long): Long = {
    val t0 = System.nanoTime()
    try {
      val rows = body
      append(procedure, f"completed in ${(System.nanoTime() - t0) / 1e9}%.2f s", rows)
      rows
    } catch {
      case e: Throwable =>
        append(procedure, "failed", -1, e.toString.take(500))
        flush()
        throw e
    }
  }
}
