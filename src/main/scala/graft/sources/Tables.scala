package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided parquet tables (TESTDATA.md).
  *
  * Mirrors the reference's `data_source` landing layer
  * (reference: python/import_data.py:92 lands CSVs as tables); here the
  * landing format is parquet. Filters/projections applied downstream are
  * pushed into these scans by Catalyst (PushedFilters / ReadSchema), so
  * always start from these readers rather than caching whole tables.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame = table(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = table(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = table(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = table(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = table(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = table(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = table(spark, d, "lineitem")
  /** Normalize a parquet event-time column to TIMESTAMP (with zone) no
    * matter how the writer encoded it: TIMESTAMP(NANOS) arrives as a
    * nanosecond long under `nanosAsLong` (truncate to micros — the same
    * truncation DuckDB applies); TIMESTAMP(MICROS) without UTC
    * adjustment infers as TIMESTAMP_NTZ (cast — value-preserving under
    * the UTC session zone this engine pins, and required because
    * unix_micros/watermarks/windows reject NTZ); an already-zoned
    * column passes through.
    */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName, expr(s"timestamp_micros($colName div 1000)"))
      case TimestampNTZType =>
        df.withColumn(colName, col(colName).cast(TimestampType))
      case _ => df
    }
  }

  def events(spark: SparkSession, d: String): DataFrame =
    normalizeTs(table(spark, d, "events"))
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
