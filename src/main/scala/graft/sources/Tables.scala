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
  /** events.ts is parquet TIMESTAMP(NANOS): Spark reads it as a nanosecond
    * long (spark.sql.legacy.parquet.nanosAsLong=true); convert to a
    * microsecond TimestampType — the same truncation DuckDB applies.
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    val raw = table(spark, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(spark: SparkSession, d: String): DataFrame = table(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = table(spark, d, "embeddings")
}
