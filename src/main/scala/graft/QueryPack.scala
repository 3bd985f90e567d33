package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One module's contribution to SparkEntry: named queries plus the
  * DuckDB oracle SQL the driver hash-compares against (omitted entries
  * get a weaker rows-only check).
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracleSql: Map[String, String]
}
