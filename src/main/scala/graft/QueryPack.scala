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

object QueryPack {
  /** DuckDB twin of
    * [[graft.functions.TextFunctions.md5Bucket10]]: the ten-way split
    * from the first two md5 nibbles of `salt ‖ key`. `keySql` must
    * already be VARCHAR (CAST at the call site, matching the Scala
    * side's .cast("string")). One generator instead of a hand-typed
    * nib() per oracle — a missed site silently diverges a query from
    * its gate.
    */
  def md5Bucket10Sql(keySql: String, salt: String = ""): String = {
    def nib(i: Int) =
      s"strpos('123456789abcdef', substr(md5('$salt' || ($keySql)), $i, 1))"
    s"((${nib(1)} * 16 + ${nib(2)}) % 10)"
  }

  /** DuckDB twin of
    * [[graft.functions.TextFunctions.md5Ring48]]: 48-bit ring position
    * from the first 12 md5 nibbles of `salt ‖ key`. Same
    * change-together contract as md5Bucket10Sql.
    */
  def md5Ring48Sql(keySql: String, salt: String = ""): String = {
    def nib(i: Int) =
      s"strpos('123456789abcdef', substr(md5('$salt' || ($keySql)), $i, 1))"
    (1 to 12).map(i => s"${nib(i)} * ${1L << (4 * (12 - i))}")
      .mkString("(", " + ", ")")
  }
}
