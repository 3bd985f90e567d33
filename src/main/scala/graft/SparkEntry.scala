package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._
import graft.plans.EtlQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    AnalyticsQueries,
    WarehouseQueries,
    ScdQueries,
    HierarchyQueries,
    DatesQueries,
    TextQueries,
    RetrievalQueries,
    DedupQueries,
    SimilarityQueries,
    EventsQueries,
    MultimodalQueries,
    CurationQueries,
    EtlQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    AnalyticsQueries.queries("q03_top_nations")(spark, "/root/testdata/sf0.001")

  /** toMap would silently last-win on a name defined by two packs —
    * the earlier query would never run and could end up hash-gated
    * against the other pack's SQL. Loud at first access instead.
    */
  private def mergedUnique[V](pairs: Seq[(String, V)], what: String): Map[String, V] = {
    val dup = pairs.groupBy(_._1).collect { case (k, vs) if vs.size > 1 => k }
    require(dup.isEmpty,
      s"duplicate $what defined by more than one query pack: ${dup.mkString(", ")}")
    pairs.toMap
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    mergedUnique(packs.flatMap(_.queries.toSeq), "query names")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    mergedUnique(packs.flatMap(_.oracleSql.toSeq), "oracle entries")
}
