package graft.operators

import graft.SparkSpec
import graft.plans.Orchestrator
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** E2E port of the reference's three-tier test suite
  * (reference: python/dw_etl_tests.py — layer reconciliation, idempotent
  * re-run, referential integrity, SCD2 versioning) over sf0.001.
  */
class OrchestratorSpec extends SparkSpec {
  import spark.implicits._

  private val whRoot =
    java.nio.file.Files.createTempDirectory("graft-wh").toString
  private lazy val orch = new Orchestrator(spark, sf, whRoot)
  private lazy val firstRun = orch.runFullEtl()

  test("full ETL reconciles layer row counts with the source") {
    val nLineitem = Tables.lineitem(spark, sf).count()
    val nCustomer = Tables.customer(spark, sf).count()
    val nPart = Tables.part(spark, sf).count()
    assert(firstRun("ce_sales") == nLineitem)
    assert(firstRun("fct_sales") == nLineitem)
    assert(firstRun("ce_customers") == nCustomer)
    // initial SCD2 load: one active version per distinct product
    assert(firstRun("ce_products_scd") == nPart)
    val prod = orch.wh.read("bl_3nf", "ce_products_scd")
    assert(prod.filter($"is_active" === "N").count() == 0)
  }

  test("referential integrity: no unresolved (-1) product keys in the fact") {
    firstRun
    val fct = orch.wh.read("bl_dm", "fct_sales")
    assert(fct.filter($"product_id" === -1L).count() == 0)
    assert(fct.filter($"customer_id" === -1L).count() == 0)
    assert(fct.filter($"sale_total".isNull).count() == 0)
  }

  test("dim_dates covers [min−1mo, max+1mo] of the fact, 17 attributes") {
    firstRun
    val dates = orch.wh.read("bl_dm", "dim_dates")
    val fact = orch.wh.read("bl_3nf", "ce_sales")
    val Array(lo, hi) = fact
      .agg(add_months(min($"order_dt"), -1), add_months(max($"order_dt"), 1))
      .as[(java.sql.Date, java.sql.Date)].collect().flatMap(t => Array(t._1, t._2))
    val Array(dlo, dhi) = dates.agg(min($"date_id"), max($"date_id"))
      .as[(java.sql.Date, java.sql.Date)].collect().flatMap(t => Array(t._1, t._2))
    assert(dlo == lo && dhi == hi)
    // continuous: count == span in days
    assert(dates.count() == dates.select(datediff(max($"date_id"), min($"date_id"))).as[Int].head() + 1)
    assert(dates.columns.length == 18) // date_id + 17 attributes
  }

  test("second run is idempotent: fact unchanged, no new SCD2 versions") {
    firstRun
    // materialize BEFORE the re-run: the overwrite swaps the directory a
    // lazy DataFrame would still point at
    val before = orch.wh.read("bl_dm", "fct_sales").drop("order_month")
      .collect().map(_.toString).sorted
    val secondRun = orch.runFullEtl()
    assert(secondRun("ce_sales") == firstRun("ce_sales"))
    assert(secondRun("ce_products_scd") == firstRun("ce_products_scd"))
    val after = orch.wh.read("bl_dm", "fct_sales").drop("order_month")
      .collect().map(_.toString).sorted
    assert(after.sameElements(before))
  }

  test("a price change triggers exactly one new SCD2 version") {
    firstRun
    val pid = orch.wh.read("bl_3nf", "ce_products_scd")
      .select($"product_id").orderBy($"product_id").as[Long].head()
    // simulate a re-extract with one changed price in staging
    val staged = orch.wh.read("staging", "products")
    val bumped = staged.withColumn("p_retailprice",
      when($"p_partkey".cast("long") === pid,
        ($"p_retailprice".cast(DecimalType(9, 2)) + lit(1)).cast("string"))
        .otherwise($"p_retailprice"))
    orch.wh.overwrite(bumped, "staging", "products")
    orch.stage3nf()
    val versions = orch.wh.read("bl_3nf", "ce_products_scd")
      .filter($"product_id" === pid).collect()
    assert(versions.length == 2)
    assert(versions.count(_.getAs[String]("is_active") == "Y") == 1)
    assert(versions.count(_.getAs[String]("is_active") == "N") == 1)
  }

  test("etl log captures one completed row per loader") {
    firstRun
    val log = orch.wh.read("bl_cl", "etl_log")
    val procs = log.filter($"message".startsWith("completed"))
      .select($"procedure").distinct().as[String].collect().toSet
    assert(procs.contains("load_staging_sales"))
    assert(procs.contains("load_3nf_ce_sales"))
    assert(procs.contains("load_fct_sales"))
  }
}
