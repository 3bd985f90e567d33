package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-depth hierarchies (SURVEY §1.4, §2.3-J3/J4):
  * 4-level geo — continents → countries → states → cities — and the
  * 2-level product tree — categories → subcategories — with the same
  * loader shapes as the reference:
  *
  *  - states source from customers ∪ suppliers (the stores analog) with
  *    a country lookup (reference: sql/3nf/load_3nf_ce_states_table
  *    .sql:31-49);
  *  - cities source from customers and resolve their parent state by
  *    CASE-INSENSITIVE NAME (J1), not by id (reference:
  *    sql/3nf/load_3nf_ce_cities_table.sql:31-32);
  *  - customers link to a city by name and split the full name into
  *    tracked first/last parts (reference:
  *    sql/3nf/load_3nf_ce_customers_scd_table_type1.sql:24-25,57-58);
  *  - the DM layer flattens the whole chain with one 4-join snowflake
  *    denormalization (reference:
  *    sql/dimensional/load_dim_customers_dimension_scd_type1.sql:88-95);
  *  - categories/subcategories derive from the product type string and
  *    get row_number surrogate ids (reference:
  *    sql/3nf/load_3nf_ce_categories_table.sql,
  *    load_3nf_ce_subcategories_table.sql).
  *
  * The testdata has no state/city/category columns, so the extra levels
  * are SYNTHESIZED deterministically from stable business-key
  * arithmetic: state num = key % 5, city num = key % 20 (5 | 20 keeps
  * city → state functional), category = first word of p_type,
  * subcategory = category + brand. Both engines (Spark and the DuckDB
  * oracle) can derive the identical levels, so every loader is still
  * hash-verifiable end-to-end.
  *
  * Scale notes: every level is fixed-cardinality by construction
  * (≤ 25·20 cities, ≤ 30 subcategories) — broadcast hints on them are
  * safe at any scale factor, unlike customer/product dims. The name
  * lookups are broadcast equi-joins on upper(name); the only wide
  * operation in any loader is the initial distinct() over the
  * (country, num) projection, a partial-aggregated shuffle of a
  * two-column relation.
  */
object Hierarchy {

  val StatesPerCountry = 5
  val CitiesPerCountry = 20

  /** Shared source projections — ONE derivation for the orchestrator
    * and the oracle-verified queries, so the warehouse and the checked
    * query surface cannot diverge. Inputs may be raw typed tables or
    * the string-typed staging layer (casts cover both).
    */
  def countriesFrom(nation: DataFrame): DataFrame = nation.select(
    col("n_nationkey").cast(LongType).as("country_id"),
    initcap(lower(col("n_name"))).as("country_name"),
    col("n_regionkey").cast(LongType).as("country_continent_id"))

  def continentsFrom(region: DataFrame): DataFrame = region.select(
    col("r_regionkey").cast(LongType).as("continent_id"),
    initcap(lower(col("r_name"))).as("continent_name"))

  def custGeoFrom(customer: DataFrame): DataFrame = customer.select(
    col("c_nationkey").cast(LongType).as("country_id"),
    col("c_custkey").cast(LongType).as("src_key"))

  def supGeoFrom(supplier: DataFrame): DataFrame = supplier.select(
    col("s_nationkey").cast(LongType).as("country_id"),
    col("s_suppkey").cast(LongType).as("src_key"))

  def stateNum(key: Column): Column = key % StatesPerCountry
  def cityNum(key: Column): Column = key % CitiesPerCountry

  def stateNameOf(countryName: Column, num: Column): Column =
    concat(countryName, lit(" State "), num.cast(StringType))
  def cityNameOf(countryName: Column, num: Column): Column =
    concat(countryName, lit(" City "), num.cast(StringType))

  /** First word of the product type = category (reference CategoryKey). */
  def categoryOf(pType: Column): Column = split(pType, " ").getItem(0)

  /** Subcategory = category + brand — the testdata's p_type is a single
    * word, so the second tree level nests (type, brand) under type
    * (150 subcategories under 6 categories, functional parent).
    */
  def subcategoryOf(pType: Column, brand: Column): Column =
    concat_ws(" ", categoryOf(pType), brand)

  /** CE_STATES: one state per (country, key%5) observed in customers ∪
    * suppliers; ids are deterministic (country_id·5 + num), so re-runs
    * and multi-source unions can never collide.
    * Output: state_id, state_name, state_country_id.
    */
  def states(custGeo: DataFrame, supGeo: DataFrame, countries: DataFrame): DataFrame = {
    val nums = custGeo.select(col("country_id"), stateNum(col("src_key")).as("state_num"))
      .unionByName(supGeo.select(col("country_id"), stateNum(col("src_key")).as("state_num")))
      .distinct()
    nums.join(broadcast(countries.select(col("country_id"), col("country_name"))),
        Seq("country_id"))
      .select(
        (col("country_id") * StatesPerCountry + col("state_num")).cast(LongType).as("state_id"),
        stateNameOf(col("country_name"), col("state_num")).as("state_name"),
        col("country_id").as("state_country_id"))
  }

  /** CE_CITIES: cities from customers only; the parent state is resolved
    * by case-insensitive NAME lookup (J1/J4 — the reference's cities
    * know their state only by name). Unresolved parents fall back to −1.
    * Output: city_id, city_name, city_state_id.
    */
  def cities(custGeo: DataFrame, countries: DataFrame, states: DataFrame): DataFrame = {
    val named = custGeo
      .join(broadcast(countries.select(col("country_id"), col("country_name"))),
        Seq("country_id"))
      .select(col("country_id"),
        cityNum(col("src_key")).as("city_num"),
        cityNameOf(col("country_name"), cityNum(col("src_key"))).as("city_name"),
        stateNameOf(col("country_name"), stateNum(col("src_key"))).as("state_ref"))
      .distinct()
    named
      .join(broadcast(states.select(col("state_id"), col("state_name"))),
        upper(col("state_ref")) === upper(col("state_name")), "left")
      .select(
        (col("country_id") * CitiesPerCountry + col("city_num")).cast(LongType).as("city_id"),
        col("city_name"),
        coalesce(col("state_id"), lit(-1L)).as("city_state_id"))
  }

  /** 3NF customer source rows: full name split into tracked first/last
    * (PG split_part semantics, '' past the end) and the city link
    * resolved case-insensitively by name.
    * Output: customer_id, first_name, last_name, segment, customer_city_id.
    */
  def customersSource(cust: DataFrame, countries: DataFrame, cities: DataFrame): DataFrame = {
    val base = cust.select(
      col("c_custkey").cast(LongType).as("customer_id"),
      coalesce(split(col("c_name"), "#").getItem(0), lit("")).as("first_name"),
      coalesce(split(col("c_name"), "#").getItem(1), lit("")).as("last_name"),
      col("c_mktsegment").as("segment"),
      col("c_nationkey").cast(LongType).as("country_id"))
    base
      .join(broadcast(countries.select(col("country_id"), col("country_name"))),
        Seq("country_id"), "left")
      .withColumn("city_ref",
        cityNameOf(col("country_name"), cityNum(col("customer_id"))))
      .join(broadcast(cities.select(col("city_id"), col("city_name"))),
        upper(col("city_ref")) === upper(col("city_name")), "left")
      .select(col("customer_id"), col("first_name"), col("last_name"), col("segment"),
        coalesce(col("city_id"), lit(-1L)).as("customer_city_id"))
  }

  /** 3NF supplier source rows (the reference's stores: state-level geo
    * link + a numeric attribute + a DATE attribute parsed inside the
    * loader — reference: sql/3nf/load_3nf_ce_stores_table.sql:17-33,
    * where open_date arrives as a raw MM/DD/YYYY VARCHAR and is parsed
    * by TO_DATE in the insert path (F7 composed into the dim loader,
    * :23). The testdata suppliers carry no date column, so the raw
    * string is synthesized deterministically from the key, then parsed
    * exactly as the reference parses its raw extract.
    * Output: supplier_id, supplier_name, acctbal, open_date,
    * supplier_state_id.
    */
  def suppliersSource(sup: DataFrame, countries: DataFrame, states: DataFrame): DataFrame = {
    val key = col("s_suppkey").cast(LongType)
    val base = sup.select(
      key.as("supplier_id"),
      col("s_name").as("supplier_name"),
      col("s_acctbal").cast(DecimalType(12, 2)).as("acctbal"),
      concat_ws("/", key % 12 + 1, key % 28 + 1, key % 7 + 1992).as("open_date_raw"),
      col("s_nationkey").cast(LongType).as("country_id"))
    base
      .join(broadcast(countries.select(col("country_id"), col("country_name"))),
        Seq("country_id"), "left")
      .withColumn("state_ref",
        stateNameOf(col("country_name"), stateNum(col("supplier_id"))))
      .join(broadcast(states.select(col("state_id"), col("state_name"))),
        upper(col("state_ref")) === upper(col("state_name")), "left")
      .select(col("supplier_id"), col("supplier_name"), col("acctbal"),
        to_date(col("open_date_raw"), "M/d/yyyy").as("open_date"),
        coalesce(col("state_id"), lit(-1L)).as("supplier_state_id"))
  }

  /** J3 at reference depth: the 4-join snowflake flatten
    * customer → city → state → country → continent, default-row
    * excluded, NULLs backfilled with 'n.a.' (reference:
    * load_dim_customers_dimension_scd_type1.sql:71-95).
    */
  def flattenCustomers(customers: DataFrame, cities: DataFrame, states: DataFrame,
                       countries: DataFrame, continents: DataFrame): DataFrame =
    customers.filter(col("customer_id") =!= -1)
      .join(broadcast(cities), col("customer_city_id") === col("city_id"), "left")
      .join(broadcast(states), col("city_state_id") === col("state_id"), "left")
      .join(broadcast(countries), col("state_country_id") === col("country_id"), "left")
      .join(broadcast(continents), col("country_continent_id") === col("continent_id"), "left")
      .select(col("customer_id"), col("first_name"), col("last_name"), col("segment"),
        coalesce(col("city_name"), lit("n.a.")).as("city_name"),
        coalesce(col("state_name"), lit("n.a.")).as("state_name"),
        coalesce(col("country_name"), lit("n.a.")).as("country_name"),
        coalesce(col("continent_name"), lit("n.a.")).as("continent_name"))

  /** Store-analog flatten: supplier → state → country → continent
    * (reference: sql/dimensional/load_dim_stores_dimension.sql:79-84).
    */
  def flattenSuppliers(suppliers: DataFrame, states: DataFrame,
                       countries: DataFrame, continents: DataFrame): DataFrame =
    suppliers.filter(col("supplier_id") =!= -1)
      .join(broadcast(states), col("supplier_state_id") === col("state_id"), "left")
      .join(broadcast(countries), col("state_country_id") === col("country_id"), "left")
      .join(broadcast(continents), col("country_continent_id") === col("continent_id"), "left")
      .select(col("supplier_id"), col("supplier_name"), col("acctbal"),
        col("open_date"),
        coalesce(col("state_name"), lit("n.a.")).as("supplier_state"),
        coalesce(col("country_name"), lit("n.a.")).as("supplier_country"),
        coalesce(col("continent_name"), lit("n.a.")).as("supplier_continent"))

  /** CE_CATEGORIES: distinct first word of p_type with row_number
    * surrogate ids (F19 in anger — the reference's NEXTVAL).
    * Output: category_name, category_id.
    */
  def categories(products: DataFrame, pTypeCol: String = "p_type"): DataFrame =
    Relational.surrogateKeys(
      products.select(categoryOf(col(pTypeCol)).as("category_name")).distinct(),
      "category_name", 0L, "category_id")

  /** CE_SUBCATEGORIES: distinct two-word prefix with its parent category
    * resolved by case-insensitive name (J1).
    * Output: subcategory_name, subcategory_id, subcategory_category_id.
    */
  def subcategories(products: DataFrame, cats: DataFrame,
                    pTypeCol: String = "p_type", brandCol: String = "p_brand"): DataFrame = {
    val subs = products.select(
      subcategoryOf(col(pTypeCol), col(brandCol)).as("subcategory_name"),
      categoryOf(col(pTypeCol)).as("category_ref")).distinct()
    Relational.surrogateKeys(subs, "subcategory_name", 0L, "subcategory_id")
      .join(broadcast(cats),
        upper(col("category_ref")) === upper(col("category_name")), "left")
      .select(col("subcategory_name"), col("subcategory_id"),
        coalesce(col("category_id"), lit(-1L)).as("subcategory_category_id"))
  }
}
