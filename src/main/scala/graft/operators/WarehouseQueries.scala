package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Warehouse-layer operator surface: staging cleaners, insert-dedup
  * anti-joins, union-distinct, default-row backfill, surrogate keys,
  * case-insensitive hierarchy joins, name splitting — SURVEY §2.1-§2.3,
  * §2.6-§2.7, each mapped onto the testdata tables.
  */
object WarehouseQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // P1+P2: cast-everything-to-varchar staging cleaner + DISTINCT
    // (reference: sql/staging/load_staging_customers_table.sql:24-35).
    // Doubles are deliberately excluded from the cast list: double→string
    // formatting is engine-specific, and staging only needs the keys.
    "q10_staging_clean" -> ((s, d) => {
      Staging.clean(Tables.customer(s, d),
        Seq("c_custkey", "c_name", "c_nationkey", "c_mktsegment"))
    }),

    // J8: anti-join insert-dedup — rows whose key is absent from the
    // "target" (orders already finalized), summarized per linestatus
    // (reference: sql/staging/load_staging_sales_table.sql:116-121).
    "q11_antijoin_new_rows" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val tgt = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"))
      Staging.newRowsOnly(li, tgt.withColumnRenamed("o_orderkey", "l_orderkey"),
        Seq("l_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_qty"))
    }),

    // U1: UNION with PostgreSQL dedup semantics
    // (reference: sql/3nf/load_3nf_ce_countries_table.sql:34).
    "q12_union_distinct" -> ((s, d) => {
      val a = Tables.customer(s, d).select(col("c_nationkey").cast(IntegerType).as("nationkey"))
      val b = Tables.supplier(s, d).select(col("s_nationkey").cast(IntegerType).as("nationkey"))
      Relational.unionDistinct(a, b)
    }),

    // F5: SPLIT_PART name split with the PG ''-past-the-end convention
    // (reference: sql/3nf/load_3nf_ce_customers_scd_table_type1.sql:24-25,
    //  SURVEY §7.5.7).
    "q13_split_name" -> ((s, d) => {
      Tables.customer(s, d).select(
        col("c_custkey"),
        coalesce(split(col("c_name"), "#").getItem(0), lit("")).as("name_prefix"),
        coalesce(split(col("c_name"), "#").getItem(1), lit("")).as("name_num"))
    }),

    // J2/F2: default-row (−1 / 'n.a.') backfill after a left join against
    // a deliberately incomplete dimension
    // (reference: sql/3nf/load_3nf_ce_continents_table.sql:24-25,48-69).
    "q14_default_row" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d).filter(col("n_nationkey") < 20)
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
        .select(
          col("c_custkey"),
          Relational.withDefault(col("n_nationkey").cast(IntegerType), -1).as("nation_id"),
          Relational.withDefault(col("n_name"), "n.a.").as("nation_name"))
    }),

    // F19: sequence replacement — dense surrogate ids past an existing max
    // (reference: NEXTVAL at sql/3nf/load_3nf_ce_continents_table.sql:89).
    "q15_surrogate_keys" -> ((s, d) => {
      Relational.surrogateKeys(
        Tables.nation(s, d).select("n_nationkey", "n_name"),
        "n_name", 100L, "surr_id")
    }),

    // J1+F3/F4: case-insensitive hierarchy join with INITCAP-normalized
    // output (reference: sql/3nf/load_3nf_ce_countries_table.sql:22,31-32).
    "q16_ci_hierarchy_join" -> ((s, d) => {
      val n = Tables.nation(s, d)
        .select(lower(col("n_name")).as("nation_lc"), col("n_regionkey"))
      val r = Tables.region(s, d)
      val joined = n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "left")
      joined.select(
        initcap(col("nation_lc")).as("nation_name"),
        initcap(lower(col("r_name"))).as("region_name"))
    }),

    // F6: money-string cleaning "$1,234.50" → decimal. The money string is
    // synthesized deterministically from integer parts so both engines see
    // identical input text (reference money parse:
    // sql/3nf/load_3nf_ce_products_scd_table_type2.sql:28-35).
    "q17_money_parse" -> ((s, d) => {
      val p = Tables.part(s, d).select(col("p_partkey"))
      val money = concat(lit("$"), (col("p_partkey") % 90 + 1).cast(StringType),
        lit(","), lpad(((col("p_partkey") * 7) % 1000).cast(StringType), 3, "0"),
        lit("."), lpad((col("p_partkey") % 100).cast(StringType), 2, "0"))
      p.withColumn("money_str", money)
        .withColumn("amount",
          regexp_replace(trim(col("money_str")), "[$,]", "").cast(DecimalType(9, 2)).cast(DoubleType))
    }),

    // F7: MM/dd/yyyy date round-trip (reference TO_DATE parse:
    // sql/3nf/load_3nf_ce_stores_table.sql:23).
    "q18_date_parse" -> ((s, d) => {
      Tables.orders(s, d).select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "MM/dd/yyyy").as("date_str"))
        .withColumn("parsed_dt", to_date(col("date_str"), "MM/dd/yyyy"))
    }),

    // P6/A7: the post-load data-quality gate as one queryable report
    // (reference: python/dw_etl_tests.py:274-305 runs FK / UNIQUE /
    // NOT-NULL assertions after every ETL). Each FK check is a left-anti
    // join whose dim side AQE broadcasts while it fits; the dup check is
    // a partial-agg groupBy. Every check reduces to one row before the
    // union, so at 100 TB this is k independent scans and nothing else —
    // no driver-side looping over assertion results.
    "q106_integrity_check" -> ((s, d) => {
      val cust = Tables.customer(s, d).select("c_custkey")
      val orders = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      def one(name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n_violations"))
          .select(lit(name).as("check_name"), col("n_violations"))
      one("orders_custkey_fk",
        orders.join(cust, col("o_custkey") === col("c_custkey"), "left_anti"))
        .unionByName(one("lineitem_orderkey_fk",
          li.join(orders.select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"), "left_anti")))
        .unionByName(one("lineitem_partkey_fk",
          li.join(Tables.part(s, d).select("p_partkey"),
            col("l_partkey") === col("p_partkey"), "left_anti")))
        .unionByName(one("events_user_fk",
          Tables.events(s, d).join(cust,
            col("user_id") === col("c_custkey"), "left_anti")))
        .unionByName(one("customer_custkey_dup",
          Tables.customer(s, d).groupBy(col("c_custkey"))
            .agg(count(lit(1)).as("c")).filter(col("c") > 1)))
        .unionByName(one("orders_orderdate_null",
          orders.filter(col("o_orderdate").isNull)))
        .unionByName(one("documents_dup_text",
          Tables.documents(s, d).groupBy(col("text"))
            .agg(count(lit(1)).as("c")).filter(col("c") > 1)))
    }),

    // Column profiling (the ANALYZE/summarize every warehouse exposes):
    // null count, distinct count, lexical min/max per column, computed
    // in ONE scan via unpivot — Catalyst plans an Expand (×k columns)
    // feeding a single partial-agg shuffle keyed on column name, instead
    // of k separate scans. Doubles are excluded by policy (double→string
    // is engine-specific); ints and dates profile through stable casts.
    "q110_profile" -> ((s, d) => {
      val o = Tables.orders(s, d).select(
        col("o_orderstatus"),
        col("o_orderpriority"),
        col("o_custkey").cast(StringType).as("o_custkey_s"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate_s"))
      o.unpivot(Array.empty[org.apache.spark.sql.Column], "col_name", "val")
        .groupBy(col("col_name"))
        .agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col("val"))).as("n_null"),
          countDistinct(col("val")).as("n_distinct"),
          min(col("val")).as("min_val"),
          max(col("val")).as("max_val"))
    }),

    // S1 promoted to the hash gate: the full CSV ingest path —
    // windows-1252 file with smart-quote punctuation (0x93/0x94), the
    // encoding PROBE (utf-8 decodes them to U+FFFD → rejected;
    // ISO-8859-1 to C1 controls → rejected; cp1252 wins), header read,
    // then the staging parses (money F6, MM/dd/yyyy date F7) — proven
    // value-exact against the oracle computing straight from parquet.
    // Every decorated name hashes right only if the detected encoding
    // was correct, so the fallback itself is under the hash check.
    "q113_csv_roundtrip" -> ((s, d) => {
      val dir = graft.plans.EtlQueries.tmpWarehouse() + "/cust_csv"
      val money = concat(lit("$"), (col("c_custkey") % 90 + 1).cast(StringType),
        lit(","), lpad(((col("c_custkey") * 7) % 1000).cast(StringType), 3, "0"),
        lit("."), lpad((col("c_custkey") % 100).cast(StringType), 2, "0"))
      val name = when(col("c_custkey") % 10 === 0,
        concat(col("c_name"), lit(" “vip”"))).otherwise(col("c_name"))
      val dateStr = date_format(
        date_add(lit("1992-01-01").cast(DateType), (col("c_custkey") % 2000).cast("int")),
        "MM/dd/yyyy")
      Tables.customer(s, d)
        .select(col("c_custkey"), name.as("name"), money.as("bal_str"),
          dateStr.as("joined_str"))
        .coalesce(1)
        .write.mode("overwrite").option("header", "true")
        .option("encoding", "windows-1252").csv(dir)
      graft.sources.Csv.readWithEncodingFallback(s, dir)
        .select(col("c_custkey").cast(LongType).as("c_custkey"), col("name"),
          regexp_replace(trim(col("bal_str")), "[$,]", "")
            .cast(DecimalType(9, 2)).cast(DoubleType).as("amount"),
          to_date(col("joined_str"), "MM/dd/yyyy").as("joined_dt"))
    }),

    // ORC interchange roundtrip — the third exchange format next to
    // q113 (CSV) and q203 (JSONL): the fact slice is written as ORC
    // partitioned by return flag (predicate-pruned scans on read-back,
    // same layout contract as the warehouse's month partitioning),
    // read back through the ORC reader, and aggregated; the oracle
    // computes the same aggregates straight from parquet, so the green
    // hash proves the format hop is lossless — exact longs, exact cent
    // arithmetic via the decimal cast, timestamps surviving the
    // writer/reader pair. The partition column comes back as the
    // read-back string type and is re-selected explicitly (the q113
    // lesson about partition-column type inference).
    "q221_orc_roundtrip" -> ((s, d) => {
      val dir = graft.plans.EtlQueries.tmpWarehouse() + "/fact_orc"
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag"), col("l_shipdate"))
        .write.mode("overwrite").partitionBy("l_returnflag").orc(dir)
      s.read.orc(dir)
        .groupBy(col("l_returnflag").cast(StringType).as("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast(DoubleType)
            .as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast(DoubleType)
            .as("sum_price"),
          sum(col("l_orderkey")).as("sum_keys"),
          max(col("l_shipdate")).as("max_ship"))
    }),

    // Schema-evolution merge READ — S4's on-read half: batch 1 lands
    // orders with the v1 schema, batch 2 with an added column, and one
    // `mergeSchema` scan reads both vintages as the union schema with
    // NULLs where the old files have no column — the additive-evolution
    // contract (`Warehouse.evolveAdditively`) proven at the file-format
    // layer, no rewrite of batch 1. At 100 TB this is how a year of
    // schema drift stays one table: footer-merged schema, partition
    // pruning intact (the batch partition column arrives type-inferred,
    // cast explicitly — the q113 lesson).
    "q223_schema_merge" -> ((s, d) => {
      val dir = graft.plans.EtlQueries.tmpWarehouse() + "/orders_evo"
      val o = Tables.orders(s, d)
      o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .write.mode("overwrite").parquet(s"$dir/batch=1")
      o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"))
        .write.mode("overwrite").parquet(s"$dir/batch=2")
      s.read.option("mergeSchema", "true").parquet(dir)
        .groupBy(col("batch").cast(IntegerType).as("batch"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast(DoubleType)
            .as("sum_price"),
          count(col("o_orderstatus")).as("n_with_status"))
    }),

    // Malformed-record QUARANTINE on JSON ingest — the dead-letter
    // verb every landing zone needs: a feed where every 7th line is
    // (deterministically) truncated mid-record is read PERMISSIVE with
    // a corrupt-record column, valid rows parse through, broken rows
    // route to quarantine instead of killing the job or silently
    // vanishing. The gate proves the routing EXACTLY matches the
    // injection rule — a parser that dropped a valid line, accepted a
    // truncated one, or mangled a parsed field value would break the
    // counts or the recovered-field sums. Scan-speed, no shuffle; the
    // quarantine side carries the raw line for replay-after-fix.
    "q241_corrupt_quarantine" -> ((s, d) => {
      val dir = graft.plans.EtlQueries.tmpWarehouse() + "/jsonl_feed"
      Tables.documents(s, d)
        .select(col("doc_id"),
          to_json(struct(col("doc_id"), col("source"), col("n_chars"))).as("l"))
        .select(when(col("doc_id") % 7 === 0,
            expr("substring(l, 1, length(l) - 2)")).otherwise(col("l")).as("value"))
        .write.mode("overwrite").text(dir)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("source", StringType),
        StructField("n_chars", LongType), StructField("_corrupt", StringType)))
      s.read.schema(schema)
        .option("columnNameOfCorruptRecord", "_corrupt").json(dir)
        .agg(
          sum(when(col("_corrupt").isNull, 1L).otherwise(0L)).as("n_valid"),
          sum(when(col("_corrupt").isNotNull, 1L).otherwise(0L)).as("n_quarantined"),
          sum(when(col("_corrupt").isNull, col("doc_id"))).as("sum_valid_ids"),
          sum(when(col("_corrupt").isNull, col("n_chars"))).as("sum_valid_chars"))
    }),

    // Incremental aggregate maintenance under a CDC DELTA — q107
    // maintains an agg under watermarked APPENDS; this is the general
    // case a warehouse actually faces: one change batch carrying
    // deletes (orderkey % 97), in-place updates (% 89: quantity + 1)
    // and inserts (% 83 rows cloned a month later under fresh keys).
    // The maintained monthly rollup is the BASE AGGREGATE plus
    // adjustment rows computed from the delta alone — deletes retract
    // (−qty, −1), updates adjust by the new−old difference (+1 per
    // row), inserts add — re-aggregated on the month key. Nothing
    // outside the delta is ever rescanned: at 100 TB the maintenance
    // cost is O(|delta| + |affected months|), not O(fact). All
    // arithmetic is exact decimal, so combining partial aggregates
    // cannot drift; the oracle RECOMPUTES the modified table from
    // scratch — a green hash proves maintenance ≡ recompute, deletes
    // winning over updates and inserts exempt from both.
    "q232_incremental_agg_cdc" -> ((s, d) => {
      val dec = DecimalType(18, 2)
      val li = Tables.lineitem(s, d)
      def m(c: org.apache.spark.sql.Column) = date_format(c, "yyyy-MM")
      def qtyAgg(df: org.apache.spark.sql.DataFrame, sign: Int,
                 qty: org.apache.spark.sql.Column) =
        df.groupBy(col("m"))
          .agg((sum(qty.cast(dec)) * sign).as("q"),
            (count(lit(1)) * sign).as("n"))
      val base = qtyAgg(li.select(m(col("l_shipdate")).as("m"), col("l_quantity")),
        1, col("l_quantity"))
      val deletes = qtyAgg(li.filter(col("l_orderkey") % 97 === 0)
        .select(m(col("l_shipdate")).as("m"), col("l_quantity")),
        -1, col("l_quantity"))
      // update adjustment: new − old = +1 per surviving updated row
      val updates = li
        .filter(col("l_orderkey") % 89 === 0 && col("l_orderkey") % 97 =!= 0)
        .groupBy(m(col("l_shipdate")).as("m"))
        .agg(count(lit(1)).cast(dec).as("q"), lit(0L).as("n"))
      val inserts = qtyAgg(li.filter(col("l_orderkey") % 83 === 0)
        .select(m(expr("l_shipdate + INTERVAL 30 DAYS")).as("m"), col("l_quantity")),
        1, col("l_quantity"))
      base.unionByName(deletes).unionByName(updates).unionByName(inserts)
        .groupBy(col("m"))
        .agg(sum(col("q")).cast(DoubleType).as("sum_qty"),
          sum(col("n")).as("n_rows"))
        .filter(col("n_rows") > 0)
    })
  )

  val oracleSql: Map[String, String] = Map(
    // amount: build the EXACT integer cent count first, divide once —
    // two divisions (decimal / then sum) round twice and can flip the
    // last ulp near a midpoint vs Spark's single decimal→double cast
    "q113_csv_roundtrip" ->
      """SELECT c_custkey,
         c_name || CASE WHEN c_custkey % 10 = 0 THEN ' “vip”' ELSE '' END AS name,
         CAST(((c_custkey % 90 + 1) * 1000 + (c_custkey * 7) % 1000) * 100
              + c_custkey % 100 AS DOUBLE) / 100 AS amount,
         DATE '1992-01-01' + CAST(c_custkey % 2000 AS INT) AS joined_dt
         FROM customer""",
    "q221_orc_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           CAST(SUM(l_orderkey) AS BIGINT) AS sum_keys,
           MAX(l_shipdate) AS max_ship
         FROM lineitem GROUP BY 1""",
    // Ground truth from the injection rule: any mis-parse of a valid
    // line or acceptance of a truncated one breaks these counts.
    "q241_corrupt_quarantine" ->
      """SELECT
           CAST(count(CASE WHEN doc_id % 7 != 0 THEN 1 END) AS BIGINT) AS n_valid,
           CAST(count(CASE WHEN doc_id % 7 = 0 THEN 1 END) AS BIGINT) AS n_quarantined,
           CAST(SUM(CASE WHEN doc_id % 7 != 0 THEN doc_id END) AS BIGINT) AS sum_valid_ids,
           CAST(SUM(CASE WHEN doc_id % 7 != 0 THEN n_chars END) AS BIGINT) AS sum_valid_chars
         FROM documents""",
    // Recompute-from-scratch ground truth for the CDC maintenance:
    // deletes win over updates, inserts land a month later untouched.
    "q232_incremental_agg_cdc" ->
      """WITH mod AS (
           SELECT l_shipdate AS dt,
                  l_quantity + (CASE WHEN l_orderkey % 89 = 0
                                     THEN 1 ELSE 0 END) AS q
           FROM lineitem WHERE l_orderkey % 97 != 0
           UNION ALL
           SELECT l_shipdate + INTERVAL 30 DAY, l_quantity
           FROM lineitem WHERE l_orderkey % 83 = 0)
         SELECT strftime(dt, '%Y-%m') AS m,
                CAST(SUM(CAST(q AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
                count(*) AS n_rows
         FROM mod GROUP BY 1""",
    "q223_schema_merge" ->
      """SELECT CAST(1 + (o_orderkey % 2) AS INT) AS batch,
           count(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           CAST(count(CASE WHEN o_orderkey % 2 = 1
                           THEN o_orderstatus END) AS BIGINT) AS n_with_status
         FROM orders GROUP BY 1""",
    "q110_profile" ->
      """WITH up AS (
           SELECT 'o_orderstatus' AS col_name, o_orderstatus AS val FROM orders
           UNION ALL
           SELECT 'o_orderpriority', o_orderpriority FROM orders
           UNION ALL
           SELECT 'o_custkey_s', CAST(o_custkey AS VARCHAR) FROM orders
           UNION ALL
           SELECT 'o_orderdate_s', strftime(o_orderdate, '%Y-%m-%d') FROM orders)
         SELECT col_name, count(*) AS n_rows,
           count(*) - count(val) AS n_null,
           count(DISTINCT val) AS n_distinct,
           MIN(val) AS min_val, MAX(val) AS max_val
         FROM up GROUP BY col_name""",
    "q106_integrity_check" ->
      """SELECT 'orders_custkey_fk' AS check_name,
           (SELECT count(*) FROM orders o WHERE NOT EXISTS
             (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS n_violations
         UNION ALL SELECT 'lineitem_orderkey_fk',
           (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
             (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
         UNION ALL SELECT 'lineitem_partkey_fk',
           (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
             (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
         UNION ALL SELECT 'events_user_fk',
           (SELECT count(*) FROM events e WHERE NOT EXISTS
             (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id))
         UNION ALL SELECT 'customer_custkey_dup',
           (SELECT count(*) FROM (SELECT c_custkey FROM customer
                                  GROUP BY c_custkey HAVING count(*) > 1))
         UNION ALL SELECT 'orders_orderdate_null',
           (SELECT count(*) FROM orders WHERE o_orderdate IS NULL)
         UNION ALL SELECT 'documents_dup_text',
           (SELECT count(*) FROM (SELECT text FROM documents
                                  GROUP BY text HAVING count(*) > 1))""",
    "q10_staging_clean" ->
      """SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS c_custkey,
         CAST(c_name AS VARCHAR) AS c_name,
         CAST(c_nationkey AS VARCHAR) AS c_nationkey,
         CAST(c_mktsegment AS VARCHAR) AS c_mktsegment
         FROM customer""",
    "q11_antijoin_new_rows" ->
      """SELECT l_linestatus, count(*) AS n_rows,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')
         GROUP BY l_linestatus""",
    "q12_union_distinct" ->
      """SELECT CAST(c_nationkey AS INT) AS nationkey FROM customer
         UNION
         SELECT CAST(s_nationkey AS INT) AS nationkey FROM supplier""",
    "q13_split_name" ->
      """SELECT c_custkey,
         split_part(c_name, '#', 1) AS name_prefix,
         split_part(c_name, '#', 2) AS name_num
         FROM customer""",
    "q14_default_row" ->
      """SELECT c_custkey,
         COALESCE(CAST(n_nationkey AS INT), -1) AS nation_id,
         COALESCE(n_name, 'n.a.') AS nation_name
         FROM customer LEFT JOIN (SELECT * FROM nation WHERE n_nationkey < 20) n
           ON c_nationkey = n_nationkey""",
    "q15_surrogate_keys" ->
      """SELECT n_nationkey, n_name,
         CAST(row_number() OVER (ORDER BY n_name) + 100 AS BIGINT) AS surr_id
         FROM nation""",
    "q16_ci_hierarchy_join" ->
      """SELECT array_to_string(list_transform(string_split(lower(n_name), ' '),
                w -> upper(substr(w,1,1)) || substr(w,2)), ' ') AS nation_name,
         array_to_string(list_transform(string_split(lower(r_name), ' '),
                w -> upper(substr(w,1,1)) || substr(w,2)), ' ') AS region_name
         FROM nation LEFT JOIN region ON n_regionkey = r_regionkey""",
    "q17_money_parse" ->
      """SELECT p_partkey,
         '$' || CAST(p_partkey % 90 + 1 AS VARCHAR) || ',' ||
            lpad(CAST((p_partkey * 7) % 1000 AS VARCHAR), 3, '0') || '.' ||
            lpad(CAST(p_partkey % 100 AS VARCHAR), 2, '0') AS money_str,
         CAST(CAST(regexp_replace(trim('$' || CAST(p_partkey % 90 + 1 AS VARCHAR) || ',' ||
            lpad(CAST((p_partkey * 7) % 1000 AS VARCHAR), 3, '0') || '.' ||
            lpad(CAST(p_partkey % 100 AS VARCHAR), 2, '0')), '[$,]', '', 'g') AS DECIMAL(9,2)) AS DOUBLE) AS amount
         FROM part""",
    "q18_date_parse" ->
      """SELECT o_orderkey,
         strftime(o_orderdate, '%m/%d/%Y') AS date_str,
         CAST(strptime(strftime(o_orderdate, '%m/%d/%Y'), '%m/%d/%Y') AS DATE) AS parsed_dt
         FROM orders"""
  )
}
