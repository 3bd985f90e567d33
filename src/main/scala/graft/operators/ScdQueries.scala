package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SCD + incremental-load operator surface (SURVEY §2.9, §2.2-P3,
  * §2.3 J5-J10). Target/source pairs are derived deterministically from
  * the testdata so the DuckDB oracle can rebuild the exact same merge
  * inputs; all timestamps are NTZ so parquet annotations agree between
  * engines.
  */
object ScdQueries extends QueryPack {

  private val dec = DecimalType(18, 2)
  private def ntz(s: String) = lit(s).cast(TimestampNTZType)

  /** Customer snapshot pair shared by q111 (the diff view) and q114
    * (time travel) — q111 is, by construction, the change view of
    * exactly q114's two versions. v2 = bump every 5th key's balance,
    * drop every 13th, add a shifted key for every 17th.
    */
  private def custV1(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.customer(s, d).select(
      col("c_custkey").as("k"), col("c_name").as("name"),
      (col("c_acctbal").cast(dec) * 100).cast(LongType).as("cents"))

  private def custV2(v1: org.apache.spark.sql.DataFrame) =
    v1.filter(col("k") % 13 =!= 0)
      .select(col("k"), col("name"),
        (col("cents") + when(col("k") % 5 === 0, 500L).otherwise(0L)).as("cents"))
      .unionByName(v1.filter(col("k") % 17 === 0)
        .select((col("k") + 10000000L).as("k"), col("name"), lit(0L).as("cents")))

  /** The same two snapshots as DuckDB CTEs (`cust` = v1, `nxt` = v2). */
  private val custSnapshotsCte =
    """cust AS (
         SELECT c_custkey AS k, c_name AS name,
                CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         FROM customer),
       nxt AS (
         SELECT k, name, cents + CASE WHEN k % 5 = 0 THEN 500 ELSE 0 END AS cents
         FROM cust WHERE k % 13 != 0
         UNION ALL
         SELECT k + 10000000, name, CAST(0 AS BIGINT) FROM cust WHERE k % 17 = 0)"""

  val queries: Map[String, Q] = Map(
    // C1: SCD Type 1 upsert — full-outer merge with null-safe change
    // detection (reference: load_3nf_ce_customers_scd_table_type1.sql:98-144).
    "q20_scd1_upsert" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val target = c.filter(col("c_custkey") % 100 < 90)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_nationkey"))
        .withColumn("insert_dt", lit("2024-01-01").cast(DateType))
        .withColumn("update_dt", lit("2024-01-01").cast(DateType))
      val source = c.filter(col("c_custkey") % 7 =!= 0)
        .select(col("c_custkey"), col("c_name"),
          when(col("c_custkey") % 3 === 0, "AUTOMOBILE").otherwise(col("c_mktsegment")).as("c_mktsegment"),
          col("c_nationkey"))
      Scd.scd1Merge(target, source, Seq("c_custkey"),
        Seq("c_name", "c_mktsegment"), lit("2024-06-01").cast(DateType))
    }),

    // STREAMING SCD1: the C1 upsert meeting the streaming extension —
    // customer updates arrive in TWO stream waves (even keys, then odd
    // keys) and upsert on ingest via foreachBatch over a pre-seeded
    // dimension. The landed table must hash-match folding the same two
    // waves through batch scd1Merge — the oracle nests the full-outer
    // merge twice. Exactly-once replay + checkpointed multi-run folds
    // are pinned by StreamingSpec; this gate proves stream ≡ batch.
    "q162_stream_scd1" -> ((s, d) => {
      import graft.streaming.EventPipelines
      val wh = new graft.sources.Warehouse(graft.plans.EtlQueries.tmpWarehouse(), s)
      val c = Tables.customer(s, d)
      wh.overwrite(c.filter(col("c_custkey") % 100 < 90)
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_nationkey"))
        .withColumn("insert_dt", lit("2024-01-01").cast(DateType))
        .withColumn("update_dt", lit("2024-01-01").cast(DateType)),
        "bl_3nf", "cust_scd1"): Unit
      val stream = s.readStream
        .schema(s.read.option("pathGlobFilter", "customer.parquet").parquet(d).schema)
        .option("pathGlobFilter", "customer.parquet").parquet(d)
      def wave(parity: Int)(b: org.apache.spark.sql.DataFrame) = b
        .filter(col("c_custkey") % 7 =!= 0 && col("c_custkey") % 2 === parity)
        .select(col("c_custkey"), col("c_name"),
          when(col("c_custkey") % 3 === 0, "AUTOMOBILE")
            .otherwise(col("c_mktsegment")).as("c_mktsegment"),
          col("c_nationkey"))
      EventPipelines.scd1AvailableNow(stream, wh, "bl_3nf", "cust_scd1",
        Seq("c_custkey"), Seq("c_name", "c_mktsegment"),
        lit("2024-06-01").cast(DateType), prep = Some(wave(0)))
      EventPipelines.scd1AvailableNow(stream, wh, "bl_3nf", "cust_scd1",
        Seq("c_custkey"), Seq("c_name", "c_mktsegment"),
        lit("2024-07-01").cast(DateType), prep = Some(wave(1)))
      wh.read("bl_3nf", "cust_scd1")
    }),

    // STREAMING SCD2: the C2 versioning meeting the streaming
    // extension — part price updates arrive in TWO stream waves (even
    // keys at 2024-06-01, odd keys at 2024-07-01) and VERSION on
    // ingest via foreachBatch over a pre-seeded dimension: a changed
    // price closes the active version (runTs − 1s, 'N') and opens a
    // new one, new keys get a first version, untouched parity passes
    // through. The landed table must hash-match folding the same two
    // waves through batch scd2Merge — the oracle enumerates the fold's
    // row classes per wave. Exactly-once replay is pinned by
    // StreamingSpec; this gate proves stream versioning ≡ batch.
    "q213_stream_scd2" -> ((s, d) => {
      import graft.streaming.EventPipelines
      val wh = new graft.sources.Warehouse(graft.plans.EtlQueries.tmpWarehouse(), s)
      val p = Tables.part(s, d)
      wh.overwrite(p.filter(col("p_partkey") % 100 < 95)
        .select(col("p_partkey"), col("p_retailprice").as("price"))
        .withColumn("start_ts", ntz("2024-01-01 00:00:00"))
        .withColumn("end_ts", ntz("9999-12-31 00:00:00"))
        .withColumn("is_active", lit("Y")),
        "bl_3nf", "part_scd2"): Unit
      val stream = s.readStream
        .schema(s.read.option("pathGlobFilter", "part.parquet").parquet(d).schema)
        .option("pathGlobFilter", "part.parquet").parquet(d)
      def wave(parity: Int)(b: org.apache.spark.sql.DataFrame) = b
        .filter(col("p_partkey") % 2 === parity)
        .select(col("p_partkey"),
          (col("p_retailprice") +
            when(col("p_partkey") % 5 === 0, 10.0).otherwise(0.0)).as("price"))
      EventPipelines.scd2AvailableNow(stream, wh, "bl_3nf", "part_scd2",
        Seq("p_partkey"), Seq("price"),
        ntz("2024-06-01 00:00:00"), ntz("9999-12-31 00:00:00"),
        prep = Some(wave(0)))
      EventPipelines.scd2AvailableNow(stream, wh, "bl_3nf", "part_scd2",
        Seq("p_partkey"), Seq("price"),
        ntz("2024-07-01 00:00:00"), ntz("9999-12-31 00:00:00"),
        prep = Some(wave(1)))
      wh.read("bl_3nf", "part_scd2")
    }),

    // C2: SCD Type 2 versioning — close-and-version on price change
    // (reference: load_3nf_ce_products_scd_table_type2.sql:111-222).
    "q21_scd2_versioning" -> ((s, d) => {
      val p = Tables.part(s, d)
      val active = p.filter(col("p_partkey") % 100 < 95)
        .select(col("p_partkey"), col("p_retailprice").as("price"))
        .withColumn("start_ts", ntz("2024-01-01 00:00:00"))
        .withColumn("end_ts", ntz("9999-12-31 00:00:00"))
        .withColumn("is_active", lit("Y"))
      val inactive = p.filter(col("p_partkey") % 100 < 5)
        .select(col("p_partkey"), (col("p_retailprice") - 5.0).as("price"))
        .withColumn("start_ts", ntz("2023-01-01 00:00:00"))
        .withColumn("end_ts", ntz("2023-12-31 23:59:59"))
        .withColumn("is_active", lit("N"))
      val target = active.unionByName(inactive)
      val source = p.select(col("p_partkey"),
        (col("p_retailprice") + when(col("p_partkey") % 5 === 0, 10.0).otherwise(0.0)).as("price"))
      Scd.scd2Merge(target, source, Seq("p_partkey"), Seq("price"),
        ntz("2024-06-01 00:00:00"), ntz("9999-12-31 00:00:00"))
    }),

    // P3: incremental watermark load — only rows past max(target ts)
    // (reference: load_3nf_ce_sales_pre_fact_table.sql:21-23,94).
    "q22_watermark_incremental" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val finished = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_orderdate").as("l_shipdate"))
      Relational.newerThanWatermark(li, finished, "l_shipdate")
        .groupBy(date_trunc("month", col("l_shipdate")).cast(DateType).as("ship_month"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast(dec)).cast(DoubleType).as("sum_qty"))
    }),

    // J10+F8+F9: fact load — composite business key, dim surrogate
    // resolution with −1 defaults, exact measure computation
    // (reference: load_fct_sales_fact_table_dimensional_layer.sql:108-148).
    "q23_fact_load" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d).select("o_orderkey", "o_orderdate")
      val p = Tables.part(s, d).filter(col("p_size") <= 45).select("p_partkey")
      val sup = Tables.supplier(s, d).filter(col("s_suppkey") < 90).select("s_suppkey")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(p), col("l_partkey") === col("p_partkey"), "left")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"), "left")
        .select(
          concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("sale_src_id"),
          col("o_orderdate").cast(DateType).as("order_dt"),
          coalesce(col("p_partkey"), lit(-1L)).as("part_id"),
          coalesce(col("s_suppkey"), lit(-1L)).as("supp_id"),
          col("l_quantity").as("quantity"),
          (col("l_quantity").cast(dec) * col("l_extendedprice").cast(dec))
            .cast(DoubleType).as("total_sum"))
    }),

    // J7: left semi (EXISTS) — customers having orders
    // (reference: load_3nf_ce_products_scd_table_type2.sql:121-127).
    "q24_exists_semi" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_semi")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
    }),

    // J9: left anti (NOT EXISTS) — customers with no 'P'-status order
    // (reference: load_3nf_ce_products_scd_table_type2.sql:181-186).
    "q25_not_exists_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "P")
        .select(col("o_custkey").as("c_custkey"))
      c.join(o, Seq("c_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
    }),

    // C3 composed: insert-only dimension load — union-dedup two sources,
    // anti-join existing keys, assign fresh surrogate ids past the max
    // (reference: load_3nf_ce_countries_table.sql:34,96-100 + NEXTVAL).
    "q26_insert_only_dim" -> ((s, d) => {
      val existing = Tables.nation(s, d).filter(col("n_nationkey") < 15)
        .select(col("n_nationkey").as("nationkey"),
          (col("n_nationkey") + 1000).cast(LongType).as("surr_id"))
      val src = Relational.unionDistinct(
        Tables.customer(s, d).select(col("c_nationkey").as("nationkey")),
        Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      val maxId = existing.agg(max(col("surr_id"))).head().getLong(0)
      val fresh = Relational.surrogateKeys(
        Staging.newRowsOnly(src, existing, Seq("nationkey")),
        "nationkey", maxId, "surr_id")
      existing.withColumn("status", lit("existing"))
        .unionByName(fresh.withColumn("status", lit("new")))
    }),

    // As-of join: price at ship time against a versioned price table —
    // the operator the reference sidesteps with "currently-active price"
    // (SURVEY §3.4.5). One shuffle (union-and-carry-forward), oracle is
    // DuckDB's native ASOF LEFT JOIN.
    "q27_asof_price" -> ((s, d) => {
      val versions = Tables.part(s, d).select(col("p_partkey"), explode(array(
        struct(lit("1993-01-01").cast(DateType).as("price_dt"),
          (col("p_retailprice") - 10.0).as("price")),
        struct(lit("1995-01-01").cast(DateType).as("price_dt"),
          col("p_retailprice").as("price")),
        struct(lit("1997-01-01").cast(DateType).as("price_dt"),
          (col("p_retailprice") + 10.0).as("price")))).as("v"))
        .select(col("p_partkey"), col("v.price_dt"), col("v.price"))
      val li = Tables.lineitem(s, d).select(
        concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("sale_id"),
        col("l_partkey").as("p_partkey"),
        to_date(col("l_shipdate")).as("ship_dt"))
      Relational.asOfJoin(li, versions, Seq("p_partkey"), "ship_dt", "price_dt")
    }),

    // q27 driven through the NATIVE as-of join operator instead of the
    // composed union-carry-forward form: AsOfJoinNode → AsOfJoinStrategy
    // (injected via GraftExtensions) → AsOfJoinExec, a declared-
    // requirement streaming merge (one shuffle + sort per side, one
    // buffered row of carry state). Checked against DuckDB's native
    // ASOF LEFT JOIN.
    "q96_asof_native" -> ((s, d) => {
      val versions = Tables.part(s, d).select(col("p_partkey"), explode(array(
        struct(lit("1993-01-01").cast(DateType).as("price_dt"),
          (col("p_retailprice") - 10.0).as("price")),
        struct(lit("1995-01-01").cast(DateType).as("price_dt"),
          col("p_retailprice").as("price")),
        struct(lit("1997-01-01").cast(DateType).as("price_dt"),
          (col("p_retailprice") + 10.0).as("price")))).as("v"))
        .select(col("p_partkey"), col("v.price_dt"), col("v.price"))
      val li = Tables.lineitem(s, d).select(
        concat_ws("-", col("l_orderkey"), col("l_linenumber")).as("sale_id"),
        col("l_partkey").as("p_partkey"),
        to_date(col("l_shipdate")).as("ship_dt"))
      org.apache.spark.sql.graft.AsOfJoinPlan.asOfJoinNative(
        li, versions, Seq("p_partkey"), "ship_dt", "price_dt")
        .select(col("p_partkey"), col("ship_dt"), col("sale_id"), col("price"))
    }),

    // C2 at the DM layer: the reference re-runs an INDEPENDENT SCD2
    // merge over the 3NF active slice when building the dimensional
    // product dim — its own change detection, closing, and versioning
    // (reference: load_dim_products_dimension_scd_type2.sql:118-234).
    // Modeled as two chained merges into an initially-empty DM target:
    // run 1 loads the active slice, run 2 sees a changed slice and
    // closes/re-versions — history accumulates in the DM dim even
    // though each 3NF active slice carries only current rows.
    "q64_dm_scd2_reversion" -> ((s, d) => {
      val p = Tables.part(s, d)
      val slice1 = p.select(col("p_partkey"), col("p_retailprice").as("price"))
      val empty = slice1.limit(0)
        .withColumn("start_ts", ntz("2024-01-01 00:00:00"))
        .withColumn("end_ts", ntz("9999-12-31 00:00:00"))
        .withColumn("is_active", lit("Y"))
      val dm1 = Scd.scd2Merge(empty, slice1, Seq("p_partkey"), Seq("price"),
        ntz("2024-01-01 00:00:00"), ntz("9999-12-31 00:00:00"))
      val slice2 = p.select(col("p_partkey"),
        (col("p_retailprice") + when(col("p_partkey") % 4 === 0, 7.5).otherwise(0.0)).as("price"))
      Scd.scd2Merge(dm1, slice2, Seq("p_partkey"), Seq("price"),
        ntz("2024-06-01 00:00:00"), ntz("9999-12-31 00:00:00"))
    }),

    // Skew-salted join, verified: ~70% of the fact lands on one key (the
    // pathological hot-key case where even AQE's skew split straggles),
    // the dim side replicates per salt, and the result must equal the
    // plain join — the oracle computes exactly that. The per-nation
    // rollup after the join keeps the output hashable while the join
    // itself runs at fact width.
    "q78_salted_join" -> ((s, d) => {
      val fact = Tables.lineitem(s, d).select(
        when(col("l_partkey") % 1000 < 700, 0L)
          .otherwise(col("l_partkey").cast(LongType) % 25).as("nation_key"),
        col("l_quantity").cast(DecimalType(18, 2)).as("qty"))
      val dim = Tables.nation(s, d).select(
        col("n_nationkey").cast(LongType).as("nation_key"), col("n_name"))
      Relational.saltedJoin(fact, dim, "nation_key", salts = 16)
        .groupBy(col("nation_key"), col("n_name"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("qty")).cast(DoubleType).as("sum_qty"))
    }),

    // q78 wired to the q172-style skew AUDIT: the salt count is chosen
    // per key from the measured hot-key relation (>10×-mean), so only
    // the one pathological key fans out and the 24 cold nation keys
    // join plain — build replication cost is salts·|hot| instead of
    // salts·|build|. Result must still equal the plain join (same
    // oracle as q78); the fan-out contract is pinned by RelationalSpec.
    "q214_audited_salted_join" -> ((s, d) => {
      val fact = Tables.lineitem(s, d).select(
        when(col("l_partkey") % 1000 < 700, 0L)
          .otherwise(col("l_partkey").cast(LongType) % 25).as("nation_key"),
        col("l_quantity").cast(DecimalType(18, 2)).as("qty"))
      val dim = Tables.nation(s, d).select(
        col("n_nationkey").cast(LongType).as("nation_key"), col("n_name"))
      val audit = Relational.hotKeys(fact, "nation_key", factor = 10)
      Relational.adaptiveSaltedJoin(fact, dim, "nation_key", salts = 16, audit)
        .groupBy(col("nation_key"), col("n_name"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("qty")).cast(DoubleType).as("sum_qty"))
    }),

    // Binned range join: orders falling inside per-nation campaign
    // windows — point-in-interval as an equi-join on time bins plus a
    // residual filter, instead of a nested-loop.
    "q28_range_join" -> ((s, d) => {
      val campaigns = Tables.nation(s, d)
        .select(date_add(lit("1995-01-01").cast(DateType),
          (col("n_nationkey") * 40).cast("int")).as("camp_start"))
        .distinct()
        .withColumn("camp_end", date_add(col("camp_start"), 90))
        .withColumn("camp_id", unix_date(col("camp_start")))
      val o = Tables.orders(s, d).select(
        to_date(col("o_orderdate")).as("order_dt"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("total"))
      Relational.rangeJoinBinned(o, campaigns,
        "order_dt", "camp_start", "camp_end", binDays = 90)
        .groupBy(col("camp_id"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("total")).cast(DoubleType).as("sum_total"))
    }),

    // CDC merge: apply an insert/update/DELETE change feed to a
    // dimension snapshot with last-writer-wins per key — the missing
    // third verb next to scd1Merge (no deletes) and scd2Merge. The
    // feed is synthesized deterministically from the snapshot (update
    // every 7th key, delete every 11th — overlapping keys exercise the
    // ordering — insert brand-new keys for every 13th) with explicit
    // seq numbers, as a CDC source would carry offsets. Scale shape:
    // ONE key-partitioned window over base ∪ feed picks the winning
    // version, no full-outer juggling; balances are cent longs so every
    // output is integral.
    "q109_cdc_merge" -> ((s, d) => {
      val base = Tables.customer(s, d).select(
        col("c_custkey").as("k"), col("c_name").as("name"),
        (col("c_acctbal").cast(dec) * 100).cast(LongType).as("bal_cents"),
        lit(0L).as("seq"), lit("U").as("op"))
      val src = Tables.customer(s, d)
      val updates = src.filter(col("c_custkey") % 7 === 0).select(
        col("c_custkey").as("k"), col("c_name").as("name"),
        ((col("c_acctbal").cast(dec) * 100).cast(LongType) + 10000L).as("bal_cents"),
        lit(1L).as("seq"), lit("U").as("op"))
      val deletes = src.filter(col("c_custkey") % 11 === 0).select(
        col("c_custkey").as("k"), col("c_name").as("name"),
        lit(0L).as("bal_cents"), lit(2L).as("seq"), lit("D").as("op"))
      val inserts = src.filter(col("c_custkey") % 13 === 0).select(
        (col("c_custkey") + 10000000L).as("k"),
        concat(lit("new-"), col("c_name")).as("name"),
        lit(0L).as("bal_cents"), lit(1L).as("seq"), lit("U").as("op"))
      val feed = updates.unionByName(deletes).unionByName(inserts)
      Scd.cdcMerge(base, feed, Seq("k"))
        .select(col("k"), col("name"), col("bal_cents"), col("seq").as("last_seq"))
    }),

    // Snapshot diff: full-outer compare of two table versions into an
    // added/removed/changed report — the regression gate a warehouse
    // runs after every load (and the byte-level cousin of q74's
    // incremental ≡ from-scratch proof). The next version is derived
    // deterministically (bump every 5th key's balance, drop every 13th,
    // add a shifted key for every 17th). One co-partitioned full-outer
    // join on the key; unchanged rows — the overwhelming mass at
    // 100 TB — are filtered before anything is materialized.
    "q111_snapshot_diff" -> ((s, d) => {
      val cust = custV1(s, d)
      val next = custV2(cust)
      val b = cust.select(col("k"), col("name").as("b_name"), col("cents").as("b_cents"))
      val n = next.select(col("k"), col("name").as("n_name"), col("cents").as("n_cents"))
      b.join(n, Seq("k"), "full_outer")
        .withColumn("op",
          when(col("b_cents").isNull, "A")
            .when(col("n_cents").isNull, "R")
            .when(!(col("b_name") <=> col("n_name")) ||
              !(col("b_cents") <=> col("n_cents")), "C"))
        .where(col("op").isNotNull)
        .select(col("k"), col("op"), col("b_cents"), col("n_cents"))
    }),

    // Column-profile drift between snapshot versions — the data-ops
    // monitor that catches a bad load BEFORE consumers do: q110's
    // per-column profile (rows, nulls, distincts, lexicographic range)
    // computed over BOTH committed versions of the dimension and
    // joined per column, with row/distinct deltas and a range-stable
    // flag. Rides the same immutable-version machinery as q114; each
    // profile is one unpivot + one agg, so the drift report costs two
    // profile scans however wide the table.
    "q194_profile_drift" -> ((s, d) => {
      val wh = new graft.sources.Warehouse(graft.plans.EtlQueries.tmpWarehouse(), s)
      val v1 = custV1(s, d)
      val v2 = custV2(v1)
      wh.writeVersion(v1, "bl_3nf", "dim_customers_pdrift"): Unit
      wh.writeVersion(v2, "bl_3nf", "dim_customers_pdrift"): Unit
      def profile(df: org.apache.spark.sql.DataFrame) = df.select(
          col("k").cast(StringType).as("k"), col("name"),
          col("cents").cast(StringType).as("cents"))
        .unpivot(Array.empty[org.apache.spark.sql.Column], "col_name", "val")
        .groupBy(col("col_name"))
        .agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col("val"))).as("n_null"),
          countDistinct(col("val")).as("n_distinct"),
          min(col("val")).as("min_val"), max(col("val")).as("max_val"))
      val p1 = profile(wh.readVersion("bl_3nf", "dim_customers_pdrift", 1))
        .toDF("col_name", "n_rows_1", "n_null_1", "n_distinct_1", "min_1", "max_1")
      val p2 = profile(wh.readVersion("bl_3nf", "dim_customers_pdrift", 2))
        .toDF("col_name", "n_rows_2", "n_null_2", "n_distinct_2", "min_2", "max_2")
      p1.join(p2, "col_name")
        .select(col("col_name"),
          col("n_rows_1"), col("n_rows_2"),
          (col("n_rows_2") - col("n_rows_1")).as("row_delta"),
          col("n_null_1"), col("n_null_2"),
          col("n_distinct_1"), col("n_distinct_2"),
          (col("n_distinct_2") - col("n_distinct_1")).as("distinct_delta"),
          (col("min_1") === col("min_2") && col("max_1") === col("max_2"))
            .as("range_stable"))
    }),

    // Time travel: two snapshot versions committed to the warehouse
    // (immutable `v=N` dirs — Warehouse.writeVersion), then BOTH read
    // back — v1 as-of-read AFTER v2 was committed, so a green hash
    // proves snapshot isolation: later commits never disturb earlier
    // readers. v2 applies q111's mutation set, which makes q111 the
    // derived CHANGE view of exactly these two versions. Full-copy
    // versioning is the dimension-table path; facts version
    // per-partition (q74/q79).
    "q114_time_travel" -> ((s, d) => {
      val wh = new graft.sources.Warehouse(graft.plans.EtlQueries.tmpWarehouse(), s)
      val v1 = custV1(s, d)
      val v2 = custV2(v1)
      wh.writeVersion(v1, "bl_3nf", "dim_customers"): Unit
      wh.writeVersion(v2, "bl_3nf", "dim_customers"): Unit
      val asOf1 = wh.readVersion("bl_3nf", "dim_customers", 1)
      val asOf2 = wh.readVersion("bl_3nf", "dim_customers", 2)
      asOf1.withColumn("version", lit(1))
        .unionByName(asOf2.withColumn("version", lit(2)))
        .select(col("version"), col("k"), col("name"), col("cents"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q114_time_travel" ->
      s"""WITH $custSnapshotsCte
         SELECT 1 AS version, * FROM cust
         UNION ALL
         SELECT 2 AS version, * FROM nxt""",
    "q194_profile_drift" -> {
      def prof(rel: String, colName: String, valSql: String) =
        s"""SELECT '$colName' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(*) - count($valSql) AS BIGINT) AS n_null,
              CAST(count(DISTINCT $valSql) AS BIGINT) AS n_distinct,
              min($valSql) AS min_val, max($valSql) AS max_val FROM $rel"""
      def profAll(rel: String) = Seq(
        prof(rel, "k", "CAST(k AS VARCHAR)"),
        prof(rel, "name", "name"),
        prof(rel, "cents", "CAST(cents AS VARCHAR)")).mkString(" UNION ALL ")
      s"""WITH $custSnapshotsCte,
         p1 AS (${profAll("cust")}),
         p2 AS (${profAll("nxt")})
       SELECT p1.col_name, p1.n_rows AS n_rows_1, p2.n_rows AS n_rows_2,
              p2.n_rows - p1.n_rows AS row_delta,
              p1.n_null AS n_null_1, p2.n_null AS n_null_2,
              p1.n_distinct AS n_distinct_1, p2.n_distinct AS n_distinct_2,
              p2.n_distinct - p1.n_distinct AS distinct_delta,
              (p1.min_val = p2.min_val AND p1.max_val = p2.max_val)
                AS range_stable
       FROM p1 JOIN p2 USING (col_name)"""
    },
    "q109_cdc_merge" ->
      """WITH base AS (
           SELECT c_custkey AS k, c_name AS name,
                  CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_cents,
                  CAST(0 AS BIGINT) AS seq, 'U' AS op FROM customer),
         upd AS (
           SELECT c_custkey, c_name,
                  CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) + 10000,
                  CAST(1 AS BIGINT), 'U' FROM customer WHERE c_custkey % 7 = 0),
         del AS (
           SELECT c_custkey, c_name, CAST(0 AS BIGINT), CAST(2 AS BIGINT), 'D'
           FROM customer WHERE c_custkey % 11 = 0),
         ins AS (
           SELECT c_custkey + 10000000, 'new-' || c_name, CAST(0 AS BIGINT),
                  CAST(1 AS BIGINT), 'U' FROM customer WHERE c_custkey % 13 = 0),
         allops AS (SELECT * FROM base UNION ALL SELECT * FROM upd
                    UNION ALL SELECT * FROM del UNION ALL SELECT * FROM ins),
         ranked AS (SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC, op DESC) AS rn
                    FROM allops)
         SELECT k, name, bal_cents, seq AS last_seq
         FROM ranked WHERE rn = 1 AND op = 'U'""",
    "q111_snapshot_diff" ->
      s"""WITH $custSnapshotsCte
         SELECT COALESCE(b.k, n.k) AS k,
           CASE WHEN b.cents IS NULL THEN 'A'
                WHEN n.cents IS NULL THEN 'R'
                WHEN b.name IS DISTINCT FROM n.name
                  OR b.cents IS DISTINCT FROM n.cents THEN 'C' END AS op,
           b.cents AS b_cents, n.cents AS n_cents
         FROM cust b FULL OUTER JOIN nxt n ON b.k = n.k
         WHERE CASE WHEN b.cents IS NULL THEN 'A'
                    WHEN n.cents IS NULL THEN 'R'
                    WHEN b.name IS DISTINCT FROM n.name
                      OR b.cents IS DISTINCT FROM n.cents THEN 'C' END IS NOT NULL""",
    "q27_asof_price" ->
      """WITH versions AS (
           SELECT p_partkey, CAST(v.dt AS DATE) AS price_dt,
                  p_retailprice + CAST(v.off AS DOUBLE) AS price
           FROM part, (VALUES ('1993-01-01', -10.0), ('1995-01-01', 0.0),
                              ('1997-01-01', 10.0)) v(dt, off)),
         li AS (
           SELECT l_orderkey || '-' || l_linenumber AS sale_id,
                  l_partkey AS p_partkey, CAST(l_shipdate AS DATE) AS ship_dt
           FROM lineitem)
       SELECT li.p_partkey, li.ship_dt, li.sale_id, v.price
       FROM li ASOF LEFT JOIN versions v
         ON li.p_partkey = v.p_partkey AND li.ship_dt >= v.price_dt""",
    "q96_asof_native" ->
      """WITH versions AS (
           SELECT p_partkey, CAST(v.dt AS DATE) AS price_dt,
                  p_retailprice + CAST(v.off AS DOUBLE) AS price
           FROM part, (VALUES ('1993-01-01', -10.0), ('1995-01-01', 0.0),
                              ('1997-01-01', 10.0)) v(dt, off)),
         li AS (
           SELECT l_orderkey || '-' || l_linenumber AS sale_id,
                  l_partkey AS p_partkey, CAST(l_shipdate AS DATE) AS ship_dt
           FROM lineitem)
       SELECT li.p_partkey, li.ship_dt, li.sale_id, v.price
       FROM li ASOF LEFT JOIN versions v
         ON li.p_partkey = v.p_partkey AND li.ship_dt >= v.price_dt""",
    // the audited variant must produce the identical plain-join result
    "q214_audited_salted_join" ->
      """SELECT nation_key, n_name, count(*) AS n_rows,
              CAST(SUM(qty) AS DOUBLE) AS sum_qty
         FROM (SELECT CASE WHEN l_partkey % 1000 < 700 THEN CAST(0 AS BIGINT)
                           ELSE CAST(l_partkey % 25 AS BIGINT) END AS nation_key,
                      CAST(l_quantity AS DECIMAL(18,2)) AS qty
               FROM lineitem) f
         JOIN (SELECT CAST(n_nationkey AS BIGINT) AS nation_key, n_name
               FROM nation) n USING (nation_key)
         GROUP BY 1, 2""",
    "q78_salted_join" ->
      """SELECT nation_key, n_name, count(*) AS n_rows,
              CAST(SUM(qty) AS DOUBLE) AS sum_qty
         FROM (SELECT CASE WHEN l_partkey % 1000 < 700 THEN CAST(0 AS BIGINT)
                           ELSE CAST(l_partkey % 25 AS BIGINT) END AS nation_key,
                      CAST(l_quantity AS DECIMAL(18,2)) AS qty
               FROM lineitem) f
         JOIN (SELECT CAST(n_nationkey AS BIGINT) AS nation_key, n_name
               FROM nation) n USING (nation_key)
         GROUP BY 1, 2""",
    "q28_range_join" ->
      """WITH campaigns AS (
           SELECT DISTINCT DATE '1995-01-01' + CAST(n_nationkey * 40 AS INT) AS camp_start
           FROM nation),
         c2 AS (SELECT camp_start, camp_start + 90 AS camp_end,
                  CAST(date_diff('day', DATE '1970-01-01', camp_start) AS INT) AS camp_id
                FROM campaigns)
       SELECT camp_id, count(*) AS n_orders,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_total
       FROM orders JOIN c2
         ON CAST(o_orderdate AS DATE) BETWEEN camp_start AND camp_end
       GROUP BY camp_id""",
    "q162_stream_scd1" -> {
      def fold(t: String, s: String, dt: String): String = {
        val changed = s"(s.c_custkey IS NOT NULL AND (s.c_name IS DISTINCT FROM t.c_name" +
          " OR s.c_mktsegment IS DISTINCT FROM t.c_mktsegment))"
        s"""SELECT COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
           CASE WHEN t.c_custkey IS NULL OR $changed THEN s.c_name ELSE t.c_name END AS c_name,
           CASE WHEN t.c_custkey IS NULL OR $changed THEN s.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment,
           CASE WHEN t.c_custkey IS NULL THEN s.c_nationkey ELSE t.c_nationkey END AS c_nationkey,
           CASE WHEN t.c_custkey IS NULL THEN DATE '$dt' ELSE t.insert_dt END AS insert_dt,
           CASE WHEN t.c_custkey IS NULL OR $changed THEN DATE '$dt' ELSE t.update_dt END AS update_dt,
           CASE WHEN t.c_custkey IS NULL THEN 'new'
                WHEN $changed THEN 'updated' ELSE 'unchanged' END AS scd_status
         FROM $t t FULL OUTER JOIN $s s ON t.c_custkey = s.c_custkey"""
      }
      s"""WITH tgt AS (
           SELECT c_custkey, c_name, c_mktsegment, c_nationkey,
                  DATE '2024-01-01' AS insert_dt, DATE '2024-01-01' AS update_dt
           FROM customer WHERE c_custkey % 100 < 90),
         src AS (
           SELECT c_custkey, c_name,
                  CASE WHEN c_custkey % 3 = 0 THEN 'AUTOMOBILE' ELSE c_mktsegment END AS c_mktsegment,
                  c_nationkey
           FROM customer WHERE c_custkey % 7 != 0),
         s1 AS (SELECT * FROM src WHERE c_custkey % 2 = 0),
         s2 AS (SELECT * FROM src WHERE c_custkey % 2 = 1),
         f1 AS (${fold("tgt", "s1", "2024-06-01")}),
         f2 AS (${fold("f1", "s2", "2024-07-01")})
       SELECT * FROM f2"""
    },
    // The two-wave streaming SCD2 fold enumerated by row class: per
    // parity, unchanged actives pass through, changed keys split into
    // (closed old, new version) at that wave's runTs, unseeded keys
    // get a first version.
    "q213_stream_scd2" ->
      """WITH seeded AS (
           SELECT p_partkey, p_retailprice AS price
           FROM part WHERE p_partkey % 100 < 95),
         src AS (
           SELECT p_partkey, p_retailprice +
                  CASE WHEN p_partkey % 5 = 0 THEN 10.0 ELSE 0.0 END AS price
           FROM part)
       SELECT p_partkey, price, TIMESTAMP '2024-01-01 00:00:00' AS start_ts,
              TIMESTAMP '9999-12-31 00:00:00' AS end_ts, 'Y' AS is_active
       FROM seeded WHERE p_partkey % 5 != 0
       UNION ALL
       SELECT p_partkey, price, TIMESTAMP '2024-01-01 00:00:00',
              TIMESTAMP '2024-05-31 23:59:59', 'N'
       FROM seeded WHERE p_partkey % 5 = 0 AND p_partkey % 2 = 0
       UNION ALL
       SELECT p_partkey, price, TIMESTAMP '2024-01-01 00:00:00',
              TIMESTAMP '2024-06-30 23:59:59', 'N'
       FROM seeded WHERE p_partkey % 5 = 0 AND p_partkey % 2 = 1
       UNION ALL
       SELECT p_partkey, price, TIMESTAMP '2024-06-01 00:00:00',
              TIMESTAMP '9999-12-31 00:00:00', 'Y'
       FROM src WHERE p_partkey % 5 = 0 AND p_partkey % 100 < 95 AND p_partkey % 2 = 0
       UNION ALL
       SELECT p_partkey, price, TIMESTAMP '2024-07-01 00:00:00',
              TIMESTAMP '9999-12-31 00:00:00', 'Y'
       FROM src WHERE p_partkey % 5 = 0 AND p_partkey % 100 < 95 AND p_partkey % 2 = 1
       UNION ALL
       SELECT p_partkey, price, TIMESTAMP '2024-06-01 00:00:00',
              TIMESTAMP '9999-12-31 00:00:00', 'Y'
       FROM src WHERE p_partkey % 100 >= 95 AND p_partkey % 2 = 0
       UNION ALL
       SELECT p_partkey, price, TIMESTAMP '2024-07-01 00:00:00',
              TIMESTAMP '9999-12-31 00:00:00', 'Y'
       FROM src WHERE p_partkey % 100 >= 95 AND p_partkey % 2 = 1""",
    "q20_scd1_upsert" ->
      """WITH tgt AS (
           SELECT c_custkey, c_name, c_mktsegment, c_nationkey,
                  DATE '2024-01-01' AS insert_dt, DATE '2024-01-01' AS update_dt
           FROM customer WHERE c_custkey % 100 < 90),
         src AS (
           SELECT c_custkey, c_name,
                  CASE WHEN c_custkey % 3 = 0 THEN 'AUTOMOBILE' ELSE c_mktsegment END AS c_mktsegment,
                  c_nationkey
           FROM customer WHERE c_custkey % 7 != 0)
       SELECT COALESCE(t.c_custkey, s.c_custkey) AS c_custkey,
         CASE WHEN t.c_custkey IS NULL
                OR (s.c_custkey IS NOT NULL AND (s.c_name IS DISTINCT FROM t.c_name
                    OR s.c_mktsegment IS DISTINCT FROM t.c_mktsegment))
              THEN s.c_name ELSE t.c_name END AS c_name,
         CASE WHEN t.c_custkey IS NULL
                OR (s.c_custkey IS NOT NULL AND (s.c_name IS DISTINCT FROM t.c_name
                    OR s.c_mktsegment IS DISTINCT FROM t.c_mktsegment))
              THEN s.c_mktsegment ELSE t.c_mktsegment END AS c_mktsegment,
         CASE WHEN t.c_custkey IS NULL THEN s.c_nationkey ELSE t.c_nationkey END AS c_nationkey,
         CASE WHEN t.c_custkey IS NULL THEN DATE '2024-06-01' ELSE t.insert_dt END AS insert_dt,
         CASE WHEN t.c_custkey IS NULL
                OR (s.c_custkey IS NOT NULL AND (s.c_name IS DISTINCT FROM t.c_name
                    OR s.c_mktsegment IS DISTINCT FROM t.c_mktsegment))
              THEN DATE '2024-06-01' ELSE t.update_dt END AS update_dt,
         CASE WHEN t.c_custkey IS NULL THEN 'new'
              WHEN s.c_custkey IS NOT NULL AND (s.c_name IS DISTINCT FROM t.c_name
                   OR s.c_mktsegment IS DISTINCT FROM t.c_mktsegment) THEN 'updated'
              ELSE 'unchanged' END AS scd_status
       FROM tgt t FULL OUTER JOIN src s ON t.c_custkey = s.c_custkey""",
    "q21_scd2_versioning" ->
      """WITH tgt_active AS (
           SELECT p_partkey, p_retailprice AS price FROM part WHERE p_partkey % 100 < 95),
         src AS (
           SELECT p_partkey, p_retailprice +
                  CASE WHEN p_partkey % 5 = 0 THEN 10.0 ELSE 0.0 END AS price
           FROM part)
       SELECT p_partkey, p_retailprice - 5.0 AS price,
              TIMESTAMP '2023-01-01 00:00:00' AS start_ts,
              TIMESTAMP '2023-12-31 23:59:59' AS end_ts, 'N' AS is_active
       FROM part WHERE p_partkey % 100 < 5
       UNION ALL
       SELECT p_partkey, price, TIMESTAMP '2024-01-01 00:00:00',
              TIMESTAMP '9999-12-31 00:00:00', 'Y'
       FROM tgt_active WHERE p_partkey % 5 != 0
       UNION ALL
       SELECT p_partkey, price, TIMESTAMP '2024-01-01 00:00:00',
              TIMESTAMP '2024-05-31 23:59:59', 'N'
       FROM tgt_active WHERE p_partkey % 5 = 0
       UNION ALL
       SELECT p_partkey, price, TIMESTAMP '2024-06-01 00:00:00',
              TIMESTAMP '9999-12-31 00:00:00', 'Y'
       FROM src WHERE p_partkey % 5 = 0 AND p_partkey % 100 < 95
       UNION ALL
       SELECT p_partkey, price, TIMESTAMP '2024-06-01 00:00:00',
              TIMESTAMP '9999-12-31 00:00:00', 'Y'
       FROM src WHERE p_partkey % 100 >= 95""",
    "q64_dm_scd2_reversion" ->
      """SELECT p_partkey, p_retailprice AS price,
           TIMESTAMP '2024-01-01 00:00:00' AS start_ts,
           CASE WHEN p_partkey % 4 = 0 THEN TIMESTAMP '2024-05-31 23:59:59'
                ELSE TIMESTAMP '9999-12-31 00:00:00' END AS end_ts,
           CASE WHEN p_partkey % 4 = 0 THEN 'N' ELSE 'Y' END AS is_active
         FROM part
         UNION ALL
         SELECT p_partkey, p_retailprice + 7.5,
           TIMESTAMP '2024-06-01 00:00:00', TIMESTAMP '9999-12-31 00:00:00', 'Y'
         FROM part WHERE p_partkey % 4 = 0""",
    "q22_watermark_incremental" ->
      """SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
         count(*) AS n_rows,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem
         WHERE l_shipdate > (SELECT max(o_orderdate) FROM orders WHERE o_orderstatus = 'F')
         GROUP BY 1""",
    "q23_fact_load" ->
      """SELECT CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS sale_src_id,
         CAST(o_orderdate AS DATE) AS order_dt,
         COALESCE(p.p_partkey, CAST(-1 AS BIGINT)) AS part_id,
         COALESCE(sup.s_suppkey, CAST(-1 AS BIGINT)) AS supp_id,
         l_quantity AS quantity,
         CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS total_sum
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         LEFT JOIN (SELECT p_partkey FROM part WHERE p_size <= 45) p ON l_partkey = p.p_partkey
         LEFT JOIN (SELECT s_suppkey FROM supplier WHERE s_suppkey < 90) sup ON l_suppkey = sup.s_suppkey""",
    "q24_exists_semi" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         GROUP BY c_mktsegment""",
    "q25_not_exists_anti" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
         GROUP BY c_mktsegment""",
    "q26_insert_only_dim" ->
      """WITH existing AS (
           SELECT n_nationkey AS nationkey, CAST(n_nationkey + 1000 AS BIGINT) AS surr_id
           FROM nation WHERE n_nationkey < 15),
         src AS (
           SELECT c_nationkey AS nationkey FROM customer
           UNION
           SELECT s_nationkey FROM supplier),
         fresh AS (
           SELECT nationkey,
                  CAST(row_number() OVER (ORDER BY nationkey) + 1014 AS BIGINT) AS surr_id
           FROM src WHERE nationkey NOT IN (SELECT nationkey FROM existing))
       SELECT nationkey, surr_id, 'existing' AS status FROM existing
       UNION ALL
       SELECT nationkey, surr_id, 'new' AS status FROM fresh"""
  )
}
