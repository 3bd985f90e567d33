package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Analytical query surface: the reference's three benchmark queries
  * (reference: python/dw_etl_tests.py:470-506) re-expressed over the
  * testdata star schema (orders+lineitem = fact; part/customer/nation/
  * region = dims), plus the grouped/having/conditional/top-k shapes of
  * SURVEY §2.4-§2.5.
  *
  * Numeric convention for oracle parity: monetary doubles are cast to
  * exact DecimalType at the scan, all arithmetic stays in decimal, and
  * only the final aggregate is cast to double — identical bits in Spark
  * and DuckDB regardless of summation order.
  *
  * Scale notes: dims (region, nation, part, even customer) are broadcast;
  * the only shuffles are the fact-side group-bys and the
  * lineitem⋈orders join (co-partitioned on orderkey at 100 TB via
  * bucketing; AQE handles skew locally).
  */
object AnalyticsQueries extends QueryPack {

  private val dec = DecimalType(18, 2)
  /** exact revenue: price × (1 − discount), all decimal. */
  private def revenue = (col("l_extendedprice").cast(dec) *
    (lit(1) - col("l_discount").cast(DecimalType(4, 2))))
  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"

  val queries: Map[String, Q] = Map(

    // Pearson correlation as a distributed aggregate — the missing
    // statistics primitive next to the sums/counts family: per return
    // flag, corr(quantity, extended price) from the five exact decimal
    // moment sums (Σx, Σy, Σxy, Σx², Σy²), combined in DOUBLE only at
    // the very end. One partial-agg shuffle; the moment sums are
    // associative, so map-side combine does most of the work — the
    // 100 TB shape for ANY moment statistic. Decimal accumulation
    // makes the result independent of partitioning/summation order,
    // which a naive double Σ is not.
    "q187_pearson_corr" -> ((s, d) => {
      val x = col("l_quantity").cast(dec)
      val y = col("l_extendedprice").cast(dec)
      Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
          sum(x * x).as("sxx"), sum(y * y).as("syy"))
        .select(col("l_returnflag"), col("n"),
          ((col("n").cast(DoubleType) * col("sxy").cast(DoubleType) -
            col("sx").cast(DoubleType) * col("sy").cast(DoubleType)) /
            sqrt((col("n").cast(DoubleType) * col("sxx").cast(DoubleType) -
                  col("sx").cast(DoubleType) * col("sx").cast(DoubleType)) *
                 (col("n").cast(DoubleType) * col("syy").cast(DoubleType) -
                  col("sy").cast(DoubleType) * col("sy").cast(DoubleType))))
            .as("pearson_r"))
    }),

    // Hot-join-key audit — the skew detector run BEFORE sizing a big
    // join: top-20 hottest lineitem part keys with their corpus share
    // (ppm) and a >10×-mean flag. At 100 TB this is the relation that
    // decides which keys get salted and whether AQE skew-join kicks
    // in; one partial-aggregated shuffle on the key, bounded output.
    "q172_hot_keys" -> ((s, d) => {
      val counts = Tables.lineitem(s, d)
        .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum(col("n")).as("t"), count(lit(1)).as("k"))
      counts.orderBy(col("n").desc, col("l_partkey")).limit(20)
        .crossJoin(broadcast(tot))
        .select(col("l_partkey"), col("n"),
          expr("(1000000 * n) div t").as("share_ppm"),
          (col("n") * col("k") > col("t") * 10).as("hot"))
    }),
    // A1: global fact aggregate (reference Q1, dw_etl_tests.py:470-476)
    "q01_fact_agg" -> ((s, d) => {
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast(dec)).cast(DoubleType).as("sum_qty"),
        sum(revenue).cast(DoubleType).as("sum_revenue"))
    }),

    // A5: sales by product type (reference Q2, dw_etl_tests.py:481-490)
    "q02_sales_by_type" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d).select("p_partkey", "p_type")
      // no forced broadcast: part grows with the scale factor — AQE
      // broadcasts it while it fits and falls back to shuffle when not
      li.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type"))
        .agg(
          count(lit(1)).as("n_sales"),
          sum(col("l_quantity").cast(dec)).cast(DoubleType).as("sum_qty"),
          sum(revenue).cast(DoubleType).as("sum_revenue"))
        .orderBy(col("sum_revenue").desc, col("p_type"))
    }),

    // A5: top-10 geographies by revenue (reference Q3, dw_etl_tests.py:494-506)
    "q03_top_nations" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), revenue.as("rev"))
      val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
      val c = Tables.customer(s, d).select("c_custkey", "c_nationkey")
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      // customer scales with the data — no forced broadcast (AQE
      // decides); nation/region are fixed-cardinality, hint kept
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(col("rev")).cast(DoubleType).as("sum_revenue"))
        .orderBy(col("sum_revenue").desc, col("n_name"))
        .limit(10)
    }),

    // A4: GROUP BY multi-col + HAVING (dw_etl_tests.py:436-447)
    "q04_having_groups" -> ((s, d) => {
      Tables.customer(s, d)
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("c_acctbal").cast(dec)).cast(DoubleType).as("sum_acctbal"))
        .filter(col("n_customers") >= 10)
    }),

    // A3: conditional aggregates (dw_etl_tests.py:274-281)
    "q05_conditional_agg" -> ((s, d) => {
      Tables.orders(s, d).agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).cast(LongType).as("n_finished"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).cast(LongType).as("n_open"),
        sum(when(col("o_totalprice") > 200000.0, 1).otherwise(0)).cast(LongType).as("n_large"))
    }),

    // §2.5: top-k per group via row_number window (Power BI top-10 pattern)
    "q06_topk_per_group" -> ((s, d) => {
      Relational.topKPerGroup(
        Tables.orders(s, d).select("o_orderkey", "o_orderpriority", "o_totalprice"),
        Seq("o_orderpriority"),
        Seq(col("o_totalprice").desc, col("o_orderkey")), 3)
    }),

    // A6: audit-trail style rollup over the events table as the log
    // analog (dw_etl_tests.py:554-564)
    "q07_log_rollup" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          max(col("ts").cast(DateType)).as("last_day"),
          sum(when(col("value") > 10.0, 1).otherwise(0)).cast(LongType).as("n_big"))
    }),

    // A2: MIN/MAX range derivation (watermark / date-dim auto-range input)
    "q08_minmax_range" -> ((s, d) => {
      Tables.orders(s, d).agg(
        min(col("o_orderdate").cast(DateType)).as("min_dt"),
        max(col("o_orderdate").cast(DateType)).as("max_dt"),
        countDistinct(col("o_custkey")).as("n_custs"))
    }),

    // Pivot: month × segment revenue matrix — the report-layout shape
    // every BI export needs. The pivot values are PINNED so the plan is
    // a single pass (no values-discovery job) and the output schema is
    // static — the only pivot form that scales.
    "q09_sales_pivot" -> ((s, d) => {
      val o = Tables.orders(s, d).select(
        date_format(to_date(col("o_orderdate")), "yyyyMM").as("order_month"),
        col("o_custkey").as("c_custkey"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("total"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      o.join(c, Seq("c_custkey"))
        .groupBy(col("order_month"))
        .pivot("c_mktsegment",
          Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
        .agg(sum(col("total")).cast(DoubleType))
    }),

    // §2.5 range-frame window: per-nation daily revenue with a 7-day
    // rolling sum (RANGE, so missing days shrink the window rather than
    // silently widening it the way a 7-ROW frame would) and the
    // previous-active-day revenue via lag. Money is quantized to cent
    // longs BEFORE the windows so every rolling sum is exact integer
    // arithmetic — order-independent across engines. Scale: the window
    // partitions by nation key, so state per task is one nation's
    // day-series — no global sort anywhere.
    "q93_rolling_revenue" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val o = Tables.orders(s, d).select(
        col("o_custkey"),
        to_date(col("o_orderdate")).as("dt"),
        (col("o_totalprice").cast(dec) * 100).cast(LongType).as("cents"))
      val c = Tables.customer(s, d).select(
        col("c_custkey").as("o_custkey"), col("c_nationkey"))
      val daily = o.join(broadcast(c), Seq("o_custkey"))
        .groupBy(col("c_nationkey"), col("dt"))
        .agg(sum(col("cents")).as("rev_cents"), count(lit(1)).as("n_orders"))
      val rolling = Window.partitionBy(col("c_nationkey"))
        .orderBy(datediff(col("dt"), lit("1992-01-01")))
        .rangeBetween(-6, Window.currentRow)
      val byDay = Window.partitionBy(col("c_nationkey")).orderBy(col("dt"))
      daily.select(
        col("c_nationkey"), col("dt"), col("rev_cents"), col("n_orders"),
        sum(col("rev_cents")).over(rolling).as("rev_7d_cents"),
        coalesce(lag(col("rev_cents"), 1).over(byDay), lit(0L)).as("prev_day_cents"))
    }),

    // The last BI-parity composition (reference: PowerBI_Report/
    // readme.md:60,66 — the "Top 10 products" overview chart whose
    // custom tooltip shows each product's weekly order trend): weekly
    // per-product distinct-order counts and revenue, a trailing-4-week
    // revenue frame per product (RANGE over the week date — q93's
    // device at week grain, so a product's gap weeks SHRINK the frame
    // instead of a 4-ROW frame silently widening it), and the per-week
    // top-10 revenue rank (q06's device) — one relation serving both
    // the chart (rank filter) and its tooltip (the trend columns).
    // Revenue is quantized to cent longs before any window → exact
    // integer arithmetic, order-independent across engines. Scale: one
    // (product, week) partial-agg shuffle; both windows partition by
    // bounded keys (a product's weeks / a week's products), no global
    // sort anywhere.
    "q256_weekly_product_trend" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val weekly = Tables.lineitem(s, d).select(
          col("l_partkey").cast(LongType).as("product_id"),
          date_trunc("week", to_date(col("l_shipdate"))).cast(DateType).as("wk"),
          col("l_orderkey"),
          (col("l_extendedprice").cast(dec) * 100).cast(LongType).as("cents"))
        .groupBy(col("product_id"), col("wk"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
          sum(col("cents")).as("rev_cents"))
      val trail = Window.partitionBy(col("product_id"))
        .orderBy(datediff(col("wk"), lit("1992-01-01")))
        .rangeBetween(-21, Window.currentRow)
      val rankW = Window.partitionBy(col("wk"))
        .orderBy(col("rev_cents").desc, col("product_id"))
      weekly
        .withColumn("rev_4w_cents", sum(col("rev_cents")).over(trail))
        .withColumn("rank_in_week", row_number().over(rankW).cast(IntegerType))
        .filter(col("rank_in_week") <= 10)
        .select(col("wk"), col("product_id"), col("n_orders"),
          col("rev_cents"), col("rev_4w_cents"), col("rank_in_week"))
    }),

    // §2.4 grouping-sets, CUBE form — completes the family next to
    // ROLLUP (q73) and PIVOT (q09): every (priority, year) cell plus
    // both one-dimension margins plus the grand total in ONE pass.
    // Catalyst plans Expand + a single partial-aggregated shuffle, so
    // the 4 grouping sets cost one scan, not four.
    "q100_sales_cube" -> ((s, d) => {
      Tables.orders(s, d).select(
          col("o_orderpriority").as("priority"),
          year(col("o_orderdate")).as("yr"),
          col("o_totalprice").cast(dec).as("total"))
        .cube(col("priority"), col("yr"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("total")).cast(DoubleType).as("revenue"))
    }),

    // Incremental aggregate maintenance (materialized-view pattern): a
    // monthly sales summary kept current by RE-AGGREGATING stored
    // partials with the delta's partials — count/sum partials are
    // mergeable, and decimal addition is associative, so the merged
    // summary equals the full recompute bit-for-bit (the oracle IS the
    // full recompute). Here the stored summary is simulated by
    // aggregating the pre-watermark slice; in the warehouse it would be
    // read back as k rows. At 100 TB the payoff is the whole point:
    // refresh cost is O(delta + summary), never a rescan of history —
    // the same economics as loadFactIncremental's partition-wise swap
    // but for the aggregate layer.
    "q107_incremental_agg" -> ((s, d) => {
      val wm = lit(java.sql.Date.valueOf("1997-06-01"))
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(date_format(col("l_shipdate"), "yyyyMM").as("ship_month"),
            col("l_returnflag"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("l_quantity").cast(dec)).as("sum_qty"),
            sum(revenue).as("sum_revenue"))
      val li = Tables.lineitem(s, d)
      val base = partial(li.filter(col("l_shipdate") <= wm))
      val delta = partial(li.filter(col("l_shipdate") > wm))
      base.unionByName(delta)
        .groupBy(col("ship_month"), col("l_returnflag"))
        .agg(sum(col("n_rows")).as("n_rows"),
          sum(col("sum_qty")).cast(DoubleType).as("sum_qty"),
          sum(col("sum_revenue")).cast(DoubleType).as("sum_revenue"))
    }),

    // k-anonymity audit (k=5) — the privacy gate a warehouse runs
    // before releasing a dimension or a training extract: every
    // quasi-identifier combination (nation × segment × $1000 balance
    // band) whose group holds fewer than k individuals re-identifies
    // them; the audit emits each QI cell with its size and an at_risk
    // flag so a release job can suppress or generalize flagged cells.
    // Complements q87's direct-identifier PII redaction: that removes
    // identifiers, this measures what the REMAINING attributes still
    // leak. 100 TB shape: one partial-agg group-by at scan speed — QI
    // cardinality (≪ rows) bounds the shuffle; banding uses one IEEE
    // floor both engines compute bit-identically.
    "q209_k_anonymity" -> ((s, d) => {
      Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000.0).cast(IntegerType).as("bal_kbucket"))
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_kbucket"))
        .agg(count(lit(1)).as("n_rows"))
        .withColumn("at_risk", col("n_rows") < 5)
    }),

    // Keyed pseudonymization with referential integrity — the privacy
    // verb between q87's redaction (destroy) and q210's suppression
    // (generalize): replace the direct identifier with a salted
    // deterministic pseudonym so released tables still JOIN, without
    // exposing the key. Both release sides map c/o_custkey through the
    // same salted hash; the query then joins customers⋈orders ON THE
    // PSEUDONYM and aggregates per nation — while the oracle computes
    // the same rollup joining the RAW keys. A green hash therefore
    // proves the pseudonym join is exactly the key join (injective on
    // this corpus — any collision would misroute an order and break
    // the hash). Scan + hash projection per side, one equi-join on the
    // pseudonym: the released-data join cost equals the raw join cost.
    "q231_pseudonymize" -> ((s, d) => {
      def pseud(c: org.apache.spark.sql.Column) =
        md5(concat(lit("pseud1-"), c.cast(StringType)))
      val cust = Tables.customer(s, d)
        .select(pseud(col("c_custkey")).as("pid"), col("c_nationkey"))
      val ord = Tables.orders(s, d)
        .select(pseud(col("o_custkey")).as("pid"), col("o_totalprice"))
      cust.join(ord, Seq("pid"), "left")
        .groupBy(col("c_nationkey"))
        .agg(count_distinct(col("pid")).as("n_customers"),
          count(col("o_totalprice")).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("sum_price"))
    }),

    // l-diversity audit — k-anonymity's (q209) stronger sibling: a
    // ≥ k cell whose members all share one SENSITIVE value still leaks
    // it (the homogeneity attack k-anonymity cannot see), so each
    // quasi-identifier cell must also carry ≥ l distinct sensitive
    // values. QI here is (nation, $1000 balance band); the sensitive
    // attribute is the market segment — deliberately EXCLUDED from the
    // QI, unlike q209 where it is part of it. Same scale shape as the
    // k-audit: one partial-agg group-by with a count-distinct, QI
    // cardinality bounds the shuffle.
    "q229_l_diversity" -> ((s, d) => {
      Tables.customer(s, d)
        .select(col("c_nationkey"),
          floor(col("c_acctbal") / 1000.0).cast(IntegerType).as("bal_kbucket"),
          col("c_mktsegment"))
        .groupBy(col("c_nationkey"), col("bal_kbucket"))
        .agg(count(lit(1)).as("n_rows"),
          count_distinct(col("c_mktsegment")).as("n_sensitive"))
        .withColumn("l_ok", col("n_sensitive") >= 3)
    }),

    // Anonymized release extract — q209's audit ENFORCED: rows in
    // at-risk QI cells ship with the balance band suppressed (NULL —
    // generalize-to-coarser, the standard k-anonymization move), so
    // every surviving non-NULL band sits in a cell of ≥ k individuals.
    // The release carries NO direct identifier and NO per-row
    // suppression flag: shipping c_custkey next to the QI band would
    // re-identify the very rows the gate protects, and a suppressed
    // flag would disclose that a row's cell holds < k members — the
    // cell-size evidence lives in q209 (the audit), never in the
    // released rows, which stay an anonymous one-row-per-individual
    // multiset. The audit→enforcement pair mirrors q41 score →
    // q94 gate. Shape: the cell-size relation is QI-cardinality-
    // bounded (broadcast); the release is one scan + one broadcast
    // equi-join — no second pass over the fact-sized side.
    "q210_anon_release" -> ((s, d) => {
      val banded = Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000.0).cast(IntegerType).as("bal_kbucket"))
      val cells = banded
        .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_kbucket"))
        .agg(count(lit(1)).as("n_rows"))
      banded.join(broadcast(cells),
          Seq("c_nationkey", "c_mktsegment", "bal_kbucket"))
        .select(col("c_nationkey"), col("c_mktsegment"),
          when(col("n_rows") >= 5, col("bal_kbucket")).as("bal_kbucket"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q187_pearson_corr" ->
      """WITH m AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         |  sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
         |  sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
         |  sum(CAST(l_quantity AS DECIMAL(18,2)) *
         |      CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
         |  sum(CAST(l_quantity AS DECIMAL(18,2)) *
         |      CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
         |  sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
         |      CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
         |FROM lineitem GROUP BY 1)
         |SELECT l_returnflag, n,
         |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
         |   CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
         |  sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
         |        CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
         |       (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
         |        CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS pearson_r
         |FROM m""".stripMargin,
    "q172_hot_keys" ->
      """WITH c AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n
         |           FROM lineitem GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t,
         |               CAST(count(*) AS BIGINT) AS k FROM c)
         |SELECT l_partkey, n, (1000000 * n) // t AS share_ppm,
         |       n * k > 10 * t AS hot
         |FROM c, tot
         |ORDER BY n DESC, l_partkey LIMIT 20""".stripMargin,
    "q107_incremental_agg" ->
      s"""SELECT strftime(l_shipdate, '%Y%m') AS ship_month, l_returnflag,
         count(*) AS n_rows,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM($revenueSql) AS DOUBLE) AS sum_revenue
         FROM lineitem GROUP BY 1, 2""",
    "q100_sales_cube" ->
      """SELECT o_orderpriority AS priority, CAST(year(o_orderdate) AS INT) AS yr,
         count(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM orders GROUP BY CUBE (priority, yr)""",
    "q93_rolling_revenue" ->
      """WITH daily AS (
           SELECT c_nationkey, CAST(o_orderdate AS DATE) AS dt,
                  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
                    AS rev_cents,
                  count(*) AS n_orders
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2)
         SELECT c_nationkey, dt, rev_cents, n_orders,
           CAST(SUM(rev_cents) OVER (PARTITION BY c_nationkey ORDER BY dt
                RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS BIGINT)
             AS rev_7d_cents,
           COALESCE(LAG(rev_cents, 1) OVER (PARTITION BY c_nationkey ORDER BY dt), 0)
             AS prev_day_cents
         FROM daily""",
    "q256_weekly_product_trend" ->
      """WITH weekly AS (
           SELECT CAST(l_partkey AS BIGINT) AS product_id,
                  CAST(date_trunc('week', CAST(l_shipdate AS DATE)) AS DATE) AS wk,
                  count(DISTINCT l_orderkey) AS n_orders,
                  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
                    AS rev_cents
           FROM lineitem GROUP BY 1, 2),
         t AS (
           SELECT product_id, wk, n_orders, rev_cents,
                  CAST(SUM(rev_cents) OVER (PARTITION BY product_id ORDER BY wk
                       RANGE BETWEEN INTERVAL 21 DAY PRECEDING AND CURRENT ROW) AS BIGINT)
                    AS rev_4w_cents,
                  CAST(row_number() OVER (PARTITION BY wk
                       ORDER BY rev_cents DESC, product_id) AS INT) AS rank_in_week
           FROM weekly)
         SELECT wk, product_id, n_orders, rev_cents, rev_4w_cents, rank_in_week
         FROM t WHERE rank_in_week <= 10""",
    "q09_sales_pivot" -> {
      val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
      val cols = segs.map(g =>
        s"CAST(SUM(CASE WHEN c_mktsegment = '$g' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS $g"
      ).mkString(",\n         ")
      s"""SELECT strftime(CAST(o_orderdate AS DATE), '%Y%m') AS order_month,
         $cols
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1"""
    },
    "q01_fact_agg" ->
      s"""SELECT count(*) AS n_rows,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM($revenueSql) AS DOUBLE) AS sum_revenue
         FROM lineitem""",
    "q02_sales_by_type" ->
      s"""SELECT p_type, count(*) AS n_sales,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM($revenueSql) AS DOUBLE) AS sum_revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_type ORDER BY sum_revenue DESC, p_type""",
    "q03_top_nations" ->
      s"""SELECT r_name, n_name, CAST(SUM($revenueSql) AS DOUBLE) AS sum_revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name
         ORDER BY sum_revenue DESC, n_name LIMIT 10""",
    "q04_having_groups" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS n_customers,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
         FROM customer GROUP BY c_nationkey, c_mktsegment
         HAVING count(*) >= 10""",
    "q05_conditional_agg" ->
      """SELECT count(*) AS n_orders,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
         CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
         CAST(SUM(CASE WHEN o_totalprice > 200000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_large
         FROM orders""",
    "q06_topk_per_group" ->
      """SELECT * FROM (
           SELECT o_orderkey, o_orderpriority, o_totalprice,
                  CAST(row_number() OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
           FROM orders) t WHERE rn <= 3""",
    "q07_log_rollup" ->
      """SELECT event_type, count(*) AS n_events,
         CAST(max(ts) AS DATE) AS last_day,
         CAST(SUM(CASE WHEN value > 10.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_big
         FROM events GROUP BY event_type""",
    "q08_minmax_range" ->
      """SELECT CAST(min(o_orderdate) AS DATE) AS min_dt,
         CAST(max(o_orderdate) AS DATE) AS max_dt,
         count(DISTINCT o_custkey) AS n_custs
         FROM orders""",
    "q209_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
         CAST(floor(c_acctbal / 1000.0) AS INT) AS bal_kbucket,
         count(*) AS n_rows, count(*) < 5 AS at_risk
         FROM customer GROUP BY 1, 2, 3""",
    // Ground truth joins the RAW keys: a hash match proves the
    // pseudonym join (Spark side) routed every order identically.
    "q231_pseudonymize" ->
      """SELECT c_nationkey,
         count(DISTINCT c_custkey) AS n_customers,
         count(o_totalprice) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         GROUP BY 1""",
    "q229_l_diversity" ->
      """SELECT c_nationkey,
         CAST(floor(c_acctbal / 1000.0) AS INT) AS bal_kbucket,
         count(*) AS n_rows,
         count(DISTINCT c_mktsegment) AS n_sensitive,
         count(DISTINCT c_mktsegment) >= 3 AS l_ok
         FROM customer GROUP BY 1, 2""",
    "q210_anon_release" ->
      """WITH banded AS (SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000.0) AS INT) AS bal_kbucket
           FROM customer),
         cells AS (SELECT c_nationkey, c_mktsegment, bal_kbucket,
             count(*) AS n_rows
           FROM banded GROUP BY 1, 2, 3)
         SELECT b.c_nationkey, b.c_mktsegment,
           CASE WHEN c.n_rows >= 5 THEN b.bal_kbucket END AS bal_kbucket
         FROM banded b
         JOIN cells c USING (c_nationkey, c_mktsegment, bal_kbucket)"""
  )
}
