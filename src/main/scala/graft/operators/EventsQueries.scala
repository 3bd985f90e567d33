package graft.operators

import graft.QueryPack
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Event-stream surface, batch-equivalent form. The same logic runs as
  * Structured Streaming in [[graft.streaming.EventPipelines]] (windowed
  * aggregation with watermark, dedup-by-id, stateful sessionization);
  * these batch twins give the DuckDB oracle something to hash.
  */
object EventsQueries extends QueryPack {

  private val dec = DecimalType(18, 2)
  private val GAP_US = 30L * 60 * 1000000 // 30-min session gap

  val queries: Map[String, Q] = Map(
    // Tumbling 1-hour windowed aggregation (streaming: groupBy(window(..)))
    "q53_event_hourly" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(
          date_trunc("hour", col("ts")).cast(TimestampNTZType).as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(dec)).cast(DoubleType).as("sum_value"))
    }),

    // Exactly-once style dedup of an at-least-once (duplicated) feed
    // (streaming: dropDuplicates("event_id") under watermark).
    "q54_event_dedup" -> ((s, d) => {
      val e = Tables.events(s, d).select("event_id", "event_type")
      e.unionByName(e) // simulate duplicate delivery
        .dropDuplicates("event_id")
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_events"))
    }),

    // Stream-static dimension enrichment (streaming: the micro-batch
    // side joins a static dim snapshot — EventPipelines.enrichWithDim):
    // events resolve their user against the customer dim, unknowns get
    // the default bucket, rollup per (segment, event_type).
    "q70_event_enrich" -> ((s, d) => {
      val dim = Tables.customer(s, d).select(
        col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
      Tables.events(s, d)
        .join(dim, Seq("user_id"), "left")
        .groupBy(coalesce(col("segment"), lit("n.a.")).as("segment"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(dec)).cast(DoubleType).as("sum_value"))
    }),

    // Semi-structured props: JSON field extraction stays a codegen'd
    // expression (get_json_object), then a plain rollup — the shape of
    // every event-payload pipeline.
    "q71_json_props" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"),
          max(col("k")).as("max_k"))
    }),

    // STREAMING ingest, promoted to the correctness gate q74-style: the
    // first half of the time range is batch-bootstrapped into a
    // day-partitioned warehouse table, then the FULL feed replays
    // through Trigger.AvailableNow → foreachBatch → anti-join merge →
    // per-day atomic partition swaps. A green hash proves stream ingest
    // ≡ batch load row-for-row (the oracle aggregates the raw table):
    // already-loaded days aren't rewritten, the boundary day merges,
    // duplicate delivery dedups.
    "q77_stream_ingest" -> ((s, d) => {
      import graft.streaming.EventPipelines
      val wh = new graft.sources.Warehouse(graft.plans.EtlQueries.tmpWarehouse(), s)
      val full = Tables.events(s, d)
      val (lo, hi) = {
        val r = full.agg(min(to_date(col("ts"))), max(to_date(col("ts")))).head()
        (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate)
      }
      val cut = lo.plusDays(java.time.temporal.ChronoUnit.DAYS.between(lo, hi) / 2)
      // a feed spanning <= 2 days has nothing before the cut — skip the
      // bootstrap (a zero-file table would break the first micro-batch's
      // read) and let the stream path create the table itself
      if (cut.isAfter(lo)) {
        val boot = full.filter(to_date(col("ts")) < lit(java.sql.Date.valueOf(cut)))
        wh.overwrite(EventPipelines.withEventDay(boot), "bl_3nf", "events_stream",
          partitionBy = Seq("event_day")): Unit
      }
      // file stream sources take a directory: stream the sfDir with a
      // glob pinned to the events table
      val stream = s.readStream.schema(EventPipelines.rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(d)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      EventPipelines.ingestAvailableNow(stream, wh, "bl_3nf", "events_stream",
        keys = Seq("event_id"))
      wh.readPartitioned("bl_3nf", "events_stream", "event_day")
        .groupBy(col("event_day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(dec)).cast(DoubleType).as("sum_value"))
    }),

    // Gap-based sessionization (streaming: flatMapGroupsWithState).
    "q55_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("is_new",
          when(col("prev_us").isNull ||
            (unix_micros(col("ts")) - col("prev_us")) > GAP_US, 1).otherwise(0))
        .groupBy(col("user_id"))
        .agg(sum(col("is_new")).as("n_sessions"), count(lit(1)).as("n_events"))
    }),

    // Stream-stream interval join, batch twin (streaming:
    // EventPipelines.viewPurchaseJoin — watermarked both sides, the
    // time-range predicate bounds join state). Attribution shape: every
    // purchase within an hour of the same user's view. All time math in
    // exact microsecond longs (unix_micros ↔ epoch_us parity).
    "q95_stream_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      val views = e.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"),
          unix_micros(col("ts")).as("v_us"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"),
          unix_micros(col("ts")).as("p_us"))
      views.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("p_us") >= col("v_us") &&
          col("p_us") - col("v_us") <= 3600000000L)
        .select(col("user_id"), col("view_id"), col("purchase_id"),
          (col("p_us") - col("v_us")).as("lag_us"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "q53_event_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
         count(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q54_event_dedup" ->
      """SELECT event_type, count(*) AS n_events FROM (
           SELECT DISTINCT event_id, event_type FROM (
             SELECT event_id, event_type FROM events
             UNION ALL
             SELECT event_id, event_type FROM events))
         GROUP BY event_type""",
    "q71_json_props" ->
      """SELECT event_type, count(*) AS n_events,
         CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
         MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
         MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
         FROM events GROUP BY event_type""",
    "q70_event_enrich" ->
      """SELECT COALESCE(c.c_mktsegment, 'n.a.') AS segment, e.event_type,
         count(*) AS n_events,
         CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY 1, 2""",
    "q77_stream_ingest" ->
      """SELECT strftime(ts, '%Y%m%d') AS event_day, event_type,
         count(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q55_sessionize" ->
      """SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions,
                count(*) AS n_events
         FROM (SELECT user_id,
                 CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
                      THEN 1 ELSE 0 END AS is_new
               FROM (SELECT user_id, ts, event_id,
                       lag(epoch_us(ts)) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS prev_us
                     FROM events))
         GROUP BY user_id""",
    "q95_stream_join" ->
      """SELECT v.user_id, v.view_id, p.purchase_id, p.p_us - v.v_us AS lag_us
         FROM (SELECT event_id AS view_id, user_id, epoch_us(ts) AS v_us
               FROM events WHERE event_type = 'view') v
         JOIN (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS p_us
               FROM events WHERE event_type = 'purchase') p
           ON v.user_id = p.user_id
          AND p.p_us >= v.v_us AND p.p_us - v.v_us <= 3600000000"""
  )
}
