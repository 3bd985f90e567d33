package graft.operators

import graft.QueryPack
import graft.sources.Tables

/** Query-surface wrapper for the date dimension (SURVEY §2.8). */
object DatesQueries extends QueryPack {

  val queries: Map[String, Q] = Map(
    // G1+G2+G3: auto-ranged date series (±1 month around the fact dates)
    // with the reference's 17 calendar attributes.
    "q30_dim_dates" -> ((s, d) =>
      DimDates.autoRanged(s, Tables.orders(s, d), "o_orderdate"))
  )

  val oracleSql: Map[String, String] = Map(
    "q30_dim_dates" ->
      """WITH rng AS (
           SELECT CAST(CAST(min(o_orderdate) AS DATE) - INTERVAL 1 MONTH AS DATE) AS mn,
                  CAST(CAST(max(o_orderdate) AS DATE) + INTERVAL 1 MONTH AS DATE) AS mx
           FROM orders),
         series AS (
           SELECT CAST(unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS date_id
           FROM rng)
       SELECT date_id,
         CAST(day(date_id) AS INT) AS day_num,
         dayname(date_id) AS day_name,
         CAST(isodow(date_id) AS INT) AS iso_dow,
         CASE WHEN isodow(date_id) >= 6 THEN 'Y' ELSE 'N' END AS is_weekend,
         CAST(weekofyear(date_id) AS INT) AS week_num,
         date_id + CAST(7 - isodow(date_id) AS INT) AS week_ending,
         CAST(month(date_id) AS INT) AS month_num,
         monthname(date_id) AS month_name,
         CAST(date_trunc('month', date_id) AS DATE) AS month_start,
         last_day(date_id) AS month_end,
         CAST(quarter(date_id) AS INT) AS quarter_num,
         CAST(date_trunc('quarter', date_id) AS DATE) AS quarter_start,
         CAST(date_diff('day', CAST(date_trunc('quarter', date_id) AS DATE),
              CAST(date_trunc('quarter', date_id) AS DATE) + INTERVAL 3 MONTH) AS INT) AS days_in_quarter,
         CAST(year(date_id) AS INT) AS year_num,
         CAST(date_trunc('year', date_id) AS DATE) AS year_start,
         CAST(CAST(date_trunc('year', date_id) AS DATE) + INTERVAL 1 YEAR - INTERVAL 1 DAY AS DATE) AS year_end,
         CASE WHEN (year(date_id) % 4 = 0 AND year(date_id) % 100 != 0)
                   OR year(date_id) % 400 = 0 THEN 366 ELSE 365 END AS days_in_year
       FROM series"""
  )
}
