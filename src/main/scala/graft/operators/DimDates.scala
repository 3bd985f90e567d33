package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Date dimension generator (SURVEY §2.8 G1-G3).
  *
  * The reference builds this with a recursive CTE plus 37 lines of
  * per-date attribute derivation
  * (reference: sql/dimensional/load_dim_dates_dimension.sql:30-73) and an
  * auto-ranging wrapper that pads [min, max] of the fact dates by one
  * month on each side (:226-251). Spark needs no recursion:
  * `sequence(start, end, interval 1 day)` + explode is a single
  * codegen'd projection.
  *
  * Pitfall F12: Spark's `dayofweek` is Sunday=1; the reference uses ISO
  * (Monday=1) for both the number and the weekend flag — we derive
  * `weekday()+1`.
  */
object DimDates {

  /** G1+G2: every date in [start, end] with calendar attributes. */
  def generate(spark: SparkSession, start: java.sql.Date, end: java.sql.Date): DataFrame = {
    val series = spark.range(1).select(
      explode(sequence(lit(start), lit(end), expr("INTERVAL 1 DAY"))).as("date_id"))
    withCalendarAttributes(series)
  }

  /** G3: auto-ranged — [min(dtCol) − 1 month, max(dtCol) + 1 month]. */
  def autoRanged(spark: SparkSession, fact: DataFrame, dtCol: String): DataFrame = {
    val row = fact.agg(
      add_months(min(col(dtCol)).cast(DateType), -1),
      add_months(max(col(dtCol)).cast(DateType), 1)).head()
    generate(spark, row.getDate(0), row.getDate(1))
  }

  /** The 17 calendar attributes of the reference's dim_dates. */
  def withCalendarAttributes(series: DataFrame): DataFrame = {
    val d = col("date_id")
    val isoDow = weekday(d) + 1
    val leap = (year(d) % 4 === 0 && year(d) % 100 =!= 0) || year(d) % 400 === 0
    val qStart = trunc(d, "quarter")
    val yStart = trunc(d, "year")
    series.select(
      d,
      dayofmonth(d).as("day_num"),
      date_format(d, "EEEE").as("day_name"),
      isoDow.as("iso_dow"),
      when(isoDow >= 6, "Y").otherwise("N").as("is_weekend"),
      weekofyear(d).as("week_num"),
      date_add(d, lit(7) - isoDow).as("week_ending"),
      month(d).as("month_num"),
      date_format(d, "MMMM").as("month_name"),
      trunc(d, "month").as("month_start"),
      last_day(d).as("month_end"),
      quarter(d).as("quarter_num"),
      qStart.as("quarter_start"),
      datediff(add_months(qStart, 3), qStart).as("days_in_quarter"),
      year(d).as("year_num"),
      yStart.as("year_start"),
      date_sub(add_months(yStart, 12), 1).as("year_end"),
      when(leap, 366).otherwise(365).as("days_in_year"))
  }
}
