package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DimDatesSpec extends SparkSpec {
  import spark.implicits._

  private def attrs(day: String) =
    DimDates.generate(spark, java.sql.Date.valueOf(day), java.sql.Date.valueOf(day))
      .collect().head

  test("ISO day-of-week is Monday=1 and drives the weekend flag") {
    val mon = attrs("2024-06-03") // a Monday
    assert(mon.getAs[Int]("iso_dow") == 1 && mon.getAs[String]("is_weekend") == "N")
    val sun = attrs("2024-06-09") // a Sunday
    assert(sun.getAs[Int]("iso_dow") == 7 && sun.getAs[String]("is_weekend") == "Y")
    val sat = attrs("2024-06-08")
    assert(sat.getAs[Int]("iso_dow") == 6 && sat.getAs[String]("is_weekend") == "Y")
  }

  test("leap-year rules: div-4 yes, div-100 no, div-400 yes") {
    assert(attrs("2024-03-01").getAs[Int]("days_in_year") == 366)
    assert(attrs("1900-03-01").getAs[Int]("days_in_year") == 365) // div-100 exception
    assert(attrs("2000-03-01").getAs[Int]("days_in_year") == 366) // div-400 exception
    assert(attrs("2023-03-01").getAs[Int]("days_in_year") == 365)
  }

  test("period boundaries: month end, quarter length, week ending") {
    val d = attrs("2024-02-15")
    assert(d.getAs[java.sql.Date]("month_end").toString == "2024-02-29")
    assert(d.getAs[Int]("days_in_quarter") == 91) // leap Q1
    assert(d.getAs[java.sql.Date]("week_ending").toString == "2024-02-18") // Sunday
    val q4 = attrs("2023-11-10")
    assert(q4.getAs[Int]("days_in_quarter") == 92)
  }
}
