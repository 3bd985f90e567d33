package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def runDt = lit("2024-06-01").cast("date")

  test("scd1Merge classifies new/updated/unchanged and keeps untracked cols") {
    val target = Seq((1L, "Alice", "A", 10L), (2L, "Bob", "B", 20L))
      .toDF("id", "name", "seg", "geo")
      .withColumn("insert_dt", lit("2024-01-01").cast("date"))
      .withColumn("update_dt", lit("2024-01-01").cast("date"))
    val source = Seq((2L, "Bob", "Z", 99L), (3L, "Cara", "C", 30L))
      .toDF("id", "name", "seg", "geo")

    val out = Scd.scd1Merge(target, source, Seq("id"), Seq("name", "seg"), runDt)
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getAs[String]("scd_status") == "unchanged")
    assert(out(2L).getAs[String]("scd_status") == "updated")
    assert(out(2L).getAs[String]("seg") == "Z")
    assert(out(2L).getAs[Long]("geo") == 20L)  // untracked: never updated
    assert(out(2L).getAs[java.sql.Date]("update_dt").toString == "2024-06-01")
    assert(out(2L).getAs[java.sql.Date]("insert_dt").toString == "2024-01-01")
    assert(out(3L).getAs[String]("scd_status") == "new")
    assert(out(3L).getAs[Long]("geo") == 30L)
  }

  test("scd1Merge is idempotent: re-merge of same source is all unchanged/new-less") {
    val target = Seq((1L, "Alice", "A", 10L)).toDF("id", "name", "seg", "geo")
      .withColumn("insert_dt", lit("2024-01-01").cast("date"))
      .withColumn("update_dt", lit("2024-01-01").cast("date"))
    val source = Seq((1L, "Alice", "A", 10L)).toDF("id", "name", "seg", "geo")
    val once = Scd.scd1Merge(target, source, Seq("id"), Seq("name", "seg"), runDt)
    assert(once.filter($"scd_status" =!= "unchanged").count() == 0)
  }

  test("scd2Merge closes changed versions and opens new ones exactly once") {
    val ts0 = lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    val far = lit("9999-12-31 00:00:00").cast("timestamp_ntz")
    val runTs = lit("2024-06-01 00:00:00").cast("timestamp_ntz")
    val target = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "price")
      .withColumn("start_ts", ts0).withColumn("end_ts", far)
      .withColumn("is_active", lit("Y"))
    val source = Seq((1L, 10.0), (2L, 25.0), (3L, 30.0)).toDF("id", "price")

    val v1 = Scd.scd2Merge(target, source, Seq("id"), Seq("price"), runTs, far)
    val rows = v1.orderBy($"id", $"start_ts").collect()
    // id=1 unchanged: 1 row; id=2 changed: closed + new; id=3 new: 1 row
    assert(rows.length == 4)
    val id2 = rows.filter(_.getLong(0) == 2L)
    assert(id2.map(_.getAs[String]("is_active")).sorted.sameElements(Array("N", "Y")))
    val closed = id2.find(_.getAs[String]("is_active") == "N").get
    assert(closed.getAs[java.time.LocalDateTime]("end_ts").toString == "2024-05-31T23:59:59")
    assert(id2.find(_.getAs[String]("is_active") == "Y").get.getDouble(1) == 25.0)

    // idempotency: merging the same source again changes nothing
    val v2 = Scd.scd2Merge(v1, source, Seq("id"), Seq("price"), runTs, far)
    assert(v2.count() == v1.count())
    assert(v2.exceptAll(v1).isEmpty)
  }

  test("scd2Merge detects change on ANY tracked column, not just the first") {
    val ts0 = lit("2024-01-01 00:00:00").cast("timestamp_ntz")
    val far = lit("9999-12-31 00:00:00").cast("timestamp_ntz")
    val runTs = lit("2024-06-01 00:00:00").cast("timestamp_ntz")
    val target = Seq((1L, 10.0, "a"), (2L, 20.0, "b")).toDF("id", "price", "cat")
      .withColumn("start_ts", ts0).withColumn("end_ts", far)
      .withColumn("is_active", lit("Y"))
    // id=1: only the SECOND tracked column changes; id=2: untouched
    val source = Seq((1L, 10.0, "z"), (2L, 20.0, "b")).toDF("id", "price", "cat")
    val out = Scd.scd2Merge(target, source, Seq("id"), Seq("price", "cat"), runTs, far)
    assert(out.filter($"id" === 1L).count() == 2)
    assert(out.filter($"id" === 1L && $"is_active" === "Y")
      .select($"cat").as[String].head() == "z")
    assert(out.filter($"id" === 2L).count() == 1)
  }

  test("surrogate keys are dense and collision-free") {
    val dim = Seq("c", "a", "b").toDF("k")
    val withIds = Relational.surrogateKeys(dim, "k", 100L, "id")
    assert(withIds.orderBy("id").as[(String, Long)].collect()
      .sameElements(Array(("a", 101L), ("b", 102L), ("c", 103L))))
    val hashed = Relational.surrogateKeysHashed(
      spark.range(100000).toDF("k"), Seq("k"), "id")
    assert(hashed.select("id").distinct().count() == 100000)
  }
}
