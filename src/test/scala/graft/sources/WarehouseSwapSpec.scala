package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** The LEAF-level partition swap (overwritePartitions swapLeaves=true)
  * — the write-amplification bound for bucketed ingest tables: a
  * micro-batch touching one bucket of a partition must replace that
  * leaf dir alone, leaving sibling buckets' files untouched on disk
  * (a partition can hold a whole corpus slice; rewriting it per batch
  * is the write twin of the full-scan read class the bucketed layout
  * kills). Proven on REAL file metadata — part-file name sets — not
  * on row counts, which an accidental whole-partition rewrite would
  * reproduce perfectly.
  */
class WarehouseSwapSpec extends graft.SparkSpec {
  import spark.implicits._

  private def freshWh(tag: String) = new Warehouse(
    java.nio.file.Files.createTempDirectory(s"graft-swap$tag").toString, spark)

  private def hfs(wh: Warehouse) =
    new Path(wh.root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Part-file names of one leaf dir — the rewrite observable. */
  private def leafFiles(wh: Warehouse, leaf: String): Set[String] = {
    val p = new Path(wh.path("l", "t"), leaf)
    val fs = hfs(wh)
    if (!fs.exists(p)) Set.empty
    else fs.listStatus(p).filter(_.isFile).map(_.getPath.getName)
      .filter(_.endsWith(".parquet")).toSet
  }

  private def seed(wh: Warehouse): Unit = {
    val df = Seq(
      ("a", 0, 1L, "a0-old"), ("a", 1, 2L, "a1-keep"),
      ("b", 0, 3L, "b0-keep"), ("b", 1, 4L, "b1-keep"))
      .toDF("p", "__bucket", "id", "v")
    wh.overwrite(df, "l", "t", partitionBy = Seq("p", "__bucket")): Unit
  }

  test("swapLeaves replaces ONLY the touched (partition, bucket) leaves; sibling buckets' part files are untouched") {
    val wh = freshWh("a")
    seed(wh)
    val before = Map(
      "p=a/__bucket=0" -> leafFiles(wh, "p=a/__bucket=0"),
      "p=a/__bucket=1" -> leafFiles(wh, "p=a/__bucket=1"),
      "p=b/__bucket=0" -> leafFiles(wh, "p=b/__bucket=0"),
      "p=b/__bucket=1" -> leafFiles(wh, "p=b/__bucket=1"))
    assert(before.values.forall(_.nonEmpty))
    // rewrite leaf (a,0) with a replacement row + land a NEW partition
    // value (c,1) — the mkdirs path for a first-seen partition
    val batch = Seq(("a", 0, 1L, "a0-new"), ("c", 1, 9L, "c1-new"))
      .toDF("p", "__bucket", "id", "v")
    wh.overwritePartitions(batch, "l", "t", "p",
      subPartitionBy = Seq("__bucket"), swapLeaves = true): Unit
    // untouched leaves: identical part-file NAMES (a rewrite mints new
    // UUID part names — row-count equality would not catch it)
    for (leaf <- Seq("p=a/__bucket=1", "p=b/__bucket=0", "p=b/__bucket=1"))
      assert(leafFiles(wh, leaf) == before(leaf), s"$leaf was rewritten")
    // touched leaf replaced, new leaf landed, rows exactly right
    assert(leafFiles(wh, "p=a/__bucket=0") != before("p=a/__bucket=0"))
    val rows = wh.readPartitioned("l", "t", "p").select($"id", $"v")
      .as[(Long, String)].collect().toSet
    assert(rows == Set((1L, "a0-new"), (2L, "a1-keep"), (3L, "b0-keep"),
      (4L, "b1-keep"), (9L, "c1-new")))
  }

  test("leaf-swap crash window (live renamed to __old, swap unfinished) heals on the next read via the __ptmp-gated scan") {
    val wh = freshWh("b")
    seed(wh)
    val fs = hfs(wh)
    val leaf = new Path(wh.path("l", "t"), "p=a/__bucket=0")
    val old = new Path(wh.path("l", "t"), "p=a/__bucket=0__old")
    // simulate the crash between rename(live -> __old) and
    // rename(tmpLeaf -> live): live missing, backup present, and the
    // staging dir still on disk (the gate recover() keys on)
    assert(fs.rename(leaf, old))
    assert(fs.mkdirs(new Path(wh.path("l", "t__ptmp"))))
    val rows = wh.readPartitioned("l", "t", "p").select($"id").as[Long]
      .collect().toSet
    assert(rows == Set(1L, 2L, 3L, 4L), "crashed leaf swap lost rows")
    assert(fs.exists(leaf) && !fs.exists(old), "backup not swapped back")
    // a superseded backup (live present again) is dropped, not restored
    assert(fs.mkdirs(old))
    wh.read("l", "t").count(): Unit
    assert(!fs.exists(old), "superseded nested __old not dropped")
  }
}
