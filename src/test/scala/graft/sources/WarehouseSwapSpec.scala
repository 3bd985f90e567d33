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

  test("a second live writer fails LOUDLY against the lease; a dead writer's stale lease is reclaimed") {
    val wh = freshWh("c")
    seed(wh)
    val fs = hfs(wh)
    val lock = new Path(wh.path("l", "t__lock"))
    // simulate a LIVE concurrent writer: fresh-mtime lock held by
    // someone else — the mutation must throw naming the conflict, not
    // interleave swaps
    val out = fs.create(lock, false)
    out.write("other-writer".getBytes("UTF-8")); out.close()
    val e = intercept[IllegalStateException] {
      wh.overwrite(Seq(("a", 0, 9L, "x")).toDF("p", "__bucket", "id", "v"),
        "l", "t"): Unit
    }
    assert(e.getMessage.contains("other-writer"))
    assert(fs.exists(lock), "the loser must not delete a live holder's lease")
    // simulate the holder DYING: no heartbeat, mtime ages past the
    // lease — the next writer reclaims and proceeds
    fs.setTimes(lock, System.currentTimeMillis() - 3600L * 1000, -1)
    wh.overwrite(Seq(("a", 0, 9L, "x")).toDF("p", "__bucket", "id", "v"),
      "l", "t"): Unit
    assert(!fs.exists(lock), "lease not released after the write")
    assert(wh.read("l", "t").count() == 1L)
  }

  test("mergePartitionDirs consolidates K partition dirs into one atomically; a crash after the marker commit replays on the next read") {
    val wh = freshWh("d")
    val df = Seq(("0", 0, 1L), ("1", 0, 2L), ("1", 1, 3L), ("2", 0, 4L))
      .toDF("w", "__bucket", "id")
    wh.overwrite(df, "l", "t", partitionBy = Seq("w", "__bucket")): Unit
    val fs = hfs(wh)
    val merged = wh.read("l", "t").where($"w" =!= "2")
      .withColumn("w", lit("1"))
    val (n, bytes) = wh.mergePartitionDirs(merged, "l", "t", "w",
      sources = Seq("0", "1"), target = "1", subPartitionBy = Seq("__bucket"))
    assert(n == 3L && bytes > 0L)
    val root = new Path(wh.path("l", "t"))
    val dirs = fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("w=")).toSet
    assert(dirs == Set("w=1", "w=2"), s"unexpected dirs: $dirs")
    assert(wh.read("l", "t").select($"id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L))
    assert(!fs.exists(new Path(wh.path("l", "t__cmerge"))))
    // CRASH WINDOW: marker committed, nothing replayed — rebuild that
    // exact state by hand (staged target + valid marker) and prove the
    // next plain read completes the merge: sources gone, staged rows
    // win, no duplicates
    val ctmp = new Path(wh.path("l", "t__ctmp"))
    wh.read("l", "t").withColumn("w", lit("2"))
      .repartition($"w", $"__bucket").write.mode("overwrite")
      .partitionBy("w", "__bucket").parquet(ctmp.toString)
    val marker = new Path(wh.path("l", "t__cmerge"))
    val mo = fs.create(marker, true)
    mo.write(Seq("w", "2", "1", "2", "#end").mkString("\n").getBytes("UTF-8"))
    mo.close()
    assert(wh.read("l", "t").select($"id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L), "replayed merge lost or duplicated rows")
    assert(!fs.exists(marker) && !fs.exists(ctmp), "replay left staging behind")
    assert(fs.listStatus(root).map(_.getPath.getName).filter(_.startsWith("w="))
      .toSet == Set("w=2"))
    // a TORN marker (no #end sentinel) must be ignored and dropped —
    // no source deletion may ever run under it
    val mo2 = fs.create(marker, true)
    mo2.write("w\n2\n1".getBytes("UTF-8")); mo2.close()
    assert(wh.read("l", "t").select($"id").as[Long].collect().toSet ==
      Set(1L, 2L, 3L, 4L))
    assert(!fs.exists(marker), "torn marker not dropped")
  }

  test("vacuumStaging reclaims a dead writer's staging + lease; overwrite() clears stale __ptmp/__ctmp itself") {
    val wh = freshWh("e")
    seed(wh)
    val fs = hfs(wh)
    // a decommissioned writer's leftovers: leaf-swap staging (which
    // taxes every read with the nested heal scan), merge staging, lease
    for (sfx <- Seq("t__tmp", "t__ptmp", "t__ctmp", "t__lock"))
      assert(fs.mkdirs(new Path(wh.path("l", sfx))))
    wh.vacuumStaging("l", "t")
    for (sfx <- Seq("t__tmp", "t__ptmp", "t__ctmp", "t__lock"))
      assert(!fs.exists(new Path(wh.path("l", sfx))), s"$sfx not reclaimed")
    assert(wh.read("l", "t").count() == 4L, "vacuum touched live data")
    // ADVICE round 14: a table whose writes are all whole-table
    // overwrites must not pay the __ptmp recover scan forever — the
    // overwrite itself clears dead staging
    assert(fs.mkdirs(new Path(wh.path("l", "t__ptmp"))))
    assert(fs.mkdirs(new Path(wh.path("l", "t__ctmp"))))
    wh.overwrite(Seq(("a", 0, 1L, "v")).toDF("p", "__bucket", "id", "v"),
      "l", "t"): Unit
    assert(!fs.exists(new Path(wh.path("l", "t__ptmp"))), "__ptmp survived overwrite")
    assert(!fs.exists(new Path(wh.path("l", "t__ctmp"))), "__ctmp survived overwrite")
  }

  test("hasSubPartition answers uniform layouts and throws on a MIXED tree instead of routing a half-blind pruned read") {
    val wh = freshWh("f")
    seed(wh)
    assert(wh.hasSubPartition("l", "t", "p", "__bucket"))
    assert(!wh.hasSubPartition("l", "t", "p", "__nope"))
    // malform: one partition dir flat (bucket dirs removed, a bare
    // file in their place) next to nested siblings
    val fs = hfs(wh)
    val pa = new Path(wh.path("l", "t"), "p=a")
    fs.delete(pa, true)
    assert(fs.mkdirs(pa))
    fs.create(new Path(pa, "orphan.parquet"), true).close()
    val e = intercept[IllegalStateException] {
      wh.hasSubPartition("l", "t", "p", "__bucket")
    }
    assert(e.getMessage.contains("mixes"))
  }
}
