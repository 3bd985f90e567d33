package graft.operators

import graft.SparkSpec
import graft.sources.Warehouse
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("newerThanWatermark keeps strictly newer rows; empty target passes all") {
    val target = Seq(("2024-01-01"), ("2024-02-01")).toDF("dt")
      .select($"dt".cast("date"))
    val src = Seq("2024-01-15", "2024-02-01", "2024-02-02").toDF("dt")
      .select($"dt".cast("date"))
    assert(Relational.newerThanWatermark(src, target, "dt").count() == 1)
    assert(Relational.newerThanWatermark(src, target.limit(0), "dt").count() == 3)
  }

  test("unionDistinct has PostgreSQL UNION semantics") {
    val a = Seq(1, 2, 2).toDF("x")
    val b = Seq(2, 3).toDF("x")
    assert(Relational.unionDistinct(a, b).as[Int].collect().sorted.sameElements(Array(1, 2, 3)))
  }

  test("topKPerGroup is deterministic under ties") {
    val df = Seq(("a", 10, 1), ("a", 10, 2), ("a", 5, 3), ("b", 7, 4)).toDF("g", "m", "id")
    val top = Relational.topKPerGroup(df, Seq("g"), Seq($"m".desc, $"id"), 1)
      .select($"g", $"id").as[(String, Int)].collect().toMap
    assert(top("a") == 1 && top("b") == 4)
  }

  test("staging clean casts all to string and dedups") {
    val df = Seq((1, 2.5), (1, 2.5), (2, 3.0)).toDF("k", "v")
    val out = Staging.clean(df, Seq("k", "v"))
    assert(out.schema.fields.forall(_.dataType.typeName == "string"))
    assert(out.count() == 2)
  }

  test("antiJoinAppend is idempotent and appends only new keys") {
    val target = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val src = Seq((2, "zzz"), (3, "c")).toDF("k", "v")
    val once = Staging.antiJoinAppend(src, target, Seq("k"))
    assert(once.count() == 3)
    // existing key 2 keeps target's value (insert-only, never update)
    assert(once.filter($"k" === 2).select($"v").as[String].head() == "b")
    val twice = Staging.antiJoinAppend(src, once, Seq("k"))
    assert(twice.exceptAll(once).isEmpty)
  }

  test("dedupFirstWins picks one deterministic row per key") {
    val df = Seq((1, "x", 5), (1, "y", 9), (2, "z", 1)).toDF("k", "v", "p")
    val out = Staging.dedupFirstWins(df, Seq("k"), Seq($"p".desc))
    assert(out.count() == 2)
    assert(out.filter($"k" === 1).select($"v").as[String].head() == "y")
  }

  test("warehouse overwrite is an atomic swap and survives re-read") {
    val root = java.nio.file.Files.createTempDirectory("graft-whspec").toString
    val wh = new Warehouse(root, spark)
    assert(!wh.exists("l", "t"))
    assert(wh.overwrite(Seq(1, 2, 3).toDF("x"), "l", "t") == 3)
    assert(wh.exists("l", "t"))
    assert(wh.overwrite(Seq(4).toDF("x"), "l", "t") == 1)
    assert(wh.read("l", "t").as[Int].collect().sameElements(Array(4)))
  }

  test("versioned snapshots: isolation, latest pointer, vacuum retention") {
    val root = java.nio.file.Files.createTempDirectory("graft-verspec").toString
    val wh = new Warehouse(root, spark)
    assert(wh.latestVersion("l", "t").isEmpty)
    assert(wh.writeVersion(Seq(1, 2).toDF("x"), "l", "t") == 1)
    assert(wh.writeVersion(Seq(3).toDF("x"), "l", "t") == 2)
    assert(wh.writeVersion(Seq(4, 5, 6).toDF("x"), "l", "t") == 3)
    assert(wh.latestVersion("l", "t").contains(3))
    // as-of read of v1 is untouched by later commits (snapshot isolation)
    assert(wh.readVersion("l", "t", 1).as[Int].collect().sorted.sameElements(Array(1, 2)))
    // vacuum keeps the newest `keep`, reports what it dropped; the live
    // snapshot is never vacuumable (guards version-number reuse too)
    assert(intercept[IllegalArgumentException](
      wh.vacuumVersions("l", "t", keep = 0)).getMessage.contains("live snapshot"))
    assert(wh.vacuumVersions("l", "t", keep = 2) == Seq(1))
    assert(intercept[IllegalArgumentException](
      wh.readVersion("l", "t", 1)).getMessage.contains("no committed version"))
    assert(wh.readVersion("l", "t", 3).as[Int].collect().sorted.sameElements(Array(4, 5, 6)))
    // version numbers never reuse a vacuumed slot
    assert(wh.writeVersion(Seq(7).toDF("x"), "l", "t") == 4)
  }

  test("writeVersion never clobbers a committed slot; torn leftovers are reclaimed") {
    val root = java.nio.file.Files.createTempDirectory("graft-verclobber").toString
    val wh = new Warehouse(root, spark)
    assert(wh.writeVersion(Seq(1).toDF("x"), "l", "t") == 1)
    // a foreign writer lands a COMMITTED v=2 out-of-band (the
    // concurrent-duplicate-writer shape): our next write must advance
    // past it, leaving its content untouched
    Seq(42).toDF("x").write.parquet(s"$root/l/t__versions/v=2")
    assert(wh.writeVersion(Seq(3).toDF("x"), "l", "t") == 3)
    assert(wh.readVersion("l", "t", 2).as[Int].collect().sameElements(Array(42)))
    assert(wh.readVersion("l", "t", 3).as[Int].collect().sameElements(Array(3)))
    // a TORN write (no _SUCCESS) at the next slot is invisible to
    // readers and safe to reclaim — numbering does not skip it
    val torn = new java.io.File(s"$root/l/t__versions/v=4")
    assert(torn.mkdirs())
    java.nio.file.Files.writeString(torn.toPath.resolve("part-junk.parquet"), "torn"): Unit
    assert(wh.latestVersion("l", "t").contains(3)) // torn slot not visible
    assert(wh.writeVersion(Seq(5).toDF("x"), "l", "t") == 4)
    assert(wh.readVersion("l", "t", 4).as[Int].collect().sameElements(Array(5)))
  }

  test("warehouse compact collapses small files without changing a row") {
    val root = java.nio.file.Files.createTempDirectory("graft-whspec").toString
    val wh = new Warehouse(root, spark)
    wh.overwrite((1 to 1000).toDF("x").repartition(16), "l", "frag")
    def files() = new java.io.File(s"$root/l/frag").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files() == 16)
    assert(wh.compact("l", "frag") == 1000)
    assert(files() == 1)
    assert(wh.read("l", "frag").as[Int].collect().sorted.sameElements(1 to 1000))
    // partitioned variant: one file per partition dir afterwards
    val parted = (1 to 100).map(i => (i, (i % 3).toString)).toDF("x", "p")
    wh.overwrite(parted.repartition(8), "l", "pfrag", partitionBy = Seq("p"))
    assert(wh.compact("l", "pfrag", partCol = Some("p")) == 100)
    val dirs = new java.io.File(s"$root/l/pfrag").listFiles().filter(_.isDirectory)
    assert(dirs.nonEmpty && dirs.forall(d =>
      d.listFiles().count(_.getName.endsWith(".parquet")) == 1))
    assert(wh.readPartitioned("l", "pfrag", "p").count() == 100)
  }

  test("asOfJoin picks the latest right row at or before the left timestamp") {
    val prices = Seq((1L, "2024-01-01", 10.0), (1L, "2024-03-01", 20.0), (2L, "2024-02-01", 5.0))
      .toDF("k", "dt", "price").select($"k", $"dt".cast("date").as("dt"), $"price")
    val events = Seq(
      (1L, "2023-12-31", "before-any"), (1L, "2024-01-01", "same-day"),
      (1L, "2024-02-15", "mid"), (1L, "2024-03-01", "at-v2"), (1L, "2024-12-31", "after-all"),
      (2L, "2024-02-02", "other-key"))
      .toDF("k", "ts", "tag").select($"k", $"ts".cast("date").as("ts"), $"tag")
    val out = Relational.asOfJoin(events, prices, Seq("k"), "ts", "dt")
      .select($"tag", $"price").as[(String, Option[Double])].collect().toMap
    assert(out("before-any").isEmpty)  // no version yet → null
    assert(out("same-day").contains(10.0)) // inclusive >=
    assert(out("mid").contains(10.0))
    assert(out("at-v2").contains(20.0))
    assert(out("after-all").contains(20.0))
    assert(out("other-key").contains(5.0)) // keys never cross
  }

  test("asOfJoin keeps a NULL attribute of the matched version (no stale backfill)") {
    val prices = Seq((1L, "2024-01-01", Some(10.0), Some("promo")),
      (1L, "2024-03-01", Some(20.0), None))
      .toDF("k", "dt", "price", "note").select($"k", $"dt".cast("date").as("dt"), $"price", $"note")
    val events = Seq((1L, "2024-03-02", "after-v2")).toDF("k", "ts", "tag")
      .select($"k", $"ts".cast("date").as("ts"), $"tag")
    val r = Relational.asOfJoin(events, prices, Seq("k"), "ts", "dt").collect().head
    assert(r.getAs[Double]("price") == 20.0)
    assert(r.isNullAt(r.fieldIndex("note"))) // matched version's NULL survives
  }

  test("asOfJoinNative: same semantics as the composed form, planned as AsOfJoinExec") {
    import org.apache.spark.sql.graft.AsOfJoinPlan
    val prices = Seq((1L, "2024-01-01", 10.0), (1L, "2024-03-01", 20.0), (2L, "2024-02-01", 5.0))
      .toDF("k", "dt", "price").select($"k", $"dt".cast("date").as("dt"), $"price")
    val events = Seq(
      (1L, "2023-12-31", "before-any"), (1L, "2024-01-01", "same-day"),
      (1L, "2024-02-15", "mid"), (1L, "2024-03-01", "at-v2"), (1L, "2024-12-31", "after-all"),
      (2L, "2024-02-02", "other-key"), (3L, "2024-05-05", "no-right-group"))
      .toDF("k", "ts", "tag").select($"k", $"ts".cast("date").as("ts"), $"tag")
    val native = AsOfJoinPlan.asOfJoinNative(events, prices, Seq("k"), "ts", "dt")
    // planned as the custom exec, with declared-requirement shuffles/sorts
    val physical = native.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfJoin"), physical)
    val out = native.select($"tag", $"price").as[(String, Option[Double])].collect().toMap
    assert(out("before-any").isEmpty && out("no-right-group").isEmpty)
    assert(out("same-day").contains(10.0)) // inclusive >=
    assert(out("mid").contains(10.0) && out("at-v2").contains(20.0))
    assert(out("after-all").contains(20.0) && out("other-key").contains(5.0))
    // full-frame equivalence with the composed operator
    val composed = Relational.asOfJoin(events, prices, Seq("k"), "ts", "dt")
      .select($"k", $"ts", $"tag", $"price")
    val nativeSel = native.select($"k", $"ts", $"tag", $"price")
    assert(nativeSel.exceptAll(composed).isEmpty && composed.exceptAll(nativeSel).isEmpty)
  }

  test("asOfJoinNative: NULL keys/ts never match; type mismatches fail fast") {
    import org.apache.spark.sql.graft.AsOfJoinPlan
    val prices = Seq(
      (Option(1L), Option("2024-01-01"), 10.0),
      (Option(1L), Option.empty[String], 99.0), // NULL version ts: invisible
      (Option.empty[Long], Option("2024-01-01"), 77.0)) // NULL key: invisible
      .toDF("k", "dt", "price").select($"k", $"dt".cast("date").as("dt"), $"price")
    val events = Seq((1L, "2023-06-01", "pre"), (1L, "2024-06-01", "post"))
      .toDF("k", "ts", "tag").select($"k", $"ts".cast("date").as("ts"), $"tag")
    val out = AsOfJoinPlan.asOfJoinNative(events, prices, Seq("k"), "ts", "dt")
      .select($"tag", $"price").as[(String, Option[Double])].collect().toMap
    assert(out("pre").isEmpty)           // NULL-ts row must not carry
    assert(out("post").contains(10.0))
    intercept[IllegalArgumentException] { // int vs long key would mis-hash
      AsOfJoinPlan.asOfJoinNative(
        events, prices.withColumn("k", $"k".cast("int")), Seq("k"), "ts", "dt")
    }
    intercept[IllegalArgumentException] { // date vs timestamp ts: unlike units
      AsOfJoinPlan.asOfJoinNative(
        events, prices.withColumn("dt", $"dt".cast("timestamp")), Seq("k"), "ts", "dt")
    }
  }

  test("rangeJoinBinned equals a plain inequality join") {
    val points = Seq((1, "2024-01-05"), (2, "2024-02-20"), (3, "2024-06-01"))
      .toDF("id", "ts").select($"id", $"ts".cast("date").as("ts"))
    val intervals = Seq(("a", "2024-01-01", "2024-01-31"), ("b", "2024-01-20", "2024-03-15"),
      ("c", "2030-01-01", "2030-12-31"))
      .toDF("name", "s", "e")
      .select($"name", $"s".cast("date").as("s"), $"e".cast("date").as("e"))
    val binned = Relational.rangeJoinBinned(points, intervals, "ts", "s", "e", binDays = 7)
      .select($"id", $"name")
    val plain = points.join(intervals, $"ts".between($"s", $"e")).select($"id", $"name")
    assert(binned.exceptAll(plain).isEmpty && plain.exceptAll(binned).isEmpty)
    assert(binned.as[(Int, String)].collect().toSet == Set((1, "a"), (2, "b")))
  }

  test("warehouse recovers a table stranded at __old by a mid-swap crash") {
    import graft.sources.Warehouse
    import org.apache.hadoop.fs.Path
    val root = java.nio.file.Files.createTempDirectory("graft-crash").toString
    val wh = new Warehouse(root, spark)
    wh.overwrite(Seq(1, 2).toDF("x"), "l", "t")
    // simulate a crash between rename(target, old) and rename(tmp, target)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new Path(wh.path("l", "t")), new Path(wh.path("l", "t__old")))
    assert(wh.exists("l", "t")) // recovery restores the table
    assert(wh.read("l", "t").count() == 2)
  }

  test("bucketed tables join without an exchange") {
    import graft.sources.Warehouse
    val root = java.nio.file.Files.createTempDirectory("graft-bk").toString
    val wh = new Warehouse(root, spark)
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    wh.overwriteBucketed(a, "l", "ta", Seq("k"), 4)
    wh.overwriteBucketed(b, "l", "tb", Seq("k"), 4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = wh.readBucketed("l", "ta").join(wh.readBucketed("l", "tb"), "k")
      assert(j.count() == 1000)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("asOfJoinNative over bucketed inputs: bucketing satisfies the declared distribution, zero Exchange") {
    // THE case the native operator exists for: both sides already
    // hash-distributed on the key (bucketed fact + bucketed version
    // table) — the declared ClusteredDistribution lets
    // EnsureRequirements reuse the bucket layout on BOTH sides, which
    // the composed union-carry-forward form structurally cannot
    import graft.sources.Warehouse
    val root = java.nio.file.Files.createTempDirectory("graft-asof-bk").toString
    val wh = new Warehouse(root, spark)
    val events = (1 to 500).map(i => (i.toLong % 50, i.toLong * 10, s"e$i"))
      .toDF("k", "ts", "ev")
    val prices = (0 until 50).flatMap(k => Seq(0L, 1000L, 3000L)
      .map(t => (k.toLong, t, k * 1000.0 + t))).toDF("k", "dt", "price")
    wh.overwriteBucketed(events, "l", "aev", Seq("k"), 4)
    wh.overwriteBucketed(prices, "l", "apr", Seq("k"), 4)
    val j = org.apache.spark.sql.graft.AsOfJoinPlan.asOfJoinNative(
      wh.readBucketed("l", "aev"), wh.readBucketed("l", "apr"), Seq("k"), "ts", "dt")
    assert(j.count() == 500)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Exchange"), s"bucketed as-of still shuffles:\n$plan")
    // and the merge's answers are the latest dt <= ts, per row
    val got = j.select($"k", $"ts", $"ev", $"price")
      .as[(Long, Long, String, Double)].collect().toSet
    val exp = events.as[(Long, Long, String)].collect().map { case (k, ts, ev) =>
      val dt = Seq(0L, 1000L, 3000L).filter(_ <= ts).max
      (k, ts, ev, k * 1000.0 + dt)
    }.toSet
    assert(got == exp)
  }

  test("hashed surrogate keys are deterministic across runs") {
    val df = Seq("k1", "k2").toDF("bk")
    val a = Relational.surrogateKeysHashed(df, Seq("bk"), "id").as[(String, Long)].collect().toMap
    val b = Relational.surrogateKeysHashed(df, Seq("bk"), "id").as[(String, Long)].collect().toMap
    assert(a == b && a("k1") != a("k2"))
  }

  test("orderedRanks equals the single-partition dense_rank, distributed") {
    import org.apache.spark.sql.expressions.Window
    // real vocabulary-shaped input: many ties on c, unique (c, tok) key
    val vocab = graft.sources.Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("c"))
    val want = vocab
      .withColumn("rnk", dense_rank().over(Window.orderBy($"c".desc, $"tok")).cast("long"))
      .select($"tok", $"rnk").as[(String, Long)].collect().toMap
    val got = Relational.orderedRanks(vocab, Seq($"c".desc, $"tok"), "rnk")
      .select($"tok", $"rnk").as[(String, Long)].collect().toMap
    assert(got == want)
    // and it is stable across evaluations (range bounds don't leak in)
    val again = Relational.orderedRanks(vocab, Seq($"c".desc, $"tok"), "rnk")
      .select($"tok", $"rnk").as[(String, Long)].collect().toMap
    assert(again == want)
  }

  test("orderedPrefixSum equals the single-partition running sum, distributed") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n"))
    val want = docs
      .withColumn("off", coalesce(sum($"n").over(Window.orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select($"doc_id", $"off").as[(Long, Long)].collect().toMap
    val got = Relational.orderedPrefixSum(docs, Seq($"doc_id"), "n", "off")
      .select($"doc_id", $"off").as[(Long, Long)].collect().toMap
    assert(got == want)
    // exclusive semantics: the first doc in order starts at offset 0,
    // and total mass is conserved at the last element
    val inOrder = docs.orderBy($"doc_id").as[(Long, Long)].collect()
    assert(got(inOrder.head._1) == 0L)
    assert(got(inOrder.last._1) + 0L == inOrder.dropRight(1).map(_._2).sum)
    // misuse fails loudly: non-long value column, colliding output name
    intercept[IllegalArgumentException] {
      Relational.orderedPrefixSum(
        docs.withColumn("d", $"n".cast("double")), Seq($"doc_id"), "d", "off")
    }
    intercept[IllegalArgumentException] {
      Relational.orderedPrefixSum(docs, Seq($"doc_id"), "n", "n")
    }
  }

  test("adaptiveSaltedJoin: fan-out only for audit-flagged keys, result equals plain join") {
    // key 0 holds 90 rows next to 30 single-row cold keys: mean = 4,
    // 90 > 10×4 → only key 0 flags (with k keys a hot key needs
    // n·k > factor·t, so the fixture needs enough cold keys for 10×
    // mean to be reachable at all)
    val fact = ((1 to 90).map(_ => 0L) ++ (1L to 30L))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "v")
    val dim = (0L to 30L).map(k => (k, s"n$k")).toDF("k", "name")
    val audit = Relational.hotKeys(fact, "k", factor = 10)
    assert(audit.as[Long].collect().toSeq == Seq(0L)) // only the hot key flags
    // build side: the flagged key replicates `salts`×, cold keys once
    val repl = Relational.replicateBuildByAudit(dim, "k", salts = 4, audit)
      .groupBy($"k").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(repl(0L) == 4L && (1L to 30L).forall(repl(_) == 1L))
    // fact side: hot rows spread over >1 salt, every cold row stays 0
    val salted = Relational.saltFactByAudit(fact, "k", salts = 4, audit)
    assert(salted.filter($"k" === 0L).select($"__salt").distinct().count() > 1)
    assert(salted.filter($"k" =!= 0L && $"__salt" =!= 0).count() == 0)
    // end-to-end: identical to the unsalted join
    val got = Relational.adaptiveSaltedJoin(fact, dim, "k", salts = 4, audit)
    val plain = fact.join(dim, "k")
    assert(got.exceptAll(plain).isEmpty && plain.exceptAll(got).isEmpty)
  }
}
