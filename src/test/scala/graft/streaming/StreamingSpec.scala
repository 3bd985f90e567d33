package graft.streaming

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Structured Streaming ↔ batch parity over the sf0.001 events table.
  * The stream source is a temp dir seeded with the events parquet file
  * (the file-source contract a production feed would use).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events")
    val src = new java.io.File(s"$sf/events.parquet")
    val files =
      if (src.isDirectory) src.listFiles().filter(_.getName.endsWith(".parquet")).toSeq
      else Seq(src)
    files.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.copy(f.toPath, dir.resolve(s"part-$i.parquet"))
    }
    dir.toString
  }

  private def batchEvents = Tables.events(spark, sf)

  test("hourlyAgg matches the batch tumbling-window aggregation") {
    EventPipelines.runToMemory(
      EventPipelines.hourlyAgg(EventPipelines.readEventStream(spark, streamDir)),
      "hourly", org.apache.spark.sql.streaming.OutputMode.Complete)
    val streamed = spark.table("hourly")
      .select(date_format($"hour", "yyyy-MM-dd HH").as("h"), $"event_type", $"n_events")
      .as[(String, String, Long)].collect().toSet
    val batch = batchEvents
      .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH").as("h"), $"event_type")
      .agg(count(lit(1)).as("n_events"))
      .as[(String, String, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("stream-static dim enrichment matches the batch join") {
    val dim = Tables.customer(spark, sf).select(
      $"c_custkey".as("user_id"), $"c_mktsegment".as("segment"))
    val enriched = EventPipelines.enrichWithDim(
      EventPipelines.readEventStream(spark, streamDir), dim, "user_id", Seq("segment"))
      .groupBy($"segment", $"event_type").agg(count(lit(1)).as("n_events"))
    EventPipelines.runToMemory(enriched, "enriched",
      org.apache.spark.sql.streaming.OutputMode.Complete)
    val streamed = spark.table("enriched")
      .as[(String, String, Long)].collect().toSet
    val batch = batchEvents.join(dim, Seq("user_id"), "left")
      .groupBy(coalesce($"segment", lit("n.a.")).as("segment"), $"event_type")
      .agg(count(lit(1)).as("n_events"))
      .as[(String, String, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("dedupById removes duplicate event ids within the watermark") {
    val s = EventPipelines.readEventStream(spark, streamDir)
    EventPipelines.runToMemory(
      EventPipelines.dedupById(s.union(s)).select($"event_id"), "deduped")
    assert(spark.table("deduped").count() == batchEvents.select($"event_id").distinct().count())
  }

  test("native session_window agrees with the lag/sum gap logic on session counts") {
    // strict-gap vs gap-inclusive boundaries differ only at exactly-30min
    // gaps; verify none exist in the fixture, then counts must match
    val gapUs = 30L * 60 * 1000000
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val exactGaps = batchEvents.withColumn("us", unix_micros($"ts"))
      .withColumn("d", $"us" - lag($"us", 1).over(w))
      .filter($"d" === gapUs).count()
    assert(exactGaps == 0, "fixture has an exactly-30min gap; counts may differ")
    val native = graft.streaming.EventPipelines
      .sessionizeNative(batchEvents.select($"user_id", $"ts"))
      .groupBy($"user_id").agg(count(lit(1)).as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    val viaLag = batchEvents.withColumn("us", unix_micros($"ts"))
      .withColumn("new_s", when(lag($"us", 1).over(w).isNull ||
        ($"us" - lag($"us", 1).over(w)) > gapUs, 1).otherwise(0))
      .groupBy($"user_id").agg(sum($"new_s").as("n_sessions"))
      .as[(Long, Long)].collect().toMap
    assert(native == viaLag)
  }

  test("ingestAvailableNow lands multi-batch dedup'd events via partition swaps") {
    // two copies of the feed in separate files + maxFilesPerTrigger=1:
    // batch 1 bootstraps the table, batch 2 is 100% duplicate delivery
    // and must merge to a no-op — the at-least-once contract end-to-end
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest-src")
    val src = new java.io.File(s"$sf/events.parquet")
    java.nio.file.Files.copy(src.toPath, dir.resolve("feed-0.parquet"))
    java.nio.file.Files.copy(src.toPath, dir.resolve("feed-1.parquet"))
    val whRoot = java.nio.file.Files.createTempDirectory("graft-ingest-wh").toString
    val wh = new graft.sources.Warehouse(whRoot, spark)
    val stream = EventPipelines.withUtcTs(
      spark.readStream.schema(spark.read.parquet(dir.toString).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir.toString))
    EventPipelines.ingestAvailableNow(stream, wh, "bl_3nf", "ev", Seq("event_id"))
    val got = wh.readPartitioned("bl_3nf", "ev", "event_day")
    assert(got.count() == batchEvents.count()) // duplicates fully collapsed
    val days = batchEvents.select(date_format($"ts", "yyyyMMdd")).distinct().count()
    assert(got.select($"event_day").distinct().count() == days)
    // value-level parity with the batch table on a checksum
    val a = got.agg(bit_xor(xxhash64($"event_id", $"event_type", $"value"))).head().getLong(0)
    val b = batchEvents.agg(bit_xor(xxhash64($"event_id", $"event_type", $"value"))).head().getLong(0)
    assert(a == b)
  }

  test("q147 stream curation: a below-gate doc NEVER lands; above-gate docs land once") {
    // fixture corpus with known gate outcomes: 'good' passes (60
    // non-stopword tokens → quality 1.0), 'junk' is 100% stopwords
    // (quality 0.0) and must be dropped AT INGEST, not after landing
    val good = (1 to 60).map(i => s"tok$i").mkString(" ")
    val junk = Seq.fill(20)("the").mkString(" ")
    val fixture = Seq(
      (1L, good, "en", "srcGood", good.length.toLong),
      (2L, junk, "en", "srcJunk", junk.length.toLong),
      (3L, good, "en", "srcGood", good.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-curate-src")
    val stage = java.nio.file.Files.createTempDirectory("graft-curate-stage")
    fixture.repartition(1).write.mode("overwrite").parquet(stage.toString)
    val part = new java.io.File(stage.toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath, dir.resolve("documents.parquet"))
    val out = graft.operators.TextQueries
      .queries("q147_stream_curate")(spark, dir.toString)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // the junk source never produces a landed row — the gate filtered
    // it in foreachBatch, so it was never written, not cleaned up later
    assert(!out.contains("srcJunk"), s"below-gate doc landed: $out")
    assert(out("srcGood") == ((2L, 2000000L))) // two docs at quality 1.0
  }

  test("streaming near-dup ingest: drops vs index, within batch, AND vs earlier batches' landings") {
    val base = "the quick brown fox jumps over the lazy dog"
    val uniq = "completely different text about spark engines and planning"
    val other = "a second unrelated passage discussing parquet files here"
    val dir = java.nio.file.Files.createTempDirectory("graft-sdd-src")
    val whRoot = java.nio.file.Files.createTempDirectory("graft-sdd-wh").toString
    val wh = new graft.sources.Warehouse(whRoot, spark)
    def docsOf(rows: (Long, String)*) = rows.toDF("doc_id", "text")
      .withColumn("source", lit("s"))
    // pre-seeded deduped corpus: doc 1
    wh.overwrite(docsOf((1L, base)), "bl_3nf", "dd", partitionBy = Seq("source")): Unit
    def drop(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("graft-sdd-stage")
      df.repartition(1).write.mode("overwrite").parquet(stage.toString)
      val part = new java.io.File(stage.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, dir.resolve(name))
    }
    // batch 1: 2 near-dups doc 1 (vs-index drop), 3 unique (lands),
    //          4 near-dups 3 within the batch (min-id drop)
    drop(docsOf((2L, base.replace("dog", "cat")), (3L, uniq),
      (4L, uniq.replace("planning", "shuffles"))), "b1.parquet")
    // batch 2: 5 near-dups 3 — which landed in batch 1, so the INDEX
    //          catches it; 6 unique (lands). Last-token edit keeps the
    //          pair at shingle-jaccard ~0.71, where these (k=8, b=4)
    //          LSH parameters catch deterministically (md5 minhashes).
    drop(docsOf((5L, uniq.replace("planning", "scheduling")), (6L, other)), "b2.parquet")
    val stream = spark.readStream.schema(docsOf((0L, "x")).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    graft.streaming.EventPipelines.dedupIngestAvailableNow(stream, wh,
      "bl_3nf", "dd", idCol = "doc_id", textCol = "text", partCol = "source",
      ngram = 3, k = 8, bands = 4, minJaccard = 0.2)
    val landed = wh.readPartitioned("bl_3nf", "dd", "source")
      .select($"doc_id").as[Long].collect().toSet
    assert(landed == Set(1L, 3L, 6L), s"landed $landed")
  }

  test("streaming SCD1: checkpointed waves fold exactly like batch scd1Merge; replay skips") {
    import org.apache.spark.sql.types.DateType
    val dir = java.nio.file.Files.createTempDirectory("graft-scd1-src")
    val ck = java.nio.file.Files.createTempDirectory("graft-scd1-ck").toString
    val whRoot = java.nio.file.Files.createTempDirectory("graft-scd1-wh").toString
    val wh = new graft.sources.Warehouse(whRoot, spark)
    def cust(rows: (Long, String, String)*) =
      rows.toDF("c_custkey", "c_name", "c_mktsegment")
    val w1 = cust((1L, "ann", "AUTO"), (2L, "bob", "RAIL"))
    val w2 = cust((2L, "bob", "SHIP"), (3L, "cyd", "AUTO")) // update + insert
    val schema = w1.schema
    def run(dt: String): Unit = EventPipelines.scd1AvailableNow(
      spark.readStream.schema(schema).parquet(dir.toString),
      wh, "bl_3nf", "cs", Seq("c_custkey"), Seq("c_name", "c_mktsegment"),
      lit(dt).cast(DateType), checkpointDir = Some(ck))
    // file source doesn't recurse: land each wave as a single file
    def drop(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("graft-scd1-stage")
      df.repartition(1).write.mode("overwrite").parquet(stage.toString)
      val part = new java.io.File(stage.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, dir.resolve(name))
    }
    drop(w1, "w1.parquet")
    run("2024-06-01")
    // wave 1 bootstraps: everything lands as 'new'
    // materialize: the next run's atomic swap replaces these files
    val t1 = wh.read("bl_3nf", "cs").localCheckpoint(true)
    assert(t1.count() == 2 && t1.filter($"scd_status" === "new").count() == 2)
    // wave 2 through the SAME checkpoint: only the new file is read,
    // and the landed table equals the batch fold scd1Merge(fold1, w2)
    drop(w2, "w2.parquet")
    run("2024-07-01")
    val got = wh.read("bl_3nf", "cs")
    val batchFold = graft.operators.Scd.scd1Merge(
      t1, w2, Seq("c_custkey"), Seq("c_name", "c_mktsegment"),
      lit("2024-07-01").cast(DateType))
    assert(got.exceptAll(batchFold).isEmpty && batchFold.exceptAll(got).isEmpty)
    val byKey = got.select($"c_custkey", $"c_mktsegment", $"scd_status")
      .as[(Long, String, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byKey(1L) == (("AUTO", "unchanged")))
    assert(byKey(2L) == (("SHIP", "updated")))
    assert(byKey(3L) == (("AUTO", "new")))
    // a third run with no new files fires no batch; table unchanged
    run("2024-08-01")
    assert(wh.read("bl_3nf", "cs").filter($"update_dt" === "2024-08-01").count() == 0)
    // crash-replay of a committed batch id is a metadata-only skip —
    // even carrying different rows
    val ns = EventPipelines.ledgerNamespace(ck)
    assert(!EventPipelines.scd1Batch(wh, "bl_3nf", "cs", Seq("c_custkey"),
      Seq("c_name", "c_mktsegment"), lit("2024-09-01").cast(DateType),
      cust((9L, "zed", "MAIL")), batchId = 0, useLedger = true, ledgerNs = ns))
    assert(wh.read("bl_3nf", "cs").count() == 3)
  }

  test("streaming SCD2: checkpointed waves version exactly like batch scd2Merge; replay skips") {
    import org.apache.spark.sql.types.TimestampNTZType
    def ntz(s: String) = lit(s).cast(TimestampNTZType)
    val far = ntz("9999-12-31 00:00:00")
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2-src")
    val ck = java.nio.file.Files.createTempDirectory("graft-scd2-ck").toString
    val whRoot = java.nio.file.Files.createTempDirectory("graft-scd2-wh").toString
    val wh = new graft.sources.Warehouse(whRoot, spark)
    def parts(rows: (Long, Double)*) = rows.toDF("p_partkey", "price")
    val w1 = parts((1L, 10.0), (2L, 20.0))
    val w2 = parts((1L, 10.0), (2L, 25.0), (3L, 30.0)) // unchanged + change + insert
    val schema = w1.schema
    def run(ts: String): Unit = EventPipelines.scd2AvailableNow(
      spark.readStream.schema(schema).parquet(dir.toString),
      wh, "bl_3nf", "ps", Seq("p_partkey"), Seq("price"),
      ntz(ts), far, checkpointDir = Some(ck))
    def drop(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("graft-scd2-stage")
      df.repartition(1).write.mode("overwrite").parquet(stage.toString)
      val part = new java.io.File(stage.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, dir.resolve(name))
    }
    drop(w1, "w1.parquet")
    run("2024-06-01 00:00:00")
    // wave 1 bootstraps: two first versions, both active
    val t1 = wh.read("bl_3nf", "ps").localCheckpoint(true)
    assert(t1.count() == 2 && t1.filter($"is_active" === "Y").count() == 2)
    // wave 2 through the SAME checkpoint: landed history must equal
    // the batch fold scd2Merge(fold1, w2)
    drop(w2, "w2.parquet")
    run("2024-07-01 00:00:00")
    val got = wh.read("bl_3nf", "ps")
    val batchFold = graft.operators.Scd.scd2Merge(
      t1, w2, Seq("p_partkey"), Seq("price"), ntz("2024-07-01 00:00:00"), far)
    assert(got.exceptAll(batchFold).isEmpty && batchFold.exceptAll(got).isEmpty)
    // the changed key carries a CLOSED first version + an open second
    val k2 = got.filter($"p_partkey" === 2L)
      .select($"price", $"is_active", $"end_ts".cast("string"))
      .as[(Double, String, String)].collect().toSet
    assert(k2 == Set((20.0, "N", "2024-06-30 23:59:59"),
      (25.0, "Y", "9999-12-31 00:00:00")))
    // unchanged key: still one open version; insert: one open version
    assert(got.filter($"p_partkey" === 1L).count() == 1)
    assert(got.filter($"p_partkey" === 3L)
      .select($"is_active").as[String].collect().toSeq == Seq("Y"))
    // crash-replay of a committed batch id is a metadata-only skip
    val ns = EventPipelines.ledgerNamespace(ck)
    assert(!EventPipelines.scd2Batch(wh, "bl_3nf", "ps", Seq("p_partkey"),
      Seq("price"), ntz("2024-09-01 00:00:00"), far,
      parts((9L, 99.0)), batchId = 0, useLedger = true, ledgerNs = ns))
    assert(wh.read("bl_3nf", "ps").count() == 4)
  }

  test("batch ledger: a replayed batchId is a metadata-only skip, not a re-land") {
    val whRoot = java.nio.file.Files.createTempDirectory("graft-ledger-wh").toString
    val wh = new graft.sources.Warehouse(whRoot, spark)
    def batchOf(ids: Long*) = ids.toDF("event_id")
      .withColumn("ts", expr("timestamp_micros(1704067200000000 + event_id)"))
      .withColumn("user_id", lit(1L)).withColumn("event_type", lit("x"))
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    def land(b: org.apache.spark.sql.DataFrame, bid: Long, ledger: Boolean = true) =
      EventPipelines.landBatch(wh, "bl_3nf", "lev", Seq("event_id"),
        "event_day", b, bid, useLedger = ledger)
    assert(land(batchOf(1L, 2L), bid = 0))
    assert(wh.batchCommitted("bl_3nf", "lev", 0))
    // crash-replay of bid 0 — even carrying rows the first delivery
    // lacked, it must SKIP entirely (the ledger, not the anti-join)
    assert(!land(batchOf(1L, 2L, 99L), bid = 0))
    assert(wh.read("bl_3nf", "lev").count() == 2)
    // the next bid lands; value-level dedup still applies inside it
    assert(land(batchOf(2L, 3L), bid = 1))
    assert(wh.read("bl_3nf", "lev").count() == 3)
    // without the ledger the same bid re-lands and the anti-join alone
    // decides — new keys slip in (why the ledger needs the checkpoint)
    assert(land(batchOf(99L), bid = 1, ledger = false))
    assert(wh.read("bl_3nf", "lev").count() == 4)
  }

  test("ledger survives a checkpoint reset: fresh checkpoint wipes stale markers, no batch swallowed") {
    // run 1 ingests the feed under a durable checkpoint (ledger marker
    // b=0 written); then the checkpoint is DELETED, new events arrive,
    // and run 2 starts from a fresh checkpoint at the same path — its
    // batch ids restart at 0, so without the fresh-init wipe the stale
    // b=0 marker would skip the whole batch and silently swallow the
    // new events
    val srcDir = java.nio.file.Files.createTempDirectory("graft-ckreset-src")
    java.nio.file.Files.copy(new java.io.File(s"$sf/events.parquet").toPath,
      srcDir.resolve("feed-0.parquet"))
    val whRoot = java.nio.file.Files.createTempDirectory("graft-ckreset-wh").toString
    val ck = java.nio.file.Files.createTempDirectory("graft-ckreset-ck")
    val wh = new graft.sources.Warehouse(whRoot, spark)
    def ingest(): Unit = EventPipelines.ingestAvailableNow(
      EventPipelines.readEventStream(spark, srcDir.toString),
      wh, "bl_3nf", "ckev", Seq("event_id"), checkpointDir = Some(ck.toString))
    ingest()
    val n1 = wh.readPartitioned("bl_3nf", "ckev", "event_day").count()
    assert(n1 == batchEvents.count())
    // reset: drop the checkpoint, add genuinely new events to the feed
    def rmRf(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    rmRf(ck)
    java.nio.file.Files.createDirectories(ck): Unit
    // the appended file must carry the SAME ts type as the copied feed
    // file (mixed parquet types in one stream dir won't merge)
    val feedTs = spark.read.parquet(srcDir.toString).schema("ts").dataType
    val fresh = Seq((900001L, 1704067200L * 1000000000L, 7L, "reset", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", feedTs match {
        case org.apache.spark.sql.types.LongType => $"ts"
        case t => expr("timestamp_micros(ts div 1000)").cast(t)
      })
    fresh.coalesce(1).write.mode("append").parquet(srcDir.toString)
    ingest() // re-reads everything as batch 0 of the NEW lineage
    val after = wh.readPartitioned("bl_3nf", "ckev", "event_day")
    assert(after.count() == n1 + 1) // the new event landed, dups collapsed
    assert(after.filter($"event_id" === 900001L).count() == 1)
  }

  test("ledger namespaces: a relocated checkpoint never collides with the old one's markers") {
    // same table, two different checkpoint locations: markers written
    // under ck A's namespace must be invisible to a run under ck B —
    // without the namespace, B's batch 0 would hit A's b=0 marker and
    // be swallowed
    val whRoot = java.nio.file.Files.createTempDirectory("graft-ns-wh").toString
    val wh = new graft.sources.Warehouse(whRoot, spark)
    val nsA = EventPipelines.ledgerNamespace("/tmp/ck-a")
    val nsB = EventPipelines.ledgerNamespace("/tmp/ck-b")
    assert(nsA != nsB)
    wh.markBatchCommitted("bl_3nf", "nst", 0, nsA)
    assert(wh.batchCommitted("bl_3nf", "nst", 0, nsA))
    assert(!wh.batchCommitted("bl_3nf", "nst", 0, nsB)) // B starts clean
    assert(!wh.batchCommitted("bl_3nf", "nst", 0))      // un-namespaced too
    // wiping B's namespace leaves A's markers intact
    wh.clearLedger("bl_3nf", "nst", nsB)
    assert(wh.batchCommitted("bl_3nf", "nst", 0, nsA))
    wh.clearLedger("bl_3nf", "nst", nsA)
    assert(!wh.batchCommitted("bl_3nf", "nst", 0, nsA))
  }

  test("ledger vacuum: old markers pruned, replay-skip intact for retained ids, namespaces isolated") {
    val whRoot = java.nio.file.Files.createTempDirectory("graft-vac-wh").toString
    val wh = new graft.sources.Warehouse(whRoot, spark)
    val nsA = EventPipelines.ledgerNamespace("/tmp/ck-vac-a")
    val nsB = EventPipelines.ledgerNamespace("/tmp/ck-vac-b")
    (0L to 5L).foreach(b => wh.markBatchCommitted("bl_3nf", "vac", b, nsA))
    wh.markBatchCommitted("bl_3nf", "vac", 0, nsB)
    assert(wh.vacuumLedger("bl_3nf", "vac", keep = 2, nsA) == Seq(0L, 1L, 2L, 3L))
    // the retained tail still skips replays; pruned ids no longer do
    // (only the LAST batch of a lineage can legally replay, so the
    // pruned ids can never arrive again)
    assert(wh.batchCommitted("bl_3nf", "vac", 4, nsA))
    assert(wh.batchCommitted("bl_3nf", "vac", 5, nsA))
    (0L to 3L).foreach(b => assert(!wh.batchCommitted("bl_3nf", "vac", b, nsA)))
    // the other checkpoint's namespace is untouched
    assert(wh.batchCommitted("bl_3nf", "vac", 0, nsB))
    // idempotent floor: re-vacuum drops nothing further
    assert(wh.vacuumLedger("bl_3nf", "vac", keep = 2, nsA).isEmpty)
    // keep must retain at least the newest marker
    intercept[IllegalArgumentException](wh.vacuumLedger("bl_3nf", "vac", keep = 0, nsA))
  }

  test("streaming arrivals route onto the trained index, matching the batch operator") {
    import graft.operators.Similarity
    import graft.streaming.VectorPipelines
    val emb = Tables.embeddings(spark, sf)
    val base = emb.filter($"vec_id" % 10 =!= 0)
    val arrivals = emb.filter($"vec_id" % 10 === 0)
    val (cents, _) = Similarity.trainedIndex(base, "vec_id", "embedding", k = 8, rounds = 2)
    val arrDir = java.nio.file.Files.createTempDirectory("graft-varr").toString
    arrivals.repartition(3).write.mode("overwrite").parquet(s"$arrDir/files")
    val root = java.nio.file.Files.createTempDirectory("graft-vwh").toString
    val wh = new graft.sources.Warehouse(root, spark)
    val stream = spark.readStream.schema(arrivals.schema)
      .option("maxFilesPerTrigger", 1) // several micro-batches, not one
      .parquet(s"$arrDir/files")
    VectorPipelines.routeAvailableNow(stream, cents, "vec_id", "embedding",
      wh, "idx", "cells", Some(s"$root/ckpt"))
    val landed = wh.readPartitioned("idx", "cells", "cid")
      .select($"vec_id", $"cid".cast("int")).as[(Long, Int)].collect()
    val expected = Similarity.assignToCells(arrivals, "vec_id", "embedding", cents)
      .select($"vec_id", $"cid").as[(Long, Int)].collect().toSet
    // exactly the batch operator's routing, and one row per id — the
    // searchable-cells contract ivfProbedKnn/ivfAdcKnn require
    assert(landed.toSet == expected)
    assert(landed.length == landed.map(_._1).distinct.length)
    // a second drain of the SAME files is a ledgered no-op, not a re-land
    val stream2 = spark.readStream.schema(arrivals.schema).parquet(s"$arrDir/files")
    VectorPipelines.routeAvailableNow(stream2, cents, "vec_id", "embedding",
      wh, "idx", "cells", Some(s"$root/ckpt"))
    assert(wh.readPartitioned("idx", "cells", "cid").count() == landed.length)
  }

  test("sessionize emits closed sessions that match the batch gap logic") {
    EventPipelines.runToMemory(
      EventPipelines.sessionize(spark, EventPipelines.readEventStream(spark, streamDir)).toDF(),
      "sessions")
    val streamed = spark.table("sessions")
      .select($"user_id", $"session_start_us", $"n_events")
      .as[(Long, Long, Int)].collect().toSet

    // batch truth: gap-based sessions via lag + running sum
    val gapUs = 30L * 60 * 1000000
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val sessions = batchEvents
      .withColumn("us", unix_micros($"ts"))
      .withColumn("new_s", when(lag($"us", 1).over(w).isNull ||
        ($"us" - lag($"us", 1).over(w)) > gapUs, 1).otherwise(0))
      .withColumn("sid", sum($"new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"sid")
      .agg(min($"us").as("session_start_us"), count(lit(1)).cast("int").as("n_events"))
    val all = sessions.select($"user_id", $"session_start_us", $"n_events")
      .as[(Long, Long, Int)].collect().toSet

    // every emitted session is a true session, and at most one session per
    // user (the final one, possibly still open in state) is unemitted
    assert(streamed.subsetOf(all))
    val nUsers = sessions.select($"user_id").distinct().count()
    assert(streamed.size >= all.size - nUsers)
  }

  test("sessionize: a cross-batch straggler before the open session becomes its own session") {
    // batch 1 opens [T, T+5m]; batch 2 delivers T−1h (above the 2 h
    // watermark, 60 min > gap BEFORE the session start — gluing it
    // would drag session_start back an hour); batch 3's far-future
    // event flushes the open session. Expected: the straggler is a
    // singleton closed session and the [T, T+5m] session stays intact.
    val dir = java.nio.file.Files.createTempDirectory("graft-straggler")
    def writeFeed(name: String, rows: Seq[String]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-straggler-w")
      rows.map(ts => (1L, java.sql.Timestamp.valueOf(ts)))
        .toDF("user_id", "ts").coalesce(1).write.parquet(s"$tmp/out")
      val part = new java.io.File(s"$tmp/out").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(part.toPath, dir.resolve(name)): Unit
    }
    writeFeed("feed-0.parquet", Seq("2024-01-01 12:00:00", "2024-01-01 12:05:00"))
    writeFeed("feed-1.parquet", Seq("2024-01-01 11:00:00"))
    writeFeed("feed-2.parquet", Seq("2024-02-01 12:00:00"))
    val stream = spark.readStream
      .schema(spark.read.parquet(dir.toString).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    EventPipelines.runToMemory(
      EventPipelines.sessionize(spark, stream).toDF(), "straggler_sessions")
    def us(ts: String) =
      java.sql.Timestamp.valueOf(ts).getTime * 1000L
    val got = spark.table("straggler_sessions")
      .select($"session_start_us", $"n_events").as[(Long, Int)].collect().toSet
    assert(got.contains((us("2024-01-01 11:00:00"), 1)),
      s"straggler not emitted as its own session: $got")
    assert(got.contains((us("2024-01-01 12:00:00"), 2)),
      s"open session was disturbed by the straggler: $got")
  }

  test("stream-stream interval join matches the batch twin") {
    EventPipelines.runToMemory(
      EventPipelines.viewPurchaseJoin(EventPipelines.readEventStream(spark, streamDir)),
      "vpjoin")
    val streamed = spark.table("vpjoin")
      .select($"user_id", $"view_id", $"purchase_id", $"lag_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    val views = batchEvents.filter($"event_type" === "view")
      .select($"event_id".as("view_id"), $"user_id", unix_micros($"ts").as("v_us"))
    val purchases = batchEvents.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("p_user_id"),
        unix_micros($"ts").as("p_us"))
    val batch = views.join(purchases,
      $"user_id" === $"p_user_id" && $"p_us" >= $"v_us" &&
        $"p_us" - $"v_us" <= 3600000000L)
      .select($"user_id", $"view_id", $"purchase_id", ($"p_us" - $"v_us").as("lag_us"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(batch.nonEmpty)       // the fixture must actually exercise the join
    assert(streamed == batch)    // inner interval join: no watermark hold-back
  }

  test("streaming CC maintenance: micro-batched fold equals batch CC; ledgered re-drain is a no-op") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog today"),   // near-dup of 1
      (3L, "a completely different document about spark physical plans"),
      (4L, "a completely different document about spark logical plans"), // near-dup of 3
      (5L, "the quick brown fox jumps over the lazy dog tomorrow"), // bridges into 1-2's cluster
      (6L, "unrelated text with nothing shared at all here")
    ).toDF("doc_id", "text")
    val arrDir = java.nio.file.Files.createTempDirectory("graft-ccarr").toString
    // three files → three micro-batches under maxFilesPerTrigger = 1;
    // the bridge doc 5 arrives LAST so a cross-batch merge must happen
    docs.filter($"doc_id" <= 2).coalesce(1).write.parquet(s"$arrDir/f1")
    docs.filter($"doc_id" === 3 || $"doc_id" === 4 || $"doc_id" === 6)
      .coalesce(1).write.parquet(s"$arrDir/f2")
    docs.filter($"doc_id" === 5).coalesce(1).write.parquet(s"$arrDir/f3")
    val dir = java.nio.file.Files.createTempDirectory("graft-ccwh").toString
    val wh = new graft.sources.Warehouse(dir, spark)
    def drain(): Unit = EventPipelines.ccMaintainAvailableNow(
      spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$arrDir/*"),
      wh, "idx", "cc", "doc_id", "text",
      ngram = 3, k = 8, bands = 4, minJaccard = 0.2,
      checkpointDir = Some(s"$dir/ckpt"))
    drain()
    def assignment(): Set[(Long, Long)] =
      EventPipelines.ccAssignment(wh, "idx", "cc")
        .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toSet
    val landed = assignment()
    val full = Dedup.connectedComponents(
      Dedup.minhashLshNearDups(docs, "text", "doc_id", 3, 8, 4, 0.2)
        .select($"id_1", $"id_2"),
      docs.select($"doc_id"), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(landed == full && landed.nonEmpty)
    // docs 1, 2, 5 must have merged across batches into one cluster
    val cids = landed.toMap
    assert(cids(1L) == cids(2L) && cids(2L) == cids(5L))
    assert(cids(3L) == cids(4L) && cids(3L) != cids(1L))
    // the docs index is append-only: one wave partition per micro-batch,
    // stored band keys landed with each wave, text landed exactly once
    val docsTbl = wh.read("idx", "cc")
    assert(docsTbl.columns.contains(Dedup.BAND_KEYS_COL))
    assert(docsTbl.select(col(EventPipelines.CcWaveCol)).distinct().count() == 3)
    assert(docsTbl.count() == 6)
    // a second drain of the SAME files replays ledgered batch ids: no-op
    drain()
    assert(assignment() == landed)
    // the crash window BETWEEN doc-landing and ledger marker: replay
    // the last batch with the ledger OFF (as a post-crash restart
    // would) — the anti-join replay guard must fold the re-delivered
    // ids to an empty wave, never duplicate docs or perturb labels
    EventPipelines.ccBatch(wh, "idx", "cc", "doc_id", "text",
      ngram = 3, k = 8, bands = 4, minJaccard = 0.2,
      batch = docs.filter($"doc_id" === 5), batchId = 99L,
      useLedger = false): Unit
    assert(wh.read("idx", "cc").count() == landed.size, "replay duplicated landed docs")
    assert(assignment() == landed)
  }

  test("ccBatch probes STORED band keys — never re-signatures the landed corpus") {
    import graft.operators.Dedup
    val dir = java.nio.file.Files.createTempDirectory("graft-ccpoison").toString
    val wh = new graft.sources.Warehouse(dir, spark)
    val wave1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "a completely different document about spark physical plans")
    ).toDF("doc_id", "text")
    val wave2 = Seq(
      (5L, "the quick brown fox jumps over the lazy dog tomorrow") // near-dup of 1
    ).toDF("doc_id", "text")
    def ccb(b: org.apache.spark.sql.DataFrame, bid: Long): Unit =
      EventPipelines.ccBatch(wh, "idx", "cc", "doc_id", "text",
        ngram = 3, k = 8, bands = 4, minJaccard = 0.2,
        batch = b, batchId = bid, useLedger = false): Unit
    ccb(wave1, 0L)
    // the bootstrap landed the per-doc key arrays with the docs wave
    assert(wh.read("idx", "cc").columns.contains(Dedup.BAND_KEYS_COL))
    // poison doc 1's STORED keys (text untouched). If the next batch
    // re-computed landed-side signatures from text — the O(B·corpus)
    // behavior the stored-key contract forbids — the poison would be
    // invisible and 5 would still merge into 1's cluster.
    val poisoned = wh.read("idx", "cc").localCheckpoint(true)
      .withColumn(Dedup.BAND_KEYS_COL,
        when($"doc_id" === 1L,
          transform(col(Dedup.BAND_KEYS_COL), _ => lit("poisoned")))
          .otherwise(col(Dedup.BAND_KEYS_COL)))
    wh.overwrite(poisoned, "idx", "cc",
      partitionBy = Seq(EventPipelines.CcWaveCol)): Unit
    ccb(wave2, 1L)
    val cids = EventPipelines.ccAssignment(wh, "idx", "cc")
      .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toMap
    assert(cids(5L) != cids(1L),
      "arrival merged through a poisoned stored key — the probe is " +
        "re-computing landed-side signatures instead of reading the " +
        s"stored ${Dedup.BAND_KEYS_COL} relation")
    // a keyless docs table must fail LOUDLY, not silently fall back
    // to the per-batch corpus re-signature
    wh.overwrite(wh.read("idx", "cc").localCheckpoint(true)
      .drop(Dedup.BAND_KEYS_COL), "idx", "cc",
      partitionBy = Seq(EventPipelines.CcWaveCol)): Unit
    val e = intercept[IllegalArgumentException] {
      ccb(Seq((7L, "more text that would otherwise land fine today")).toDF("doc_id", "text"), 2L)
    }
    assert(e.getMessage.contains(Dedup.BAND_KEYS_COL))
  }

  test("ccBatch rejects a keyed but UNPARTITIONED pre-seed BEFORE mutating it") {
    import graft.operators.Dedup
    val dir = java.nio.file.Files.createTempDirectory("graft-ccflat").toString
    val wh = new graft.sources.Warehouse(dir, spark)
    val seed = Seq((1L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    // keyed (passes the column check) but NOT wave-partitioned: the
    // wave swap would drop a __wave=N subdir next to root-level files —
    // a mixed layout Spark rejects on the next read, AFTER mutation
    wh.overwrite(Dedup.withBandKeys(seed, "text", "doc_id", 3, 8, 4),
      "idx", "cc"): Unit
    val before = wh.read("idx", "cc").count()
    val e = intercept[IllegalArgumentException] {
      EventPipelines.ccBatch(wh, "idx", "cc", "doc_id", "text",
        ngram = 3, k = 8, bands = 4, minJaccard = 0.2,
        batch = Seq((2L, "another doc entirely")).toDF("doc_id", "text"),
        batchId = 0L, useLedger = false): Unit
    }
    assert(e.getMessage.contains(EventPipelines.CcWaveCol))
    assert(wh.read("idx", "cc").count() == before, "reject must not mutate")
  }

  test("ccBatch self-heals the docs-landed/version-unpublished crash window") {
    import graft.operators.Dedup
    val dir = java.nio.file.Files.createTempDirectory("graft-ccheal").toString
    val wh = new graft.sources.Warehouse(dir, spark)
    val all = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog today"),   // near-dup of 1
      (3L, "a completely different document about spark physical plans"),
      (4L, "a completely different document about spark logical plans"), // near-dup of 3
      (5L, "the quick brown fox jumps over the lazy dog tomorrow") // bridges 1-2
    ).toDF("doc_id", "text")
    def ccb(ids: Long*)(bid: Long): Unit =
      EventPipelines.ccBatch(wh, "idx", "cc", "doc_id", "text",
        ngram = 3, k = 8, bands = 4, minJaccard = 0.2,
        batch = all.filter($"doc_id".isin(ids: _*)), batchId = bid,
        useLedger = false): Unit
    ccb(1L, 2L)(0L)
    ccb(3L, 4L)(1L)
    // simulate the crash BETWEEN doc-landing and version publish: batch
    // 1's docs stay landed, its published snapshot disappears
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    val latest = wh.latestVersion("idx", "cc__assign").get
    rm(new java.io.File(wh.path("idx", "cc__assign__versions"), s"v=$latest"))
    // the next batch must fold the ORPHANED docs (3, 4) in along with
    // its own arrival (5) against the still-consistent v1 snapshot —
    // "arrivals" are docs missing from the snapshot, not batch rows
    ccb(5L)(2L)
    val got = EventPipelines.ccAssignment(wh, "idx", "cc")
      .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toSet
    val full = Dedup.connectedComponents(
      Dedup.minhashLshNearDups(all, "text", "doc_id", 3, 8, 4, 0.2)
        .select($"id_1", $"id_2"),
      all.select($"doc_id"), "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(got == full, s"self-heal diverged: $got vs $full")
  }

  test("dedup ingest over a KEYED seed (q166 shape): same decisions, O(arrivals) probe") {
    import graft.operators.Dedup
    val base = "the quick brown fox jumps over the lazy dog"
    val uniq = "completely different text about spark engines and planning"
    val dir = java.nio.file.Files.createTempDirectory("graft-sddk-src")
    val whRoot = java.nio.file.Files.createTempDirectory("graft-sddk-wh").toString
    val wh = new graft.sources.Warehouse(whRoot, spark)
    def docsOf(rows: (Long, String)*) = rows.toDF("doc_id", "text")
      .withColumn("source", lit("s"))
    // pre-seeded index landed WITH its band keys — the documented shape
    wh.overwrite(Dedup.withBandKeys(docsOf((1L, base)), "text", "doc_id", 3, 8, 4),
      "bl_3nf", "dd", partitionBy = Seq("source")): Unit
    def drop(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = java.nio.file.Files.createTempDirectory("graft-sddk-stage")
      df.repartition(1).write.mode("overwrite").parquet(stage.toString)
      val part = new java.io.File(stage.toString).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, dir.resolve(name))
    }
    drop(docsOf((2L, base.replace("dog", "cat")), (3L, uniq)), "b1.parquet") // 2 drops vs idx, 3 lands
    drop(docsOf((5L, uniq.replace("planning", "scheduling"))), "b2.parquet") // near-dups 3 → idx catches
    val stream = spark.readStream.schema(docsOf((0L, "x")).schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
    EventPipelines.dedupIngestAvailableNow(stream, wh,
      "bl_3nf", "dd", idCol = "doc_id", textCol = "text", partCol = "source",
      ngram = 3, k = 8, bands = 4, minJaccard = 0.2)
    val landedTbl = wh.readPartitioned("bl_3nf", "dd", "source")
    // the maintained table keeps its key column batch over batch, and
    // every landed doc that has shingles carries usable keys
    assert(landedTbl.columns.contains(Dedup.BAND_KEYS_COL))
    assert(landedTbl.filter(col(Dedup.BAND_KEYS_COL).isNull).count() == 0)
    assert(landedTbl.select($"doc_id").as[Long].collect().toSet == Set(1L, 3L))
  }

  test("streaming drains retire every per-batch cut: no persisted-RDD growth (incl. the distributed-CC fallback)") {
    import graft.operators.Dedup
    val sc = spark.sparkContext
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "a completely different document about spark physical plans"),
      (4L, "a completely different document about spark logical plans"),
      (5L, "the quick brown fox jumps over the lazy dog tomorrow")
    ).toDF("doc_id", "text")
    val arrDir = java.nio.file.Files.createTempDirectory("graft-ccleak").toString
    docs.filter($"doc_id" <= 2).coalesce(1).write.parquet(s"$arrDir/f1")
    docs.filter($"doc_id" === 3 || $"doc_id" === 4).coalesce(1).write.parquet(s"$arrDir/f2")
    docs.filter($"doc_id" === 5).coalesce(1).write.parquet(s"$arrDir/f3")
    val wh = new graft.sources.Warehouse(
      java.nio.file.Files.createTempDirectory("graft-ccleak-wh").toString, spark)
    // force the distributed min-label fallback inside the contraction
    // fold: its final label generation is cut INSIDE connectedComponents
    // (unretirable there — the returned plan reads it) and must be
    // caught by ccBatch's section-level id diff
    spark.conf.set("graft.cc.driverEdgeLimit", "0")
    // keySet diff, not a size diff: persistentRdds is weak-valued, so a
    // GC reaping OTHER tests' leftovers between the reads could mask a
    // genuine leak under a size comparison. New ids are monotonic, and
    // a NEW id still registered after the drain IS a leak.
    val before = sc.getPersistentRDDs.keySet.toSet
    try {
      EventPipelines.ccMaintainAvailableNow(
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1)
          .parquet(s"$arrDir/*"),
        wh, "idx", "ccleak", "doc_id", "text",
        ngram = 3, k = 8, bands = 4, minJaccard = 0.2)
    } finally spark.conf.unset("graft.cc.driverEdgeLimit")
    val leaked = sc.getPersistentRDDs.keySet.toSet -- before
    assert(leaked.isEmpty, s"ccMaintain drain left persisted RDDs: $leaked")
    // dedup ingest: same bound — keyed/survivors retire per batch and
    // the LAST batch's landed output retires when the drain completes
    val dd = docs.withColumn("source", lit("s"))
    val ddDir = java.nio.file.Files.createTempDirectory("graft-ddleak").toString
    dd.filter($"doc_id" <= 3).coalesce(1).write.parquet(s"$ddDir/f1")
    dd.filter($"doc_id" >= 4).coalesce(1).write.parquet(s"$ddDir/f2")
    val before2 = sc.getPersistentRDDs.keySet.toSet
    EventPipelines.dedupIngestAvailableNow(
      spark.readStream.schema(dd.schema).option("maxFilesPerTrigger", 1)
        .parquet(s"$ddDir/*"),
      wh, "idx", "ddleak", idCol = "doc_id", textCol = "text",
      partCol = "source", ngram = 3, k = 8, bands = 4, minJaccard = 0.2)
    val leaked2 = sc.getPersistentRDDs.keySet.toSet -- before2
    assert(leaked2.isEmpty, s"dedup-ingest drain left persisted RDDs: $leaked2")
  }
}
