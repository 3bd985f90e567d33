package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** BM25 ranking semantics, the count-min-sketch heavy-hitter contract,
  * and funnel sequencing — the spec side of the retrieval pack (the
  * oracle side is q98/q99/q103).
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("q98 bm25 ranks matching docs above non-matching, higher tf first") {
    val top = SparkEntry_bm25(sf)
    // every returned doc matches at least one query term
    assert(top.forall { case (_, tfs, score) => tfs.sum > 0 && score > 0 })
    // scores are non-increasing in rank order
    val scores = top.map(_._3)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  private def SparkEntry_bm25(d: String): Array[(Long, Seq[Int], Double)] =
    RetrievalQueries.queries("q98_bm25")(spark, d)
      .collect().map(r => (r.getLong(0),
        Seq(r.getInt(1), r.getInt(2), r.getInt(3)), r.getDouble(4)))

  test("count-min sketch estimates respect the eps*N over-count contract") {
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(explode(TextFunctions.tokens($"text")).as("token"))
    val n = toks.count()
    val eps = 0.001
    val cms = toks.stat.countMinSketch("token", eps = eps, confidence = 0.99, seed = 42)
    val exact = toks.groupBy($"token").count()
      .orderBy($"count".desc).limit(20)
      .as[(String, Long)].collect()
    exact.foreach { case (tok, cnt) =>
      val est = cms.estimateCount(tok)
      assert(est >= cnt, s"CMS must never under-count: $tok est=$est exact=$cnt")
      assert(est <= cnt + (eps * n).toLong + 1,
        s"CMS over-count beyond eps*N: $tok est=$est exact=$cnt n=$n")
    }
  }

  test("q131 hybrid RRF: integer fusion arithmetic, bounded ranks, deterministic") {
    val rows = RetrievalQueries.queries("q131_hybrid_rrf")(spark, sf)
      .select($"doc_id", $"r_lex", $"r_sem", $"rrf_ppb")
      .as[(Long, Int, Int, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (_, rl, rs, ppb) =>
      assert(rl >= 0 && rl <= 50 && rs >= 0 && rs <= 50)
      assert(rl > 0 || rs > 0) // fused docs came from at least one leg
      val expected = (if (rl > 0) 1000000000L / (60 + rl) else 0L) +
        (if (rs > 0) 1000000000L / (60 + rs) else 0L)
      assert(ppb == expected) // the score IS the integer RRF definition
    }
    val again = RetrievalQueries.queries("q131_hybrid_rrf")(spark, sf)
      .select($"doc_id", $"r_lex", $"r_sem", $"rrf_ppb")
      .as[(Long, Int, Int, Long)].collect()
    assert(rows.sameElements(again))
  }

  test("q103 funnel requires strict view -> click -> purchase ordering") {
    import java.sql.Timestamp
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val events = Seq(
      // user 1: full ordered funnel
      (1L, ts(1), 1L, "view", 1.0, "{}"),
      (2L, ts(2), 1L, "click", 1.0, "{}"),
      (3L, ts(3), 1L, "purchase", 1.0, "{}"),
      // user 2: click BEFORE first view -> stage stops at 1
      (4L, ts(1), 2L, "click", 1.0, "{}"),
      (5L, ts(2), 2L, "view", 1.0, "{}"),
      // user 3: purchase before click -> stage 2, purchase not counted
      (6L, ts(1), 3L, "view", 1.0, "{}"),
      (7L, ts(2), 3L, "purchase", 1.0, "{}"),
      (8L, ts(3), 3L, "click", 1.0, "{}"),
      // user 4: never viewed -> absent from the funnel
      (9L, ts(1), 4L, "purchase", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")

    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    events.withColumn("ts", expr("unix_micros(ts) * 1000"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = EventsQueries.queries("q103_funnel")(spark, dir)
      .select($"user_id", $"stage").as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 3, 2L -> 1, 3L -> 2))
  }
}
