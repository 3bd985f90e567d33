package graft.streaming

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Randomized invariants for the streaming-CC fold and its stored-key
  * probes — breadth behind StreamingSpec's hand-built corpora.
  * Deterministic seeds, raw scalacheck Gen (the scalatest bridge isn't
  * in the offline cache), same device as BpePropertySpec.
  *
  * The central property is EXACT, not statistical: band keys are
  * per-document functions of the text, so the LSH candidate relation
  * decomposes across any wave split (within-wave self-joins ∪
  * arrival×assigned probes cover every colliding pair exactly once),
  * and the contraction preserves connectivity — so the maintained
  * assignment must equal one-shot batch CC label-for-label on EVERY
  * corpus and EVERY split, whatever the LSH parameters happen to
  * catch.
  */
class StreamCcPropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](ga: Gen[A], n: Int)(f: (A, Int) => Unit): Unit =
    (1 to n).foreach { i =>
      f(ga(Gen.Parameters.default, Seed(i * 2654435761L)).get, i)
    }

  // documents over a tiny vocabulary with deliberate near-dup pressure:
  // exact dups under fresh ids, single-word edits of shared bases
  // (near-dups), fresh sentences (singletons), and shingle-less shorties
  // (the NULL-band-key path)
  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "spark",
    "plan", "fox", "dog", "lazy", "quick")
  private val baseDoc = Gen.listOfN(8, word).map(_.mkString(" "))
  private val corpusGen: Gen[Seq[(Long, String)]] = for {
    bases <- Gen.choose(2, 4).flatMap(Gen.listOfN(_, baseDoc))
    n <- Gen.choose(4, 10)
    docs <- Gen.listOfN(n, for {
      b <- Gen.oneOf(bases)
      fresh <- baseDoc
      edit <- word
      pos <- Gen.choose(0, 7)
      kind <- Gen.frequency(3 -> 0, 4 -> 1, 3 -> 2, 1 -> 3)
    } yield kind match {
      case 0 => b
      case 1 => val t = b.split(" "); t(pos) = edit; t.mkString(" ")
      case 2 => fresh
      case _ => "xy" // two chars: zero 3-gram shingles, NULL keys
    })
  } yield docs.zipWithIndex.map { case (t, i) => (i + 1L, t) }

  private def fullCc(corpus: Seq[(Long, String)]): Set[(Long, Long)] = {
    val df = corpus.toDF("doc_id", "text")
    Dedup.connectedComponents(
      Dedup.minhashLshNearDups(df, "text", "doc_id", 3, 8, 4, 0.2)
        .select($"id_1", $"id_2"),
      df.select($"doc_id"), "doc_id")
      .as[(Long, Long)].collect().toSet
  }

  test("ccBatch fold over a RANDOM wave split ≡ one-shot batch CC, label for label") {
    val gen = for {
      c <- corpusGen
      x <- Gen.choose(0, c.size)
      y <- Gen.choose(0, c.size)
    } yield (c, math.min(x, y), math.max(x, y))
    forAll(gen, 5) { case ((corpus, a, b), i) =>
      val whRoot = java.nio.file.Files.createTempDirectory(s"graft-ccprop$i").toString
      val wh = new graft.sources.Warehouse(whRoot, spark)
      // three waves, any of which may be empty (empty first batch must
      // not create a table; empty later batch must be a no-op)
      Seq(corpus.take(a), corpus.slice(a, b), corpus.drop(b))
        .zipWithIndex.foreach { case (w, bid) =>
          EventPipelines.ccBatch(wh, "idx", "cc", "doc_id", "text",
            ngram = 3, k = 8, bands = 4, minJaccard = 0.2,
            batch = w.toDF("doc_id", "text"), batchId = bid.toLong,
            useLedger = false): Unit
        }
      val got = EventPipelines.ccAssignment(wh, "idx", "cc")
        .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toSet
      assert(got == fullCc(corpus),
        s"seed $i (split $a/$b of ${corpus.size}): fold diverged from batch CC")
      // the docs index landed every doc exactly once, keys attached
      val docsTbl = wh.read("idx", "cc")
      assert(docsTbl.count() == corpus.size)
      assert(docsTbl.columns.contains(Dedup.BAND_KEYS_COL))
    }
  }

  test("storedKeySelfNearDups ≡ minhashLshNearDups on random corpora") {
    forAll(corpusGen, 8) { (corpus, i) =>
      val df = corpus.toDF("doc_id", "text")
      val got = Dedup.storedKeySelfNearDups(
        Dedup.withBandKeys(df, "text", "doc_id", 3, 8, 4),
        "text", "doc_id", 3, 0.2)
        .as[(Long, Long, Double)].collect().toSet
      val want = Dedup.minhashLshNearDups(df, "text", "doc_id", 3, 8, 4, 0.2)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == want, s"seed $i: stored-key pairs diverged")
    }
  }
}
