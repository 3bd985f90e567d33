package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The stored-band-key probe ([[Dedup.withBandKeys]] /
  * [[Dedup.indexedCrossNearDups]]) — the round-12 mechanism that makes
  * streaming dedup/CC maintenance O(arrivals + collisions) instead of
  * re-signaturing the landed corpus every micro-batch.
  */
class IndexedDedupSpec extends SparkSpec {
  import spark.implicits._

  private val NGRAM = 3; private val K = 8; private val BANDS = 4
  private val MIN_J = 0.2

  private val idxDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog tonight"),
    (2L, "a completely different document about spark physical plans"),
    (3L, "unrelated text with nothing shared at all anywhere here")
  ).toDF("doc_id", "text")
  private val newDocs = Seq(
    (11L, "the quick brown fox jumps over the lazy dog today"), // near-dup of 1
    (12L, "fresh text mentioning parquet readers and shuffle services"),
    (13L, "a completely different document about spark logical plans") // near-dup of 2
  ).toDF("doc_id", "text")

  private def asPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select($"idx_id", $"new_id").as[(Long, Long)].collect().toSet

  test("indexedCrossNearDups over stored keys ≡ crossCorpusNearDups recomputing them") {
    val idx = Dedup.withBandKeys(idxDocs, "text", "doc_id", NGRAM, K, BANDS)
    val got = Dedup.indexedCrossNearDups(newDocs, idx, "text", "doc_id",
      NGRAM, K, BANDS, MIN_J)
    val tagged = idxDocs.withColumn("__side", lit("idx"))
      .unionByName(newDocs.withColumn("__side", lit("new")))
    val want = Dedup.crossCorpusNearDups(tagged, "text", "doc_id",
      "__side", "idx", "new", NGRAM, K, BANDS, MIN_J)
    assert(asPairs(got) == asPairs(want) && asPairs(got).nonEmpty)
    // jaccard values agree too (exact verify on both paths)
    val gj = got.as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val wj = want.select($"idx_id", $"new_id", $"jaccard")
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(gj == wj)
  }

  test("the STORED keys drive the candidates: poisoning one kills exactly that pair") {
    // corrupt doc 1's stored band-key array. If the operator re-computed
    // landed-side signatures from text (the O(corpus)-per-batch behavior
    // this contract forbids), the poison would be invisible and the
    // (1, 11) pair would still surface.
    val idx = Dedup.withBandKeys(idxDocs, "text", "doc_id", NGRAM, K, BANDS)
      .withColumn(Dedup.BAND_KEYS_COL,
        when($"doc_id" === 1L,
          transform(col(Dedup.BAND_KEYS_COL), _ => lit("poisoned")))
          .otherwise(col(Dedup.BAND_KEYS_COL)))
    val got = asPairs(Dedup.indexedCrossNearDups(newDocs, idx, "text", "doc_id",
      NGRAM, K, BANDS, MIN_J))
    assert(!got.exists(_._1 == 1L), s"poisoned stored key still matched: $got")
    assert(got.contains((2L, 13L)), s"untouched stored keys must still match: $got")
  }

  test("short / shingle-less docs carry NULL key arrays and never match") {
    val idx = Dedup.withBandKeys(
      idxDocs.unionByName(Seq((4L, "too short")).toDF("doc_id", "text")),
      "text", "doc_id", NGRAM, K, BANDS)
    val nulls = idx.filter($"doc_id" === 4L)
      .select(col(Dedup.BAND_KEYS_COL).isNull).as[Boolean].collect()
    assert(nulls.sameElements(Array(true)))
    val got = asPairs(Dedup.indexedCrossNearDups(newDocs, idx, "text", "doc_id",
      NGRAM, K, BANDS, MIN_J))
    assert(!got.exists(_._1 == 4L))
  }

  test("storedKeySelfNearDups over stored keys ≡ minhashLshNearDups from text") {
    val docs = idxDocs.unionByName(newDocs)
    val got = Dedup.storedKeySelfNearDups(
      Dedup.withBandKeys(docs, "text", "doc_id", NGRAM, K, BANDS),
      "text", "doc_id", NGRAM, MIN_J)
      .as[(Long, Long, Double)].collect().toSet
    val want = Dedup.minhashLshNearDups(docs, "text", "doc_id",
      NGRAM, K, BANDS, MIN_J)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("storedKeyCrossNearDups with pre-keyed arrivals ≡ the recomputing path") {
    val idx = Dedup.withBandKeys(idxDocs, "text", "doc_id", NGRAM, K, BANDS)
    val arr = Dedup.withBandKeys(newDocs, "text", "doc_id", NGRAM, K, BANDS)
    val got = asPairs(Dedup.storedKeyCrossNearDups(arr, idx, "text", "doc_id",
      NGRAM, MIN_J))
    val tagged = idxDocs.withColumn("__side", lit("idx"))
      .unionByName(newDocs.withColumn("__side", lit("new")))
    val want = asPairs(Dedup.crossCorpusNearDups(tagged, "text", "doc_id",
      "__side", "idx", "new", NGRAM, K, BANDS, MIN_J))
    assert(got == want && got.nonEmpty)
  }

  test("plan shape: the stored-key probe computes NO minhash signatures anywhere") {
    // both inputs are materialized (lineage cut), so the probe's plan
    // is ONLY the probe: if it re-derived signatures from text on
    // either side, the mh* aggregate columns would appear in it — the
    // O(corpus)-per-batch work the stored-key contract forbids
    val idx = Dedup.withBandKeys(idxDocs, "text", "doc_id", NGRAM, K, BANDS)
      .localCheckpoint(true)
    val arr = Dedup.withBandKeys(newDocs, "text", "doc_id", NGRAM, K, BANDS)
      .localCheckpoint(true)
    val probe = Dedup.storedKeyCrossNearDups(arr, idx, "text", "doc_id",
      NGRAM, MIN_J)
    assert(!probe.queryExecution.optimizedPlan.toString.contains("mh0"),
      "stored-key probe plan contains signature computation")
    // positive control: the recomputing path's plan DOES carry them
    val tagged = idxDocs.withColumn("__side", lit("idx"))
      .unionByName(newDocs.withColumn("__side", lit("new")))
    val recompute = Dedup.crossCorpusNearDups(tagged, "text", "doc_id",
      "__side", "idx", "new", NGRAM, K, BANDS, MIN_J)
    assert(recompute.queryExecution.optimizedPlan.toString.contains("mh0"))
    // and the probe still finds the pairs (the plan is minimal, not empty)
    assert(asPairs(probe).nonEmpty)
  }

  test("bandKeyArrays matches the banding relation the candidate joins use") {
    // element b of the stored array == the (band=b, bkey) row of
    // lshCandidatePairs' exploded relation — same md5-concat recipe, so
    // stored-key and recomputed-key candidate sets are interchangeable
    val sh = Dedup.shingleTable(idxDocs, "text", "doc_id", NGRAM)
    val sig = Dedup.minhashSignatures(sh, "doc_id", K)
    val viaArrays = Dedup.bandKeyArrays(idxDocs, "text", "doc_id", NGRAM, K, BANDS)
      .select($"doc_id", posexplode(col(Dedup.BAND_KEYS_COL)))
      .select($"doc_id", $"pos".as("band"), $"col".as("bkey"))
      .as[(Long, Int, String)].collect().toSet
    // reproduce bandRelation through the public candidate-pair surface:
    // self-join of idxDocs against itself collides every doc with itself
    // on every band — instead just rebuild the keys from the signatures
    val rpb = K / BANDS
    val viaSig = sig.select($"doc_id", posexplode(array((0 until BANDS).map { b =>
      md5(concat_ws("|", (0 until rpb).map(j => col(s"mh${b * rpb + j}")): _*))
    }: _*))).select($"doc_id", $"pos".as("band"), $"col".as("bkey"))
      .as[(Long, Int, String)].collect().toSet
    assert(viaArrays == viaSig && viaArrays.size == idxDocs.count() * BANDS)
  }
}
