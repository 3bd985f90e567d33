package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Focused coverage for the round-15 kernel-parallelism changes:
  * [[KernelPar]]'s derivation/override/loud-parse contract, the
  * `spread` conditional, and the two operator-internal rewrites that
  * ride on it — bruteForceKnn's per-side zero-norm filter (replacing
  * the pushed cos-isNotNull that double-evaluated the dot inside the
  * nested-loop join condition) and jaccardPairs' pinned shingle
  * exchange (whose results must be partition-count-independent).
  */
class KernelParSpec extends SparkSpec {
  import spark.implicits._

  test("partitions: derived default fills every slot on a small session") {
    // the shared test session runs local[4]: min(4, max(8, 4/4)) = 4 —
    // the low-core floor must never leave task slots idle
    assert(KernelPar.partitions(spark) == 4)
  }

  test("partitions: conf override honored, malformed/out-of-range loud") {
    // newSession isolates the conf from concurrently-running suites
    val s2 = spark.newSession()
    s2.conf.set("graft.kernel.parallelism", "3")
    assert(KernelPar.partitions(s2) == 3)
    s2.conf.set("graft.kernel.parallelism", "8_000")
    intercept[IllegalArgumentException](KernelPar.partitions(s2))
    s2.conf.set("graft.kernel.parallelism", "2000000")
    intercept[IllegalArgumentException](KernelPar.partitions(s2))
  }

  test("spread: identity at-or-above the target, repartitions below it") {
    val s2 = spark.newSession()
    s2.conf.set("graft.kernel.parallelism", "3")
    import s2.implicits._
    val below = Seq.tabulate(20)(i => (i.toLong, s"d$i")).toDF("id", "t")
      .repartition(1)
    assert(KernelPar.spread(below).rdd.getNumPartitions == 3)
    val enough = Seq.tabulate(20)(i => (i.toLong, s"d$i")).toDF("id", "t")
      .repartition(5)
    // already ≥ target: the input relation comes back untouched — the
    // at-scale guarantee that spread never ADDS a pass
    assert(KernelPar.spread(enough).rdd.getNumPartitions == 5)
  }

  test("bruteForceKnn: zero-norm rows excluded from BOTH roles, result " +
    "equals an independent window-ranked reference") {
    val emb = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0.9f, 0.1f, 0f)),
      (3L, Array(0f, 1f, 0f)),
      (4L, Array(0f, 0f, 0f)), // zero norm: no cosine in either role
      (5L, Array(-1f, 0f, 0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.bruteForceKnn(emb, "vec_id", "embedding", 2)
      .select($"vec_id", $"nn_id", $"cos", $"rn")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(!got.exists(r => r._1 == 4L || r._2 == 4L),
      "zero-norm vector must appear in neither the query nor the neighbor role")
    // independent reference: explicit guarded cosine over the cross
    // join + a row_number window with the same (cos desc, id asc) order
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorFunctions.{dot, norm}
    val a = emb.select($"vec_id", $"embedding".as("va"), norm($"embedding").as("na"))
    val b = emb.select($"vec_id".as("nn_id"), $"embedding".as("vb"), norm($"embedding").as("nb"))
    val ref = a.join(b, $"vec_id" =!= $"nn_id")
      .withColumn("cos", when($"na" * $"nb" =!= 0, dot($"va", $"vb") / ($"na" * $"nb")))
      .filter($"cos".isNotNull)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"cos".desc, $"nn_id".asc)))
      .filter($"rn" <= 2)
      .select($"vec_id", $"nn_id", $"cos", $"rn".cast("int"))
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(got == ref)
  }

  test("jaccardPairs: identical relation at kernel parallelism 1 and 7 " +
    "(capped and uncapped)") {
    val s2 = spark.newSession()
    import s2.implicits._
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d x y"),
      (3L, "a b c q r s"),
      (4L, "z z z a b c")
    ).toDF("doc_id", "text")
    val sh = Dedup.shingleTable(docs, "text", "doc_id", 3)
    def run(p: String, cap: Option[Int]) = {
      s2.conf.set("graft.kernel.parallelism", p)
      Dedup.jaccardPairs(sh, "doc_id", 0.0, cap)
        .as[(Long, Long, Double)].collect().toSet
    }
    assert(run("1", None) == run("7", None))
    assert(run("1", Some(2)) == run("7", Some(2)))
  }

  test("derive: tracks defaultParallelism at cluster sizes — the 8-way floor is a floor, not a cap") {
    // rig-floor regime: every slot up to 8-way
    assert(KernelPar.derive(1) == 1)
    assert(KernelPar.derive(4) == 4)
    assert(KernelPar.derive(8) == 8)
    // oversubscription regime: a quarter of the advertised threads,
    // floored at 8
    assert(KernelPar.derive(16) == 8)
    assert(KernelPar.derive(32) == 8)
    // cluster regime: scales LINEARLY with the session — a 4096-slot
    // cluster must get 1024-way kernels, never this rig's 8
    assert(KernelPar.derive(64) == 16)
    assert(KernelPar.derive(512) == 128)
    assert(KernelPar.derive(4096) == 1024)
    // monotone and never above the slot count at any size
    (1 to 5000).foldLeft(0) { (prev, dp) =>
      val p = KernelPar.derive(dp)
      assert(p >= prev && p <= dp, s"dp=$dp p=$p prev=$prev")
      p
    }: Unit
  }
}
