package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths, mirroring what a 100 TB pipeline needs:
  *  - [[bruteForceKnn]]: exact cosine top-k via self-join — the
  *    correctness baseline, quadratic, only for small/filtered sets
  *    (or per-LSH-bucket after blocking).
  *  - [[lshNearPairs]]: sign-bit LSH bucketing → candidates share a
  *    bucket → exact cosine only on candidates. The bucket join is an
  *    equi-join (shuffle on the bucket key), so the all-pairs cross
  *    product never materializes; bucket skew is handled by AQE or by
  *    raising `bits`. An IVF variant is the same shape with learned
  *    centroid ids as the bucket key.
  */
object Similarity {

  /** Exact cosine top-k neighbors per vector (excluding self), with a
    * deterministic neighbor-id tie-break.
    */
  def bruteForceKnn(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    // Norms are computed once per vector BEFORE the self-join (2N sqrt's,
    // not 2N² — the join then evaluates a single codegen'd dot per pair).
    // cos = dot/(na*nb) is the same arithmetic as dot/(sqrt(Σa²)·sqrt(Σb²)),
    // so oracle results stay bit-identical.
    val a = emb.select(col(idCol).as("vec_id"), col(vecCol).as("va"),
      norm(col(vecCol)).as("na"))
    val b = emb.select(col(idCol).as("nn_id"), col(vecCol).as("vb"),
      norm(col(vecCol)).as("nb"))
    // Top-k via a bounded partial aggregate, not a window: map tasks
    // reduce to ≤k per vec_id before the exchange (see TopKByScore).
    val topk = udaf(new graft.functions.TopKByScore(k))
    a.crossJoin(b).filter(col("vec_id") =!= col("nn_id"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .groupBy(col("vec_id"))
      .agg(topk(col("cos"), col("nn_id")).as("nns"))
      .select(col("vec_id"), posexplode(col("nns")))
      .select(col("vec_id"), col("col._2").as("nn_id"), col("col._1").as("cos"),
        (col("pos") + 1).cast("int").as("rn"))
  }

  /** Sign-bit LSH buckets: (id, bucket). */
  def buckets(emb: DataFrame, idCol: String, vecCol: String, bits: Int): DataFrame =
    emb.select(col(idCol), col(vecCol), signBucket(col(vecCol), bits).as("bucket"))

  /** IVF-style ANN: exact top-k restricted to the probed coarse
    * partition (`clusterCol` — a centroid/cell id from any coarse
    * quantizer; the testdata's `label` plays that role). The classic
    * IVF trade: recall bounded by the quantizer, cost divided by the
    * number of cells. nprobe>1 = union several cluster ids upstream.
    * Partition-local: the self-join shuffles on the cluster key only —
    * each cell's quadratic search is independent, so the shape
    * parallelizes across cells at 100 TB.
    */
  def ivfKnn(emb: DataFrame, idCol: String, vecCol: String,
             clusterCol: String, k: Int): DataFrame = {
    val a = emb.select(col(clusterCol).as("cluster"), col(idCol).as("vec_id"),
      col(vecCol).as("va"), norm(col(vecCol)).as("na"))
    val b = emb.select(col(clusterCol).as("cluster"), col(idCol).as("nn_id"),
      col(vecCol).as("vb"), norm(col(vecCol)).as("nb"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("nn_id"))
    a.join(b, "cluster").filter(col("vec_id") =!= col("nn_id"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("cluster"), col("vec_id"), col("nn_id"), col("cos"), col("rn"))
  }

  /** Near pairs: same bucket AND exact cosine ≥ minCos. */
  def lshNearPairs(emb: DataFrame, idCol: String, vecCol: String,
                   bits: Int, minCos: Double): DataFrame = {
    val bk = buckets(emb, idCol, vecCol, bits)
    val a = bk.select(col(idCol).as("id_1"), col(vecCol).as("va"),
      norm(col(vecCol)).as("na"), col("bucket"))
    val b = bk.select(col(idCol).as("id_2"), col(vecCol).as("vb"),
      norm(col(vecCol)).as("nb"), col("bucket"))
    a.join(b, "bucket").filter(col("id_1") < col("id_2"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= minCos)
      .select(col("id_1"), col("id_2"), col("cos"))
  }
}
