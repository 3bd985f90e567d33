package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Frequency-sketch operators. The corpus sketches the query packs
  * already carry (HLL/LC distincts q191, GK-style quantiles q190, CMS
  * q182, Bloom q192) are value summaries; this module adds the
  * remaining classic — heavy hitters — as a MERGEABLE deterministic
  * summary (Misra–Gries), plus the two-pass exact protocol built on it.
  *
  * Why it matters at 100 TB: `GROUP BY token` over a web corpus
  * shuffles the ENTIRE vocabulary (10⁹⁺ keys) to answer "which tokens
  * dominate?". The Misra–Gries route shuffles at most `partitions × k`
  * candidate rows — constant per partition — and the second exact pass
  * is a broadcast semi-join + partial agg over only those candidates.
  */
object Sketches {

  /** Misra–Gries summary of one partition's stream: at most k (item,
    * counter) survivors. Classic guarantee (Misra & Gries 1982): any
    * item with local frequency > n_p / k survives with counter within
    * n_p / k of its true local count.
    */
  private[operators] def mgPartition(it: Iterator[String], k: Int): Iterator[(String, Long)] = {
    val m = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      m.get(t) match {
        case Some(c) => m.update(t, c + 1)
        case None if m.size < k => m.update(t, 1L)
        case None =>
          // decrement-all step; drop zeros (O(k), amortized over ≥ k arrivals)
          val dead = m.iterator.collect { case (key, 1L) => key }.toList
          m.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(m.remove)
      }
    }
    m.iterator
  }

  /** Per-partition Misra–Gries summaries of `valueCol`, as a relation
    * (item, mg_count) with ≤ k rows per input partition. Mergeable in
    * the Agarwal et al. ("Mergeable Summaries", PODS'12) sense: the
    * UNION of per-partition survivor sets is a superset of every item
    * with GLOBAL frequency > n / k — pigeonhole: an item below the
    * local threshold n_p / k in every partition is below n / k
    * globally. That superset property is all [[heavyHitters]] needs;
    * counters are advisory (pass 2 recounts exactly).
    */
  def mgSummaries(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    require(k >= 1, s"Misra-Gries needs k >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val vals: Dataset[String] =
      df.select(col(valueCol).cast("string")).na.drop().as[String]
    vals.mapPartitions(it => mgPartition(it, k)).toDF("item", "mg_count")
  }

  /** EXACT φ = 1/k heavy hitters by the standard two-pass protocol:
    * pass 1 builds the per-partition Misra–Gries candidate union
    * (bounded: partitions × k rows — the ONLY data that ever
    * shuffles); pass 2 recounts exactly those candidates with a
    * broadcast semi-join and keeps `count · k > n`. Output is
    * bit-identical to the full `GROUP BY` + `HAVING count(*)·k > n`
    * (the DuckDB-oracle form) — the sketch changes the plan, never the
    * answer. Returns (item, n_occurrences, n_total).
    */
  def heavyHitters(df: DataFrame, valueCol: String, k: Int): DataFrame = {
    val vals = df.select(col(valueCol).cast("string").as("item")).na.drop()
    val cand = mgSummaries(df, valueCol, k).select(col("item")).distinct()
    val total = vals.agg(count(lit(1)).as("n_total"))
    vals.join(broadcast(cand), Seq("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("n_occurrences"))
      .crossJoin(broadcast(total))
      .filter(col("n_occurrences") * k > col("n_total"))
  }
}
