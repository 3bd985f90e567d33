package graft.operators

import org.apache.spark.sql.SparkSession

/** Partition count for COMPUTE-DENSE kernel stages.
  *
  * Spark sizes every stage's parallelism by BYTES: scan splits pack
  * files up to `maxPartitionBytes` (with a 4 MB open-cost floor that
  * leaves a small file in one split), and AQE coalesces post-shuffle
  * partitions down to `coalescePartitions.minPartitionSize` (1 MB).
  * Both policies assume compute ∝ bytes. The quadratic/explosive
  * kernels in this library violate that by orders of magnitude: a
  * 600 KB document corpus explodes into Σ df·(df−1)/2 candidate-pair
  * rows, an exact-KNN baseline evaluates a 64-dim cosine per PAIR of a
  * self-join, a MinHash signature computes k md5 hashes per shingle
  * row. Left to byte-sizing those stages land on 1-8 tasks while the
  * rest of the cluster idles (measured: the exact-KNN build ran its
  * 4M-pair nested-loop join on 4 tasks of a 32-core session — wall
  * 6.5 s for 6.1 s of task time; guide §2.6 "stragglers and idle
  * capacity" is exactly this, at stage grain).
  *
  * Each such kernel pins its expensive stage's partitioning to
  * `graft.kernel.parallelism` (session conf, loud parse; a
  * user-specified repartition count is exempt from AQE's byte-based
  * coalescing — the point of the pin). The derived default is
  * min(defaultParallelism, max(8, defaultParallelism / 4)):
  * every task slot up to 8-way, and a QUARTER of the advertised
  * threads beyond that — deliberately below the hardware-thread count,
  * because these stages are memory-bound (string hashing,
  * broadcast-relation probes, array scans), and memory-bound kernels
  * saturate well under the logical-CPU count on SMT /
  * oversubscribed-vCPU hosts. Measured on the 32-vCPU bench rig
  * (alternating cold runs of the six kernel-bound queries, medians):
  * byte-derived partitioning 17.6 s total, pin=8 (= threads/4) 13.3 s,
  * pin=32 (= all threads) 23.3 s with per-task CPU inflated 5-20× —
  * full-thread concurrency thrashes the shared cache and is strictly
  * WORSE than leaving the stage near-serial; up to 8-way, added
  * concurrency never hurt any measured kernel (a pure-arithmetic probe
  * put the host's real concurrent throughput at ~8 cores' worth).
  *
  * Production: the default still scales with the cluster (it derives
  * from defaultParallelism, never a constant), but a deployment on
  * dedicated hardware should set `graft.kernel.parallelism` to its
  * physical-core count (or shuffle-partition count for very large
  * corpora) — on non-oversubscribed iron the saturation point is the
  * physical cores, not a quarter of the advertised threads.
  */
object KernelPar {
  def partitions(spark: SparkSession): Int = {
    val conf = Dedup.longConf(spark, "graft.kernel.parallelism", 0L)
    require(conf >= 0 && conf <= 1000000,
      s"graft.kernel.parallelism=$conf out of range [0 (derive), 1000000]")
    if (conf > 0L) conf.toInt
    else derive(spark.sparkContext.defaultParallelism)
  }

  /** The derived-default formula, exposed for direct spec coverage at
    * simulated cluster sizes (a live test session cannot fake a
    * thousand-slot defaultParallelism): min(dp, max(8, dp / 4)) —
    * scales linearly with the session past 32 slots, never a constant
    * cap (KernelParSpec pins the shape so the 8-way floor tuned on
    * this rig can never fossilize into a cluster-size cap).
    */
  private[operators] def derive(dp: Int): Int =
    math.min(dp, math.max(8, dp / 4))

  /** Spread a SCAN-ROOTED relation to at least [[partitions]] splits —
    * for kernels whose expensive work is MAP-SIDE of their first
    * exchange (per-row hashing/decoding inside a partial aggregate),
    * where pinning the exchange itself would defeat partial aggregation
    * and shuffle the pre-aggregated relation (§2.3: aggregate before
    * you shuffle). Conditional: when the input already has enough
    * splits (any at-scale scan), this is the identity — the extra
    * round-robin pass exists only where byte-sized splitting
    * under-parallelized the scan. Caller contract: `df` must have no
    * shuffle upstream (`.rdd` on an AQE plan executes its exchange
    * stages eagerly, and the real query would not reuse them).
    */
  def spread(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val p = partitions(df.sparkSession)
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
