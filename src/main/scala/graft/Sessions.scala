package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession factory: UTC, AQE on, local-sized shuffle
  * partitions. On a real cluster the same builder is used minus
  * `master`, with shuffle partitions sized to cores×2-3.
  */
object Sessions {
  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
              Runtime.getRuntime.availableProcessors().toString),
            app: String = "graft"): SparkSession = {
    // "*" is the standard local-master spelling but not a partition
    // count — resolve it up front instead of deferring a
    // NumberFormatException to the first shuffle
    val nShuffle =
      if (cores == "*") Runtime.getRuntime.availableProcessors().toString
      else cores
    require(nShuffle.forall(_.isDigit) && nShuffle.toIntOption.exists(_ >= 1),
      s"SPARK_GRAFT_CPUS must be a positive integer or '*', got '$cores'")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(app)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // Csv encoding fallback probes windows-1252, which Spark 4's
      // charset allowlist rejects without this flag.
      .config("spark.sql.legacy.javaCharsets", "true")
      .config("spark.sql.shuffle.partitions", nShuffle)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // events.parquet carries TIMESTAMP(NANOS) which Spark has no native
      // type for; read as long and convert (Tables.events).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // A/B seam: session confs from the environment
    // (SPARK_GRAFT_SESSION_CONF="k=v;k2=v2"). graft.* keys cannot ride
    // -D system properties (Spark only forwards spark.*-prefixed ones
    // into the conf), and bench A/B runs (driver-CC cap experiments,
    // fastFold off, compaction budgets) need a no-recompile way to set
    // them. Malformed entries fail loudly — a typo'd key=value pair
    // must not silently run the DEFAULT side of an A/B.
    sys.env.get("SPARK_GRAFT_SESSION_CONF").foreach { s =>
      s.split(';').map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) if k.nonEmpty && v.nonEmpty => spark.conf.set(k, v)
          case _ => throw new IllegalArgumentException(
            s"SPARK_GRAFT_SESSION_CONF entry '$kv' is not key=value")
        }
      }
    }
    // WindowExec's "No Partition Defined" warning exists to flag
    // corpus-sized single-partition sorts; every unpartitioned window
    // in this library is over a PROVABLY BOUNDED relation (k-row
    // centroid seeds, R-row RRF candidate lists, dimension-cardinality
    // surrogate-key blocks — each marked at the call site with
    // Relational.tinyOrderedWindow), yet dozens of repeats per bench
    // run buried real warnings. A constant partition key can't silence
    // it — Spark's EliminateWindowPartitions strips foldable keys back
    // out — so the logger is raised to ERROR here, centrally and
    // documented. Corpus-scale window misuse is guarded by plan
    // assertions in the specs, not by this log line.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    // RDD.unpersist warns "was locally checkpointed … cannot be
    // recomputed after unpersisting" on EVERY retired fixpoint
    // generation (the CC/BPE loops now unpersist at the RDD level —
    // Dataset.unpersist was a silent no-op for checkpoint-backed
    // frames). The warning exists to flag accidental unpersists of
    // state someone might still read through — EXACTLY the signal that
    // would diagnose a real retirement bug (a wrongly-retired
    // checkpoint-backed model fails loudly on its next read, and this
    // warn is the breadcrumb). So suppression is OPT-IN: only the
    // high-volume harness entrypoints (Bench/Verify set the property —
    // thousands of deliberate retirements per run, pure repetition
    // burying real warnings) silence it; tests and ad-hoc sessions
    // keep every warning. Scope when enabled: the logger is the RDD's
    // runtime class, so it silences ALL MapPartitionsRDD warns — a
    // cluster deployment builds its own SparkSession and is never
    // affected. Misuse is guarded by the block-manager-bound specs in
    // TextDedupSpec either way.
    if (sys.props.get("graft.quietRddWarns")
        .orElse(sys.env.get("SPARK_GRAFT_QUIET_RDD_WARNS")).contains("1"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.rdd.MapPartitionsRDD",
        org.apache.logging.log4j.Level.ERROR)
    spark
  }
}
