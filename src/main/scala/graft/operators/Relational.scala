package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** General relational operators shared across layers.
  *
  * Each maps 1:1 to a SURVEY §2 row; all are plain Catalyst-optimizable
  * DataFrame graphs (predicate pushdown / column pruning / broadcast
  * decided by the optimizer, AQE re-plans shuffles at runtime).
  */
object Relational {

  /** P3: incremental watermark — keep only src rows strictly newer than
    * max(tsCol) of the target (reference:
    * sql/3nf/load_3nf_ce_sales_pre_fact_table.sql:21-23,94).
    *
    * The max() is a cheap single-column scan (column-pruned); the
    * resulting filter is pushed to the parquet scan of `src`, so with a
    * date-partitioned source this prunes whole partitions — the property
    * that keeps incremental loads O(new data) at 100 TB.
    */
  def newerThanWatermark(src: DataFrame, target: DataFrame, tsCol: String): DataFrame = {
    val wm = target.agg(max(col(tsCol))).head().get(0)
    if (wm == null) src else src.filter(col(tsCol) > lit(wm))
  }

  /** U1: PostgreSQL UNION semantics (dedup) — Spark union is UNION ALL,
    * so the distinct() is load-bearing (SURVEY §3.4.2).
    */
  def unionDistinct(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).distinct()

  /** J2/F2: default-row backfill — the reference cross-joins a 1-row
    * default dimension record (id −1, 'n.a.') so COALESCE can replace
    * NULLs (reference: sql/3nf/load_3nf_ce_continents_table.sql:24-25).
    * Expressed directly as coalesce with the default constants: same
    * semantics, no join at all.
    */
  def withDefault(c: Column, default: Any): Column = coalesce(c, lit(default))

  /** §2.5: top-k per group with a deterministic tie-break. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** F19: sequence replacement — dense surrogate ids for new rows,
    * offset past the existing max id.
    *
    * `row_number over (order by …)` funnels through a single partition:
    * fine at dimension cardinality (the reference's dims are ≤15k rows),
    * wrong for facts. For fact-scale key needs use
    * [[surrogateKeysHashed]] instead.
    */
  def surrogateKeys(newRows: DataFrame, orderCol: String, maxExisting: Long, idCol: String): DataFrame =
    newRows.withColumn(idCol,
      (row_number().over(tinyOrderedWindow(col(orderCol))) + lit(maxExisting)).cast(LongType))

  /** Window spec for PROVABLY TINY relations — k-row centroid seeds,
    * R-row candidate lists, dimension-cardinality key blocks. Runtime
    * behavior is identical to `Window.orderBy` (the constant partition
    * key below is stripped by Spark's EliminateWindowPartitions rule;
    * everything lands in one partition — which is the point at these
    * cardinalities). The call through this helper is an AUDIT MARKER:
    * it asserts the input is bounded by construction, and is why
    * [[graft.Sessions.local]] raises WindowExec's "No Partition
    * Defined" logger (aimed at corpus-sized inputs) to ERROR. Do NOT
    * use where the input can scale with the data.
    */
  def tinyOrderedWindow(order: Column*): org.apache.spark.sql.expressions.WindowSpec =
    Window.partitionBy(lit(0)).orderBy(order: _*)

  /** Fact-scale surrogate keys: deterministic 64-bit hash of the business
    * key — no global sort, no single-partition window, collision-checked
    * by callers via a post-load uniqueness assertion (SURVEY §7.4).
    */
  def surrogateKeysHashed(rows: DataFrame, businessKey: Seq[String], idCol: String): DataFrame =
    rows.withColumn(idCol, xxhash64(businessKey.map(col): _*))

  /** Fact-scale global ordinals 1..N in `sortExprs` order WITHOUT a
    * single-partition window: range-repartition on the sort key, sort
    * within partitions, then a distributed zipWithIndex (one per-
    * partition counting pass + one indexed pass). The scalable twin of
    * [[surrogateKeys]] for when rank must follow an ORDER (frequency
    * ranks, leaderboards) rather than just be unique — every partition
    * carries ~N/parts rows, nothing funnels through one task.
    *
    * Requires the sort key to be UNIQUE per row (makes row_number ≡
    * dense_rank ≡ rank); ordinal values depend only on the total order,
    * not on the sampled range bounds, so the result is deterministic.
    * Duplicate sort keys would make the ordinals among the tied rows
    * depend on range-partition sampling — misuse the caller must rule
    * out, not a case this operator silently resolves. `idCol` must not
    * already exist in the schema (validated — a duplicate-name column
    * would poison every downstream reference).
    */
  def orderedRanks(df: DataFrame, sortExprs: Seq[Column], idCol: String): DataFrame = {
    require(!df.columns.exists(_.equalsIgnoreCase(idCol)),
      s"orderedRanks: output column '$idCol' already exists in the input schema " +
        s"(${df.columns.mkString(", ")})")
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortExprs: _*).sortWithinPartitions(sortExprs: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(idCol, LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Distributed EXCLUSIVE prefix sum of `valueCol` (long) in
    * `sortExprs` order, with NO single-partition window: the classic
    * two-pass scan — range-repartition + in-partition sort, collect the
    * numPartitions per-partition totals (bounded driver state: one long
    * per partition), then stream each partition once more adding its
    * exclusive offset. The input is materialized once so both passes
    * see identical partitioning. Same unique-sort-key contract as
    * [[orderedRanks]]: duplicate keys would make the ordinal order — and
    * thus each duplicate's prefix — nondeterministic.
    */
  def orderedPrefixSum(df: DataFrame, sortExprs: Seq[Column], valueCol: String,
                       outCol: String): DataFrame = {
    require(!df.columns.exists(_.equalsIgnoreCase(outCol)),
      s"orderedPrefixSum: output column '$outCol' already exists in the input schema")
    require(df.schema(valueCol).dataType == LongType,
      s"orderedPrefixSum: '$valueCol' must be LongType, got " +
        df.schema(valueCol).dataType.simpleString)
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*).localCheckpoint(true)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val partSums = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var s = 0L; it.foreach(r => s += r.getLong(vIdx)); Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(outCol, LongType, nullable = false))
    val rdd = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { r =>
        val out = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ acc)
        acc += r.getLong(vIdx)
        out
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** As-of join: for each left row, the single latest right row with
    * `rightTs <= leftTs` on the same key — the price-at-event-time
    * lookup Spark has no built-in for (the reference sidesteps it by
    * using the currently-active price, SURVEY §3.4.5; this operator is
    * the "more correct" variant).
    *
    * Implementation is the union-and-carry-forward form, NOT a range
    * join: tag right rows 0 / left rows 1, sort within each key by
    * (ts, tag), and carry the latest right row forward as ONE struct
    * with an unbounded-preceding window — atomically, so a NULL
    * attribute in the matched version stays NULL instead of being
    * back-filled from an older version. ONE shuffle on the key — the
    * same cost as a plain equi-join — versus a range join's quadratic
    * per-key blowup; at same-ts ties the right row sorts first, giving
    * the inclusive (>=) semantics of SQL ASOF JOIN.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String): DataFrame = {
    val rightAttrs = right.columns.filterNot(c => keys.contains(c) || c == rightTs).toSeq
    val leftAttrs = left.columns.filterNot(c => keys.contains(c) || c == leftTs).toSeq
    require(leftAttrs.intersect(rightAttrs).isEmpty,
      s"asOfJoin: colliding attribute names ${leftAttrs.intersect(rightAttrs).mkString(",")}" +
        " — rename one side first")
    // keys included: a key NAMED __ts would otherwise slip past the
    // guard and collide with the tag projection downstream
    require(!(keys ++ leftAttrs ++ rightAttrs)
      .exists(c => c == "__ts" || c == "__tag" || c == "__r"),
      "asOfJoin: __ts/__tag/__r are reserved")
    require(rightAttrs.nonEmpty, "asOfJoin: right side carries no attributes to join")
    val taggedRight = right.select(
      keys.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__tag")) ++
        leftAttrs.map(c => lit(null).as(c)) :+
        struct(rightAttrs.map(col): _*).as("__r"): _*)
    val taggedLeft = left.select(
      keys.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__tag")) ++
        leftAttrs.map(col) :+ lit(null).as("__r"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft, allowMissingColumns = false)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(keys.map(col) ++ Seq(col("__ts").as(leftTs)) ++
        leftAttrs.map(col) ++ rightAttrs.map(c => col(s"__r.$c").as(c)): _*)
  }

  /** Binned range join: point-in-interval joins (`leftTs ∈ [start,end]`)
    * have no equi-key, so Spark executes them as a broadcast
    * nested-loop — O(N·M) comparisons. Binning gives them one: each
    * interval explodes into the `binDays`-sized bins it covers, the
    * point maps to its single bin, and the match becomes an equi-join
    * on the bin id plus a residual filter. Work becomes
    * O(N + M·span/bin + matches); pick `binDays` near the typical
    * interval length so each interval covers O(1) bins.
    */
  def rangeJoinBinned(left: DataFrame, right: DataFrame, leftTs: String,
                      start: String, end: String, binDays: Int): DataFrame = {
    val lb = left.withColumn("__bin", floor(unix_date(col(leftTs)) / binDays))
    val rb = right.withColumn("__bin", explode(sequence(
      floor(unix_date(col(start)) / binDays),
      floor(unix_date(col(end)) / binDays))))
    lb.join(rb, "__bin")
      .filter(col(leftTs).between(col(start), col(end)))
      .drop("__bin")
  }

  /** Skew-salted inner equi-join: fact-side hot keys are spread over
    * `salts` buckets and the (smaller) build side is replicated once per
    * bucket, so no single reducer owns a hot key's whole partition. AQE's
    * skew-join split handles moderate skew on its own; explicit salting
    * is for the pathological case (one key = 30% of a 100 TB fact) where
    * even a split partition is a straggler. Build-side replication cost =
    * `salts` × |build|, so keep the build side the small one.
    */
  def saltedJoin(fact: DataFrame, build: DataFrame, key: String,
                 salts: Int, saltCols: Seq[String] = Nil): DataFrame = {
    // salt from the ROW CONTENT, never monotonically_increasing_id():
    // a per-attempt id re-salts rows differently on task retry, and a
    // retried map stage whose first attempt was partially fetched then
    // drops/duplicates fact rows in the (key, __salt) join. Identical
    // rows sharing a salt is the accepted trade (fact rows are
    // near-unique; exact duplicates just co-locate — pass `saltCols`
    // naming a distinguishing subset if the hot key's rows are exact
    // duplicates). By default every HASHABLE column participates:
    // map-typed columns are skipped (xxhash64 rejects MapType at
    // analysis time), and at least one hashable column must remain.
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(contentSaltCols(fact, saltCols): _*), lit(salts)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** The columns a content-derived salt hashes: the caller's subset if
    * given, else every column whose type contains no MapType (xxhash64
    * rejects maps at analysis time — unordered entries have no stable
    * hash). Loud `require` when nothing hashable remains.
    */
  private def contentSaltCols(fact: DataFrame,
                              saltCols: Seq[String]): Seq[Column] = {
    import org.apache.spark.sql.types._
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType      => true
      case a: ArrayType    => hasMap(a.elementType)
      case s: StructType   => s.fields.exists(f => hasMap(f.dataType))
      case _               => false
    }
    // a misspelled saltCols name would otherwise pass every check here
    // (the map-type filter below matches on schema FIELDS, silently
    // skipping a nonexistent name) and only surface later as a generic
    // unresolved-column analysis error far from the call site
    val unknown = saltCols.filterNot(fact.columns.toSet)
    require(unknown.isEmpty,
      s"saltedJoin: saltCols name columns absent from the fact schema: " +
        s"${unknown.mkString(", ")} (have: ${fact.columns.mkString(", ")})")
    val names =
      if (saltCols.nonEmpty) saltCols
      else fact.schema.fields.filterNot(f => hasMap(f.dataType)).map(_.name).toSeq
    require(names.nonEmpty,
      s"saltedJoin: no hashable (map-free) columns to salt on; " +
        s"schema: ${fact.schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
    if (saltCols.nonEmpty) {
      val bad = fact.schema.fields
        .filter(f => saltCols.contains(f.name) && hasMap(f.dataType)).map(_.name)
      require(bad.isEmpty, s"saltedJoin: saltCols contain map-typed " +
        s"columns ${bad.mkString(", ")} which xxhash64 cannot hash")
    }
    names.map(col)
  }

  /** The skew AUDIT feeding [[adaptiveSaltedJoin]]: keys whose row
    * count exceeds `factor`× the mean per-key count (n·k > factor·t —
    * integer arithmetic, no division), i.e. the q172 hot-key detector
    * as a reusable relation. Hot keys are BOUNDED by construction
    * (fewer than k/factor keys can each exceed factor× the mean), so
    * the result broadcasts safely at any corpus size.
    */
  def hotKeys(fact: DataFrame, key: String, factor: Int = 10): DataFrame = {
    require(factor >= 1, s"factor=$factor must be >= 1")
    val counts = fact.groupBy(col(key)).agg(count(lit(1)).as("__n"))
    val tot = counts.agg(sum(col("__n")).as("__t"), count(lit(1)).as("__k"))
    counts.crossJoin(broadcast(tot))
      .filter(col("__n") * col("__k") > col("__t") * factor)
      .select(col(key))
  }

  /** [[saltedJoin]]'s fact side, salted ONLY where the audit flagged:
    * rows of a hot key spread over `salts` buckets, cold rows keep
    * salt 0 — so the cold (vast) majority of the build side is never
    * replicated. Package-private so the spec can pin the fan-out
    * contract directly.
    */
  private[graft] def saltFactByAudit(fact: DataFrame, key: String,
                                     salts: Int, hot: DataFrame): DataFrame = {
    val hotSet = broadcast(hot.select(col(key)).distinct()
      .withColumn("__hot", lit(true)))
    // content-derived salt, same retry-determinism argument (and same
    // map-free column rule) as [[saltedJoin]] — never
    // monotonically_increasing_id()
    fact.join(hotSet, Seq(key), "left")
      .withColumn("__salt", when(col("__hot").isNotNull,
        pmod(xxhash64(contentSaltCols(fact, Nil): _*), lit(salts)).cast("int"))
        .otherwise(lit(0)))
      .drop("__hot")
  }

  /** [[saltedJoin]]'s build side under the audit: a hot key's build
    * row replicates `salts`×, every cold key exactly once (salt 0) —
    * replication cost drops from salts·|build| to salts·|hot keys|.
    */
  private[graft] def replicateBuildByAudit(build: DataFrame, key: String,
                                           salts: Int, hot: DataFrame): DataFrame = {
    val hotSet = broadcast(hot.select(col(key)).distinct()
      .withColumn("__hot", lit(true)))
    build.join(hotSet, Seq(key), "left")
      .withColumn("__salt", explode(when(col("__hot").isNotNull,
        sequence(lit(0), lit(salts - 1))).otherwise(sequence(lit(0), lit(0)))))
      .drop("__hot")
  }

  /** Audit-driven skew-salted inner equi-join: [[saltedJoin]] with the
    * salt count CHOSEN PER KEY from a skew audit relation (`hot` —
    * typically [[hotKeys]], the q172 detector) instead of salting
    * everything. Flagged keys spread over `salts` buckets with the
    * build side replicated per bucket; unflagged keys join plain
    * (salt 0, one build row) — the fan-out only exists where the
    * audit measured the skew that justifies it. Same result as the
    * plain join, same straggler-killing property on the hot keys,
    * at 1/|build-side replication| of the blanket-salting cost.
    */
  def adaptiveSaltedJoin(fact: DataFrame, build: DataFrame, key: String,
                         salts: Int, hot: DataFrame): DataFrame =
    saltFactByAudit(fact, key, salts, hot)
      .join(replicateBuildByAudit(build, key, salts, hot), Seq(key, "__salt"))
      .drop("__salt")
}
