package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
    (2L, Array(0f, 0f, 1f), Array(0f, 1f, 0f)),
    (3L, Array(1.5f, -2.5f, 0.5f), Array(-1f, 1f, 1f))
  ).toDF("id", "a", "b")

  test("codegen'd dot matches the scala fold exactly") {
    val got = df.select($"id", VectorFunctions.dot($"a", $"b").as("d"))
      .as[(Long, Double)].collect().toMap
    def fold(a: Array[Float], b: Array[Float]) =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
    assert(got(1L) == fold(Array(1f, 2f, 3f), Array(4f, 5f, 6f)))
    assert(got(2L) == 0.0)
    assert(got(3L) == fold(Array(1.5f, -2.5f, 0.5f), Array(-1f, 1f, 1f)))
  }

  test("dot matches the interpreted higher-order-function formulation") {
    val hof = aggregate(
      zip_with($"a", $"b", (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val diff = df.select((VectorFunctions.dot($"a", $"b") - hof).as("d"))
      .as[Double].collect()
    assert(diff.forall(_ == 0.0))
  }

  test("null vector yields null, not a crash") {
    val withNull = Seq((1L, Array(1f), Option.empty[Array[Float]]))
      .toDF("id", "a", "b")
    val r = withNull.select(VectorFunctions.dot($"a", $"b")).collect()
    assert(r.head.isNullAt(0))
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val r = df.select($"id",
      VectorFunctions.cosine($"a", $"a").as("self"),
      VectorFunctions.cosine($"a", $"b").as("cross"))
      .as[(Long, Double, Double)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(math.abs(r(1L)._1 - 1.0) < 1e-12)
    assert(r(2L)._2 == 0.0)
  }

  test("vec_dot is SQL-callable via GraftExtensions") {
    df.createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT id, vec_dot(a, b) AS d FROM vecs WHERE id = 1")
      .as[(Long, Double)].head()
    assert(r == (1L, 32.0))
  }

  test("ivfKnn searches only within the coarse partition") {
    val emb = Seq(
      (1L, 0, Array(1f, 0f)), (2L, 0, Array(0.9f, 0.1f)), (3L, 0, Array(0f, 1f)),
      (4L, 1, Array(1f, 0f))
    ).toDF("vec_id", "label", "embedding")
    val knn = graft.operators.Similarity.ivfKnn(emb, "vec_id", "embedding", "label", 1)
      .select($"vec_id", $"nn_id").as[(Long, Long)].collect().toMap
    assert(knn(1L) == 2L && knn(2L) == 1L)
    assert(!knn.contains(4L)) // alone in its cell: no neighbors, never crosses cells
  }

  test("TopKByScore keeps k best with deterministic ties across merge orders") {
    val agg = new graft.functions.TopKByScore(2)
    val items = Seq((0.5, 7L), (0.9, 3L), (0.9, 1L), (0.1, 9L), (0.9, 2L))
    val direct = items.foldLeft(agg.zero)(agg.reduce)
    assert(direct == Seq((0.9, 1L), (0.9, 2L)))
    // associativity: any split-merge gives the same answer
    val (l, r) = items.splitAt(2)
    val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(merged == direct)
  }

  test("kmeansCentroids trains deterministic cells; ivfTrainedKnn searches within them") {
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0f, 1f)), (4L, Array(0.1f, 0.9f))
    ).toDF("vec_id", "embedding")
    val c1 = graft.operators.Similarity.kmeansCentroids(emb, "vec_id", "embedding", 2, 2)
      .orderBy($"cid").as[(Int, Array[Float])].collect()
    val c2 = graft.operators.Similarity.kmeansCentroids(emb, "vec_id", "embedding", 2, 2)
      .orderBy($"cid").as[(Int, Array[Float])].collect()
    assert(c1.map(_._1).toSeq == c2.map(_._1).toSeq)
    assert(c1.map(_._2.toSeq).toSeq == c2.map(_._2.toSeq).toSeq) // bit-identical reruns
    val knn = graft.operators.Similarity
      .ivfTrainedKnn(emb, "vec_id", "embedding", k = 2, rounds = 2, kNeighbors = 1)
      .select($"vec_id", $"nn_id").as[(Long, Long)].collect().toMap
    // seeds 1,2 pull the x-axis pair into one cell, the y-axis pair lands
    // together too — neighbors never cross the learned cells
    assert(knn(1L) == 2L && knn(2L) == 1L)
    assert(knn(3L) == 4L && knn(4L) == 3L)
  }

  test("probedCells: probe #1 is the assigned cell; recall monotone in nprobe; full-width probing is exact") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val (cents, cells) = Similarity.trainedIndex(emb, "vec_id", "embedding", k = 4, rounds = 2)
    // probe #1 = the assignment (same cosine, same cid-asc tie-break)
    val p1 = Similarity.probedCells(emb, "vec_id", "embedding", cents, 1)
      .as[(Long, Int)].collect().toSet
    val assigned = cells.as[(Long, Int)].collect().toSet
    assert(p1 == assigned)
    // ivfProbedKnn at p=1 ≡ searching the assigned cells directly
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"nn_id", $"rn").as[(Long, Long, Int)].collect().toSet
    val probed1 = pairs(Similarity.ivfProbedKnn(emb, "vec_id", "embedding", cents, cells, 1, 3))
    val direct = pairs(Similarity.ivfKnn(emb.join(cells, "vec_id"), "vec_id", "embedding", "cid", 3))
    assert(probed1 == direct)
    // recall climbs with nprobe, and probing every cell IS the exact search
    val exact = pairs(Similarity.bruteForceKnn(emb, "vec_id", "embedding", 3))
    def recall(p: Int) =
      (pairs(Similarity.ivfProbedKnn(emb, "vec_id", "embedding", cents, cells, p, 3))
        intersect exact).size
    val (r1, r2, r4) = (recall(1), recall(2), recall(4))
    assert(r1 <= r2 && r2 <= r4)
    assert(pairs(Similarity.ivfProbedKnn(emb, "vec_id", "embedding", cents, cells, 4, 3)) == exact)
  }

  test("assignToCells routes new vectors onto an existing index without retraining") {
    import graft.operators.Similarity
    val idx = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0f, 1f)), (4L, Array(0.1f, 0.9f))
    ).toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(idx, "vec_id", "embedding", 2, 2)
    val fresh = Seq(
      (10L, Array(0.8f, 0.2f)),  // x-axis-ish → the seeds-1,2 cell
      (11L, Array(0.2f, 0.8f)),  // y-axis-ish → the other cell
      (12L, Array(0f, 0f))       // zero norm: no cosine, no assignment
    ).toDF("vec_id", "embedding")
    val got = Similarity.assignToCells(fresh, "vec_id", "embedding", cents)
      .select($"vec_id", $"cid").as[(Long, Int)].collect().toMap
    val trained = Similarity.assignToCells(idx, "vec_id", "embedding", cents)
      .select($"vec_id", $"cid").as[(Long, Int)].collect().toMap
    assert(got(10L) == trained(1L) && got(10L) == trained(2L))
    assert(got(11L) == trained(3L) && got(11L) == trained(4L))
    assert(!got.contains(12L))
  }

  test("ivfAdcKnn at full probe width equals the flat ADC scan") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val pq = Similarity.pqTrain(emb, "vec_id", "embedding", dim = 64, m = 4, k = 4, rounds = 1)
    val (cents, cells) = Similarity.trainedIndex(emb, "vec_id", "embedding", k = 4, rounds = 1)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select($"vec_id", $"nn_id", $"adc", $"rn").as[(Long, Long, Double, Int)].collect().toSet
    val flat = rows(Similarity.pqAdcKnnFlat(emb, "vec_id", "embedding", pq, 3))
    val ivf = rows(Similarity.ivfAdcKnn(emb, "vec_id", "embedding", pq, cents, cells, 4, 3))
    assert(ivf == flat) // bit-identical scores: same LUT doubles, same fold
  }

  test("ivfAdcKnn serves an external query set: neighbors from the index only, batch-size invariant") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val index = emb.filter($"vec_id" % 10 =!= 0)
    val queries = emb.filter($"vec_id" % 10 === 0)
    val pq = Similarity.pqTrain(index, "vec_id", "embedding", dim = 64, m = 4, k = 4, rounds = 1)
    val (cents, cells) = Similarity.trainedIndex(index, "vec_id", "embedding", k = 4, rounds = 1)
    val served = Similarity.ivfAdcKnn(queries, "vec_id", "embedding", pq, cents, cells, 2, 3)
      .select($"vec_id", $"nn_id", $"adc", $"rn").as[(Long, Long, Double, Int)].collect()
    val indexIds = index.select($"vec_id").as[Long].collect().toSet
    val queryIds = queries.select($"vec_id").as[Long].collect().toSet
    assert(served.nonEmpty)
    assert(served.forall(r => queryIds.contains(r._1)))
    assert(served.forall(r => indexIds.contains(r._2))) // never another query
    // per-query independence: a single query served alone gets the
    // identical ranked answer it got inside the batch
    val q0 = queryIds.min
    val solo = Similarity.ivfAdcKnn(queries.filter($"vec_id" === q0),
      "vec_id", "embedding", pq, cents, cells, 2, 3)
      .select($"vec_id", $"nn_id", $"adc", $"rn").as[(Long, Long, Double, Int)].collect().toSet
    assert(solo == served.filter(_._1 == q0).toSet)
  }

  test("cellMeans returns true per-cell means on the 1e-7 grid") {
    import graft.operators.Similarity
    val emb = Seq(
      (1L, Array(0.5f, 0.1f)), (2L, Array(0.3f, 0.3f)), // cell 1
      (3L, Array(-0.2f, 0.4f)) // cell 2 (singleton; negative coord)
    ).toDF("vec_id", "embedding")
    val cells = Seq((1L, 1), (2L, 1), (3L, 2)).toDF("vec_id", "cid")
    val got = Similarity.cellMeans(emb, "vec_id", "embedding", cells)
      .as[(Int, Array[Float])].collect().toMap
    // the contract: float((Σ floor(x·1e7) / n) / 1e7) — NOT a double mean
    def m(xs: Float*) =
      ((xs.map(x => math.floor(x.toDouble * 1e7)).sum / xs.size) / 1e7).toFloat
    assert(got(1).toSeq == Seq(m(0.5f, 0.3f), m(0.1f, 0.3f)))
    assert(got(2).toSeq == Seq(m(-0.2f), m(0.4f)))
    assert(got(1).toSeq == Seq(0.4f, 0.2f)) // exact on-grid values divide back
  }

  test("ivfAdcResidualKnn with per-vector codebooks reproduces the exact ranking") {
    import graft.operators.Similarity
    // k = corpus size → every residual slice is its own (1e-7-quantized)
    // codebook entry, so mean + decoded residual ≈ the original vector
    // and the decomposed ADC score collapses to cosine(q, x): the
    // residual scoring formula is proven against brute force end-to-end.
    val emb = Seq(
      (1L, Array(1f, 0.1f, 0.2f, 0f)), (2L, Array(0.9f, 0.2f, 0.1f, 0.1f)),
      (3L, Array(0.8f, 0f, 0.3f, 0.2f)),
      (4L, Array(0.1f, 1f, 0f, 0.3f)), (5L, Array(0.2f, 0.9f, 0.1f, 0.2f)),
      (6L, Array(0f, 0.8f, 0.2f, 0.1f))
    ).toDF("vec_id", "embedding")
    val (cents, cells) = Similarity.trainedIndex(emb, "vec_id", "embedding", k = 2, rounds = 1)
    val mc = Similarity.cellMeans(emb, "vec_id", "embedding", cells)
    val pqr = Similarity.pqTrainResidual(emb, "vec_id", "embedding", mc, cells,
      dim = 4, m = 2, k = 6, rounds = 1)
    val got = Similarity
      .ivfAdcResidualKnn(emb, "vec_id", "embedding", pqr, cents, mc, cells,
        nprobe = 2, kNeighbors = 3)
      .select($"vec_id", $"nn_id", $"rn").as[(Long, Long, Int)].collect().toSet
    val exact = Similarity.bruteForceKnn(emb, "vec_id", "embedding", 3)
      .select($"vec_id", $"nn_id", $"rn").as[(Long, Long, Int)].collect().toSet
    assert(got == exact)
  }

  test("residual PQ lifts ADC recall over raw PQ at the serving probe width") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val (cents, cells) = Similarity.trainedIndex(emb, "vec_id", "embedding", k = 8, rounds = 2)
    val mc = Similarity.cellMeans(emb, "vec_id", "embedding", cells)
    val raw = Similarity.pqTrain(emb, "vec_id", "embedding", dim = 64, m = 4, k = 8, rounds = 1)
    val res = Similarity.pqTrainResidual(emb, "vec_id", "embedding", mc, cells,
      dim = 64, m = 4, k = 8, rounds = 1)
    val exact = Similarity.bruteForceKnn(emb, "vec_id", "embedding", 3)
      .select($"vec_id", $"nn_id").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame) =
      (df.select($"vec_id", $"nn_id").as[(Long, Long)].collect().toSet
        intersect exact).size
    // p=2 is q118/q124's operating width; on this fixture the L2-trained
    // residual codebooks win with a comfortable margin (~5% absolute)
    val rRaw = recall(Similarity.ivfAdcKnn(emb, "vec_id", "embedding", raw, cents, cells, 2, 3))
    val rRes = recall(Similarity.ivfAdcResidualKnn(emb, "vec_id", "embedding", res, cents, mc, cells, 2, 3))
    assert(rRes >= rRaw, s"residual recall $rRes < raw recall $rRaw")
  }

  test("exact re-rank of the ADC shortlist is monotone over ADC and exact at full width") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val (cents, cells) = Similarity.trainedIndex(emb, "vec_id", "embedding", k = 8, rounds = 2)
    val mc = Similarity.cellMeans(emb, "vec_id", "embedding", cells)
    val res = Similarity.pqTrainResidual(emb, "vec_id", "embedding", mc, cells,
      dim = 64, m = 4, k = 8, rounds = 1)
    val exact = Similarity.bruteForceKnn(emb, "vec_id", "embedding", 3)
      .select($"vec_id", $"nn_id").as[(Long, Long)].collect().toSet
    val adc = Similarity
      .ivfAdcResidualKnn(emb, "vec_id", "embedding", res, cents, mc, cells, 2, 3)
      .select($"vec_id", $"nn_id").as[(Long, Long)].collect().toSet
    val rer = Similarity
      .ivfAdcRerankKnn(emb, "vec_id", "embedding", res, cents, mc, cells, 2, 10, 3)
      .select($"vec_id", $"nn_id").as[(Long, Long)].collect().toSet
    // the provable half: the shortlist is a prefix-superset of the ADC
    // top-3, and at most 2 corpus vectors outrank a true top-3 member —
    // so every exact hit the ADC answer contains survives re-ranking
    assert((adc intersect exact).subsetOf(rer))
    assert((rer intersect exact).size >= (adc intersect exact).size)
    // full routing width + corpus-wide shortlist collapses to brute
    // force exactly (same scores, same tie-breaks, same ranks)
    val n = emb.count().toInt
    val full = Similarity
      .ivfAdcRerankKnn(emb, "vec_id", "embedding", res, cents, mc, cells, 8, n, 3)
      .select($"vec_id", $"nn_id", $"rn").as[(Long, Long, Int)].collect().toSet
    val bf = Similarity.bruteForceKnn(emb, "vec_id", "embedding", 3)
      .select($"vec_id", $"nn_id", $"rn").as[(Long, Long, Int)].collect().toSet
    assert(full == bf)
  }

  test("filtered re-rank serves only allowed neighbors and beats filtered-raw recall") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val (cents, cells) = Similarity.trainedIndex(emb, "vec_id", "embedding", k = 8, rounds = 2)
    val mc = Similarity.cellMeans(emb, "vec_id", "embedding", cells)
    val raw = Similarity.pqTrain(emb, "vec_id", "embedding", dim = 64, m = 4, k = 8, rounds = 1)
    val res = Similarity.pqTrainResidual(emb, "vec_id", "embedding", mc, cells,
      dim = 64, m = 4, k = 8, rounds = 1)
    val excluded = emb.filter($"label" === 0).select($"vec_id")
      .as[Long].collect().toSet
    val allowedCells = cells.join(emb.filter($"label" =!= 0).select($"vec_id"), "vec_id")
    val fRer = Similarity.ivfAdcRerankKnn(emb, "vec_id", "embedding", res,
      cents, mc, allowedCells, 2, 10, 3)
      .select($"vec_id", $"nn_id").as[(Long, Long)].collect()
    // the contract the filter exists for: an excluded vector can never
    // be served as a neighbor (it never enters the shortlist)
    assert(fRer.nonEmpty && !fRer.exists(p => excluded.contains(p._2)))
    // recall vs the FILTERED exact baseline, at equal probe width: the
    // re-ranked path must be at least as good as filtered raw-PQ (q121)
    val exactF = Similarity
      .bruteForceKnn(emb.filter($"label" =!= 0), "vec_id", "embedding", 3)
      .select($"vec_id", $"nn_id").as[(Long, Long)].collect().toSet
    val fRaw = Similarity.ivfAdcKnn(emb, "vec_id", "embedding", raw,
      cents, allowedCells, 2, 3)
      .select($"vec_id", $"nn_id").as[(Long, Long)].collect().toSet
    val rRer = (fRer.toSet intersect exactF).size
    val rRaw = (fRaw intersect exactF).size
    assert(rRer >= rRaw, s"filtered re-rank recall $rRer < filtered raw $rRaw")
  }

  test("classMeanProbe separates well-separated labels into a diagonal confusion") {
    import graft.operators.Similarity
    // label 0 clusters near (1,0,...), label 1 near (0,1,...)
    val vs = Seq(
      (1L, Array(1.0f, 0.1f, 0f, 0f), 0), (2L, Array(0.9f, 0.0f, 0f, 0f), 0),
      (3L, Array(0.1f, 1.0f, 0f, 0f), 1), (4L, Array(0.0f, 0.9f, 0f, 0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val m = Similarity.classMeanProbe(vs, "vec_id", "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(m == Map((0, 0) -> 2L, (1, 1) -> 2L)) // perfect diagonal
    // determinism: identical on re-run
    val again = Similarity.classMeanProbe(vs, "vec_id", "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(m == again)
  }

  test("JL projection audit: deterministic, scale-invariant ratio, zero vector → NULL") {
    import graft.operators.Similarity
    val vs = Seq(
      (1L, Array.tabulate(64)(i => (i % 7 - 3).toFloat)),
      (2L, Array.tabulate(64)(i => 2f * (i % 7 - 3))), // 2× vector 1
      (3L, Array.fill(64)(0f)) // zero vector: no direction, NULL ratio
    ).toDF("vec_id", "embedding")
    val out = Similarity.jlProjectionAudit(vs, "vec_id", "embedding", 64, 16)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getLong(2))).toMap
    assert(out(3L)._1.isEmpty) // ANSI-guarded, not a crash
    // projection is linear, so the distortion ratio is scale-invariant
    assert(out(1L)._1 == out(2L)._1)
    // JL at outDim 16: the ratio concentrates around 1e6 (loose bound)
    assert(out(1L)._1.exists(r => r > 200000L && r < 5000000L))
    val again = Similarity.jlProjectionAudit(vs, "vec_id", "embedding", 64, 16)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getLong(1))), r.getLong(2))).toMap
    assert(out == again)
  }

  test("persisted index: reload serves identically, rollback serves the OLD build") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val root = java.nio.file.Files.createTempDirectory("graft-idx").toString
    val wh = new graft.sources.Warehouse(root, spark)
    val (cents1, cells1) = Similarity.trainedIndex(emb, "vec_id", "embedding", k = 8, rounds = 2)
    val v1 = Similarity.saveIndex(wh, "idx", "ann", cents1, cells1)
    assert(v1 == 1)
    // a retrained (different-k) build becomes the next version
    val (cents2, cells2) = Similarity.trainedIndex(emb, "vec_id", "embedding", k = 4, rounds = 2)
    val v2 = Similarity.saveIndex(wh, "idx", "ann", cents2, cells2)
    assert(v2 == 2)
    def serve(c: org.apache.spark.sql.DataFrame, l: org.apache.spark.sql.DataFrame) =
      Similarity.ivfProbedKnn(emb, "vec_id", "embedding", c, l, 2, 3)
        .select($"vec_id", $"nn_id", $"rn").as[(Long, Long, Int)].collect().toSet
    val (lc, ll, v) = Similarity.loadIndex(wh, "idx", "ann")
    assert(v == 2 && serve(lc, ll) == serve(cents2, cells2)) // latest = new build
    val (oc, ol, _) = Similarity.loadIndex(wh, "idx", "ann", Some(1))
    assert(serve(oc, ol) == serve(cents1, cells1)) // rollback = old build, exactly
  }

  test("persisted PQ + SQ8 models: reloaded serving is bit-identical to in-session") {
    import graft.operators.Similarity
    import org.apache.spark.sql.DataFrame
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val (cents, cells) = Similarity.trainedIndex(emb, "vec_id", "embedding", k = 8, rounds = 2)
    val root = java.nio.file.Files.createTempDirectory("graft-model").toString
    val wh = new graft.sources.Warehouse(root, spark)
    val pq = Similarity.pqTrain(emb, "vec_id", "embedding", dim = 64, m = 4, k = 8, rounds = 1)
    val v = Similarity.savePqModel(wh, "idx", "pq", pq, "vec_id")
    val (lpq, lv) = Similarity.loadPqModel(wh, "idx", "pq", "vec_id")
    assert(lv == v && lpq.dim == 64 && lpq.m == 4 && lpq.k == 8)
    // codebooks round-trip exactly (floats are parquet-exact)
    (0 until 4).foreach { i =>
      assert(pq.parts(i)._2.keySet == lpq.parts(i)._2.keySet)
      pq.parts(i)._2.foreach { case (cid, c) =>
        assert(c.sameElements(lpq.parts(i)._2(cid))) }
    }
    // the SERVE from the reloaded model is bit-identical (double scores
    // compared exactly) to the in-session model's
    def adcServe(m: Similarity.PqModel) =
      Similarity.ivfAdcKnn(emb, "vec_id", "embedding", m, cents, cells, 2, 3)
        .as[(Long, Long, Double, Int)].collect().toSet
    assert(adcServe(pq) == adcServe(lpq))
    // SQ8: stats snapshot round-trips; routed serve bit-identical
    val stats = Similarity.sq8Stats(emb, "embedding")
    Similarity.saveSq8Stats(wh, "idx", "ann", stats): Unit
    val (lstats, _) = Similarity.loadSq8Stats(wh, "idx", "ann")
    def sq8Serve(st: DataFrame) =
      Similarity.sq8IvfKnn(emb, "vec_id", "embedding", cents, cells, 64, 2, 3, Some(st))
        .as[(Long, Long, Double, Int)].collect().toSet
    assert(sq8Serve(stats) == sq8Serve(lstats))
  }

  test("sq8IvfKnn: cells-bounded serve (no quadratic join), neighbors from probed cells only") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val (cents, cells) = Similarity.trainedIndex(emb, "vec_id", "embedding", k = 8, rounds = 2)
    val served = Similarity.sq8IvfKnn(emb, "vec_id", "embedding", cents, cells,
      dim = 64, nprobe = 2, kNeighbors = 3)
    val plan = served.queryExecution.executedPlan.toString
    // The serve must be the cid equi-join, never the flat quadratic
    // kernel: no shuffled cartesian anywhere, and no nested-loop join
    // carrying the corpus×corpus vec_id≠nn_id condition (the only BNLJs
    // allowed are the bounded 1-row/k-row broadcast crossJoins of
    // sq8Quantize's stats and probedCells' centroids, which have no
    // join condition and so no vec_id on their plan line).
    assert(!plan.contains("CartesianProduct"), plan)
    assert("BroadcastNestedLoopJoin[^\n]*vec_id".r.findFirstIn(plan).isEmpty, plan)
    // Routing invariant: every served neighbor sits in one of its
    // query's probed cells.
    val probes = Similarity.probedCells(emb, "vec_id", "embedding", cents, 2)
    val nnCells = served.select($"vec_id", $"nn_id")
      .join(cells.select($"vec_id".as("nn_id"), $"cid"), "nn_id")
    assert(nnCells.join(probes, Seq("vec_id", "cid"), "left_anti").count() == 0)
    // Deterministic: the serve is a pure function of (corpus, index).
    val again = Similarity.sq8IvfKnn(emb, "vec_id", "embedding", cents, cells, 64, 2, 3)
    assert(served.select($"vec_id", $"nn_id", $"rn").except(
      again.select($"vec_id", $"nn_id", $"rn")).count() == 0)
  }

  test("classMeanProbe plan: prototypes broadcast, corpus side never shuffle-joined") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val plan = Similarity.classMeanProbe(emb, "vec_id", "embedding", "label")
      .queryExecution.executedPlan.toString
    // the vector × prototype cross must be a broadcast of the
    // |labels|-row side — a shuffled cartesian would be the collapsed
    // form that cannot scale
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"prototypes not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"shuffled cartesian in probe plan:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"probe shuffle-joins the corpus:\n$plan")
  }

  test("signBucket maps sign pattern of leading dims") {
    val r = df.select($"id", VectorFunctions.signBucket($"a", 3).as("bk"))
      .as[(Long, String)].collect().toMap
    assert(r(1L) == "111")
    assert(r(3L) == "101")
  }

  test("pqEncode: valid codes per subspace, deterministic, subspaces independent") {
    import graft.operators.Similarity
    // dim 4 → m=2 subspaces of 2 dims, k=2 codes each. The two seed
    // vectors (smallest ids 0, 1) differ in BOTH subspaces, so each
    // sub-codebook separates on its own sign axis; ids 2 and 3 mix the
    // signs, proving the subspaces quantize independently (a single
    // coarse quantizer could not give id2/id3 their crossed codes).
    val emb = Seq(
      (0L, Array(1f, 0.1f, 1f, 0.1f)),
      (1L, Array(-1f, 0.1f, -1f, 0.1f)),
      (2L, Array(1f, 0.1f, -1f, 0.1f)),
      (3L, Array(-1f, 0.1f, 1f, 0.1f))
    ).toDF("vec_id", "embedding")
    val enc = Similarity.pqEncode(emb, "vec_id", "embedding", dim = 4, m = 2, k = 2, rounds = 1)
    val rows = enc.select($"vec_id", $"code0", $"code1")
      .as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((0L, 1, 1), (1L, 2, 2), (2L, 1, 2), (3L, 2, 1)))
    val again = Similarity.pqEncode(emb, "vec_id", "embedding", 4, 2, 2, 1)
      .select($"vec_id", $"code0", $"code1").as[(Long, Int, Int)].collect().sortBy(_._1)
    assert(rows.sameElements(again))
    intercept[IllegalArgumentException](
      Similarity.pqEncode(emb, "vec_id", "embedding", dim = 4, m = 3, k = 2, rounds = 1))
  }

  test("hardNegatives: same-cell other-label only; zero vectors join nothing") {
    import graft.operators.Similarity
    val emb = Seq(
      (1L, Array(1f, 0f), 0),       // cell 1
      (2L, Array(0.9f, 0.1f), 1),   // cell 1, the only valid negative for 1 and 3
      (3L, Array(0.95f, 0.05f), 0), // cell 1
      (4L, Array(1f, 0f), 1),       // cell 2: alone there → no rows
      (5L, Array(0f, 0f), 1)        // cell 1, zero vector: cosine NULL → dropped
    ).toDF("vec_id", "embedding", "label")
    val cells = Seq((1L, 1), (2L, 1), (3L, 1), (4L, 2), (5L, 1))
      .toDF("vec_id", "cid")
    val got = Similarity.hardNegatives(emb, "vec_id", "embedding", "label", cells, 2)
      .select("vec_id", "neg_id", "rnk")
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq
    // vec 2 (label 1) ranks its label-0 cellmates by cosine: 3 beats 1
    assert(got == Seq((1L, 2L, 1), (2L, 3L, 1), (2L, 1L, 2), (3L, 2L, 1)))
  }

  test("semDedup removes only later same-cell near-dups; zero vectors survive") {
    import graft.operators.Similarity
    val emb = Seq(
      (1L, Array(1f, 0f)),      // cell 1, kept (earliest of the dup pair)
      (2L, Array(0.99f, 0.01f)), // cell 1, near-dup of 1 → removed
      (3L, Array(0f, 1f)),      // cell 1, orthogonal → kept
      (4L, Array(1f, 0f)),      // cell 2, identical direction to 1 but
                                // OTHER cell → cell isolation keeps it
      (5L, Array(0f, 0f))       // cell 1, zero vector: cosine is NULL
                                // under the ANSI guard → never removed
    ).toDF("vec_id", "embedding")
    val cells = Seq((1L, 1), (2L, 1), (3L, 1), (4L, 2), (5L, 1))
      .toDF("vec_id", "cid")
    val got = Similarity.semDedup(emb, "vec_id", "embedding", cells, 0.9)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1, 4L, 1L, 3L), (2, 1L, 0L, 1L)))
  }

  test("sq8Quantize: codes bounded, extremes hit 0/255, midpoint recon inside the cell") {
    import graft.operators.Similarity
    val emb = Seq(
      (1L, Array(0f, -2f, 5f)),   // per-dim mins on dims 1-2, max on 3
      (2L, Array(4f, 2f, 5f)),    // per-dim maxes on 1-2; dim 3 constant
      (3L, Array(1f, 0f, 5f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.sq8Quantize(emb, "vec_id", "embedding", dim = 3)
      .as[(Long, Seq[Int], Seq[Float])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // mins code to 0, maxes clamp to 255; the constant dim codes 0
    assert(out(1L)._1 == Seq(0, 0, 0))
    assert(out(2L)._1 == Seq(255, 255, 0))
    // interior point: (1-0)/(4-0)*256 = 64; (0-(-2))/4*256 = 128
    assert(out(3L)._1 == Seq(64, 128, 0))
    // midpoint reconstruction stays inside its cell and the value range
    val (codes, recon) = out(3L)
    assert(recon(0) == ((64 + 0.5) * 4.0 / 256.0).toFloat)
    assert(recon(2) == 5f)                        // constant dim reconstructs exactly
    assert(codes.forall(c => c >= 0 && c <= 255))
    // quantize→reconstruct is near-lossless at 8 bits: recon within one
    // cell width of the original everywhere
    val orig = Map(1L -> Array(0f, -2f, 5f), 2L -> Array(4f, 2f, 5f), 3L -> Array(1f, 0f, 5f))
    for ((id, (_, r)) <- out; i <- r.indices)
      assert(math.abs(r(i) - orig(id)(i)) <= 4.0 / 256.0 + 1e-6)
  }

  test("sq8 serving preserves exact-KNN ranking on well-separated vectors") {
    import graft.operators.Similarity
    val emb = Seq(
      (1L, Array(1f, 0f, 0f, 0.01f)),
      (2L, Array(0.95f, 0.3f, 0f, 0.02f)),
      (3L, Array(0f, 1f, 0f, 0.03f)),
      (4L, Array(0f, 0.9f, 0.4f, 0.04f))
    ).toDF("vec_id", "embedding")
    val recon = Similarity.sq8Quantize(emb, "vec_id", "embedding", dim = 4)
      .select($"vec_id", $"recon")
    val served = Similarity.bruteForceKnn(recon, "vec_id", "recon", 1)
      .select($"vec_id", $"nn_id").as[(Long, Long)].collect().toMap
    val exact = Similarity.bruteForceKnn(emb, "vec_id", "embedding", 1)
      .select($"vec_id", $"nn_id").as[(Long, Long)].collect().toMap
    assert(served == exact) // 8-bit quantization noise ≪ the separation
  }

  test("kmeansParallelSeeds: deterministic, k seeds from the corpus, weight-ordered") {
    import graft.operators.Similarity
    val emb = graft.sources.Tables.embeddings(spark, sf)
    def run() = Similarity.kmeansParallelSeeds(emb, "vec_id", "embedding",
      k = 4, rounds = 2, oversample = 8).as[(Int, Long, Long)].collect().toSeq
    val s1 = run()
    assert(s1 == run()) // salted-hash draws: bit-identical across runs
    assert(s1.length == 4 && s1.map(_._1) == Seq(1, 2, 3, 4))
    assert(s1.map(_._3) == s1.map(_._3).sortBy(-_)) // weight desc
    assert(s1.map(_._2).distinct.length == 4)
    val ids = emb.select($"vec_id").as[Long].collect().toSet
    s1.foreach(r => assert(ids(r._2))) // seeds are actual corpus points
  }
}
