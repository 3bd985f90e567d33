package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants for the SCD merges and the top-k
  * aggregator — the operators where a subtle branch bug survives
  * example-based tests. Deterministic seeds, raw scalacheck Gen (the
  * scalatest bridge isn't in the offline cache).
  */
class ScdPropertySpec extends SparkSpec {
  import spark.implicits._

  private val runDt = lit("2024-06-01").cast("date")
  private val runTs = lit("2024-06-01 00:00:00").cast("timestamp_ntz")
  private val far = lit("9999-12-31 00:00:00").cast("timestamp_ntz")

  private val rowsGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(0, 12)
    keys <- Gen.listOfN(n, Gen.choose(1L, 8L))
    vals <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
  } yield keys.distinct.zip(vals)

  private def forAll[A, B](ga: Gen[A], gb: Gen[B], n: Int = 12)(f: (A, B) => Unit): Unit =
    (1 to n).foreach { i =>
      val p = Gen.Parameters.default
      f(ga(p, Seed(i)).get, gb(p, Seed(i * 7919)).get)
    }

  test("scd1Merge: keys = target ∪ source; idempotent re-merge; untouched absent keys") {
    forAll(rowsGen, rowsGen) { (t, s) =>
      val target = t.toDF("id", "v")
        .withColumn("insert_dt", lit("2024-01-01").cast("date"))
        .withColumn("update_dt", lit("2024-01-01").cast("date"))
      val source = s.toDF("id", "v")
      val merged = Scd.scd1Merge(target, source, Seq("id"), Seq("v"), runDt)
      val out = merged.select($"id", $"v", $"scd_status").as[(Long, String, String)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(out.keySet == (t.map(_._1) ++ s.map(_._1)).toSet)
      val sMap = s.toMap
      t.foreach { case (k, v) =>
        if (!sMap.contains(k)) assert(out(k) == (v, "unchanged")) // absent from source: untouched
        else if (sMap(k) == v) assert(out(k) == (v, "unchanged"))
        else assert(out(k) == (sMap(k), "updated"))
      }
      // idempotency: merging the merged state with the same source is all unchanged
      val again = Scd.scd1Merge(merged.drop("scd_status"), source, Seq("id"), Seq("v"), runDt)
      assert(again.filter($"scd_status" =!= "unchanged").count() == 0)
    }
  }

  test("scd2Merge: exactly one active row per live key; history never shrinks; re-merge no-op") {
    forAll(rowsGen, rowsGen) { (t, s) =>
      val target = t.toDF("id", "v")
        .withColumn("start_ts", lit("2024-01-01 00:00:00").cast("timestamp_ntz"))
        .withColumn("end_ts", far)
        .withColumn("is_active", lit("Y"))
      val source = s.toDF("id", "v")
      val v1 = Scd.scd2Merge(target, source, Seq("id"), Seq("v"), runTs, far)
      val activePerKey = v1.filter($"is_active" === "Y")
        .groupBy($"id").agg(count(lit(1)).as("n"))
        .filter($"n" =!= 1).count()
      assert(activePerKey == 0)
      assert(v1.count() >= target.count()) // versions are only ever added
      // every source value is the active value for its key
      val act = v1.filter($"is_active" === "Y").select($"id", $"v")
        .as[(Long, String)].collect().toMap
      s.foreach { case (k, v) => assert(act(k) == v) }
      // re-merge with the same source changes nothing
      val v2 = Scd.scd2Merge(v1, source, Seq("id"), Seq("v"), runTs, far)
      assert(v2.count() == v1.count() && v2.exceptAll(v1).isEmpty)
    }
  }

  test("cdcMerge equals the sequential fold of ops by offset; replay is a no-op") {
    // feed: globally unique seqs (CDC offsets), random key/op/value
    val feedGen: Gen[List[(Long, Long, String, String)]] = for {
      n <- Gen.choose(0, 14)
      keys <- Gen.listOfN(n, Gen.choose(1L, 6L))
      ops <- Gen.listOfN(n, Gen.oneOf("U", "U", "D")) // updates twice as likely
      vals <- Gen.listOfN(n, Gen.oneOf("x", "y", "z"))
    } yield keys.lazyZip(1L to n.toLong).lazyZip(ops).lazyZip(vals)
      .map((k, s, o, v) => (k, s, o, v)).toList
    forAll(rowsGen, feedGen, n = 20) { (b, f) =>
      val base = b.toDF("k", "v").select($"k", $"v", lit(0L).as("seq"), lit("U").as("op"))
      val feed = f.toDF("k", "seq", "op", "v").select($"k", $"v", $"seq", $"op")
      val out = Scd.cdcMerge(base, feed, Seq("k"))
        .select($"k", $"v", $"seq").as[(Long, String, Long)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap
      // reference: fold base+feed sequentially by seq per key
      val expected = (b.map { case (k, v) => (k, 0L, "U", v) } ++ f.map {
        case (k, s, o, v) => (k, s, o, v)
      }).groupBy(_._1).flatMap { case (k, rows) =>
        val (_, s, o, v) = rows.maxBy(_._2)
        if (o == "D") None else Some(k -> (v, s))
      }
      assert(out == expected)
      // replay idempotency: applying the same feed onto the merged state
      // reproduces it (deleted keys stay deleted, winners keep winning)
      val replay = Scd.cdcMerge(
        Scd.cdcMerge(base, feed, Seq("k")).withColumn("op", lit("U")),
        feed, Seq("k"))
        .select($"k", $"v", $"seq").as[(Long, String, Long)]
        .collect().map(r => r._1 -> (r._2, r._3)).toMap
      assert(replay == expected)
    }
  }

  test("asOfJoin — composed and native — equals the per-key scala reference") {
    val leftGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(0, 15)
      ks <- Gen.listOfN(n, Gen.choose(1L, 4L))
      ts <- Gen.listOfN(n, Gen.choose(0L, 30L))
    } yield ks.zip(ts)
    val rightGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(0, 15)
      ks <- Gen.listOfN(n, Gen.choose(1L, 4L))
      ts <- Gen.listOfN(n, Gen.choose(0L, 30L))
    } yield ks.zip(ts).distinct // (key, ts) unique: the match is well-defined
    forAll(leftGen, rightGen, n = 12) { (l, r) =>
      val left = l.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .toDF("k", "lts", "lv")
      val right = r.map { case (k, t) => (k, t, k * 1000 + t) }.toDF("k", "rts", "rv")
      // reference: latest right row at or before each left ts, same key
      val expected = l.zipWithIndex.map { case ((k, t), i) =>
        val m = r.filter(p => p._1 == k && p._2 <= t)
        (k, t, i.toLong,
          if (m.isEmpty) None else { val (mk, mt) = m.maxBy(_._2); Some(mk * 1000 + mt) })
      }.sorted
      def run(df: org.apache.spark.sql.DataFrame) =
        df.select($"k", $"lts", $"lv", $"rv").as[(Long, Long, Long, Option[Long])]
          .collect().toList.sorted
      // an empty right RELATION is a valid draw (~1 in 16): every left
      // row must come back with a null carry-in, not crash
      assert(run(Relational.asOfJoin(left, right, Seq("k"), "lts", "rts")) == expected)
      assert(run(org.apache.spark.sql.graft.AsOfJoinPlan
        .asOfJoinNative(left, right, Seq("k"), "lts", "rts")) == expected)
    }
  }

  test("connectedComponents equals union-find on random graphs (incl. dangling endpoints)") {
    val graphGen: Gen[(List[Long], List[(Long, Long)])] = for {
      nNodes <- Gen.choose(1, 18)
      nEdges <- Gen.choose(0, 22)
      // edge ids range past nNodes: some endpoints are dangling
      edges <- Gen.listOfN(nEdges, Gen.zip(Gen.choose(1L, 24L), Gen.choose(1L, 24L)))
    } yield ((1L to nNodes.toLong).toList, edges)
    forAll(graphGen, Gen.const(()), n = 10) { (g, _) =>
      val (nodeIds, edges) = g
      // maxIters must exceed the worst-case diameter the generator can
      // draw (a 22-edge path) plus the no-change detection round —
      // keep it tied to the nEdges bound, not the operator default
      val out = Dedup.connectedComponents(
        edges.toDF("src", "dst"), nodeIds.toDF("id"), "id", maxIters = 50)
        .as[(Long, Long)].collect().toMap
      // reference: plain union-find over nodes ∪ edge endpoints,
      // min-id as the canonical label
      val all = (nodeIds ++ edges.flatMap(e => Seq(e._1, e._2))).distinct
      val parent = scala.collection.mutable.Map(all.map(x => x -> x): _*)
      def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val canon = all.groupBy(find).flatMap { case (_, m) => m.map(_ -> m.min) }
      assert(out.keySet == nodeIds.toSet) // restricted back to nodes
      nodeIds.foreach(id => assert(out(id) == canon(id),
        s"node $id: got ${out(id)}, expected ${canon(id)} (edges=$edges)"))
    }
  }

  test("TopKByScore equals sort-take for any input and any split") {
    val itemsGen = Gen.listOf(Gen.zip(Gen.chooseNum(-1.0, 1.0), Gen.choose(0L, 50L)))
    forAll(itemsGen, Gen.choose(1, 5), n = 30) { (items, k) =>
      val agg = new graft.functions.TopKByScore(k)
      val expected = items.distinct.sortBy { case (s, id) => (-s, id) }.take(k)
      val direct = items.distinct.foldLeft(agg.zero)(agg.reduce)
      assert(direct == expected)
      val (l, r) = items.distinct.splitAt(items.distinct.length / 2)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(merged == expected)
    }
  }
}
