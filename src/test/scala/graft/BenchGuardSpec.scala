package graft

/** The anti-"first toucher pays" guard (round-10 verdict directive 7).
  *
  * Failure class being pinned: some SHARED state (a model cache, a
  * lazily-built index, any future memoized structure) trains lazily,
  * so whichever timed query touches it first silently pays its full
  * build cost — the round-9 q160/q104/q207 bench-attribution bug, and
  * the class the named `warm_*` rows exist to prevent. ModelCacheSpec
  * already asserts every REGISTERED QueryCaches cache has a warm step;
  * this spec catches the next cost-shift mechanism that is NOT routed
  * through QueryCaches: after the full warm pass, it runs every query
  * twice at sf0.001 and asserts the FIRST run hides no one-time cost
  * the second run doesn't pay — `t1 ≤ max(floor, factor · t2)`.
  * (The converse direction — t2 bounded by t1 — can never catch this
  * bug: a hidden training makes t1 big and t2 small, which passes any
  * "second within a factor of first" check trivially.)
  *
  * Generosity calibration: the first pass also pays per-query codegen
  * (Janino) and plan compilation, ~0.1-1 s at sf0.001 — hence the
  * absolute floor; the factor covers scheduler/GC wobble. A hidden
  * shared build worth caring about costs multiple seconds even at
  * sf0.001 (LSH pairs / PQ training / BPE at sf0.1 measured 2-14 s),
  * which clears the floor.
  *
  * Two-axis verdict, because this suite runs on a noisy shared rig:
  * the wall ratio NAMES a suspect, and the executor-CPU delta between
  * the two runs CONFIRMS it. A hidden shared build is real work — it
  * burns CPU the second run doesn't. An external stall (hypervisor
  * contention, the round-13 flake: q139 first=26.4 s vs second=3.1 s
  * at sf0.001 with flat CPU) stretches wall and task time while the
  * executors sit off-CPU, so it cannot clear the CPU floor. This is
  * the same wall-vs-cpu reading discipline the bench ledger documents
  * (bench/README), applied to the guard itself.
  *
  * Exclusions: the two ETL macros build a fresh tmpfs warehouse per
  * invocation by design — nothing is shared between their runs, and
  * their dozens of parquet writes carry write-path variance that has
  * nothing to do with this failure class.
  */
class BenchGuardSpec extends SparkSpec {

  test("Bench's skip/demotion ledger names real queries (typo = silent full-scale run)") {
    // demotions.flatMap and benchSkip.filterNot both NO-OP on an
    // unknown name: a typo would silently run q158 at full scale or
    // time q123's noisy row again, with the detail JSON still claiming
    // the demotion/skip. Name-check both maps against the real surface.
    val known = SparkEntry.queries.keySet
    val stray = (Bench.benchSkip ++ Bench.demotions.keySet).diff(known)
    assert(stray.isEmpty,
      s"Bench.benchSkip/demotions name unknown queries: ${stray.mkString(", ")}")
    // and a demotion target must look like a scale-factor dir name
    Bench.demotions.values.foreach(sib =>
      assert(sib.matches("sf[0-9.]+"), s"demotion target '$sib' is not an sf dir name"))
  }

  test("after the warm pass, no query's first run hides a one-time shared cost (cold≈warm guard)") {
    val s = spark.newSession()
    operators.ModelWarm.steps.foreach { case (name, fn) =>
      try fn(s, sf)
      catch { case e: Throwable => fail(s"warm step $name failed: $e") }
    }
    val excluded = Set("q60_full_etl", "q74_incremental_etl")
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => excluded.contains(n) }
    val cpuNs = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) cpuNs.addAndGet(m.executorCpuTime): Unit
      }
    }
    s.sparkContext.addSparkListener(listener)
    def pass(): Map[String, (Double, Double)] = qs.map { case (n, fn) =>
      org.apache.spark.graft.ListenerBusDrain.drain(s.sparkContext)
      val c0 = cpuNs.get
      val t0 = System.nanoTime()
      fn(s, sf).count(): Unit
      val wall = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBusDrain.drain(s.sparkContext)
      n -> (wall, (cpuNs.get - c0) / 1e9)
    }.toMap
    try {
      val t1 = pass()
      val t2 = pass()
      val offenders = qs.map(_._1)
        .filter { n =>
          val wallSuspect = t1(n)._1 > math.max(8.0, 5.0 * t2(n)._1)
          // real shared work the first run hid = CPU the second never
          // pays; a rig stall leaves the CPU delta under the floor
          val cpuConfirms = t1(n)._2 - t2(n)._2 > math.max(3.0, 2.0 * t2(n)._2)
          wallSuspect && cpuConfirms
        }
        .map(n => f"$n: first=${t1(n)._1}%.2f s (cpu ${t1(n)._2}%.2f) vs " +
          f"second=${t2(n)._1}%.2f s (cpu ${t2(n)._2}%.2f)")
      assert(offenders.isEmpty,
        s"queries whose first post-warm run hides a one-time cost " +
          s"(add a ModelWarm step or stop sharing state silently):\n  " +
          offenders.mkString("\n  "))
    } finally {
      s.sparkContext.removeSparkListener(listener)
      operators.QueryCaches.evictSession(s)
    } // even on a failing
    // pass/assert: otherwise this session's sf-scale models stay pinned
    // in the shared block manager for every later suite in the JVM
  }
}
