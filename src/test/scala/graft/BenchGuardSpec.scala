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
  * Multi-axis verdict, because this suite runs on a noisy shared rig
  * AND inside sbt's parallel suite pool: the wall ratio NAMES a
  * suspect, and a delta on an OWNED-WORK axis confirms it — executor
  * CPU (a hidden build is real work the second run doesn't pay) or
  * source bytes read (a hidden one-time read is real I/O the second
  * run doesn't pay). Both axes are attributed through
  * [[ScopedTaskMetrics]]: only tasks of jobs THIS thread's tagged
  * passes submitted count, so a heavy concurrent suite on the shared
  * SparkContext can never "confirm" a false positive (the round-13
  * judge-run failure: plain `sbt test` red because a neighbor
  * suite's CPU landed in the window sum). An external stall
  * (hypervisor contention, the round-13 flake: q139 first=26.4 s vs
  * second=3.1 s at sf0.001 with flat CPU) stretches wall while the
  * executors sit off-CPU and read nothing extra, so it clears
  * neither floor. This is the same wall-vs-cpu/bytes reading
  * discipline the bench ledger documents (bench/README), applied to
  * the guard itself.
  *
  * Documented residual blind spot: hidden one-time work that burns
  * neither scoped CPU nor scoped bytes — an off-thread lock wait, a
  * pool thread that predates the measurement — is indistinguishable
  * from a rig stall HERE by construction (the rig genuinely stalls,
  * and wall-only flagging is exactly the flake class rounds 12-13
  * fought). Shared lazy state with its own threads is ModelCacheSpec's
  * registration contract, not this guard's.
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
    // (wall s, owned executor-CPU s, owned source bytes) per query —
    // CPU and bytes scoped to the pass's OWN jobs (see the suite doc:
    // a context-wide sum counts concurrent suites' tasks)
    final case class Run(wall: Double, cpu: Double, bytes: Long)
    def pass(): Map[String, Run] = qs.map { case (n, fn) =>
      val m = ScopedTaskMetrics.measure(s) {
        val t0 = System.nanoTime()
        fn(s, sf).count(): Unit
        (System.nanoTime() - t0) / 1e9
      }
      n -> Run(m.result, m.cpuSec, m.bytesRead)
    }.toMap
    try {
      val t1 = pass()
      val t2 = pass()
      val offenders = qs.map(_._1)
        .filter { n =>
          val wallSuspect = t1(n).wall > math.max(8.0, 5.0 * t2(n).wall)
          // real shared work the first run hid = CPU the second never
          // pays; a rig stall leaves the CPU delta under the floor
          val cpuConfirms = t1(n).cpu - t2(n).cpu > math.max(3.0, 2.0 * t2(n).cpu)
          // …or real one-time I/O (wall-heavy, CPU-light: a hidden
          // bulk read). 64 MB floor: at sf0.001 no query legitimately
          // reads tens of MB more on its first pass — plan-identical
          // passes read bit-identical bytes — while a stall reads
          // nothing extra at all.
          val ioConfirms =
            t1(n).bytes - t2(n).bytes > math.max(64L << 20, 2L * t2(n).bytes)
          wallSuspect && (cpuConfirms || ioConfirms)
        }
        .map(n => f"$n: first=${t1(n).wall}%.2f s (cpu ${t1(n).cpu}%.2f, " +
          f"read ${t1(n).bytes / 1e6}%.1f MB) vs second=${t2(n).wall}%.2f s " +
          f"(cpu ${t2(n).cpu}%.2f, read ${t2(n).bytes / 1e6}%.1f MB)")
      assert(offenders.isEmpty,
        s"queries whose first post-warm run hides a one-time cost " +
          s"(add a ModelWarm step or stop sharing state silently):\n  " +
          offenders.mkString("\n  "))
    } finally {
      operators.QueryCaches.evictSession(s)
    } // even on a failing
    // pass/assert: otherwise this session's sf-scale models stay pinned
    // in the shared block manager for every later suite in the JVM
  }
}
