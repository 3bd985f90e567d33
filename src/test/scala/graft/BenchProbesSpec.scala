package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench sub-timing side channel: drain must return exactly the
  * named query's parts (prefix-stripped), remove what it returned, and
  * leave other queries' entries — including those of a query whose
  * name is a PREFIX of another's (the "q60" vs "q60_full" class).
  */
class BenchProbesSpec extends AnyFunSuite {
  test("drain returns, strips, clears, and respects query boundaries") {
    BenchProbes.record("qA", "p1", 1.5)
    BenchProbes.record("qA", "p2", 2.5)
    BenchProbes.record("qA_long", "p1", 9.0)
    BenchProbes.record("qB", "p1", 4.0)
    assert(BenchProbes.drain("qA") == Map("p1" -> 1.5, "p2" -> 2.5))
    // drained entries are gone; a second drain is empty
    assert(BenchProbes.drain("qA") == Map.empty[String, Double])
    // the prefix-sharing query and the unrelated one are untouched
    assert(BenchProbes.drain("qA_long") == Map("p1" -> 9.0))
    assert(BenchProbes.drain("qB") == Map("p1" -> 4.0))
  }

  test("re-recording a part overwrites (min-of-two retries keep the kept run's parts)") {
    BenchProbes.record("qC", "p", 10.0)
    BenchProbes.record("qC", "p", 3.0)
    assert(BenchProbes.drain("qC") == Map("p" -> 3.0))
  }
}
