package graft

/** The driver's contract: entry returns rows at sf0.001; every query
  * name has either an oracle or is deliberately rows-only-checked; all
  * queries run at the smoke scale factor.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry (flagship query) returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o.diff(q)}")
    assert(q == o, s"queries without oracle (verify would rows-only check): ${q.diff(o)}")
  }

  test("all queries execute at sf0.001") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(spark, sf).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
