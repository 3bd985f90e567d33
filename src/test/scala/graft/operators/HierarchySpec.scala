package graft.operators

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Structural properties of the synthesized 4-level geo chain and the
  * product tree that the DuckDB oracles can't express: plan shape
  * (broadcast-only flatten) and the functional dependencies the id
  * arithmetic must preserve.
  */
class HierarchySpec extends SparkSpec {
  import spark.implicits._

  private def countries = Hierarchy.countriesFrom(Tables.nation(spark, sf))
  private def continents = Hierarchy.continentsFrom(Tables.region(spark, sf))
  private def custGeo = Hierarchy.custGeoFrom(Tables.customer(spark, sf))
  private def supGeo = Hierarchy.supGeoFrom(Tables.supplier(spark, sf))

  test("city → state is functional and ids are collision-free") {
    val states = Hierarchy.states(custGeo, supGeo, countries)
    val cities = Hierarchy.cities(custGeo, countries, states)
    // deterministic id arithmetic can never collide
    assert(states.select($"state_id").distinct().count() == states.count())
    assert(cities.select($"city_id").distinct().count() == cities.count())
    // every city resolves its parent state by name (5 | 20 keeps key%5
    // derivable from key%20 — the property that makes the chain a tree)
    assert(cities.filter($"city_state_id" === -1L).count() == 0)
    // and the resolved parent lives in the same country the id encodes
    val joined = cities.join(states, $"city_state_id" === $"state_id")
    assert(joined.filter(($"city_id" / Hierarchy.CitiesPerCountry).cast("long") =!=
      ($"state_id" / Hierarchy.StatesPerCountry).cast("long")).count() == 0)
  }

  test("customer flatten plan is broadcast-only — no sort-merge join") {
    val states = Hierarchy.states(custGeo, supGeo, countries)
    val cities = Hierarchy.cities(custGeo, countries, states)
    val customers = Hierarchy.customersSource(Tables.customer(spark, sf), countries, cities)
    val plan = Hierarchy.flattenCustomers(customers, cities, states, countries, continents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("states derive identically from either source ordering") {
    // union symmetry: customers ∪ suppliers and suppliers ∪ customers
    // must yield the same state set (distinct() sits above the union)
    val a = Hierarchy.states(custGeo, supGeo, countries)
      .as[(Long, String, Long)].collect().toSet
    val b = Hierarchy.states(supGeo, custGeo, countries)
      .as[(Long, String, Long)].collect().toSet
    assert(a == b)
  }

  test("subcategory parents always resolve within the derived tree") {
    val p = Tables.part(spark, sf)
    val cats = Hierarchy.categories(p)
    val subs = Hierarchy.subcategories(p, cats)
    assert(subs.filter($"subcategory_category_id" === -1L).count() == 0)
    assert(subs.select($"subcategory_id").distinct().count() == subs.count())
    // parent ids point at real categories
    assert(subs.join(cats, $"subcategory_category_id" === $"category_id", "left_anti")
      .count() == 0)
  }
}
