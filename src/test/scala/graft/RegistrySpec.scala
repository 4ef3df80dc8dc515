package graft

import graft.queries.Registry

class RegistrySpec extends SparkSpec {

  test("registry names are unique and SparkEntry maps are consistent") {
    assert(Registry.all.map(_.name).distinct.size === Registry.all.size)
    assert(SparkEntry.queries.keySet === Registry.all.map(_.name).toSet)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship entry returns rows on sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
