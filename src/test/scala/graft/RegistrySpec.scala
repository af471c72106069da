package graft

/** Registry invariants: every oracle row names a registered query (a
  * typo'd key would silently become a skipped check, not a failure),
  * and the flagship entry returns rows (the driver's smoke contract).
  */
class RegistrySpec extends SparkSpec {

  test("every oracleSql key is a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle rows without a query: $orphans")
  }

  test("query names are stable snake_case identifiers") {
    val bad = SparkEntry.queries.keys.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-snake-case query names: $bad")
  }

  test("flagship entry returns rows at the smoke scale factor") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1)
  }
}
