package graft

/** Guard against vacuously-passing oracle checks: every registered query
  * must return rows on the smoke corpus (an empty result trivially
  * hash-matches an empty oracle, proving nothing). Also pins the
  * queries↔oracle registry invariant.
  */
class NonEmptySpec extends SparkSpec {

  test("every registered query returns rows at sf0.001") {
    val empty = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      SparkEntry.queries(name)(spark, sf0001).limit(1).count() == 0
    }
    assert(empty.isEmpty, s"vacuous queries: $empty")
  }

  test("every oracle key has a matching query; entry is registered") {
    val orphan = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphan.isEmpty, s"oracles without queries: $orphan")
    assert(SparkEntry.entry(spark).limit(1).count() > 0)
  }
}
