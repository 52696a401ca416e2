package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-integrity guards. `SparkEntry.queries` assembles module maps
  * with `toMap`, and the Similarity object assembles trait maps with
  * `++` — both SILENTLY overwrite on a duplicated key, which would
  * deregister a query (and its oracle row) without any test failing.
  * These guards turn that silent shadowing into a named failure. No
  * SparkSession needed: the maps are pure values.
  */
class RegistrySpec extends AnyFunSuite {

  private val modules = SparkEntry.modulesForSpec

  test("query names are globally unique across modules (no silent shadowing)") {
    val all = modules.flatMap(_.queries.keys)
    val dups = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"duplicated query names: ${dups.toSeq.sorted.mkString(", ")}")
    assert(all.size === SparkEntry.queries.size)
  }

  test("oracle names are globally unique and every oracle has a query") {
    val all = modules.flatMap(_.oracles.keys)
    val dups = all.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dups.isEmpty, s"duplicated oracle names: ${dups.toSeq.sorted.mkString(", ")}")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracles without a registered query: ${orphans.toSeq.sorted.mkString(", ")}")
  }

  test("only the formally waived queries lack an oracle") {
    // the HLL pair is waived by design (no DuckDB SQL reproduces another
    // engine's sketch registers — COVERAGE.md §2.4); anything else
    // without an oracle silently downgrades to a rows-only check
    val waived = Set("agg_approx", "agg_sketch_merge")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing === waived,
      s"queries without an oracle beyond the standing waiver: ${(missing -- waived).toSeq.sorted.mkString(", ")}")
  }
}
