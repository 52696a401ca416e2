package graft.queries

import graft.SparkSpec

/** Pins label propagation against a HAND-DERIVED run on a crafted graph
  * (the mirror-oracle countermeasure: the DuckDB oracle unrolls the same
  * three rounds, so only an independent derivation catches a shared
  * update-rule bug).
  */
class GraphSpec extends SparkSpec {

  test("label propagation matches the hand-derived 3-round run") {
    import spark.implicits._
    // two triangles {1,2,3}, {4,5,6} joined by one bridge 3-4, plus the
    // isolated node 7. Hand derivation (count DESC, label ASC tiebreak):
    //   l1: 1->2, 2->1, 3->1, 4->3, 5->4, 6->4
    //   l2: 1->1, 2->1, 3->1, 4->4, 5->3, 6->3
    //   l3: 1->1, 2->1, 3->1, 4->3, 5->3, 6->3
    // -> communities {1,2,3}=1 and {4,5,6}=3 despite the bridge; 7 stays 7.
    val half = Seq((1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4))
    val und = (half ++ half.map(_.swap)).toDF("src", "dst")
    val nodes = (1 to 7).toDF("node")
    val got = Graph.labelPropOf(und, nodes).collect()
      .map(r => r.getInt(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(got === Map(
      1 -> (1, 3L), 2 -> (1, 3L), 3 -> (1, 3L),
      4 -> (3, 3L), 5 -> (3, 3L), 6 -> (3, 3L),
      7 -> (7, 1L)))
  }
}
