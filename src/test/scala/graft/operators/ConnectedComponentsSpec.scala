package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("transitive chain collapses to one component rooted at the min id") {
    // 7→2→5→9 as a path; min label must flow the full diameter
    val got = cc(Seq((7L, 2L), (5L, 2L), (5L, 9L)))
    assert(got === Map(7L -> 2L, 2L -> 2L, 5L -> 2L, 9L -> 2L))
  }

  test("disjoint components keep separate roots; non-edge nodes absent") {
    val got = cc(Seq((1L, 2L), (10L, 11L), (11L, 12L)))
    assert(got(1L) === 1L && got(2L) === 1L)
    assert(got(10L) === 10L && got(11L) === 10L && got(12L) === 10L)
    assert(!got.contains(99L))
  }

  test("long path converges within the iteration cap") {
    val path = (0L until 12L).map(i => (i, i + 1))
    val got = cc(path)
    assert(got.values.toSet === Set(0L))
    assert(got.size === 13)
  }

  test("cluster canonical rule is transitive-consistent on the corpus") {
    val rows = graft.llm.Dedup.dedupClusters(spark, sf0001).collect()
    assert(rows.nonEmpty, "corpus has planted near-dups, clusters expected")
    val byCluster = rows.groupBy(_.getLong(0))
    byCluster.foreach { case (cid, members) =>
      val ids = members.map(_.getLong(1))
      assert(ids.min === cid, "cluster id must be its min member")
      assert(members.count(_.getBoolean(2)) === 1, "exactly one canonical")
    }
  }
}
