package graft.queries

import graft.SparkSpec

class TopKSpec extends SparkSpec {

  test("heap aggregator output is row-identical to the window top-k") {
    val win = Windows.winTopkPerKey(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val heap = Windows.aggTopkHeap(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(heap.toSeq === win.toSeq)
  }

  test("aggregator state never exceeds k and merge order is irrelevant") {
    val agg = new graft.functions.TopKAggregator(3)
    val xs = Seq(5.0 -> 1L, 1.0 -> 2L, 9.0 -> 3L, 9.0 -> 4L, 2.0 -> 5L)
      .map { case (s, i) => graft.functions.Scored(s, i) }
    val leftFold = xs.foldLeft(agg.zero)(agg.reduce)
    val split = agg.merge(
      xs.take(2).foldLeft(agg.zero)(agg.reduce),
      xs.drop(2).foldLeft(agg.zero)(agg.reduce))
    assert(leftFold === split)
    assert(leftFold.map(_.id) === Seq(3L, 4L, 1L))
    assert(leftFold.length <= 3)
  }
}
