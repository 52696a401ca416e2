package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** HLL sketch re-aggregation invariants (DataSketches via Spark builtins):
  * the properties that make per-day sketch tables trustworthy at scale.
  */
class SketchSpec extends SparkSpec {

  test("union of monthly sketches estimates EXACTLY like one direct sketch") {
    val o = Tables.orders(spark, sf0001)
    val merged = o
      .groupBy(to_date(date_trunc("month", col("o_orderdate"))).as("m"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val direct = o
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est"))
      .head().getLong(0)
    // HLL state is order-independent: merging partials reaches the same
    // sketch as one pass, so the estimates are identical, not just close.
    assert(merged === direct)
  }

  test("estimate is within the configured error bound of the true count") {
    val o = Tables.orders(spark, sf0001)
    val est = o.agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))))
      .head().getLong(0)
    val exact = o.select(countDistinct(col("o_custkey"))).head().getLong(0)
    val relErr = math.abs(est.toDouble - exact) / exact
    assert(relErr < 0.05, s"est=$est exact=$exact relErr=$relErr")
  }
}
