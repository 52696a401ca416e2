package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The HLL query has no DuckDB oracle (estimates are implementation-
  * specific); this spec is its correctness bound instead: estimates must sit
  * within the configured relative standard deviation of the exact counts.
  */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct lands within 5x rsd of exact, per group") {
    val li = Tables.lineitem(spark, sf0001)
    val both = li.groupBy("l_returnflag").agg(
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx"),
        countDistinct(col("l_orderkey")).as("exact"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      val relErr = math.abs(approx - exact) / exact
      assert(relErr <= 0.10, s"flag=${r.getString(0)} approx=$approx exact=$exact relErr=$relErr")
    }
  }

  test("percentile_approx brackets the exact percentile") {
    val li = Tables.lineitem(spark, sf0001)
    val r = li.agg(
        expr("percentile_approx(l_extendedprice, 0.5, 1000)").as("ap"),
        expr("percentile(l_extendedprice, 0.5)").as("ex"),
        min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"))
      .head()
    val (ap, ex) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(ap - ex) / ex < 0.05, s"approx=$ap exact=$ex")
  }
}
