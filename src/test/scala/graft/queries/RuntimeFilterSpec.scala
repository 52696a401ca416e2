package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning: for a selective dim-side filter,
  * Spark injects a bloom filter built from the small side into the big
  * side's scan — rows that cannot join die at the scan, before the
  * shuffle. At 100 TB this is often the difference between shuffling the
  * fact table and shuffling 2% of it. Thresholds here are lowered so the
  * optimization fires at test scale; on a cluster the defaults (10 GB
  * application side) target exactly the big-fact case.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective join injects a bloom filter on the fact-side scan") {
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, sf0001)
      val o = Tables.orders(spark, sf0001).filter(col("o_orderstatus") === "P")
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_totalprice")
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected an injected bloom filter in:\n$optimized")
      // and it did not change the answer
      assert(joined.count() ===
        li.join(o.hint("broadcast"), li("l_orderkey") === o("o_orderkey")).count())
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }
}
