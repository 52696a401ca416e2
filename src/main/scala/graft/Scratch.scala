package graft

import org.apache.spark.sql.SparkSession

/** Single-query timing harness (dev tool, not part of the driver
  * contract): `runMain graft.Scratch <query_name>` times one registered
  * query 3× at SPARK_GRAFT_SF_DIR — the fast loop for optimizing one
  * operator without paying for a full Bench sweep.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("id % 97 AS k", "id AS v")
      .groupBy("k").count().count()
    val name = args.headOption.getOrElse("dedup_containment")
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[scratch] $name run$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
