package graft.sources

import graft.{SparkSpec, Tables}
import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CuratedZoneSpec extends SparkSpec {

  test("month-partitioned write prunes directories on read (PartitionFilters)") {
    val path = Files.createTempDirectory("graft-curated").toString
    CuratedZone.writePartitionedByMonth(
      Tables.orders(spark, sf0001), "o_orderdate", path)

    val pruned = CuratedZone.readMonthRange(spark, path, 199601, 199612)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains("part_ym"), plan)

    // values correct: only 1996 orders
    val years = pruned.select(year(col("o_orderdate"))).distinct()
      .collect().map(_.getInt(0)).toSet
    assert(years === Set(1996))

    // physical layout: hive-style month dirs exist
    val dirs = new java.io.File(path).listFiles().map(_.getName).filter(_.startsWith("part_ym="))
    assert(dirs.nonEmpty)
  }

  test("compaction collapses a fragmented zone, preserving rows and layout") {
    val src = Files.createTempDirectory("graft-frag").toString
    val dst = Files.createTempDirectory("graft-compact").toString
    // fragment: force many tiny files per month partition
    Tables.orders(spark, sf0001)
      .withColumn("part_ym", date_format(col("o_orderdate"), "yyyyMM").cast("int"))
      .repartition(16)
      .write.partitionBy("part_ym")
      .option("maxRecordsPerFile", 20)
      .mode("overwrite").parquet(src)

    def parquetFiles(root: String): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Seq.empty
      walk(new java.io.File(root))
    }
    val fragged = parquetFiles(src).length
    assert(fragged > 100, s"fixture should be fragmented, got $fragged files")

    CuratedZone.compactTo(spark, src, dst, "part_ym",
      Seq("o_custkey", "o_orderkey"), targetRecordsPerFile = 100000L)

    val compacted = parquetFiles(dst).length
    val nParts = new java.io.File(dst).listFiles()
      .count(_.getName.startsWith("part_ym="))
    assert(compacted <= nParts + 1, s"$compacted files across $nParts partitions")
    // same data, hive layout intact
    val before = spark.read.parquet(src).orderBy("o_orderkey", "part_ym").collect()
    val after = spark.read.parquet(dst).orderBy("o_orderkey", "part_ym").collect()
    assert(after.length === before.length)
    assert(after.toSeq === before.toSeq)
  }

  test("co-bucketed tables join with zero exchanges") {
    // warehouse.dir is a static conf — tables land in ./spark-warehouse
    // (gitignored); only the broadcast threshold is session-scoped here.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    // (no manual cleanup needed: writeBucketed drops the catalog entry and
    // sweeps any orphaned location itself)
    val o = Tables.orders(s2, sf0001)
    val c = Tables.customer(s2, sf0001)
    CuratedZone.writeBucketed(o, "orders_b", "o_custkey", 8)
    CuratedZone.writeBucketed(
      c.withColumnRenamed("c_custkey", "o_custkey"), "customer_b", "o_custkey", 8)

    val joined = s2.table("orders_b").join(s2.table("customer_b"), "o_custkey")
    joined.count()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() === o.count()) // every order has its customer
  }
}

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the plain join's rows") {
    val o = Tables.orders(spark, sf0001)
    val c = Tables.customer(spark, sf0001).withColumnRenamed("c_custkey", "o_custkey")
    val plain = o.join(c, Seq("o_custkey"), "inner")
      .select("o_orderkey", "c_name").orderBy("o_orderkey")
    val salted = SkewJoin.saltedInnerJoin(o, c, "o_custkey", saltFactor = 7)
      .select("o_orderkey", "c_name").orderBy("o_orderkey")
    assert(salted.collect().toSeq === plain.collect().toSeq)
  }

  test("salt spreads a hot key over multiple partitions deterministically") {
    import spark.implicits._
    // one celebrity key with 10k rows
    val big = spark.range(10000).select(lit(42L).as("k"), col("id").as("payload"))
    val small = Seq((42L, "dim")).toDF("k", "name")
    val out = SkewJoin.saltedInnerJoin(big, small, "k", saltFactor = 8)
    assert(out.count() === 10000)
    // deterministic: same result twice
    assert(SkewJoin.saltedInnerJoin(big, small, "k", 8).count() === 10000)
    // distribution check: per-salt row counts are roughly uniform
    val counts = big.withColumn("__salt",
        pmod(xxhash64(col("k"), col("payload")), lit(8)).cast("int"))
      .groupBy("__salt").count().collect().map(_.getLong(1))
    assert(counts.length === 8)
    assert(counts.min > 500, s"salt skewed: ${counts.mkString(",")}")
  }
}

/** The OTHER half of the skew story: Spark's own AQE skew-join split.
  * `SkewJoin` (manual salting) handles extreme single-key skew; for garden-
  * variety skew, AQE splits oversized sort-merge partitions at runtime with
  * no query rewrite. This spec pins the behavior (and the configs that
  * enable it at test scale) so the engine's 100 TB claim is executable, not
  * aspirational.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge partition at runtime (skew=true)") {
    val confs = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of 300k rows pile onto key 0; the dim side is tiny but
      // broadcast is disabled, so this must survive as a sort-merge join.
      val big = spark.range(300000)
        .selectExpr("IF(id % 10 < 9, 0L, id % 97) AS k", "id AS v")
      val small = spark.range(97).selectExpr("id AS k", "id * 10 AS w")
      val joined = big.join(small, "k")
      // materialize THIS DataFrame's queryExecution (count() would plan a
      // separate query and leave this one unexecuted / non-final)
      assert(joined.collect().length === 300000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed SMJ:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }
}
