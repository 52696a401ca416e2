package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's test corpus (TESTDATA.md / FIXTURES.md).
  *
  * One parquet file per table under `sfDir`. All query entry points take
  * `(SparkSession, sfDir)` so the same code runs at any scale factor — and,
  * at production scale, against any S3/HDFS prefix holding the same layout.
  * Scans stay declarative (`spark.read.parquet`) so Catalyst pushes filters
  * and prunes columns into the parquet reader.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = table(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects outright. Read it as a nanosecond long (legacy conf) and convert
    * to TimestampType via integer division — ns-since-epoch (~1.7e18) is
    * beyond double's 2^53 exact-integer range, so `div`, not `/`.
    * Micros-truncation is lossless here: the generator stamps microsecond
    * values.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
