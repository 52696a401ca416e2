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
  /** `events.ts` has shipped as two parquet vintages across driver
    * regenerations, so the loader adapts to whichever is on disk and
    * normalizes both to the SAME TimestampType instants (UTC wall clock —
    * the values every oracle was pinned against):
    *   - TIMESTAMP(NANOS): Spark's vectorized reader won't produce it
    *     directly — read as a nanosecond long (legacy conf) and convert via
    *     integer division (ns-since-epoch ~1.7e18 exceeds double's 2^53
    *     exact-integer range, so `div`, not `/`; micros-truncation is
    *     lossless — the generator stamps microsecond values).
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): arrives as
    *     TIMESTAMP_NTZ; cast to TimestampType under a pinned UTC session
    *     timezone, which maps the naive wall clock to the identical
    *     instant. The session tz is set HERE because the cast's meaning
    *     depends on it — mains that don't set UTC themselves (Bench,
    *     Scratch) must not silently shift event times with the host tz.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // PUBLIC-API CONTRACT: events() PINS the session timezone to UTC for
    // the whole session (the NTZ→instant cast's meaning depends on it,
    // and downstream timestamp rendering/casts in OTHER queries follow).
    // Overriding a deliberately different caller setting is surprising —
    // so it is loud, never silent.
    val prev = spark.conf.get("spark.sql.session.timeZone")
    if (prev != "UTC")
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"graft.Tables.events pins spark.sql.session.timeZone=UTC for this session " +
          s"(was '$prev'): event-time semantics are defined in UTC; set UTC at " +
          "session build to silence this")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = table(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
