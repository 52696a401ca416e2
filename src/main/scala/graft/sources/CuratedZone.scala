package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Curated-zone layout management — the landing→transformed two-zone design
  * of the reference (`src/config/aws.config.ts:4-6`, prefix rule
  * `glue/job.py:19`) grown into the partitioned/bucketed parquet layout a
  * 100 TB curated zone actually needs.
  *
  * Layout rules encoded here:
  *  - fact tables partition by a low-cardinality date derivative
  *    (year/month) so time-ranged queries prune whole directories before
  *    any IO (PartitionFilters in the scan, verified by spec);
  *  - join-heavy tables bucket by their join key so co-bucketed joins plan
  *    with zero exchanges — the pre-shuffled layout is the single biggest
  *    shuffle saver for repeated big-big joins;
  *  - both writers compact to sane file counts (`maxRecordsPerFile`
  *    guard rails instead of letting every task emit a shard).
  */
object CuratedZone {

  /** Write a date-partitioned parquet dataset: `path/part_ym=YYYYMM/…`. */
  def writePartitionedByMonth(
      df: DataFrame,
      tsCol: String,
      path: String,
      maxRecordsPerFile: Long = 5000000L): Unit =
    df.withColumn("part_ym",
        date_format(col(tsCol), "yyyyMM").cast("int"))
      .write
      .partitionBy("part_ym")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** Read with a month range — the filter lands in PartitionFilters, so
    * only matching `part_ym=` directories are listed and scanned.
    */
  def readMonthRange(
      spark: SparkSession,
      path: String,
      fromYm: Int,
      toYm: Int): DataFrame =
    spark.read.parquet(path)
      .filter(col("part_ym") >= fromYm && col("part_ym") <= toYm)

  /** Compact a partitioned dataset's small files into ~target-sized ones —
    * the standing maintenance job of any streamed-into curated zone: every
    * micro-batch drains a few rows per partition, and a year of that is
    * millions of kilobyte files whose LIST + open overhead dwarfs the data
    * at 100 TB.
    *
    * `repartitionByRange(partCol +: sortCols)` does the heavy lifting:
    * rows of one partition value land contiguously (one output file per
    * range slice, not one per input task), and within each file rows are
    * range-clustered by `sortCols`, which tightens parquet min/max zone
    * maps for later predicate skipping. Writes to `destPath` (an object
    * store has no atomic rename, and Spark cannot overwrite a path it is
    * reading) — the orchestration layer swaps the prefix pointer.
    * Returns the number of range slices written.
    */
  def compactTo(
      spark: SparkSession,
      srcPath: String,
      destPath: String,
      partCol: String,
      sortCols: Seq[String],
      targetRecordsPerFile: Long = 5000000L): Int = {
    val df = spark.read.parquet(srcPath)
    val total = df.count()
    val slices = math.max(1, math.ceil(total.toDouble / targetRecordsPerFile).toInt)
    df.repartitionByRange(slices, (partCol +: sortCols).map(col): _*)
      .write
      .partitionBy(partCol)
      .option("maxRecordsPerFile", targetRecordsPerFile)
      .mode(SaveMode.Overwrite)
      .parquet(destPath)
    slices
  }

  /** Persist a bucketed table (bucketBy requires the table catalog). Two
    * tables bucketed the same way on the same key join with no exchange on
    * either side.
    *
    * The warehouse directory outlives the JVM while the (in-memory)
    * catalog does not, so a re-run in a fresh session would trip
    * LOCATION_ALREADY_EXISTS on the orphaned location — drop the entry
    * AND delete the leftover directory before writing.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      nBuckets: Int): Unit = synchronized {
    // JVM-wide lock: concurrent test suites (or a Verify + spec overlap)
    // re-creating the SAME table would interleave drop/delete/write.
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // Resolve the orphaned location through the Hadoop FileSystem for the
    // warehouse URI — a java.io.File on the stripped path silently no-ops
    // for any non-local warehouse (hdfs://, s3a://), which would resurface
    // the LOCATION_ALREADY_EXISTS re-run failure this delete prevents.
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"))
    val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .saveAsTable(table)
  }
}
