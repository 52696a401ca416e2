package graft.sources

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering.
  *
  * Partition pruning only skips on the partition column; queries that
  * filter on TWO dimensions (customer AND date) still scan every file of a
  * date partition. Sorting files along a space-filling curve interleaving
  * both dimensions gives each file a small bounding box in (cust, day)
  * space, so min/max footer stats skip files for either predicate — the
  * standard lakehouse answer (Delta/Iceberg `OPTIMIZE ZORDER BY`) rebuilt
  * here from plain bit arithmetic.
  *
  * Everything is codegen-friendly integer expression work: interleave the
  * low 16 bits of two cell coordinates, bit j of x → bit 2j, bit j of y →
  * bit 2j+1. `zorderWrite` is the write path: range-partition by z-value
  * (range, not hash — neighboring z-cells must land in the same file),
  * sort within partitions, write. At 100 TB the identical plan holds; the
  * only knob is the target file count.
  */
object Layout extends QueryModule {

  val Bits = 16

  /** Morton-interleave the low 16 bits of x (even positions) and y (odd). */
  def interleave(x: Column, y: Column): Column =
    (0 until Bits).map { j =>
      shiftleft(shiftright(x, j).bitwiseAND(1L), 2 * j) +
        shiftleft(shiftright(y, j).bitwiseAND(1L), 2 * j + 1)
    }.reduce(_ + _)

  /** Inverse of interleave — the even-position bits (x side). */
  def evenBits(z: Column): Column =
    (0 until Bits).map(j => shiftleft(shiftright(z, 2 * j).bitwiseAND(1L), j)).reduce(_ + _)

  /** Inverse of interleave — the odd-position bits (y side). */
  def oddBits(z: Column): Column =
    (0 until Bits).map(j => shiftleft(shiftright(z, 2 * j + 1).bitwiseAND(1L), j)).reduce(_ + _)

  /** Write `df` clustered along the z-curve of (xCol, yCol) into ~nFiles
    * range-partitioned, internally-sorted parquet files.
    */
  def zorderWrite(df: DataFrame, xCol: Column, yCol: Column, nFiles: Int, outDir: String): Unit =
    df.withColumn("__z", interleave(xCol, yCol))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)

  /** Oracle-checked z-value computation over orders: cells are
    * (custkey mod 2^16, days since epoch start). `zbucket` (the top bits)
    * is the file-assignment a range partitioner would produce.
    */
  def layoutZorder(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.orders(spark, sfDir)
      .withColumn("cell_cust", pmod(col("o_custkey"), lit(65536L)))
      .withColumn("cell_day",
        datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).cast("long"))
      .withColumn("zval", interleave(col("cell_cust"), col("cell_day")))
      .select(
        col("o_orderkey"),
        col("cell_cust"),
        col("cell_day"),
        col("zval"),
        shiftright(col("zval"), 20).as("zbucket"))
      .orderBy("o_orderkey")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder" -> (layoutZorder _),
  )

  override def oracles: Map[String, String] = {
    val zExpr = (0 until Bits).map { j =>
      s"((cell_cust >> $j) & 1) * ${1L << (2 * j)} + ((cell_day >> $j) & 1) * ${1L << (2 * j + 1)}"
    }.mkString(" + ")
    Map(
      "layout_zorder" ->
        s"""WITH c AS (
           |  SELECT o_orderkey,
           |    o_custkey % 65536 AS cell_cust,
           |    datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS cell_day
           |  FROM orders
           |), z AS (
           |  SELECT o_orderkey, cell_cust, cell_day, $zExpr AS zval FROM c
           |)
           |SELECT o_orderkey, cell_cust, cell_day, zval, zval >> 20 AS zbucket
           |FROM z ORDER BY o_orderkey""".stripMargin,
    )
  }
}
