package graft.sources

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interchange-format coverage beyond Parquet/NDJSON/CSV (SURVEY §2.1 EXT).
  *
  * ORC is the one other columnar format Spark ships a native vectorized
  * reader/writer for; a lakehouse ingesting third-party drops sees it
  * regularly. The oracle-checked query proves the full sink→scan loop
  * preserves values exactly: write lineitem as ORC, read it back, aggregate
  * — the result must hash-match DuckDB computing the same aggregate from
  * the original Parquet. Predicate pushdown and column pruning work on the
  * ORC scan the same as Parquet (Catalyst's `OrcScan` shows PushedFilters),
  * so the round-trip is also a scan-quality check, not just a fidelity one.
  */
object Formats extends QueryModule {

  /** Deterministic scratch dir per scale factor (bench and verify may both
    * run; overwrite mode keeps reruns idempotent).
    */
  private def scratch(sfDir: String, leaf: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_formats/${math.abs(sfDir.hashCode)}/$leaf"

  def orcRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val out = scratch(sfDir, "lineitem_orc")
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag", "l_shipdate")
      .write.mode("overwrite").orc(out)
    spark.read.orc(out)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(30,6)")).cast("double").as("sum_price"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))
      .orderBy("l_returnflag")
  }

  /** CSV round-trip — the row-format fidelity check (S8): CSV has no type
    * system, so everything survives only through the explicit read schema;
    * timestamps go through the default ISO formatter both ways. Same
    * aggregate-vs-original-parquet oracle trick as ORC: any value the
    * text round-trip corrupted (double formatting, timestamp precision)
    * breaks the hash.
    */
  def csvRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val out = scratch(sfDir, "lineitem_csv")
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag", "l_shipdate")
      .write.mode("overwrite").option("header", "true").csv(out)
    spark.read
      .schema("l_orderkey BIGINT, l_linenumber INT, l_quantity DOUBLE, " +
        "l_extendedprice DOUBLE, l_returnflag STRING, l_shipdate TIMESTAMP")
      .option("header", "true").csv(out)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(30,6)")).cast("double").as("sum_price"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))
      .orderBy("l_returnflag")
  }

  /** NDJSON round-trip — the REFERENCE's interchange format (glue/job.py
    * reads and writes newline-delimited JSON): write lineitem as JSON
    * lines, read back through an explicit schema, aggregate, hash-match
    * DuckDB on the original parquet.
    */
  def jsonRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val out = scratch(sfDir, "lineitem_json")
    Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag", "l_shipdate")
      .write.mode("overwrite").json(out)
    spark.read
      .schema("l_orderkey BIGINT, l_linenumber INT, l_quantity DOUBLE, " +
        "l_extendedprice DOUBLE, l_returnflag STRING, l_shipdate TIMESTAMP")
      .json(out)
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(30,6)")).cast("double").as("sum_price"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))
      .orderBy("l_returnflag")
  }

  /** Hive-partitioned parquet sink → partition-pruned scan (S7's partitioned
    * form as an ORACLE query, not just the CuratedZone spec): write orders
    * partitioned by derived year, read back with a partition predicate —
    * pruning plans only the matching directories — and aggregate per year.
    * The partition column round-trips through the DIRECTORY NAME (written
    * as path segments, re-inferred as INT on read), which is exactly the
    * fidelity this query pins against DuckDB computing from the original
    * table.
    */
  def parquetPartitioned(spark: SparkSession, sfDir: String): DataFrame = {
    val out = scratch(sfDir, "orders_part")
    Tables.orders(spark, sfDir)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(out)
    spark.read.parquet(out)
      .filter(col("o_year") >= 1996) // partition pruning: only those dirs scan
      .groupBy("o_year")
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(30,6)")).cast("double").as("sum_price"),
        countDistinct(col("o_custkey")).as("n_cust"))
      .orderBy("o_year")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orc_roundtrip" -> (orcRoundtrip _),
    "csv_roundtrip" -> (csvRoundtrip _),
    "json_roundtrip" -> (jsonRoundtrip _),
    "parquet_partitioned" -> (parquetPartitioned _),
  )

  // The oracle reads the ORIGINAL parquet: any value a round-trip corrupted
  // (timestamp precision, double bits, nulls) breaks the hash match. All
  // three formats share it — the CONTRACT is format-independent fidelity.
  private val roundtripOracle =
    """SELECT l_returnflag,
      |  COUNT(*) AS n,
      |  ROUND(SUM(l_quantity), 2) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price,
      |  MIN(l_shipdate) AS min_ship,
      |  MAX(l_shipdate) AS max_ship
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  override def oracles: Map[String, String] = Map(
    "orc_roundtrip" -> roundtripOracle,
    "csv_roundtrip" -> roundtripOracle,
    "json_roundtrip" -> roundtripOracle,
    "parquet_partitioned" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price,
        |  COUNT(DISTINCT o_custkey) AS n_cust
        |FROM orders
        |WHERE year(o_orderdate) >= 1996
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin,
  )
}
