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
  private def scratch(sfDir: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_formats/${math.abs(sfDir.hashCode)}/lineitem_orc"

  def orcRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val out = scratch(sfDir)
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

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orc_roundtrip" -> (orcRoundtrip _),
  )

  // The oracle reads the ORIGINAL parquet: any value the ORC loop corrupted
  // (timestamp precision, double bits, nulls) breaks the hash match.
  override def oracles: Map[String, String] = Map(
    "orc_roundtrip" ->
      """SELECT l_returnflag,
        |  COUNT(*) AS n,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) AS sum_price,
        |  MIN(l_shipdate) AS min_ship,
        |  MAX(l_shipdate) AS max_ship
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
  )
}
