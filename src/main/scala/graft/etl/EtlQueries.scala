package graft.etl

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked entries for the reference-parity tier (SURVEY §2.1-2.2).
  *
  * The reference's whole data path is scan → enrich → sink
  * (`glue/job.py:22-44`); `enrich_customer` runs exactly that shape over the
  * parquet corpus and doubles as the flagship smoke query.
  */
object EtlQueries extends QueryModule {

  /** P1+P2: select-star-plus-derived enrichment over customer. */
  def enrichCustomer(spark: SparkSession, sfDir: String): DataFrame =
    Enrich.enrich(Tables.customer(spark, sfDir), nameCol = "c_name")
      .orderBy("c_custkey")

  /** P5: payload whitelisting — declared columns only, with a cast, mirroring
    * the reference's ValidationPipe whitelist+transform (`src/main.ts:7-12`).
    */
  def whitelistProject(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        col("o_totalprice").cast("double").as("o_totalprice"),
        col("o_orderstatus").cast("string").as("o_orderstatus"))
      .orderBy("o_orderkey")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "enrich_customer"    -> (enrichCustomer _),
    "whitelist_project"  -> (whitelistProject _),
  )

  override def oracles: Map[String, String] = Map(
    "enrich_customer" ->
      """SELECT *, TRUE AS processed, UPPER(COALESCE(c_name, '')) AS uppercase_name
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "whitelist_project" ->
      """SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
        |       CAST(o_orderstatus AS VARCHAR) AS o_orderstatus
        |FROM orders ORDER BY o_orderkey""".stripMargin,
  )
}
