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

  /** P4: object-key URL-decode — the reference's
    * `decodeURIComponent(record.s3.object.key)` (lambda/handler.ts:37);
    * S3 event notifications deliver keys percent-encoded, with '+' for
    * spaces in the query-string convention. A planted corpus (keys built
    * from public customer columns with a fixed escape set) goes through the
    * codegen'd `url_decode` builtin and the `transformed/{key}` output rule
    * (glue/job.py:19), so the whole key arithmetic is oracle-checked.
    * DuckDB has no url_decode; the oracle decodes the planted escapes with
    * an equivalent replace() chain ('+' first — no %2B is planted, so the
    * chain is confluent).
    */
  def keyDecode(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir)
      .select(col("c_custkey"),
        concat(lit("landing%2F"), col("c_mktsegment"), lit("%2Fcust+"),
          col("c_custkey"), lit("%20v%3D1.ndjson")).as("raw_key"))
      .withColumn("key", expr("url_decode(raw_key)"))
      .withColumn("output_key",
        concat(lit(Ndjson.transformedKey("")), col("key")))
      .orderBy("c_custkey")

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "enrich_customer"    -> (enrichCustomer _),
    "whitelist_project"  -> (whitelistProject _),
    "etl_key_decode"     -> (keyDecode _),
  )

  override def oracles: Map[String, String] = Map(
    "enrich_customer" ->
      """SELECT *, TRUE AS processed, UPPER(COALESCE(c_name, '')) AS uppercase_name
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "whitelist_project" ->
      """SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
        |       CAST(o_orderstatus AS VARCHAR) AS o_orderstatus
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "etl_key_decode" ->
      """WITH k AS (
        |  SELECT c_custkey,
        |    'landing%2F' || c_mktsegment || '%2Fcust+' || c_custkey || '%20v%3D1.ndjson' AS raw_key
        |  FROM customer
        |), d AS (
        |  SELECT c_custkey, raw_key,
        |    replace(replace(replace(replace(raw_key,
        |      '+', ' '), '%2F', '/'), '%20', ' '), '%3D', '=') AS key
        |  FROM k
        |)
        |SELECT c_custkey, raw_key, key, 'transformed/' || key AS output_key
        |FROM d ORDER BY c_custkey""".stripMargin,
  )
}
