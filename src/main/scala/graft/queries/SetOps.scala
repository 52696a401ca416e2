package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set operations (SURVEY §2.7). Spark's `union` is bag semantics
  * (UNION ALL); `intersect`/`except` are distinct-set semantics;
  * `intersectAll`/`exceptAll` are multiset. All map 1:1 to ANSI.
  */
object SetOps extends QueryModule {

  /** UNION ALL across two different tables with a provenance tag. */
  def setUnionAll(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("key"), lit("customer").as("src"))
    val s = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey").as("key"), lit("supplier").as("src"))
    c.union(s).orderBy("key", "src")
  }

  /** Customers active in both order statuses (INTERSECT = distinct). */
  def setIntersect(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("key"))
    val op = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("key"))
    f.intersect(op).orderBy("key")
  }

  /** Customer keys with no P-status order (EXCEPT = distinct). */
  def setExcept(spark: SparkSession, sfDir: String): DataFrame = {
    val all = Tables.customer(spark, sfDir).select(col("c_custkey").as("key"))
    val p = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "P").select(col("o_custkey").as("key"))
    all.except(p).orderBy("key")
  }

  /** Multiset difference: order-count surplus of O-status over F-status per
    * customer, expressed as EXCEPT ALL over the custkey bags.
    */
  def setExceptAll(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val os = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("key"))
    val fs = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("key"))
    os.exceptAll(fs).orderBy("key")
  }

  /** Multiset intersection: per-customer order counts common to both status
    * bags (INTERSECT ALL keeps min-multiplicity duplicates).
    */
  def setIntersectAll(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val os = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("key"))
    val fs = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("key"))
    os.intersectAll(fs).orderBy("key")
  }

  /** Schema-evolution union: two drops of the "same" table with drifted
    * schemas (a column added, another missing) combined with
    * `unionByName(allowMissingColumns)` — absent columns become NULL, and
    * matching is BY NAME, not position. This is the reference's open-schema
    * `{**record}` spirit (glue/job.py:28) at the table level, and the
    * everyday reality of multi-vintage parquet drops at 100 TB.
    */
  def setUnionEvolve(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.orders(spark, sfDir)
    val v1 = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val v2 = o.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_orderstatus"),
        col("o_orderpriority")) // totalprice gone, priority added
    v1.unionByName(v2, allowMissingColumns = true)
      .orderBy("o_orderkey")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "set_union_evolve" -> (setUnionEvolve _),
    "set_intersect_all" -> (setIntersectAll _),
    "set_union_all"  -> (setUnionAll _),
    "set_intersect"  -> (setIntersect _),
    "set_except"     -> (setExcept _),
    "set_except_all" -> (setExceptAll _),
  )

  override def oracles: Map[String, String] = Map(
    "set_union_evolve" ->
      """SELECT * FROM (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL BY NAME
        |  SELECT o_orderkey, o_orderstatus, CAST(NULL AS DOUBLE) AS o_totalprice,
        |    o_orderpriority
        |  FROM orders WHERE o_orderkey % 2 = 1
        |)
        |ORDER BY o_orderkey""".stripMargin,
    "set_intersect_all" ->
      """SELECT * FROM (
        |  SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O'
        |  INTERSECT ALL
        |  SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY key""".stripMargin,
    "set_union_all" ->
      """SELECT * FROM (
        |  SELECT c_custkey AS key, 'customer' AS src FROM customer
        |  UNION ALL
        |  SELECT s_suppkey AS key, 'supplier' AS src FROM supplier)
        |ORDER BY key, src""".stripMargin,
    "set_intersect" ->
      """SELECT * FROM (
        |  SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F'
        |  INTERSECT
        |  SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O')
        |ORDER BY key""".stripMargin,
    "set_except" ->
      """SELECT * FROM (
        |  SELECT c_custkey AS key FROM customer
        |  EXCEPT
        |  SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'P')
        |ORDER BY key""".stripMargin,
    "set_except_all" ->
      """SELECT * FROM (
        |  SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'O'
        |  EXCEPT ALL
        |  SELECT o_custkey AS key FROM orders WHERE o_orderstatus = 'F')
        |ORDER BY key""".stripMargin,
  )
}
