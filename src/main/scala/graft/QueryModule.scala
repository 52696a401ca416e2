package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of oracle-checked queries.
  *
  * Each module contributes `(SparkSession, sfDir) => DataFrame` entries plus
  * (where ANSI-SQL-expressible) a DuckDB oracle string per entry. The driver
  * hash-compares result values after sorting columns by name, so every query
  * here (a) aliases each computed column identically in Spark and SQL, and
  * (b) pins a total row order with an explicit trailing orderBy — floats are
  * rounded onto the decimal grid their exact value lies on, so both engines
  * land on the same rounded value regardless of summation order.
  */
trait QueryModule {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
