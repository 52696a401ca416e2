package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reference-parity enrichment — the reference engine's single transform.
  *
  * The reference (pedrohw12/etl-pipeline-aws, `glue/job.py:27-34`) maps each
  * record to `{**record, "processed": True,
  * "uppercase_name": record.get("name", "").upper()}`: keep every input
  * field, add a boolean literal, and add an uppercased, null-safe copy of
  * `name`. Missing `name` defaults to the empty string (`glue/job.py:31`).
  *
  * Spark-first shape: select-star-plus-two-derived via `withColumn`, which
  * Catalyst folds into the scan's projection — fully codegen'd, no UDF, and
  * (unlike the reference's whole-object-in-driver-memory Python loop,
  * `glue/job.py:22-23`) distributed over however many partitions the source
  * has. At 100 TB this is a pure map stage: no shuffle, no driver
  * materialization.
  */
object Enrich {

  /** Enrich `df`, deriving `uppercase_name` from `nameCol`.
    *
    * `record.get("name", "")` has two distinct miss modes in the dynamic
    * schema world: the field is absent from the batch's schema entirely, or
    * present but null on a given row. Both yield `""` — the first via the
    * schema guard here, the second via `coalesce`.
    */
  def enrich(df: DataFrame, nameCol: String = "name"): DataFrame = {
    val nameExpr =
      if (df.columns.contains(nameCol)) coalesce(col(nameCol).cast("string"), lit(""))
      else lit("")
    df.withColumn("processed", lit(true))
      .withColumn("uppercase_name", upper(nameExpr))
  }
}
