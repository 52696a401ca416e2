package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._


/** Shared vector primitives of the similarity family: the HOF dot/cosine
  * folds (double-precision, oracle-order accumulation), the fp64
  * exact-top-3 truth every compressed form grades against, and the DuckDB
  * SQL mirrors of the same math.
  *
  * Mechanically moved from the former monolithic Similarity.scala (round
  * 11); behavior-identical — proved by the normalized plan-identity diff
  * and the untouched CORRECTNESS hashes.
  */

trait SimilarityCore {

  /** dot(a, b) as a higher-order fold — the builtin-only formulation, kept
    * public as the reference implementation the native expression is
    * A/B-tested against (same sequential accumulation order → bit-identical
    * results).
    */
  def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def hofCosine(a: Column, b: Column): Column =
    hofDot(a, b) / (sqrt(hofDot(a, a)) * sqrt(hofDot(b, b)))

  /** Production path: the fused single-traversal native expression
    * (graft.functions.VectorExpressions) — no per-row intermediate array,
    * one loop for dot + both norms, inside whole-stage codegen.
    */
  protected def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.cosine_sim(a, b)

  /** Pairwise-op variant with precomputed norms: ‖v‖ is computed once per
    * VECTOR (N values) instead of inside every PAIR loop (N² values) —
    * cos = dot(a,b)/(na·nb). Bit-identical to the fused form: the separate
    * sum-of-squares accumulates in the same element order, and
    * sqrt(na²)·sqrt(nb²) is the same op sequence.
    */
  protected def normOf(e: Column): Column =
    sqrt(graft.functions.VectorExpressions.dot_product(e, e))

  protected def cosinePrenorm(a: Column, b: Column, na: Column, nb: Column): Column =
    graft.functions.VectorExpressions.dot_product(a, b) / (na * nb)

  protected def embDouble(df: DataFrame): DataFrame =
    df.withColumn("e", transform(col("embedding"), x => x.cast("double")))

  val NQueries = 10

  val NCentroids = 8

  /** The fp64 L2 exact top-3 per query — the ONE fidelity truth every
    * compressed form's `in_exact3` flag and hit count compare against.
    * Shared so the instrument can never silently diverge between the
    * IVF-PQ variants. Columns: (q_id, cand_id, hit = true). */
  protected def exact3Of(emb: DataFrame): DataFrame = {
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))
    val c = emb.select(col("vec_id").as("cand_id"), col("e").as("ce"))
    // native fused L2² (graft_l2sq): bit-identical to the HOF fold —
    // same sequential accumulation — but whole-stage-codegen'd
    val l2 = graft.functions.VectorExpressions.l2_sq(col("qe"), col("ce"))
    val byL2 = Window.partitionBy("q_id").orderBy(col("d2").asc, col("cand_id"))
    c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("cand_id"))
      .withColumn("d2", l2)
      .withColumn("xrn", row_number().over(byL2))
      .filter(col("xrn") <= 3)
      .select(col("q_id"), col("cand_id"), lit(true).as("hit"))
  }

  // DuckDB mirrors: same double math as the Spark fold — elementwise
  // multiply then sequential sum (list_sum), no FMA surprises.
  protected val duckDot =
    "list_sum(list_transform(range(1, 65), i -> a[i] * b[i]))"

  protected def duckCos(a: String, b: String): String =
    s"""(list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i]))
       | / (sqrt(list_sum(list_transform(range(1, 65), i -> $a[i] * $a[i])))
       |  * sqrt(list_sum(list_transform(range(1, 65), i -> $b[i] * $b[i])))))""".stripMargin

  protected def duckPlaneLit(p: Seq[Double]): String =
    p.map(v => if (v == v.floor) f"${v.toLong}%d.0" else v.toString).mkString("[", ", ", "]")

  protected def duckBucket: String =
    graft.functions.Hashing.RpPlanes.zipWithIndex.map { case (p, j) =>
      s"(CASE WHEN list_sum(list_transform(range(1, 65), i -> v[i] * (${duckPlaneLit(p)}::DOUBLE[])[i])) > 0.0 THEN ${1 << j} ELSE 0 END)"
    }.mkString(" + ")

}
