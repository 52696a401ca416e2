package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closed-form pins for the regression and Welch-test queries — their
  * DuckDB oracles mirror the implementation formulas, so a transcription
  * error (swapped intercept numerator, wrong df denominator) would pass
  * verification; these corpora have hand-derivable answers.
  */
class StatSpec extends SparkSpec {

  test("OLS on an exact line recovers slope, intercept, r2 = 1, and zero above-fit") {
    import spark.implicits._
    // y = 3x + 7 exactly, two groups with different x ranges
    val df = (1 to 20).flatMap { i =>
      Seq(("g1", i.toDouble, 3.0 * i + 7), ("g2", (i + 5).toDouble, 3.0 * (i + 5) + 7))
    }.toDF("g", "x", "y")
    val rows = Relational.linregrOf(df, "g", col("x"), col("y")).collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      assert(r.getDouble(r.fieldIndex("slope")) === 3.0)
      assert(r.getDouble(r.fieldIndex("intercept")) === 7.0)
      assert(r.getDouble(r.fieldIndex("r2")) === 1.0)
      // no point lies strictly above its own fit line
      assert(r.getLong(r.fieldIndex("n_above_fit")) === 0L)
    }
  }

  test("OLS residual scoring counts points strictly above the fit") {
    import spark.implicits._
    // symmetric residuals ±1 around y = 2x: slope 2, intercept 0, half above
    val df = (1 to 10).flatMap { i =>
      Seq(("g", i.toDouble, 2.0 * i + 1), ("g", i.toDouble, 2.0 * i - 1))
    }.toDF("g", "x", "y")
    val r = Relational.linregrOf(df, "g", col("x"), col("y")).collect().head
    assert(r.getDouble(r.fieldIndex("slope")) === 2.0)
    assert(r.getDouble(r.fieldIndex("intercept")) === 0.0)
    assert(r.getLong(r.fieldIndex("n_above_fit")) === 10L)
  }

  test("Welch on equal-size equal-variance samples gives df = 2n-2 and the pooled t2") {
    import spark.implicits._
    // treat = {10,12} repeated, control = {7,9} repeated: each sample has
    // variance s2 = 2*n/4/(n-1)... hand-derive with n=4: values 10,12,10,12
    // mean 11 var 4/3; control 7,9,7,9 mean 8 var 4/3.
    // se2 = (4/3)/4 + (4/3)/4 = 2/3; t2 = 9 / (2/3) = 13.5
    // df = se2^2 / (((1/3)^2)/3 + ((1/3)^2)/3) = (4/9)/(2/27) = 6 = 2n-2
    val rows = Seq(
      ("t", 10.0), ("t", 12.0), ("t", 10.0), ("t", 12.0),
      ("c", 7.0), ("c", 9.0), ("c", 7.0), ("c", 9.0))
      .toDF("event_type", "value")
    val r = Relational.welchOf(rows, "c").collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getDouble(row.fieldIndex("mean_diff")) === 3.0)
    assert(row.getDouble(row.fieldIndex("t2_welch")) === 13.5)
    assert(row.getDouble(row.fieldIndex("df_welch")) === 6.0)
  }
}
