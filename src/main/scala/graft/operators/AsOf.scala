package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for each left row, attach the payload of the latest
  * right row with the same key and `rightTime <= leftTime` (nearest-earlier,
  * inclusive).
  *
  * Spark has no built-in as-of join, and the naive formulation
  * (`l.join(r, key && rTime <= lTime)` + keep-max) explodes to
  * O(|l|×|r|) rows per key before pruning. This implementation unions the
  * two inputs and runs one per-key window pass — "carry forward the last
  * right payload seen" — which costs exactly one shuffle on the key plus a
  * per-key sort: the same cost profile as a sort-merge join, row-explosion
  * free, and therefore safe at 100 TB (skew on the key is the only hazard,
  * same as any keyed shuffle; AQE skew handling applies).
  *
  * Determinism: right rows with identical (key, time) are ambiguous as-of
  * matches; we keep the one with the greatest `tieBreak` column. Right rows
  * sort before left rows at equal timestamps, giving `<=` (inclusive)
  * semantics, matching DuckDB's `ASOF JOIN ... ON l.t >= r.t`.
  */
object AsOf {

  /** @param left        probe side (e.g. events)
    * @param right       reference side (e.g. orders)
    * @param key         equi-key column name present on both sides
    * @param leftTime    event-time column on `left`
    * @param rightTime   event-time column on `right`
    * @param leftId      unique id column on `left` (stabilizes sort ties)
    * @param tieBreak    column on `right` deduping equal (key, time) rows
    * @param payload     columns of `right` to attach (null when no match)
    */
  def joinLeftAsOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      leftId: String,
      tieBreak: String,
      payload: Seq[String]): DataFrame = {

    val dedupW = Window.partitionBy(col(key), col(rightTime))
      .orderBy(col(tieBreak).desc)
    val rightCols: Seq[Column] =
      col(key).cast("long").as("__k") +:
      col(rightTime).cast("timestamp").as("__t") +:
      lit(0).as("__tag") +:
      lit(null).cast("long").as("__lid") +:
      payload.map(col)
    val r1 = right
      .withColumn("__rn", row_number().over(dedupW))
      .filter(col("__rn") === 1)
      .select(rightCols: _*)

    val leftCols: Seq[Column] =
      col(key).cast("long").as("__k") +:
      col(leftTime).cast("timestamp").as("__t") +:
      lit(1).as("__tag") +:
      col(leftId).cast("long").as("__lid") +:
      payload.map(c => lit(null).cast(right.schema(c).dataType).as(c))
    val l1 = left.select(leftCols: _*)

    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__tag"), col("__lid").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val payloadStruct = struct(payload.map(col): _*)
    val carried = r1.unionByName(l1)
      .withColumn("__last",
        last(when(col("__tag") === 0, payloadStruct), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val outCols: Seq[Column] =
      col("__lid").as(leftId) +:
      col("__k").as(key) +:
      col("__t").as(leftTime) +:
      payload.map(c => col(s"__last.$c").as(c))
    carried.select(outCols: _*)
  }

  /** Forward as-of: for each left row, the EARLIEST right row with the same
    * key and `rightTime >= leftTime` (nearest-later, inclusive) — the "next
    * event after" lookup (e.g. first order placed after a click). Mirror of
    * `joinLeftAsOf`: same single-shuffle union + window shape, with the
    * frame flipped to [current row, unbounded following] and a
    * first-non-null carry-backward. At equal timestamps the left row sorts
    * BEFORE right rows (tag descending) so a same-instant right row
    * matches, giving `<=` inclusive semantics — matching DuckDB's
    * `ASOF JOIN ... ON l.t <= r.t`.
    */
  def joinLeftAsOfForward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      leftId: String,
      tieBreak: String,
      payload: Seq[String]): DataFrame = {

    val dedupW = Window.partitionBy(col(key), col(rightTime))
      .orderBy(col(tieBreak).desc)
    val rightCols: Seq[Column] =
      col(key).cast("long").as("__k") +:
      col(rightTime).cast("timestamp").as("__t") +:
      lit(0).as("__tag") +:
      lit(null).cast("long").as("__lid") +:
      payload.map(col)
    val r1 = right
      .withColumn("__rn", row_number().over(dedupW))
      .filter(col("__rn") === 1)
      .select(rightCols: _*)

    val leftCols: Seq[Column] =
      col(key).cast("long").as("__k") +:
      col(leftTime).cast("timestamp").as("__t") +:
      lit(1).as("__tag") +:
      col(leftId).cast("long").as("__lid") +:
      payload.map(c => lit(null).cast(right.schema(c).dataType).as(c))
    val l1 = left.select(leftCols: _*)

    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__tag").desc, col("__lid").asc_nulls_first)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val payloadStruct = struct(payload.map(col): _*)
    val carried = r1.unionByName(l1)
      .withColumn("__next",
        first(when(col("__tag") === 0, payloadStruct), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)

    val outCols: Seq[Column] =
      col("__lid").as(leftId) +:
      col("__k").as(key) +:
      col("__t").as(leftTime) +:
      payload.map(c => col(s"__next.$c").as(c))
    carried.select(outCols: _*)
  }
}
