package graft.queries

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic property tests for the ML evaluation tier: random small
  * score/label frames (tiny score range FORCES tie groups), checked
  * against invariants that hold exactly in the integer-micro arithmetic —
  * properties the shared-formula DuckDB oracle cannot distinguish from a
  * consistently-wrong implementation. (Raw scalacheck generators from
  * fixed seeds — the scalatest bridge artifact isn't in the offline
  * dependency set.)
  */
class MlPropSpec extends SparkSpec {
  import spark.implicits._

  // (s, y): scores in [-4, 4] so ~each value repeats; at least one of
  // each class is forced below so denominators never degenerate
  private val rowsGen: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      s <- Gen.choose(-4L, 4L)
      y <- Gen.oneOf(0L, 1L)
    } yield (s, y)).map(_.take(40))

  private def sample(i: Long): List[(Long, Long)] = {
    val raw = rowsGen.apply(Gen.Parameters.default, Seed(i)).get
    // force both classes present (degenerate corpora are covered by the
    // explicit guard test in MlSpec)
    ((3L, 1L) :: (-3L, 0L) :: raw)
  }

  private def scoredDf(rows: Seq[(Long, Long)]) =
    rows.zipWithIndex
      .map { case ((s, y), i) => (i.toLong, s, y) }
      .toDF("doc_id", "s", "y")

  private def auc(rows: Seq[(Long, Long)]): Long =
    Ml.aucOf(scoredDf(rows)).collect()(0).getLong(3)

  test("AUC is invariant under strictly monotone score transforms") {
    for (seed <- 1L to 6L) {
      val rows = sample(seed)
      val transformed = rows.map { case (s, y) => (s * 1000L + 7L, y) }
      assert(auc(rows) === auc(transformed),
        s"seed $seed: monotone transform changed AUC")
    }
  }

  test("AUC of the label complement is the exact complement") {
    // num2(y) + num2(1-y) = 2*n_pos*n_neg exactly (midrank symmetry), so
    // the truncated micro values sum to 1e6 or 1e6-1
    for (seed <- 1L to 6L) {
      val rows = sample(seed)
      val flipped = rows.map { case (s, y) => (s, 1L - y) }
      val sum = auc(rows) + auc(flipped)
      assert(sum == 1000000L || sum == 999999L,
        s"seed $seed: auc + auc(flipped) = $sum")
    }
  }

  test("lift table accounts for every document and captures all positives") {
    for (seed <- 1L to 6L) {
      val rows = sample(seed)
      val t = Ml.liftOf(scoredDf(rows)).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(6)))
      assert(t.map(_._1).sum === rows.length.toLong, s"seed $seed: doc count")
      assert(t.map(_._2).sum === rows.count(_._2 == 1L).toLong, s"seed $seed: positives")
      // cumulative capture is nondecreasing and ends at exactly 100%
      val captures = t.map(_._4)
      assert(captures.zip(captures.tail).forall { case (a, b) => a <= b },
        s"seed $seed: capture not monotone: ${captures.toSeq}")
      assert(captures.last === 1000000L, s"seed $seed: final capture")
    }
  }
}
