package graft.queries

import graft.SparkSpec
import java.math.{BigDecimal => JBD, RoundingMode}

/** Pins the ML tier against independent derivations (the mirror-oracle
  * countermeasure: the DuckDB oracle shares each query's formulas, so only
  * a hand derivation or an independent scalar implementation can catch a
  * shared semantic bug).
  */
class MlSpec extends SparkSpec {

  private def scoredDf(rows: (Long, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "s", "y")
  }

  test("AUC is 1 for perfect separation, 0 for perfect inversion") {
    val perfect = scoredDf((1L, 10L, 1L), (2L, 9L, 1L), (3L, 2L, 0L), (4L, 1L, 0L))
    val r1 = Ml.aucOf(perfect).collect()(0)
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(3)) === ((2L, 2L, 1000000L)))
    val inverted = scoredDf((1L, 1L, 1L), (2L, 2L, 1L), (3L, 9L, 0L), (4L, 10L, 0L))
    assert(Ml.aucOf(inverted).collect()(0).getLong(3) === 0L)
  }

  test("AUC tie mid-ranks match the hand-derived Mann-Whitney value") {
    // scores: pos {3, 2}, neg {2, 1}. Pairs: (3,2)+1, (3,1)+1, (2,2)+0.5,
    // (2,1)+1 -> U = 3.5 of 4 -> AUC = 0.875.
    val ties = scoredDf((1L, 3L, 1L), (2L, 2L, 1L), (3L, 2L, 0L), (4L, 1L, 0L))
    val r = Ml.aucOf(ties).collect()(0)
    // num2 = 2*U = 7; auc_micro = 7*1e6 div 8 = 875000
    assert((r.getLong(2), r.getLong(3)) === ((7L, 875000L)))
  }

  test("PR curve matches the hand-derived thresholds") {
    // scores 3,2,2,1 with labels 1,1,0,0:
    //  t=3: tp=1 fp=0 -> P=1.0      R=0.5
    //  t=2: tp=2 fp=1 -> P=0.666666 R=1.0
    //  t=1: tp=2 fp=2 -> P=0.5      R=1.0
    val rows = Ml.prCurveOf(scoredDf(
      (1L, 3L, 1L), (2L, 2L, 1L), (3L, 2L, 0L), (4L, 1L, 0L))).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.toSeq === Seq(
      (3L, 1L, 0L, 1000000L, 500000L),
      (2L, 2L, 1L, 666666L, 1000000L),
      (1L, 2L, 2L, 500000L, 1000000L)))
  }

  test("lift deciles match the hand-derived gains table") {
    // 10 docs, distinct scores 10..1, positives at ranks 1-3: decile d
    // holds exactly rank d+1.
    val docs = (1L to 10L).map(i => (i, 11L - i, if (i <= 3) 1L else 0L))
    val rows = Ml.liftOf(scoredDf(docs: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // (decile, cum_docs, cum_pos, lift_micro, capture_micro)
    assert(rows(0) === ((0L, 1L, 1L, 3333333L, 333333L)))
    assert(rows(2) === ((2L, 3L, 3L, 3333333L, 1000000L)))
    assert(rows(9) === ((9L, 10L, 3L, 1000000L, 1000000L)))
  }

  test("gradient descent matches an independent scalar mirror on sf0.001") {
    // Local single-threaded BigDecimal implementation of the SAME spec:
    // features on their pinned grids, residuals rounded to micro, exact
    // sums, IEEE-double update, floor-requantize. Any divergence in the
    // distributed decimal path (overflow, engine rounding, plan rewrite)
    // shows up as a weight mismatch.
    val raw = graft.Tables.lineitem(spark, sf0001)
      .selectExpr("l_quantity", "l_discount", "l_extendedprice")
      .collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    def d2(x: Double) = JBD.valueOf(x).setScale(2, RoundingMode.HALF_UP)
    val feats = raw.map { case (q, disc, price) =>
      (d2(q).multiply(new JBD("0.02")).setScale(4),
        d2(disc).multiply(new JBD("10")).setScale(2),
        d2(price).multiply(new JBD("0.00001")).setScale(7))
    }
    var w1 = JBD.valueOf(0, 6); var w2 = JBD.valueOf(0, 6); var b = JBD.valueOf(0, 6)
    val expect = (1 to Ml.GdIters).map { iter =>
      var g1 = JBD.ZERO; var g2 = JBD.ZERO; var g0 = JBD.ZERO
      feats.foreach { case (x1, x2, y) =>
        val err = w1.multiply(x1).add(w2.multiply(x2)).add(b).subtract(y)
          .setScale(6, RoundingMode.HALF_UP)
        g1 = g1.add(err.multiply(x1)); g2 = g2.add(err.multiply(x2)); g0 = g0.add(err)
      }
      val n = feats.length.toDouble
      def r6(g: JBD) = g.setScale(6, RoundingMode.HALF_UP)
      def upd(w: JBD, g: JBD) = JBD.valueOf(
        math.floor((w.doubleValue - 0.5 * (r6(g).doubleValue / n)) * 1000000.0 + 0.5).toLong, 6)
      w1 = upd(w1, g1); w2 = upd(w2, g2); b = upd(b, g0)
      (iter, w1.doubleValue, w2.doubleValue, b.doubleValue,
        r6(g1).doubleValue, r6(g2).doubleValue, r6(g0).doubleValue, feats.length.toLong)
    }
    val got = Ml.mlLinregGd(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getLong(7)))
    assert(got.toSeq === expect)
  }

  test("integer logistic GD matches an independent scalar mirror on sf0.001") {
    // Pure-Long single-threaded re-derivation of the fast-sigmoid GD spec;
    // catches any engine-side integer-division or overflow divergence.
    val raw = graft.Tables.documents(spark, sf0001)
      .selectExpr("least(n_chars, 1000) AS x1",
        "(CAST(size(split(text, ' ')) AS BIGINT) * 1000) div greatest(n_chars, 1) AS x2",
        "CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    var w1 = 0L; var w2 = 0L; var b = 0L
    val expect = (1 to Ml.LogregIters).map { iter =>
      var g1 = 0L; var g2 = 0L; var g0 = 0L
      raw.foreach { case (x1v, x2v, y) =>
        val z = (w1 * x1v + w2 * x2v + 1000000000000000L) / 1000L - 1000000000000L + b
        val sig = 500000L + (if (z < 0) -1L else 1L) *
          ((math.abs(z) * 500000L) / (1000000L + math.abs(z)))
        val e = sig - y * 1000000L
        g1 += e * x1v; g2 += e * x2v; g0 += e
      }
      val n = raw.length.toLong
      def upd(w: Long, g: Long): Long = w - 5L * g / (1000L * n)
      w1 = upd(w1, g1); w2 = upd(w2, g2); b = upd(b, g0)
      (iter, w1, w2, b, g1, g2, g0, n)
    }
    val got = Ml.mlLogregGd(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(got.toSeq === expect)
  }

  test("hyperparameter sweep matches an independent scalar mirror on sf0.001") {
    val raw = graft.Tables.documents(spark, sf0001)
      .selectExpr("least(n_chars, 1000) AS x1",
        "(CAST(size(split(text, ' ')) AS BIGINT) * 1000) div greatest(n_chars, 1) AS x2",
        "CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS y")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = raw.length.toLong
    def sig(w1: Long, w2: Long, b: Long, x1: Long, x2: Long): Long = {
      val z = (w1 * x1 + w2 * x2 + 1000000000000000L) / 1000L - 1000000000000L + b
      500000L + (if (z < 0) -1L else 1L) *
        ((math.abs(z) * 500000L) / (1000000L + math.abs(z)))
    }
    val expect = Ml.SweepLrs.map { lr =>
      var w1 = 0L; var w2 = 0L; var b = 0L
      for (_ <- 1 to Ml.SweepIters) {
        var g1 = 0L; var g2 = 0L; var g0 = 0L
        raw.foreach { case (x1v, x2v, y) =>
          val e = sig(w1, w2, b, x1v, x2v) - y * 1000000L
          g1 += e * x1v; g2 += e * x2v; g0 += e
        }
        def upd(w: Long, g: Long): Long = w - lr * g / (1000L * n)
        w1 = upd(w1, g1); w2 = upd(w2, g2); b = upd(b, g0)
      }
      val correct = raw.count { case (x1v, x2v, y) =>
        (sig(w1, w2, b, x1v, x2v) >= 500000L) == (y == 1L)
      }.toLong
      (lr, w1, w2, b, correct * 1000000L / n, n)
    }
    val got = Ml.mlSweep(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq === expect)
  }

  test("confusion counts plus derived ratios stay consistent") {
    val r = Ml.mlConfusion(spark, sf0001).collect()(0)
    val Seq(tp, fp, fn, tn) = (0 to 3).map(r.getLong)
    assert(tp + fp + fn + tn > 0)
    assert(r.getLong(4) === tp * 1000000L / math.max(tp + fp, 1L))
    assert(r.getLong(7) === (tp + tn) * 1000000L / (tp + fp + fn + tn))
  }

  test("curation gate keep decisions match hand-derived fast-sigmoid values") {
    import spark.implicits._
    val docs = Seq(
      ("s1", 1000L, "a b", "en"),
      ("s1", 100L, "a", "de"),
      ("s2", 100L, "a", "en"))
      .toDF("source", "n_chars", "text", "lang")
    // Hand derivation at w1=1000, w2=0, b=0 (micro grid):
    //   x1=1000: z = (1000*1000 + 1e15) div 1000 - 1e12 = 1000
    //            sig = 500000 + (1000*500000) div (1000000+1000) = 500499
    //   x1=100:  z = 100 -> sig = 500000 + 50000000 div 1000100 = 500049
    // threshold 500100 keeps exactly the x1=1000 doc.
    val r = Ml.curateScoreOf(docs, 1000L, 0L, 0L, 500100L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(r.toSeq === Seq(("s1", 2L, 1L, 1L, 500000L), ("s2", 1L, 0L, 0L, 0L)))
    // negative-z mirror: w1=-1000 -> sigs 499501/499951, everything below
    // the 0.5 line drops (the sign-decomposition branch of the sigmoid)
    val neg = Ml.curateScoreOf(docs, -1000L, 0L, 0L, 500000L).collect()
      .map(_.getLong(2))
    assert(neg.toSeq === Seq(0L, 0L))
  }
}
