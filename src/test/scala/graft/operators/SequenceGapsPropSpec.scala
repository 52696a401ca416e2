package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property: the two-level block decomposition finds EXACTLY the gaps the
  * naive global-lag form finds — for random key sets and block widths,
  * including the adversarial cases (gaps spanning several empty blocks,
  * singleton blocks, block width 1, keys straddling block boundaries).
  * Raw scalacheck generators from a fixed seed (the EnrichPropSpec
  * bridge-free pattern).
  */
class SequenceGapsPropSpec extends SparkSpec {

  private def naiveGaps(keys: Seq[Long]): Seq[(Long, Long, Long)] = {
    val sorted = keys.distinct.sorted
    sorted.zip(sorted.drop(1)).collect {
      case (a, b) if b > a + 1 => (a + 1, b - 1, b - a - 1)
    }
  }

  private val caseGen: Gen[(List[Long], Int)] = for {
    n <- Gen.chooseNum(1, 60)
    keys <- Gen.listOfN(n, Gen.chooseNum(0L, 300L))
    block <- Gen.oneOf(1, 2, 7, 16, 64)
  } yield (keys, block)

  test("two-level gaps ≡ global-lag gaps on random key sets and block widths") {
    import spark.implicits._
    (0 until 30).foreach { i =>
      val (keys, block) = caseGen(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(fail(s"generator returned nothing for case $i"))
      val df = keys.distinct.toDF("k")
      val got = SequenceGaps.gaps(df, "k", block)
        .orderBy("gap_start")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(got == naiveGaps(keys),
        s"case $i: keys=$keys block=$block")
    }
  }

  test("dense sequence has no gaps; single key has no gaps") {
    import spark.implicits._
    assert(SequenceGaps.gaps((10L to 30L).toDF("k"), "k", 4).count() == 0)
    assert(SequenceGaps.gaps(Seq(42L).toDF("k"), "k", 8).count() == 0)
  }
}
