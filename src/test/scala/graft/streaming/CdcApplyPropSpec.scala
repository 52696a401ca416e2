package graft.streaming

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Model-based property test for CdcApply.applyChanges: random change
  * sequences, applied batch by batch through the DataFrame merge, must
  * agree with a driver-side Map model folding the same changes in
  * sequence order. (Raw scalacheck generators from fixed seeds — the
  * scalatest bridge artifact isn't in the offline dependency set.)
  */
class CdcApplyPropSpec extends SparkSpec {
  import spark.implicits._

  // (op, key, value); seq is the position in the list
  private val changeGen: Gen[(String, Long, String)] = for {
    op <- Gen.frequency(3 -> "I", 3 -> "U", 2 -> "D")
    key <- Gen.choose(0L, 7L) // small key space forces collisions
    v <- Gen.alphaLowerStr.map(_.take(4))
  } yield (op, key, v)

  private val batchesGen: Gen[List[List[(String, Long, String)]]] =
    Gen.listOfN(3, Gen.nonEmptyListOf(changeGen).map(_.take(12)))

  private def sample(i: Long): List[List[(String, Long, String)]] =
    batchesGen.apply(Gen.Parameters.default, Seed(i)).get

  /** The executable spec: fold changes into a Map in sequence order. */
  private def model(
      state: Map[Long, String],
      batch: Seq[(String, Long, String, Long)]): Map[Long, String] = {
    // within a batch only the LAST change per key applies (max seq)
    val latest = batch.groupBy(_._2).map { case (_, cs) => cs.maxBy(_._4) }
    latest.foldLeft(state) {
      case (m, ("D", k, _, _)) => m - k
      case (m, (_, k, v, _))   => m.updated(k, v)
    }
  }

  test("batched DataFrame merges agree with the sequential Map model") {
    (1L to 10L).foreach { seed =>
      var seq = 0L
      var state = Map.empty[Long, String]
      var snapshot = Seq.empty[(Long, String)].toDF("id", "val")
      sample(seed).foreach { batch =>
        val withSeq = batch.map { case (op, k, v) =>
          seq += 1; (op, k, v, seq)
        }
        state = model(state, withSeq)
        val changes = withSeq
          .map { case (op, k, v, s) => (op, s, k, v) }
          .toDF("op", "seq", "id", "val")
        snapshot = CdcApply.applyChanges(snapshot, changes, "id")
        val got = snapshot.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        assert(got === state, s"seed=$seed after seq=$seq")
      }
    }
  }
}
