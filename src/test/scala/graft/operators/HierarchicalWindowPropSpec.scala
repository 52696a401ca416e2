package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property checks for the round-8 scale primitives against the NAIVE
  * window forms they replace, on randomized skewed frames: the claim
  * everywhere is VALUE-identity (the hierarchical/salted plans are pure
  * plan-shape changes), so any divergence on any seed is a bug. (Raw
  * scalacheck generators from fixed seeds — the scalatest bridge
  * artifact isn't in the offline dependency set.)
  */
class HierarchicalWindowPropSpec extends SparkSpec {
  import spark.implicits._

  // skewed grouped rows: few groups, many rows, duplicate order values
  // (ties exercised), ids sparse (block boundaries not aligned to data)
  private val rowsGen: Gen[List[(Long, String, Int)]] =
    Gen.chooseNum(30, 120).flatMap { n =>
      Gen.listOfN(n, for {
        id <- Gen.chooseNum(0L, 4000L)
        g <- Gen.frequency(6 -> Gen.const("g0"), 1 -> Gen.oneOf("g1", "g2"))
        v <- Gen.chooseNum(1, 40)
      } yield (id, g, v))
    }.map(_.distinctBy(_._1)) // one row per id: deterministic order keys

  private def sample(i: Long): List[(Long, String, Int)] =
    rowsGen.apply(Gen.Parameters.default, Seed(i)).get

  test("cumBeforeByLang ≡ naive per-group exclusive cumsum on random skewed frames") {
    for (seed <- 1L to 8L) {
      val df = sample(seed).toDF("doc_id", "lang", "toks")
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val naive = df
        .withColumn("cum_before", coalesce(sum(col("toks")).over(w), lit(0L)))
        .select("lang", "doc_id", "cum_before")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val hier = graft.llm.Sampling.cumBeforeByLang(df)
        .select("lang", "doc_id", "cum_before")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(hier === naive, s"seed $seed")
    }
  }

  test("saltedTopK ≡ naive per-group top-k window on random skewed frames") {
    for (seed <- 1L to 8L) {
      // duplicate order values across rows: the tie-break (id asc) must
      // pick the same winners in both forms
      val df = sample(seed).toDF("id", "g", "v")
      val k = 5
      val wNaive = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
      val naive = df.withColumn("rn", row_number().over(wNaive))
        .filter(col("rn") <= k)
        .select("g", "rn", "id")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      val salted = BlockedRank.saltedTopK(
          df,
          groups = Seq("g"),
          order = Seq(col("v").desc, col("id")),
          salt = xxhash64(col("id")),
          k = k, outRank = "rn")
        .select("g", "rn", "id")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      assert(salted === naive, s"seed $seed")
    }
  }

  test("blockedPrefix PrefixValue with broadcastOffsets ≡ inclusive window sums") {
    for (seed <- 1L to 4L) {
      val df = sample(seed).toDF("doc_id", "lang", "toks")
      val wIncl = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy("lang")
      val naive = df
        .withColumn("cum", sum(col("toks")).over(wIncl))
        .withColumn("tot", sum(col("toks")).over(wAll))
        .select("lang", "doc_id", "cum", "tot")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val hier = BlockedRank.blockedPrefix(
          df,
          partition = Seq("lang"),
          blocks = Seq(("__b", expr("doc_id div 64"))),
          blockDesc = Seq(false),
          localOrder = Seq(col("doc_id")),
          outRank = "__r", outTotalN = "__n",
          values = Seq(BlockedRank.PrefixValue(
            col("toks").cast("long"), "cum", "tot")),
          broadcastOffsets = true)
        .select("lang", "doc_id", "cum", "tot")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(hier === naive, s"seed $seed")
    }
  }
}
