package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property: `BlockedRank.blockedPrefix` produces EXACTLY the ranks,
  * running sums, and totals of the unpartitioned-window form it replaces —
  * for random data, random block widths (so blocks are unbalanced, some
  * singleton, some holding everything), descending and ascending block
  * orders, with and without an outer partition; and `ntileFromRank`
  * reproduces `ntile(n)` bit-for-bit including the uneven-bucket remainder
  * distribution. Raw scalacheck generators from a fixed seed (the
  * EnrichPropSpec bridge-free pattern).
  */
class BlockedRankPropSpec extends SparkSpec {

  import BlockedRank._

  private val caseGen: Gen[(List[(Int, Long, Long)], Int, Boolean)] = for {
    n <- Gen.chooseNum(1, 80)
    rows <- Gen.listOfN(n, for {
      grp <- Gen.chooseNum(0, 2)     // outer partition key
      metric <- Gen.chooseNum(0L, 40L) // heavy ties across block boundaries
      id <- Gen.chooseNum(0L, 1000L) // tiebreak (may itself collide; see below)
    } yield (grp, metric, id))
    block <- Gen.oneOf(1, 3, 10, 100)
    desc <- Gen.oneOf(true, false)
  } yield (rows, block, desc)

  test("blockedPrefix ≡ unpartitioned window: rank, running sum, totals") {
    import spark.implicits._
    (0 until 25).foreach { i =>
      val (rows0, block, desc) = caseGen(Gen.Parameters.default, Seed(1337L + i))
        .getOrElse(fail(s"generator returned nothing for case $i"))
      // keep one row per (metric, id) so BOTH total orders (whole-table
      // and per-group) are unambiguous — the operator contract requires
      // localOrder to COMPLETE the order
      val rows = rows0.distinct.groupBy(r => (r._2, r._3))
        .map(_._2.head).toList.sorted
      val df = rows.toDF("grp", "m", "id")
      val mSort = if (desc) col("m").desc else col("m").asc

      // whole-table order (no outer partition)
      val w = Window.orderBy(mSort, col("id"))
      val wCum = w.rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val expected = df
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("cum", sum(col("id")).over(wCum))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("tv", sum(col("id")).over(wAll))
        .select("grp", "m", "id", "rk", "cum", "n", "tv")
        .collect().map(_.toSeq).toSet
      val got = blockedPrefix(df, Nil,
        Seq("__b" -> idiv(col("m"), lit(block))), Seq(desc),
        Seq(mSort, col("id")), "rk", "n",
        values = Seq(PrefixValue(col("id"), "cum", "tv")))
        .select("grp", "m", "id", "rk", "cum", "n", "tv")
        .collect().map(_.toSeq).toSet
      assert(got == expected, s"case $i: block=$block desc=$desc rows=$rows")

      // per-group order (outer partition present)
      val wg = Window.partitionBy("grp").orderBy(mSort, col("id"))
      val wgCum = wg.rowsBetween(Window.unboundedPreceding, 0)
      val wgAll = Window.partitionBy("grp").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      val expectedG = df
        .withColumn("rk", row_number().over(wg).cast("long"))
        .withColumn("cum", sum(col("id")).over(wgCum))
        .withColumn("n", count(lit(1)).over(wgAll))
        .select("grp", "m", "id", "rk", "cum", "n")
        .collect().map(_.toSeq).toSet
      val gotG = blockedPrefix(df, Seq("grp"),
        Seq("__b" -> idiv(col("m"), lit(block))), Seq(desc),
        Seq(mSort, col("id")), "rk", "n",
        values = Seq(PrefixValue(col("id"), "cum", "__tv")))
        .select("grp", "m", "id", "rk", "cum", "n")
        .collect().map(_.toSeq).toSet
      assert(gotG == expectedG, s"case $i (grouped): block=$block desc=$desc")
    }
  }

  test("selectByRank returns exactly the rows at the requested ranks") {
    import spark.implicits._
    (0 until 15).foreach { i =>
      val (rows0, block, desc) = caseGen(Gen.Parameters.default, Seed(9001L + i))
        .getOrElse(fail(s"generator returned nothing for case $i"))
      val rows = rows0.distinct.groupBy(r => (r._2, r._3))
        .map(_._2.head).toList.sorted
      val df = rows.toDF("grp", "m", "id")
      val n = rows.size
      // a spread of ranks incl. first/last and a mid duplicate-free set
      val rankVals = Seq(1L, (n / 3 + 1).toLong, (2 * n / 3 + 1).toLong, n.toLong)
        .filter(r => r >= 1 && r <= n).distinct
      val ranks = rankVals.toDF("__r")
      val mSort = if (desc) col("m").desc else col("m").asc
      val w = Window.orderBy(mSort, col("id"))
      val expected = df.withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk").isin(rankVals: _*))
        .select("grp", "m", "id", "rk")
        .collect().map(_.toSeq).toSet
      val got = selectByRank(df,
        Seq("__b" -> idiv(col("m"), lit(block))), Seq(desc),
        Seq(mSort, col("id")), ranks, "rk")
        .select("grp", "m", "id", "rk")
        .collect().map(_.toSeq).toSet
      assert(got == expected, s"case $i: block=$block desc=$desc ranks=$rankVals")
    }
  }

  test("running value sum matches window null-skipping semantics on nullable values") {
    import spark.implicits._
    // block 1 = {1,2} with values, block 2 starts with a NULL value: the
    // cum at that row must be the prior blocks' 3 (window sums skip
    // nulls), not NULL; and rows before any non-null value stay NULL
    val df = Seq(
      (0L, Option.empty[Long]), // block 0: value null → cum null
      (10L, Some(1L)), (11L, Some(2L)), // block 1
      (20L, Option.empty[Long]), (21L, Some(5L))) // block 2 starts null
      .toDF("m", "v")
    val got = blockedPrefix(df, Nil,
      Seq("__b" -> idiv(col("m"), lit(10))), Seq(false),
      Seq(col("m")), "rk", "n",
      values = Seq(PrefixValue(col("v"), "cum", "tv")))
      .orderBy("m").select("m", "cum").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(got.toSeq == Seq(
      0L -> None, 10L -> Some(1L), 11L -> Some(3L),
      20L -> Some(3L), 21L -> Some(8L)))
  }

  test("NULL block keys keep their rows and rank like the window's nulls-first") {
    import spark.implicits._
    // block key NULL for m=0 rows: the window form ranks them FIRST
    // (asc_nulls_first); a plain equi-join back would have dropped them.
    val df = Seq(0L, 0L, 5L, 12L, 17L).toDF("m")
      .withColumn("blk", when(col("m") > 0, idiv(col("m"), lit(10))))
    val got = blockedPrefix(df, Nil,
      Seq("__b" -> col("blk")), Seq(false),
      Seq(col("m")), "rk", "n")
      .orderBy("rk").select("m", "rk", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length === 5, "null-block rows must survive the join back")
    assert(got.map(_._3).forall(_ == 5L), "total counts every row")
    assert(got.map(_._1).toSeq === Seq(0L, 0L, 5L, 12L, 17L))
    assert(got.map(_._2).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("ntileFromRank ≡ ntile(n) including the uneven-remainder buckets") {
    import spark.implicits._
    for (total <- Seq(1, 4, 5, 7, 23, 100); n <- Seq(2, 3, 5, 7)) {
      val df = (1 to total).toDF("id")
      val w = Window.orderBy("id")
      val expected = df.withColumn("t", ntile(n).over(w))
        .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
      val got = df
        .withColumn("rk", col("id").cast("long"))
        .withColumn("t", ntileFromRank(col("rk"), lit(total.toLong), n))
        .collect().map(r => r.getInt(0) -> r.getInt(2)).toMap
      assert(got == expected, s"total=$total n=$n")
    }
  }
}
