package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("hash sample is deterministic and nested (1% bucket ⊂ 10% bucket)") {
    val s1 = Sampling.sampleHash(spark, sf0001).collect().map(_.getLong(0)).toSeq
    val s2 = Sampling.sampleHash(spark, sf0001).collect().map(_.getLong(0)).toSeq
    assert(s1 === s2, "same docs must be selected on every run")
    assert(s1.nonEmpty && s1.length < 150, s"~10% of 500 expected, got ${s1.length}")
  }

  test("split assignment is leakage-free: each source in exactly one split") {
    val docs = graft.Tables.documents(spark, sf0001)
    val assigned = Sampling.assignSplits(docs)
    val perSource = assigned.groupBy("source")
      .agg(countDistinct(col("split")).as("n")).collect()
    assert(perSource.forall(_.getLong(1) === 1L))
    val splits = assigned.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    assert(splits.contains("train"))
  }

  test("pack bins match a sequential cumsum simulation per language") {
    val docs = graft.Tables.documents(spark, sf0001)
    val got = Sampling.packAssign(docs, 512)
      .select("lang", "doc_id", "toks", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    val expected = got.groupBy(_._1).toSeq.flatMap { case (lang, rows) =>
      var cum = 0L
      rows.sortBy(_._2).toSeq.map { case (_, id, toks, _) =>
        val bin = cum / 512
        cum += toks
        (lang, id) -> bin
      }
    }.toMap
    got.foreach { case (lang, id, _, bin) =>
      assert(bin === expected((lang, id)), s"doc $id in $lang")
    }
  }

  test("budget fill keep-set matches a sequential greedy simulation per source") {
    val docs = graft.Tables.documents(spark, sf0001)
    val got = Sampling.budgetFillFlags(docs)
      .select("source", "doc_id", "toks", "q_ppm", "kept").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    // independent greedy replay: walk each source in (quality desc,
    // doc_id) order, keep while twice the spent mass is under the total
    val expected = got.groupBy(_._1).toSeq.flatMap { case (source, rows) =>
      val tot = rows.map(_._3).sum
      var cum = 0L
      rows.sortBy(r => (-r._4, r._2)).toSeq.map { case (_, id, toks, _, _) =>
        val keep = 2 * cum < tot
        cum += toks
        (source, id) -> keep
      }
    }.toMap
    assert(got.nonEmpty)
    got.foreach { case (source, id, _, _, kept) =>
      assert(kept === expected((source, id)), s"doc $id in $source")
    }
    // the greedy must actually cut something and keep something per source
    got.groupBy(_._1).foreach { case (source, rows) =>
      assert(rows.exists(_._5) && rows.exists(!_._5), s"degenerate fill in $source")
    }
  }

  test("curriculum schedule interpolates exactly between its endpoints") {
    val rows = Sampling.mixCurriculum(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val byStep = rows.groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    assert(byStep.keySet === Set(0, 1, 2, 3))
    // per-step mass: ppm shares sum to 1e6 minus bounded floor-division
    // loss (< 2 ppm per source per endpoint)
    byStep.foreach { case (s, w) =>
      val tot = w.values.sum
      assert(tot <= 1000000L && tot > 1000000L - 4L * w.size, s"step $s mass $tot")
    }
    // linear interpolation: each source's weight path is monotone from
    // its step-0 share to its step-3 share, and the midpoints sit within
    // floor-division distance of the exact thirds
    byStep(0).keys.foreach { src =>
      val p = (0 to 3).map(s => byStep(s)(src))
      val exact1 = (p(0) * 2 + p(3) * 1) / 3.0
      val exact2 = (p(0) * 1 + p(3) * 2) / 3.0
      assert(math.abs(p(1) - exact1) <= 2, s"$src step1 ${p(1)} vs $exact1")
      assert(math.abs(p(2) - exact2) <= 2, s"$src step2 ${p(2)} vs $exact2")
      assert((p(3) - p(0)) * (p(2) - p(1)) >= 0, s"$src not monotone: $p")
    }
  }

  test("mix keeps each source at its deterministic rate") {
    val out = Sampling.mixSources(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (rate, total, kept) = (r.getInt(1), r.getLong(2), r.getLong(3))
      assert(Set(25, 50, 75).contains(rate))
      assert(kept <= total)
    }
  }

  test("DoReMi iteration matches an independent hand-rolled run on crafted domains") {
    import spark.implicits._
    // independent re-implementation over plain Scala collections — the
    // mirror-oracle countermeasure (the DuckDB oracle unrolls the same
    // CTE algebra, so only this derivation catches a shared formula bug)
    def iterate(ls: Seq[Long], rounds: Int): (Seq[Long], Seq[Long]) = {
      val d = ls.size
      var alpha = ls.map(_ => 1000000L / d)
      var excess: Seq[Long] = ls.map(_ => 0L)
      for (_ <- 1 to rounds) {
        val refsum = alpha.lazyZip(ls).map(_ * _).sum
        excess = ls.map(l => math.max(l - refsum / 1000000L, 0L))
        val w = alpha.lazyZip(excess).map((a, e) => a * (1000000L + e / 2) / 1000000L)
        val wsum = w.sum
        alpha = w.map(x =>
          (900000L * (x * 1000000L / wsum) + 100000L * (1000000L / d)) / 1000000L)
      }
      (alpha, excess)
    }
    val losses = Seq(1000000L, 2000000L, 5000000L) // 1, 2, 5 nats
    val perSource = Seq(("a", 10L, losses(0)), ("b", 20L, losses(1)),
      ("c", 5L, losses(2))).toDF("source", "n_docs", "loss_micro")
    val got = Sampling.doremiIterate(perSource)
      .orderBy("source")
      .select("alpha", "excess_micro")
      .collect()
    val (expAlpha, expExcess) = iterate(losses, Sampling.DoremiRounds)
    assert(got.map(_.getLong(0)).toSeq === expAlpha, "alpha_ppm")
    assert(got.map(_.getLong(1)).toSeq === expExcess, "excess_micro")
    // the hard domain ends up-weighted, the easy one down-weighted,
    // and the mixture stays a (truncation-tolerant) distribution
    assert(expAlpha(2) > expAlpha(0))
    assert(math.abs(expAlpha.sum - 1000000L) <= 10L)
  }

  test("length-bucketed padding matches a hand-rolled mirror and beats arrival order") {
    import spark.implicits._
    // crafted lengths: shorts and longs interleaved by doc_id, so arrival
    // batches mix them (max-pads the shorts) while bucketing separates
    val lens = (0 until 32).map(i => (i.toLong, if (i % 2 == 0) 10L else 90L))
    val got = Sampling.packLengthBucketsOf(lens.toDF("doc_id", "toks"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // independent mirror with plain collections
    def waste(batches: Seq[Seq[Long]]): (Long, Long) = {
      val padded = batches.map(b => b.length * b.max - b.sum).sum
      (batches.map(_.sum).sum, padded)
    }
    val arrival = lens.groupBy(_._1 / 8).toSeq.map(_._2.map(_._2).toSeq)
    val bucketed = lens.map(_._2).groupBy(_ / 16).toSeq.flatMap { case (_, ls) =>
      ls.sorted.grouped(8).toSeq
    }
    val (at, ap) = waste(arrival)
    val (bt, bp) = waste(bucketed)
    assert(got("arrival") === ((arrival.size.toLong, at, ap,
      ap * 1000000L / (at + ap))))
    assert(got("length_bucketed") === ((bucketed.size.toLong, bt, bp,
      bp * 1000000L / (bt + bp))))
    // the entire point: bucketing collapses padding (here to zero)
    assert(bp < ap && bp === 0L)
  }

  test("on the corpus, length bucketing strictly reduces padding waste") {
    val rows = Sampling.packLengthBuckets(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(rows("length_bucketed") < rows("arrival"),
      s"bucketing must cut waste: $rows")
  }

  test("mix_doremi on the corpus: weights form a distribution, hard sources rank first") {
    val rows = Sampling.mixDoremi(spark, sf0001).collect()
    assert(rows.length > 1)
    val alphaSum = rows.map(_.getLong(4)).sum
    assert(math.abs(alphaSum - 1000000L) <= rows.length * 2L,
      s"alpha_ppm must sum to ~1e6, got $alphaSum")
    // α is monotone in excess loss across domains (MW property with a
    // shared reference): sort by excess, alphas must be non-decreasing
    val byExcess = rows.sortBy(_.getLong(3)).map(_.getLong(4))
    assert(byExcess.zip(byExcess.tail).forall { case (a, b) => a <= b },
      "alpha must be non-decreasing in excess loss")
  }
}

class DecontaminateSpec extends SparkSpec {

  test("docs sharing a 5-gram with a benchmark doc are removed, others kept") {
    import spark.implicits._
    // doc 0 is benchmark (0 % 97 == 0); doc 1 shares its opening 5-gram;
    // doc 2 is disjoint; doc 194 (2*97) is benchmark and must not appear.
    val docs = Seq(
      (0L,   "alpha beta gamma delta epsilon zeta", "en", "s0"),
      (1L,   "alpha beta gamma delta epsilon other words here", "en", "s1"),
      (2L,   "completely different tokens with no shared gram at all", "en", "s2"),
      (194L, "another benchmark document entirely here now", "en", "s3"),
    ).toDF("doc_id", "text", "lang", "source")
    val kept = Curation.decontaminate(docs).collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L))
  }

  test("clean corpus excludes all benchmark ids on the real table") {
    val kept = Curation.decontaminateQuery(spark, sf0001)
      .collect().map(_.getLong(0))
    assert(kept.nonEmpty)
    assert(kept.forall(_ % 97 != 0))
  }

}

class QuantizeSpec extends SparkSpec {

  test("int8 codes stay in [-128, 127] and max-abs element maps to ±126..127") {
    val out = Similarity.embQuantize(spark, sf0001).collect()
    assert(out.length === 500)
    out.foreach { r =>
      val (qMin, qMax) = (r.getLong(3), r.getLong(4))
      assert(qMin >= -128 && qMax <= 127, s"vec ${r.getLong(0)}: [$qMin, $qMax]")
      assert(qMax >= 0, "some code must be non-negative")
    }
  }
}

class TextAnalysisExtSpec extends SparkSpec {

  test("repetition ratio is 0 for all-unique grams, positive for repeats") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f", "en", "s", 0L),                 // all 3-grams unique
      (2L, "x y z x y z x y z x y z", "en", "s", 0L),     // heavy repeats
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.createOrReplaceTempView("ignore_me")
    val byId = docs.withColumn("w", split(col("text"), " "))
      .withColumn("grams",
        expr("transform(sequence(1, greatest(size(w) - 2, 1)), i -> concat_ws(' ', slice(w, i, 3)))"))
      .select(col("doc_id"),
        (lit(1.0) - size(array_distinct(col("grams"))).cast("double") / size(col("grams"))).as("rep"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(byId(1L) === 0.0)
    assert(byId(2L) > 0.5)
  }

  test("vocab top-k ranks are dense and counts non-increasing per lang") {
    val out = TextAnalysis.vocabTopk(spark, sf0001).collect()
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to sorted.length).toSeq)
      val counts = sorted.map(_.getLong(3))
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    }
  }
}
