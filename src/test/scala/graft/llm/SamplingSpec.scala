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

  test("mix keeps each source at its deterministic rate") {
    val out = Sampling.mixSources(spark, sf0001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (rate, total, kept) = (r.getInt(1), r.getLong(2), r.getLong(3))
      assert(Set(25, 50, 75).contains(rate))
      assert(kept <= total)
    }
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
