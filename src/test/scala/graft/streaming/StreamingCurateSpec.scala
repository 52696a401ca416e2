package graft.streaming

import graft.SparkSpec
import graft.queries.Ml
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.nio.file.Files

/** The curation gate deployed IN-STREAM: the registered classifier's
  * keep/drop decision is a pure literal-weight projection, so scoring a
  * landing stream per micro-batch must (a) decide every doc exactly as
  * the batch pass would and (b) produce per-source counters that merge
  * ADDITIVELY across micro-batches (keep_ppm recomputed from the merged
  * sums) — the property that lets a 100 TB deployment gate arrivals as
  * they land and still report corpus-exact keep rates.
  */
class StreamingCurateSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType), StructField("source", StringType),
    StructField("lang", StringType), StructField("n_chars", LongType),
    StructField("text", StringType)))

  test("streaming gate equals batch scoring; per-source counters merge additively") {
    val dir = Files.createTempDirectory("graft-curate").toString
    // two files → two micro-batches under maxFilesPerTrigger=1; doc
    // shapes straddle the hand-derived decision boundary of MlSpec's
    // crafted model (w1=1000, w2=0, b=0, threshold 500100: x1=1000
    // scores 500499 → keep, x1=100 scores 500049 → drop)
    def doc(id: Long, src: String, lang: String, nChars: Long) =
      s"""{"doc_id":$id,"source":"$src","lang":"$lang","n_chars":$nChars,"text":"a b"}"""
    Files.writeString(java.nio.file.Paths.get(dir, "a.json"),
      Seq(doc(1, "s1", "en", 1000), doc(2, "s1", "de", 100),
        doc(3, "s2", "en", 1000)).mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(dir, "b.json"),
      Seq(doc(4, "s1", "en", 1000), doc(5, "s2", "fr", 100),
        doc(6, "s2", "en", 100)).mkString("\n"))

    val merged = scala.collection.mutable.Map.empty[String, (Long, Long, Long)]
    var batches = 0
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += 1
        Ml.curateScoreOf(batch, 1000L, 0L, 0L, 500100L).collect().foreach { r =>
          val (n, k, ke) = merged.getOrElse(r.getString(0), (0L, 0L, 0L))
          merged(r.getString(0)) =
            (n + r.getLong(1), k + r.getLong(2), ke + r.getLong(3))
        }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(batches >= 2, "admission control must split the drain")

    val batchRows = Ml
      .curateScoreOf(spark.read.schema(schema).json(dir), 1000L, 0L, 0L, 500100L)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    // merged counters (+ recomputed ratio) must equal the batch pass
    val mergedFull = merged.toMap.map { case (s, (n, k, ke)) =>
      s -> (n, k, ke, k * 1000000L / n)
    }
    assert(mergedFull === batchRows)
    // and the decisions themselves are the hand-derived ones
    assert(batchRows("s1") === ((3L, 2L, 2L, 666666L)))
    assert(batchRows("s2") === ((3L, 1L, 1L, 333333L)))
  }
}
