package graft.streaming

import graft.SparkSpec
import graft.operators.ConnectedComponents
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.nio.file.Files

/** The deployment shape `ConnectedComponents.incrementalComponents` exists
  * for: edge batches ARRIVE (a day's co-purchase pairs, an hour's near-dup
  * pairs) and a standing labeling absorbs each batch without ever
  * re-clustering the corpus. This spec executes that contract through a
  * real Structured Streaming micro-batch drain — one incremental fold per
  * micro-batch in foreachBatch — and then requires the final labeling to
  * EQUAL the batch solve over all edges ever seen, not approximate it.
  * Batches are crafted so later ones bridge components created by earlier
  * ones (the case where a wrong freeze/relabel split shows).
  */
class StreamingComponentsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("a", LongType), StructField("b", LongType)))

  test("streaming incremental folds equal the batch solve over all arrived edges") {
    val dir = Files.createTempDirectory("graft-cc-stream").toString
    // batch 1: two chains {1..4} and {10..13}; batch 2: a bridge 4-10 plus
    // a fresh pair {20,21}; batch 3: bridges 21-13 (merging EVERYTHING
    // except {30,31}, which also arrives here)
    Files.writeString(java.nio.file.Paths.get(dir, "b1.json"),
      Seq((1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 13))
        .map { case (a, b) => s"""{"a":$a,"b":$b}""" }.mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(dir, "b2.json"),
      Seq((4, 10), (20, 21))
        .map { case (a, b) => s"""{"a":$a,"b":$b}""" }.mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(dir, "b3.json"),
      Seq((21, 13), (30, 31))
        .map { case (a, b) => s"""{"a":$a,"b":$b}""" }.mkString("\n"))

    var labeling: DataFrame = null
    var handle: ConnectedComponents.LabelingHandle = null
    var folds = 0
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(dir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val (next, nextHandle) =
          if (labeling == null) ConnectedComponents.componentsManaged(batch)
          else ConnectedComponents.incrementalComponentsManaged(labeling, batch)
        // the managed fold materializes its own cut of the prior before
        // returning, so the SUPERSEDED labeling's blocks are dead now —
        // unpersist them instead of letting each fold pin a full-corpus
        // labeling copy in the block manager until a driver GC
        if (handle != null) handle.release()
        labeling = next
        handle = nextHandle
        folds += 1
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    assert(folds >= 2, "maxFilesPerTrigger=1 must produce multiple folds")
    // only the LIVE labeling's blocks remain pinned — superseded folds
    // must not accumulate (ConnectedComponents ADVICE: explicit handle)
    val persistedAfter = spark.sparkContext.getPersistentRDDs.size
    assert(persistedAfter - persistedBefore <= 4,
      s"superseded labelings leak: $persistedBefore -> $persistedAfter persisted RDDs")
    val got = labeling.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = ConnectedComponents
      .components(spark.read.schema(schema).json(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === batch)
    // and the crafted topology really merged: one component spans 1..21
    assert(got(21L) === 1L && got(13L) === 1L && got(30L) === 30L)
  }
}
