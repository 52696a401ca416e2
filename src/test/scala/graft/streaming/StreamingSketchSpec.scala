package graft.streaming

import graft.SparkSpec
import graft.queries.Sketches
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import java.nio.file.Files

/** The CMS state is cell-wise ADDITIVE — the property that makes a sketch
  * worth shipping at 100 TB (per-partition/per-day states merge by sum,
  * never by re-scan). This spec executes the contract: build the sketch
  * incrementally over a stream in foreachBatch (merging each microbatch's
  * counters into running state), then compare the merged counters to the
  * batch build over the same rows — they must be IDENTICAL, not close.
  */
class StreamingSketchSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("k", LongType)))

  test("streaming cell-merged CMS equals the batch-built CMS exactly") {
    val dir = Files.createTempDirectory("graft-cms").toString
    // two files → at least two microbatches under maxFilesPerTrigger=1
    Files.writeString(java.nio.file.Paths.get(dir, "a.json"),
      (1L to 400L).map(i => s"""{"k":${i % 37}}""").mkString("\n"))
    Files.writeString(java.nio.file.Paths.get(dir, "b.json"),
      (1L to 300L).map(i => s"""{"k":${i % 53}}""").mkString("\n"))

    val merged = scala.collection.mutable.Map.empty[(Int, Long), Long]
    val q = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(dir)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Sketches.cmsOf(batch, col("k")).collect().foreach { r =>
          val key = (r.getInt(0), r.getLong(1))
          merged(key) = merged.getOrElse(key, 0L) + r.getLong(2)
        }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val batchCms = Sketches.cmsOf(spark.read.schema(schema).json(dir), col("k"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged.toMap === batchCms)
    assert(batchCms.values.sum === 700L * Sketches.CmsDepth)
  }
}
