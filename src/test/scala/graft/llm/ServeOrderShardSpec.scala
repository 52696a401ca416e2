package graft.llm

import graft.SparkSpec
import java.nio.file.Files

/** The refinery → disk → loader loop, closed: `serveOrderWrite`
  * materializes `refinery_serve_order`'s per-epoch manifest as
  * epoch-keyed shard files whose STORED row order is the serving order.
  * Pinned: one file per epoch, and the sequential read-back of each
  * epoch's file reproduces the oracled manifest rows for that epoch in
  * serve_rank order — nothing extra, nothing missing, nothing permuted.
  */
class ServeOrderShardSpec extends SparkSpec {

  test("serve-order shards read back in exactly the oracled per-epoch serving order") {
    val out = Files.createTempDirectory("graft-serve-shards").toString
    val n = Refinery.serveOrderWrite(spark, sf0001, out)

    // the oracled manifest, grouped per epoch in rank order
    val manifest = Refinery.refineryServeOrder(spark, sf0001).collect()
      .map(r => (r.getAs[Int]("epoch"),
        (r.getAs[Long]("serve_rank"), r.getAs[String]("lang"),
          r.getAs[Long]("bin"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("bin_tokens"))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
    assert(manifest.keySet === (0 until Sampling.ServeEpochs).toSet)
    assert(n === manifest.values.map(_.size).sum.toLong)

    val epochDirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("epoch=")).sortBy(_.getName)
    assert(epochDirs.map(_.getName.stripPrefix("epoch=").toInt).toSet ===
      manifest.keySet, "every epoch materializes, nothing else")

    epochDirs.foreach { dir =>
      val epoch = dir.getName.stripPrefix("epoch=").toInt
      val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"epoch $epoch must be ONE file")
      // a single file read in one task preserves row order — the stored
      // sequence must BE the serving order, no sort at load time
      val stored = spark.read.parquet(files.head.getPath)
        .select("serve_rank", "lang", "bin", "n_docs", "bin_tokens")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
      assert(stored === manifest(epoch),
        s"epoch $epoch stored order != oracled serve order")
    }
  }
}
