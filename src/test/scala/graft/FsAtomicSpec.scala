package graft

import java.nio.file.{Files, Paths}

/** Pins [[Fs.writeParquetAtomic]]'s contract — the cross-process safety
  * every standing-artifact memo (band index, IVF index) leans on:
  * a COMPLETE target (parquet `_SUCCESS` marker present) is never
  * rewritten; a marker-less directory is crashed-build residue and gets
  * replaced; no temp siblings survive a successful build.
  */
class FsAtomicSpec extends SparkSpec {
  import spark.implicits._

  private def freshBase() = {
    val p = Files.createTempDirectory("graft_fs_atomic")
    p.toFile.deleteOnExit()
    p
  }

  test("builds once; a complete target is never rewritten") {
    val target = freshBase().resolve("idx")
    val p1 = Fs.writeParquetAtomic(Seq(1L, 2L, 3L).toDF("v"), target)
    assert(Files.exists(target.resolve("_SUCCESS")))
    assert(spark.read.parquet(p1).count() == 3)

    // second build with DIFFERENT content must be a no-op: the complete
    // target wins so a concurrent lazy scan never sees delete-then-write
    val p2 = Fs.writeParquetAtomic(Seq(9L).toDF("v"), target)
    assert(p2 == p1)
    assert(spark.read.parquet(p2).as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("a marker-less directory is crashed residue: replaced") {
    val target = freshBase().resolve("idx")
    Files.createDirectories(target)
    Files.writeString(target.resolve("part-stale.parquet"), "garbage")
    // no _SUCCESS -> the builder must clear it and move a fresh build in
    val p = Fs.writeParquetAtomic(Seq(7L, 8L).toDF("v"), target)
    assert(Files.exists(target.resolve("_SUCCESS")))
    assert(spark.read.parquet(p).count() == 2)
    assert(!Files.exists(target.resolve("part-stale.parquet")))
  }

  test("no temp siblings survive a successful build") {
    val base = freshBase()
    Fs.writeParquetAtomic(Seq(1L).toDF("v"), base.resolve("idx"))
    val listing = Files.list(base)
    val names =
      try {
        val it = listing.iterator()
        Iterator.continually(it).takeWhile(_.hasNext)
          .map(_.next().getFileName.toString).toList
      } finally listing.close()
    assert(names == List("idx"), s"unexpected siblings: $names")
  }
}
