package graft

/** Local-filesystem helpers shared by the mains and the layout writers. */
object Fs {

  /** Best-effort recursive delete. Null-safe against `listFiles()`
    * returning null (I/O error, or a concurrent process removing the
    * directory mid-walk) — a cleanup pass must never throw past its
    * caller. Returns true when the target no longer exists.
    */
  def deleteRecursively(f: java.io.File): Boolean = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete() || !f.exists()
  }

  /** Materialize `df` as parquet at `target` ATOMICALLY: build into a
    * process-unique temp sibling, then rename into place. A complete
    * target (parquet's `_SUCCESS` marker) is never rewritten, so a
    * concurrent process lazily scanning it can never observe a
    * delete-then-write window; a racing builder that loses the rename
    * discards its temp and reads the winner's (the callers key the path
    * by a corpus fingerprint, so contents are deterministic). A
    * marker-less target is a crashed build's residue: cleared and
    * replaced. Shared by every standing-artifact memo (band index, IVF
    * index). Returns `target` as a string path.
    */
  def writeParquetAtomic(
      df: org.apache.spark.sql.DataFrame,
      target: java.nio.file.Path): String = {
    if (!java.nio.file.Files.exists(target.resolve("_SUCCESS"))) {
      val tmp = target.resolveSibling(
        s"${target.getFileName}.tmp.${java.util.UUID.randomUUID().toString}")
      df.write.mode("overwrite").parquet(tmp.toString)
      try java.nio.file.Files.move(tmp, target,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileSystemException =>
          if (!java.nio.file.Files.exists(target.resolve("_SUCCESS"))) {
            deleteRecursively(target.toFile)
            java.nio.file.Files.move(tmp, target,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          } else deleteRecursively(tmp.toFile)
      }
    }
    target.toString
  }
}
