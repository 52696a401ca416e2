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
    * process-unique temp sibling, then rename into place. Guarantees,
    * stated precisely: a builder that OBSERVES a complete target
    * (parquet's `_SUCCESS` marker) never touches it — it discards its own
    * temp and returns the winner's path; a marker-less directory is a
    * crashed build's residue and gets cleared and replaced; concurrent
    * recoveries of the same residue converge via a bounded
    * check-move-clear retry loop (each round re-checks the marker
    * IMMEDIATELY before clearing, so the window in which one recoverer
    * could clear another's just-completed install is one
    * check-to-delete syscall gap, and a builder that loses every round
    * exits through the winner's marker). Callers key the path by a
    * corpus fingerprint, so all racers build identical content. Shared
    * by every standing-artifact memo (band index, IVF index). Returns
    * `target` as a string path.
    */
  def writeParquetAtomic(
      df: org.apache.spark.sql.DataFrame,
      target: java.nio.file.Path): String = {
    import java.nio.file.{Files, FileSystemException, StandardCopyOption}
    def complete: Boolean = Files.exists(target.resolve("_SUCCESS"))
    if (!complete) {
      val tmp = target.resolveSibling(
        s"${target.getFileName}.tmp.${java.util.UUID.randomUUID().toString}")
      df.write.mode("overwrite").parquet(tmp.toString)
      var installed = false
      var rounds = 0
      while (!installed && !complete && rounds < 5) {
        rounds += 1
        try {
          Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
          installed = true
        } catch {
          case _: FileSystemException =>
            // target exists: a winner (exit via `complete` next round) or
            // crashed residue — re-check the marker immediately before
            // clearing so a freshly-completed install is never deleted
            if (!complete) deleteRecursively(target.toFile)
        }
      }
      if (!installed) deleteRecursively(tmp.toFile)
    }
    target.toString
  }
}
