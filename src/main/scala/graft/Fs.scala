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
    * crashed build's residue and gets moved ASIDE (never deleted in
    * place): residue is atomically renamed to a process-unique
    * `.trash.<uuid>` sibling before the install retries, so a racer's
    * just-completed install can never be destroyed — the aside-move and
    * a winner's install contend ATOMICALLY on the same path, and if the
    * aside-move swings a freshly-completed install out of the way (the
    * marker check runs on the MOVED directory), the mover RESTORES it
    * with a second atomic rename before deleting anything — crucial on
    * the last retry round, where no later re-install would follow — so
    * readers never observe a partially deleted directory, only
    * absent-then-complete. A builder that can neither
    * install nor observe a winner within the bounded retry loop THROWS
    * rather than returning an unverified path (a silently-returned
    * dangling path would fail far from the cause, at some later
    * spark.read). Shared by every standing-artifact memo (band index,
    * IVF index). Returns `target` as a string path.
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
            // crashed residue. Move it aside atomically instead of
            // deleting in place — deleting is non-atomic and could
            // destroy an install that completed between the marker
            // re-check and the delete; a rename can't.
            if (!complete) {
              val trash = target.resolveSibling(
                s"${target.getFileName}.trash.${java.util.UUID.randomUUID().toString}")
              try {
                Files.move(target, trash, StandardCopyOption.ATOMIC_MOVE)
                if (Files.exists(trash.resolve("_SUCCESS"))) {
                  // the aside-move swung a racer's COMPLETE install out
                  // (it landed in the check-to-move gap). Restore it —
                  // on the LAST retry round there would be no re-install
                  // after us, so deleting it here could leave no
                  // artifact at all while the racer has already returned
                  // (and memoized) the path. If the restore loses to yet
                  // another complete install, the copy is redundant.
                  try Files.move(trash, target, StandardCopyOption.ATOMIC_MOVE)
                  catch {
                    case _: java.io.IOException =>
                      if (complete) deleteRecursively(trash.toFile)
                    // else: leave the trash copy for the TTL vacuum —
                    // never destroy the only complete artifact
                  }
                } else deleteRecursively(trash.toFile) // crashed residue
              } catch {
                // another racer moved/installed concurrently — re-loop;
                // the next round either installs or exits via `complete`
                case _: java.io.IOException => ()
              }
            }
        }
      }
      if (!installed) {
        deleteRecursively(tmp.toFile)
        if (!complete) throw new IllegalStateException(
          s"writeParquetAtomic: could not install $target after $rounds " +
            "rounds and no complete artifact is present — refusing to " +
            "return an unverified path")
      }
    }
    target.toString
  }
}
