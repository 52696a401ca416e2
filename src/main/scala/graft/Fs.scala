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
}
