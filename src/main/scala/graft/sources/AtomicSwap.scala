package graft.sources

import java.io.{File, IOException}

/** Directory-swap used by rewrite-style sinks (compaction, upsert): the
  * new dataset is written to a sibling temp dir, then swapped in via
  * rename-aside → rename-in → delete-aside. A full copy of the data
  * exists on disk at EVERY point (the old version is only deleted after
  * the new one is in place); the remaining non-atomicity is a visibility
  * gap — a reader racing the instant between the two renames sees the
  * table briefly missing, never half-written and never lost.
  *
  * Plain-filesystem semantics only (same-parent rename); table formats
  * with ACID commits replace this whole class.
  */
object AtomicSwap {

  /** Replace `target` with `tmp` (both directories, same parent). */
  def replace(target: String, tmp: String): Unit = {
    val tmpDir = new File(tmp)
    if (!tmpDir.isDirectory || tmpDir.listFiles() == null || tmpDir.listFiles().isEmpty)
      throw new IOException(s"swap aborted: replacement $tmp is missing or empty; $target untouched")
    val targetDir = new File(target)
    val oldDir = new File(target + "__old")
    if (oldDir.exists()) deleteRecursively(oldDir) // stale aside from a past crash
    // rename ASIDE, not delete: a crash after a delete would leave the
    // only full copy under the temp name, where a restarted writer's
    // Overwrite could destroy it — the aside copy survives any crash
    if (targetDir.exists() && !targetDir.renameTo(oldDir))
      throw new IOException(
        s"swap aside-rename failed: $target -> ${oldDir.getPath} (everything intact)")
    if (!tmpDir.renameTo(targetDir)) {
      oldDir.renameTo(targetDir) // best-effort restore of the old version
      throw new IOException(
        s"swap rename failed: $tmp -> $target (data intact under $tmp)")
    }
    if (oldDir.exists()) deleteRecursively(oldDir)
  }

  private def deleteRecursively(f: File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    if (!f.delete() && f.exists())
      throw new IOException(s"could not delete ${f.getAbsolutePath}")
  }
}
