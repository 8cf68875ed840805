package graft.sources

import java.io.{File, IOException}

/** Directory-swap used by rewrite-style sinks (compaction, upsert): the
  * new dataset is written to a sibling temp dir, then swapped in. The
  * original is only deleted AFTER the replacement is fully materialized,
  * and on any failure the replacement stays on disk under the temp name —
  * no state where both copies are gone.
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
    if (targetDir.exists()) deleteRecursively(targetDir)
    if (!tmpDir.renameTo(targetDir))
      throw new IOException(
        s"swap rename failed: $tmp -> $target (data intact under $tmp)")
  }

  private def deleteRecursively(f: File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    if (!f.delete() && f.exists())
      throw new IOException(s"could not delete ${f.getAbsolutePath}")
  }
}
