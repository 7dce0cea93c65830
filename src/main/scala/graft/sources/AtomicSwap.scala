package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Crash-safe directory swap for snapshot tables (`current_rates`-style
  * read-modify-write, compaction rewrites).
  *
  * The naive delete-then-rename leaves a window where the destination
  * does not exist — a concurrent reader 404s and a crash inside the
  * window strands the new snapshot in the staging dir while the next
  * writer, seeing no destination, silently rebuilds from one batch.
  * Protocol here:
  *
  *   1. write the new snapshot to `dest__staging` (parquet commit
  *      protocol marks completion with `_SUCCESS`);
  *   2. rename `dest` → `dest__old`   ← commit point;
  *   3. rename `dest__staging` → `dest`;
  *   4. delete `dest__old`.
  *
  * [[recover]] (run before every swap, and cheap enough to run at
  * reader startup) rolls any crash window forward or back: a complete
  * staging dir with no destination is installed (the commit point was
  * passed), an incomplete or uncommitted staging dir is discarded (the
  * failed batch replays), a leftover `__old` is removed or restored.
  * The destination therefore exists at every observable point after
  * step 2 completes — except between 2 and 3, a window recovery closes
  * deterministically.
  *
  * Caveat (also the reference's, via GCS): HDFS/POSIX `rename` is
  * atomic; object stores emulate it with copy+delete, where a true
  * transactional commit needs a table format's log instead.
  */
object AtomicSwap {

  private def staging(dest: Path) = new Path(dest.toString + "__staging")
  private def old(dest: Path) = new Path(dest.toString + "__old")
  private def complete(fs: FileSystem, dir: Path): Boolean =
    fs.exists(new Path(dir, "_SUCCESS"))

  /** Roll a crashed swap forward (complete staging, no dest) or back
    * (discard uncommitted staging, drop/restore `__old`). Idempotent;
    * after it returns `dest` is the single source of truth. */
  def recover(fs: FileSystem, dest: Path): Unit = {
    val stg = staging(dest)
    val oldP = old(dest)
    if (!fs.exists(dest) && fs.exists(stg) && complete(fs, stg))
      fs.rename(stg, dest) // crash after commit point: finish the swap
    if (fs.exists(dest)) {
      if (fs.exists(oldP)) fs.delete(oldP, true) // crash before old cleanup
      if (fs.exists(stg)) fs.delete(stg, true) // uncommitted/incomplete stage
    } else if (fs.exists(oldP)) {
      fs.rename(oldP, dest) // staging lost mid-write: restore the old snapshot
    } else if (fs.exists(stg)) {
      fs.delete(stg, true) // incomplete initial build, nothing to preserve
    }
  }

  /** Materialize via `write` into the staging dir, then swap it in.
    * `write` may read from `dest` (it still exists while staging is
    * written — the read-modify-write shape). */
  def swapIn(fs: FileSystem, dest: Path)(write: Path => Unit): Unit = {
    recover(fs, dest)
    val stg = staging(dest)
    val oldP = old(dest)
    write(stg)
    if (fs.exists(dest)) fs.rename(dest, oldP) // commit point
    fs.rename(stg, dest)
    if (fs.exists(oldP)) fs.delete(oldP, true)
  }
}
