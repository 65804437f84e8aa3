package graft.core

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Crash-safe table swap for on-disk index maintenance — the shared
  * rename-aside discipline of [[graft.sim.Similarity]] compaction and
  * [[graft.dedup.DedupIndex.compact]]: never delete-then-rename.
  */
object FsSwap {

  /** Rename `$tmp/$child` into place as `$path/$child` by renaming the
    * live copy ASIDE first: a crash mid-swap always leaves at least
    * one complete copy on disk — either `${child}_old` (step 1 done)
    * or `$child` (step 2 done) — instead of a window with zero copies
    * and only the tmp dir for manual recovery.
    */
  def swapIntoPlace(
      fs: FileSystem, path: String, tmp: String, child: String): Unit = {
    val dst = new HPath(s"$path/$child")
    val bak = new HPath(s"$path/${child}_old")
    // Never destroy the backup while it may be the ONLY copy: a prior
    // swap that crashed between its two renames leaves dst missing and
    // bak live. Deleting bak here would turn that documented
    // manual-recovery state into zero copies — verify dst first.
    require(fs.exists(dst),
      s"swap: live $child missing at $path — a prior swap crashed " +
        s"mid-rename; recover by renaming ${child}_old back before " +
        "retrying")
    fs.delete(bak, true) // clear any leftover from a prior FINISHED swap
    require(fs.rename(dst, bak),
      s"swap: rename of live $child aside failed — index at $path " +
        s"untouched, $tmp holds the new copy")
    require(fs.rename(new HPath(s"$tmp/$child"), dst),
      s"swap: rename of new $child into place failed — restore by " +
        s"renaming ${child}_old back at $path")
    fs.delete(bak, true)
  }
}
