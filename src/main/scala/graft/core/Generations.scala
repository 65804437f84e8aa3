package graft.core

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Generation-pointer commit discipline for on-disk index maintenance —
  * the crash-safety layer ABOVE [[FsSwap]]: where FsSwap makes one
  * table's in-place swap recoverable, a generation makes a whole
  * multi-table rewrite ATOMIC for readers. Compaction writes every
  * output table under `generations/gen=N+1/`, then commits the
  * generation by atomically renaming a `_COMMITTED` manifest into the
  * directory; the manifest lists the LSM segment names the generation
  * folded, so a crash between the commit and the segment GC can never
  * serve a folded row twice. Resolution rules (shared by the IVF,
  * MinHash-dedup and substring-fingerprint index families):
  *
  *   - readers serve the HIGHEST generation with a `_COMMITTED`
  *     manifest; a generation without one (a crashed compact) is
  *     invisible and gets overwritten by the retry;
  *   - the immediately-previous generation (or the legacy flat
  *     layout, for a tree no compact has upgraded) survives one
  *     compaction as a grace copy for readers that resolved before
  *     the commit; the pre-previous is GC'd;
  *   - folded segment directories are GC'd eagerly after the commit —
  *     a reader racing the compact mid-scan of a segment fails loud
  *     (FileNotFound) rather than double-reading;
  *   - appenders call [[cleanStaleFolded]] first: a stream restarting
  *     with a fresh checkpoint reuses batchId-derived segment names a
  *     prior compact folded and GC'd, and the stale manifest entry
  *     must not silently exclude the new segment.
  */
object Generations {

  /** The latest COMMITTED generation of `path`, if the tree uses the
    * generational layout: (directory, number, foldedSegmentNames).
    * The directory is scheme-less (usable by spark.read AND
    * java.io-level tooling).
    */
  def latest(
      spark: SparkSession, path: String): Option[(String, Int, Set[String])] = {
    val root = new HPath(s"$path/generations")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    val committed = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .flatMap(p => p.getName.stripPrefix("gen=").toIntOption.map((_, p)))
      .filter { case (_, p) => fs.exists(new HPath(p, "_COMMITTED")) }
    if (committed.isEmpty) None
    else {
      val (n, p) = committed.maxBy(_._1)
      val in = fs.open(new HPath(p, "_COMMITTED"))
      val folded =
        try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().filter(_.nonEmpty).toSet
        finally in.close()
      Some((p.toUri.getPath, n, folded))
    }
  }

  /** Write the `_COMMITTED` manifest atomically (tmp-then-rename): its
    * appearance IS the generation's commit point, so it must never be
    * observable half-written (an empty manifest would un-exclude
    * still-live folded segments). rename-replace is atomic on POSIX
    * local filesystems; on a filesystem refusing rename-onto-existing
    * (the [[cleanStaleFolded]] rewrite path), delete-then-rename is
    * the fallback and its failure is loud, never wrong.
    */
  def writeManifest(
      fs: FileSystem, genDir: String, folded: Set[String]): Unit = {
    val tmp = new HPath(s"$genDir/_COMMITTED.tmp")
    val dst = new HPath(s"$genDir/_COMMITTED")
    val out = fs.create(tmp, true)
    try out.write(folded.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, dst)) {
      fs.delete(dst, false)
      require(fs.rename(tmp, dst),
        s"commit manifest rename failed at $genDir")
    }
  }

  /** Drop manifest entries whose segment directories no longer exist —
    * the appender-side half of the name-reuse contract (scaladoc
    * above). Atomic rewrite; racing readers see either manifest
    * (excluding an absent dir is a no-op).
    */
  def cleanStaleFolded(spark: SparkSession, path: String): Unit =
    latest(spark, path).foreach { case (gen, _, folded) =>
      val fs = new HPath(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val stale = folded.filterNot(n =>
        fs.exists(new HPath(s"$path/segments/$n")))
      if (stale.nonEmpty) writeManifest(fs, gen, folded -- stale)
    }

  /** Post-commit GC shared by every family: eagerly delete the folded
    * segment directories (and the emptied segments root — single
    * writer, no racing append), then apply the one-generation grace
    * rule — at the FIRST generational compact (`curN == -1`) the
    * legacy flat tables stay as the grace copy; afterwards the legacy
    * children and every generation below `curN` go.
    */
  def gcAfterCommit(
      fs: FileSystem, path: String, curN: Int,
      foldedDirs: Seq[String], legacyChildren: Seq[String]): Unit = {
    foldedDirs.foreach(d => fs.delete(new HPath(d), true))
    val segRoot = new HPath(s"$path/segments")
    if (fs.exists(segRoot) && fs.listStatus(segRoot).isEmpty)
      fs.delete(segRoot, true)
    if (curN >= 0) {
      legacyChildren.foreach(c =>
        fs.delete(new HPath(s"$path/$c"), true))
      for (old <- 0 until curN)
        fs.delete(new HPath(s"$path/generations/gen=$old"), true)
    }
  }
}
