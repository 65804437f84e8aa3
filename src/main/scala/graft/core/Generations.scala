package graft.core

import java.io.FileNotFoundException

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Generation-pointer commit discipline for on-disk index maintenance —
  * the crash-safety layer ABOVE [[FsSwap]]: where FsSwap makes one
  * table's in-place swap recoverable, a generation makes a whole
  * multi-table rewrite ATOMIC for readers. Compaction writes every
  * output table under `generations/gen=N+1/`, then commits the
  * generation by atomically renaming a manifest into the directory;
  * the manifest lists the LSM segment names the generation folded, so
  * a crash between the commit and the segment GC can never serve a
  * folded row twice. Resolution rules (shared by the IVF,
  * MinHash-dedup and substring-fingerprint index families):
  *
  *   - readers serve the HIGHEST generation with a committed
  *     manifest; a generation without one (a crashed compact) is
  *     invisible and gets overwritten by the retry;
  *   - the immediately-previous generation (or the legacy flat
  *     layout, for a tree no compact has upgraded) survives one
  *     compaction as a grace copy for readers that resolved before
  *     the commit; the pre-previous is GC'd;
  *   - folded segment directories are GC'd eagerly after the commit —
  *     a reader racing the compact mid-scan of a segment fails loud
  *     (FileNotFound) rather than double-reading; callers that
  *     re-resolve on entry can make the race invisible with
  *     [[retryOnLostSegments]];
  *   - appenders call [[prepareSegmentLanding]] first: a stream
  *     restarting with a fresh checkpoint reuses batchId-derived
  *     segment names a prior compact folded, and a stale manifest
  *     entry must never exclude (or a stale folded directory mask)
  *     the new segment;
  *   - committers commit via [[commitGeneration]], which carries
  *     forward prior-manifest folded names whose directories a
  *     crashed GC left behind — a folded segment can never re-enter
  *     service through a later generation's narrower manifest.
  *
  * Manifest files are VERSIONED and IMMUTABLE: the live manifest of a
  * generation is `_COMMITTED.N` with the highest N (the unsuffixed
  * legacy `_COMMITTED` reads as version 0). A rewrite — the
  * stale-entry cleaning above — lands as version max+1 under a FRESH
  * name via tmp-then-rename (an atomic create on every Hadoop
  * filesystem; nothing ever renames ONTO an existing manifest), and
  * superseded versions are GC'd only after the newer one exists. The
  * earlier delete-then-rename fallback had a two-metadata-op window
  * where the generation's ONLY manifest was gone — readers regressed
  * to a grace generation whose folded segments were already GC'd;
  * versioning removes that window entirely (a crash mid-rewrite
  * leaves two manifests and resolution picks the newer).
  */
object Generations {

  private val ManifestBase = "_COMMITTED"

  /** All manifest versions present in a generation directory, as
    * (version, path). Legacy unsuffixed `_COMMITTED` is version 0;
    * tmp files (non-integer suffix) are ignored.
    */
  private def manifestVersions(
      fs: FileSystem, genDir: HPath): Seq[(Int, HPath)] = {
    if (!fs.exists(genDir)) return Nil
    fs.listStatus(genDir).toSeq
      .filter(_.isFile)
      .map(_.getPath)
      .flatMap { p =>
        val n = p.getName
        if (n == ManifestBase) Some((0, p))
        else if (n.startsWith(ManifestBase + "."))
          n.stripPrefix(ManifestBase + ".").toIntOption.map((_, p))
        else None
      }
  }

  /** The live (highest-version) manifest of a generation directory. */
  private def liveManifest(fs: FileSystem, genDir: HPath): Option[HPath] =
    manifestVersions(fs, genDir) match {
      case vs if vs.isEmpty => None
      case vs => Some(vs.maxBy(_._1)._2)
    }

  private def readFolded(fs: FileSystem, manifest: HPath): Set[String] = {
    val in = fs.open(manifest)
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toSet
    finally in.close()
  }

  /** The latest COMMITTED generation of `path`, if the tree uses the
    * generational layout: (directory, number, foldedSegmentNames).
    * The directory string is built from the CALLER's `path` (not from
    * listStatus results), so it keeps whatever scheme/authority the
    * caller addresses the index with — an index rooted at
    * `s3a://bucket/idx` resolves to `s3a://bucket/idx/generations/...`,
    * never a scheme-less path the default filesystem would claim.
    */
  def latest(
      spark: SparkSession, path: String): Option[(String, Int, Set[String])] = {
    val root = new HPath(s"$path/generations")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def attempt(): Option[(String, Int, Set[String])] = {
      if (!fs.exists(root)) return None
      val committed = fs.listStatus(root).toSeq
        .filter(_.isDirectory)
        .map(_.getPath)
        .flatMap(p => p.getName.stripPrefix("gen=").toIntOption.map((_, p)))
        .flatMap { case (n, p) => liveManifest(fs, p).map((n, p, _)) }
      if (committed.isEmpty) None
      else {
        val (n, _, m) = committed.maxBy(_._1)
        Some((s"$path/generations/gen=$n", n, readFolded(fs, m)))
      }
    }
    // a manifest REWRITE (prepareSegmentLanding's stale-entry cleaning)
    // lands version max+1 then deletes the superseded version — a
    // reader racing it can (a) open the superseded version after the
    // delete and hit FileNotFound, or (b) on filesystems whose
    // listStatus SKIPS entries that vanish between readdir and stat
    // (RawLocalFileSystem does), observe ZERO manifests in a
    // generation that stayed committed throughout. Both re-list: the
    // newer version is guaranteed to exist (writeManifest deletes only
    // AFTER its successor's rename). A tree whose generations all
    // genuinely lack manifests (a crashed first compact) pays two
    // extra listings and still resolves None — rare, and the retries
    // are metadata-only. Three attempts bound the pathological
    // rewrite-per-microsecond case.
    var left = 3
    var out: Option[(String, Int, Set[String])] = None
    while (left > 0) {
      left -= 1
      try {
        out = attempt()
        if (out.isDefined || left == 0) return out
      } catch { case _: FileNotFoundException if left > 0 => }
    }
    out
  }

  /** Write the next manifest version atomically: tmp, then rename to
    * the fresh `_COMMITTED.(max+1)` name — the rename's appearance IS
    * the commit (or, for a rewrite, the supersession) point, so it
    * must never be observable half-written (an empty manifest would
    * un-exclude still-live folded segments). Superseded versions are
    * deleted AFTER the new one exists: the generation always has at
    * least one committed manifest on disk, and a crash between the
    * rename and the cleanup leaves two, resolved by max version.
    */
  def writeManifest(
      fs: FileSystem, genDir: String, folded: Set[String]): Unit = {
    val dir = new HPath(genDir)
    val existing = manifestVersions(fs, dir)
    val v = existing.map(_._1).foldLeft(0)(math.max) + 1
    val tmp = new HPath(dir, s"$ManifestBase.$v.tmp")
    val dst = new HPath(dir, s"$ManifestBase.$v")
    val out = fs.create(tmp, true)
    try out.write(folded.toSeq.sorted.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, dst),
      s"commit manifest rename failed at $genDir (version $v)")
    existing.foreach { case (_, p) => fs.delete(p, false) }
  }

  /** Commit a new generation: write its manifest listing
    * `newlyFolded` PLUS any prior-manifest folded names whose segment
    * directories still exist (a crashed post-commit GC left them —
    * without the carry-forward, the next generation's narrower
    * manifest would let those dead segments RE-ENTER service, serving
    * their rows twice and resurrecting purge-skipped tombstoned rows).
    * `priorFolded` is the folded set of the generation current at the
    * start of the compact (the caller already resolved it). Returns
    * the zombie directories so the caller's GC deletes them with the
    * newly folded ones.
    */
  def commitGeneration(
      fs: FileSystem, path: String, genDir: String,
      newlyFolded: Set[String], priorFolded: Set[String]): Seq[String] = {
    val zombies = (priorFolded -- newlyFolded)
      .filter(n => fs.exists(new HPath(s"$path/segments/$n")))
    writeManifest(fs, genDir, newlyFolded ++ zombies)
    zombies.toSeq.sorted.map(n => s"$path/segments/$n")
  }

  /** Prepare the landing zone for a segment named `name` (the
    * appender-side half of the name-reuse contract):
    *
    *   - drop manifest entries whose segment directories no longer
    *     exist — a stream restarting with a fresh checkpoint reuses
    *     batchId-derived names a prior compact folded and GC'd, and a
    *     stale entry would silently exclude the NEW segment from
    *     every read;
    *   - if `name` is manifest-listed AND its directory still exists
    *     (a crashed GC), DELETE the stale directory before dropping
    *     the entry: its rows are already folded into the current
    *     generation (dead data), and landing a replayed batch into it
    *     with the exclusion still in force would mask the fresh rows
    *     from every read until a later compact resurrected them.
    *
    * One manifest rewrite covers both; racing readers see either
    * version (excluding an absent dir is a no-op, and the conflict
    * dir is deleted BEFORE its entry is dropped, so no interleaving
    * serves the dead rows).
    */
  def prepareSegmentLanding(
      spark: SparkSession, path: String,
      name: Option[String] = None): Unit =
    latest(spark, path).foreach { case (gen, _, folded) =>
      val fs = new HPath(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val conflict = name.filter(folded.contains)
      conflict.foreach { n =>
        fs.delete(new HPath(s"$path/segments/$n"), true)
      }
      val keep = folded.filter(n =>
        fs.exists(new HPath(s"$path/segments/$n")))
      if (keep != folded) writeManifest(fs, gen, keep)
    }

  /** [[prepareSegmentLanding]] without a name — kept for callers that
    * only need the stale-entry cleaning.
    */
  def cleanStaleFolded(spark: SparkSession, path: String): Unit =
    prepareSegmentLanding(spark, path, None)

  /** Post-commit GC shared by every family: eagerly delete the folded
    * segment directories (and the emptied segments root — single
    * writer, no racing append), then apply the grace rule —
    * `graceDepth` PRIOR generations survive each compaction for
    * readers that resolved before the commit (default 1: only the
    * immediately-previous generation, the documented
    * maintenance-window rule — a reader racing TWO back-to-back
    * compactions at depth 1 can lose its resolved copy even past
    * [[retryOnLostSegments]]; depth N keeps it alive through N
    * consecutive compactions at N× the disk). The legacy flat tables
    * count as the oldest "generation" for the same rule: at the first
    * `graceDepth` compactions they stay; afterwards the legacy
    * children and every generation older than the grace window go.
    */
  def gcAfterCommit(
      fs: FileSystem, path: String, curN: Int,
      foldedDirs: Seq[String], legacyChildren: Seq[String],
      graceDepth: Int = 1): Unit = {
    require(graceDepth >= 1, s"graceDepth must be >= 1, got $graceDepth")
    foldedDirs.foreach(d => fs.delete(new HPath(d), true))
    val segRoot = new HPath(s"$path/segments")
    if (fs.exists(segRoot) && fs.listStatus(segRoot).isEmpty)
      fs.delete(segRoot, true)
    if (curN >= graceDepth - 1) {
      legacyChildren.foreach(c =>
        fs.delete(new HPath(s"$path/$c"), true))
      for (old <- 0 until (curN - graceDepth + 1))
        fs.delete(new HPath(s"$path/generations/gen=$old"), true)
    }
  }

  /** Does the failure chain of `t` bottom out in a lost file — the
    * signature of a reader racing a compact's eager segment GC (a
    * mid-scan FileNotFoundException, or the resolve-time
    * PATH_NOT_FOUND when the directory vanished before the scan even
    * planned)?
    */
  private def isLostFile(t: Throwable): Boolean = {
    Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).take(16)
      .exists { c =>
        c.isInstanceOf[FileNotFoundException] ||
          Option(c.getMessage).exists(m =>
            m.contains("FileNotFoundException") ||
              m.contains("FILE_NOT_EXIST") || // FAILED_READ_FILE class
              m.contains("PATH_NOT_FOUND"))
      }
  }

  /** Run `body` (which must RESOLVE-then-act: re-reading the index on
    * every attempt, as every served-dir resolver in this package
    * does), retrying once per lost-file failure up to `attempts`
    * total runs. This turns the documented fail-loud race — a reader
    * resolved generation N, a compact committed N+1 and eagerly GC'd
    * a segment the reader was about to scan — into an invisible one:
    * the retry re-resolves to generation N+1, whose tables contain
    * exactly the rows the GC'd segment held. Only lost-file failures
    * retry; anything else propagates immediately.
    */
  def retryOnLostSegments[T](attempts: Int = 2)(body: => T): T = {
    var left = math.max(1, attempts)
    while (true) {
      try return body
      catch {
        case t: Throwable if isLostFile(t) && left > 1 => left -= 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
