package graft.core

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Advisory single-writer lease for index maintenance — the
  * coordination layer for MULTI-WRITER deployments where two ingest
  * jobs, or an ingest and a maintenance cron, could race on one index
  * tree.
  *
  * What the lease is NOT: a correctness requirement. Index commits are
  * already atomic under versioned immutable manifests
  * ([[Generations]]), segment landings are name-fenced, and readers
  * retry GC races — a lost race without the lease wastes work (two
  * compactions rewrite the same base; last commit wins) but cannot
  * corrupt the tree. The lease exists so concurrent writers SERIALIZE
  * instead of duplicating that work, and so operators get a loud
  * "someone else is maintaining this index" instead of silent
  * double-compaction.
  *
  * Protocol (HDFS-compatible — no CAS primitive assumed):
  *   - acquire  = exclusive CREATE of `<path>/_WRITE_LEASE` carrying
  *     `owner  token  expiresAt`. Exclusive create is atomic on HDFS
  *     by contract and on local filesystems via O_EXCL (the local
  *     scheme routes through `java.nio.Files.createFile` because
  *     Hadoop's RawLocalFileSystem emulates `overwrite = false` with
  *     a non-atomic exists-then-create).
  *   - contended = if the current lease's `expiresAt` is in the
  *     future, poll until `maxWaitMs` then FAIL LOUD; if expired,
  *     delete it (idempotent — concurrent stealers both delete, at
  *     most one subsequent exclusive create wins) and retry.
  *   - release  = read-back-verify the token, then delete. A token
  *     mismatch means the lease was stolen mid-run (the TTL elapsed
  *     while `body` was still executing): the work is already done
  *     and possibly raced a thief, so release THROWS [[LeaseLost]]
  *     after the fact — callers must treat it as "re-verify what I
  *     just wrote," not ignore it.
  *
  * TTL discipline: size `ttlMs` ABOVE the worst-case duration of the
  * guarded operation (a compact of the largest expected base). An
  * undersized TTL converts slow-but-healthy maintenance into
  * steal + LeaseLost noise; an oversized one only delays takeover
  * after a genuine writer crash.
  *
  * The clock is injectable for deterministic expiry tests; production
  * callers use the default wall clock.
  */
object WriteLease {

  private val LeaseName = "_WRITE_LEASE"

  /** Thrown by acquisition timeout AND by release-time token mismatch
    * (stolen mid-run). */
  class LeaseLost(msg: String) extends RuntimeException(msg)

  /** The acquisition-timeout case specifically — "someone else holds
    * it right now," which callers with retryable work (e.g. in-loop
    * stream maintenance, retried at the next boundary anyway) may
    * treat as skip-and-continue, unlike a mid-run steal which always
    * demands attention. IS-A [[LeaseLost]] so blanket handlers keep
    * working. */
  final class LeaseBusy(msg: String) extends LeaseLost(msg)

  private def leasePath(indexPath: String): HPath =
    new HPath(indexPath, LeaseName)

  private def fsFor(indexPath: String, conf: Configuration): FileSystem =
    new HPath(indexPath).getFileSystem(conf)

  private def isLocal(fs: FileSystem): Boolean =
    fs.getScheme == "file"

  /** Atomic exclusive create; true iff THIS call created the file. */
  private def createExclusive(
      fs: FileSystem, p: HPath, content: String): Boolean =
    if (isLocal(fs)) {
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      try {
        java.nio.file.Files.write(local,
          content.getBytes(StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else {
      try {
        val out = fs.create(p, false /* overwrite */ )
        try out.write(content.getBytes(StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.io.IOException => false
      }
    }

  private def readLease(
      fs: FileSystem, p: HPath): Option[(String, String, Long)] =
    try {
      val in = fs.open(p)
      val content =
        try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          StandardCharsets.UTF_8)
        finally in.close()
      content.split('\t') match {
        case Array(owner, token, exp) => Some((owner, token, exp.toLong))
        case _ => None // truncated mid-write or foreign file: treat as absent
      }
    } catch {
      case _: java.io.FileNotFoundException => None
      case _: java.io.IOException => None
    }

  /** Run `body` holding the index's write lease. Fail-loud on
    * contention past `maxWaitMs`; steals expired leases; throws
    * [[LeaseLost]] AFTER running `body` if the lease was stolen
    * mid-run (see class doc for what callers must do then).
    */
  def withLease[T](
      indexPath: String,
      owner: String,
      ttlMs: Long,
      conf: Configuration = new Configuration(),
      maxWaitMs: Long = 0L,
      pollMs: Long = 50L,
      clock: () => Long = () => System.currentTimeMillis())(
      body: => T): T = {
    require(ttlMs > 0, s"ttlMs must be positive, got $ttlMs")
    require(maxWaitMs >= 0, s"maxWaitMs must be >= 0, got $maxWaitMs")
    require(pollMs > 0, s"pollMs must be positive, got $pollMs")
    val fs = fsFor(indexPath, conf)
    val p = leasePath(indexPath)
    val token = java.util.UUID.randomUUID().toString
    val deadline = clock() + maxWaitMs
    var acquired = false
    while (!acquired) {
      val expiresAt = clock() + ttlMs
      if (createExclusive(fs, p, s"$owner\t$token\t$expiresAt")) {
        acquired = true
      } else {
        readLease(fs, p) match {
          case Some((_, _, exp)) if exp < clock() =>
            // expired: steal via rename-to-tombstone. rename is atomic
            // on the source, so exactly one concurrent stealer moves
            // the file; the winner VERIFIES it moved the expired lease
            // it read (a fresh lease can replace the expired one
            // between read and rename — the ABA race a bare delete
            // would silently orphan) and restores a mistakenly-moved
            // live lease when the slot is still free. A victim whose
            // live lease could not be restored gets the loud
            // LeaseLost at its release, never a silent loss. Crashed
            // stealers leave only uniquely-named `_`-prefixed
            // tombstones, invisible to data readers.
            val tomb = new HPath(indexPath, s"$LeaseName.steal.$token")
            if (fs.rename(p, tomb)) {
              readLease(fs, tomb) match {
                case Some((_, _, e2)) if e2 < clock() =>
                  fs.delete(tomb, false) // confirmed expired; retry create
                case Some(_) =>
                  if (!fs.rename(tomb, p)) fs.delete(tomb, false)
                case None => fs.delete(tomb, false)
              }
            } // else another stealer won; loop re-reads
          case None =>
            // vanished between create and read (another writer released
            // or a stealer deleted): retry immediately
            ()
          case Some((heldBy, _, _)) =>
            if (clock() >= deadline)
              throw new LeaseBusy(
                s"write lease on $indexPath held by $heldBy; waited " +
                  s"${maxWaitMs}ms - another writer is maintaining this " +
                  "index (raise maxWaitMs to queue behind it)")
            Thread.sleep(pollMs)
        }
      }
    }
    var releasedCleanly = false
    val result =
      try body
      finally {
        // release only what is still OURS; a stolen lease belongs to
        // the thief and must not be deleted out from under them. A
        // clean release (our token was still on disk) is the proof the
        // lease was never stolen — absence at this point is NOT, since
        // a thief may have already stolen, run, and released.
        readLease(fs, p) match {
          case Some((_, t, _)) if t == token =>
            fs.delete(p, false)
            releasedCleanly = true
          case _ => ()
        }
      }
    if (!releasedCleanly) {
      val thief = readLease(fs, p).map(_._1)
        .getOrElse("a writer that already released")
      throw new LeaseLost(
        s"write lease on $indexPath was stolen by $thief while the " +
          "guarded operation was still running (TTL undersized?) - " +
          "the operation completed but may have raced; re-verify " +
          "the index state before trusting this run")
    }
    result
  }

  /** True iff a live (unexpired) lease currently guards `indexPath` —
    * the operator's "is maintenance running?" probe. */
  def isHeld(
      indexPath: String,
      conf: Configuration = new Configuration(),
      clock: () => Long = () => System.currentTimeMillis()): Boolean = {
    val fs = fsFor(indexPath, conf)
    readLease(fs, leasePath(indexPath)).exists(_._3 >= clock())
  }
}
