package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.text.TextStats

/** Exact substring-level deduplication — the Lee et al. 2022
  * ("Deduplicating Training Data Makes Language Models Better") family:
  * find substrings REPEATED ACROSS DOCUMENTS (boilerplate sentences,
  * license headers, templated paragraphs inside otherwise-distinct
  * pages). Document-level exact dedup ([[Dedup]]) and MinHash/SimHash
  * near-dup miss these entirely: two pages sharing one boilerplate
  * paragraph are neither identical nor globally similar.
  *
  * Lee et al. build a corpus-wide suffix array; that is inherently a
  * single-machine (or sorted-global-index) design. The Spark-first
  * shape used here reaches the same candidates with winnowing
  * fingerprints ([[graft.functions.WinnowingFingerprintKeys]], the
  * q30 machinery plus byte positions):
  *
  *   1. each document emits its selected (hash, pos) fingerprints over
  *      normalized text — O(2·len/window) rows per document, each
  *      carrying only a k-byte snippet, never the document;
  *   2. fingerprints whose document frequency exceeds `maxDocFreq` are
  *      dropped BEFORE the self-join (same hot-key cap as
  *      [[graft.text.Decontaminate]] — a license line shared by a
  *      million documents would otherwise produce a quadratic pair
  *      blowup on one join key; the cap is part of the contract and
  *      replayed by the oracle);
  *   3. one hash equi-join emits cross-document candidates, and exact
  *      equality of the k-byte snippets at the matched offsets verifies
  *      them — a Karp-Rabin collision cannot survive, so the output is
  *      exact, not probabilistic.
  *
  * Detection guarantee (winnowing): any shared normalized substring of
  * length ≥ `window + k - 1` bytes contains a full window of the match
  * in both documents, both windows select the same content-relative
  * k-gram, and that shared fingerprint becomes an output row after
  * snippet verification. Shared substrings shorter than `k` are never
  * reported. Snippet extraction uses character offsets, so byte
  * positions align with substrings only for single-byte text — callers
  * filter to ASCII (as q30/q45 do) or accept byte-offset snippets.
  *
  * At 100 TB: fingerprint rows are ~(16 + k bytes) × 2/window per
  * document byte; the only shuffle is the hash groupBy (df cap) plus
  * one equi-join, both on a 64-bit key; nothing is quadratic after the
  * cap. Output pairs feed [[Components.keepCanonical]] for
  * cluster-level removal, or a span-level trimmer.
  */
object SubstringDedup {

  /** One row per selected fingerprint: (id, hash, pos, snippet) over
    * the NORMALIZED text (lowercase, trimmed, whitespace collapsed —
    * [[TextStats.normalize]]), where `pos` is the 0-based offset of the
    * fingerprinted k-gram and `snippet` is that k-gram itself.
    */
  def fingerprints(
      df: DataFrame, idCol: String, textCol: String,
      k: Int, window: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(window >= 1, s"window must be >= 1, got $window")
    df.select(col(idCol), TextStats.normalize(col(textCol)).as("__t"))
      .select(col(idCol), col("__t"),
        explode(graft.functions.WinnowingFingerprints
          .winnowingFingerprintKeys(col("__t"), k, window)).as("__key"))
      .select(
        col(idCol),
        shiftrightunsigned(col("__key"), 32).as("hash"),
        col("__key").bitwiseAND(lit(0xFFFFFFFFL)).cast("int").as("pos"),
        col("__t").substr(
          col("__key").bitwiseAND(lit(0xFFFFFFFFL)).cast("int") + 1,
          lit(k)).as("snippet"))
  }

  /** Verified cross-document repeated-substring matches:
    * `(id_a, id_b, pos_a, pos_b, snippet)` with `id_a < id_b`, one row
    * per matched fingerprint instance pair. `snippet` is the shared
    * k-byte normalized substring; any true shared span of
    * ≥ `window + k - 1` bytes yields at least one row.
    */
  def substringMatches(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, window: Int = 16,
      maxDocFreq: Long = 1000L,
      materialize: Boolean = true): DataFrame = {
    require(maxDocFreq >= 1, s"maxDocFreq must be >= 1, got $maxDocFreq")
    // the fingerprint table feeds three plan branches (the df-cap
    // aggregate and both self-join sides); without a persist each
    // branch re-runs normalize + winnowing over the full corpus — the
    // most expensive map stage, three times. Same lifecycle contract
    // as Dedup.nearDuplicatesBySets: persisted for the duration, and
    // (in the non-lazy shape) the caller's first action releases it
    // naturally because the join result is what lives on. Pass
    // materialize = false for a fully lazy, recomputable plan (e.g. on
    // preemptible executors).
    val fp0 = fingerprints(df, idCol, textCol, k, window)
    val fp =
      if (materialize)
        fp0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else fp0
    // document frequency per hash; hot boilerplate hashes never reach
    // the join (the tiny (hash) aggregate broadcasts under AQE)
    val rare = fp.groupBy(col("hash"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") <= maxDocFreq)
      .select("hash")
    val capped = fp.join(rare, Seq("hash"))
    // dataset aliases: both sides share lineage, so bare column refs
    // would resolve to the same attribute (a trivially-true join key)
    val a = capped.select(col("hash"), col(idCol).as("id_a"),
      col("pos").as("pos_a"), col("snippet")).alias("fa")
    val b = capped.select(col("hash"), col(idCol).as("id_b"),
      col("pos").as("pos_b"), col("snippet").as("__sb")).alias("fb")
    val matches = a.join(b, col("fa.hash") === col("fb.hash") &&
        col("id_a") < col("id_b") && col("snippet") === col("__sb"))
      .select(col("id_a"), col("id_b"), col("pos_a"), col("pos_b"),
        col("snippet"))
    if (materialize) {
      // materialize the (match-sized, not corpus-sized) result so the
      // fingerprint cache releases now rather than at session end
      val result = matches.localCheckpoint(true)
      fp.unpersist()
      result
    } else matches
  }

  /** Matched fingerprints merged into MAXIMAL verified shared spans —
    * the Lee et al. output shape: `(id_a, id_b, start_a, start_b,
    * length, n_fingerprints)`, one row per contiguous cross-document
    * duplicated substring.
    *
    * Merging is a diagonal sessionization: matches of one document
    * pair with equal `pos_a - pos_b` lie on one alignment diagonal;
    * consecutive diagonal matches at distance ≤ k have OVERLAPPING (or
    * exactly abutting) verified k-gram regions, so their union is
    * verified shared end to end — no unverified gap bytes can hide a
    * difference. That soundness argument needs `window <= k`
    * (winnowing selects at least one fingerprint per `window`
    * positions, so inside a contiguous shared span consecutive
    * selections are ≤ window ≤ k apart); the method enforces it.
    * A reported span is therefore an EXACT shared substring of length
    * ≥ k; true spans may split only where the df cap removed interior
    * fingerprints.
    *
    * Plan shape: one window pass (lag + running sum) over the match
    * table partitioned by (pair, diagonal), then a hash aggregate —
    * the same exchange serves both, nothing corpus-sized.
    */
  def substringSpans(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, window: Int = 16,
      maxDocFreq: Long = 1000L,
      materialize: Boolean = true): DataFrame = {
    require(window <= k,
      s"span merging requires window <= k (got window=$window, k=$k): " +
        "consecutive in-span fingerprints must overlap to stay verified")
    import org.apache.spark.sql.expressions.{Window => W}
    val byDiag = W.partitionBy(col("id_a"), col("id_b"), col("__diag"))
      .orderBy(col("pos_a"))
    substringMatches(df, idCol, textCol, k, window, maxDocFreq, materialize)
      .withColumn("__diag", col("pos_a") - col("pos_b"))
      .withColumn("__gap_start",
        when(lag(col("pos_a"), 1).over(byDiag).isNull ||
          col("pos_a") - lag(col("pos_a"), 1).over(byDiag) > k, 1)
          .otherwise(0))
      .withColumn("__sid", sum(col("__gap_start"))
        .over(byDiag.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .groupBy(col("id_a"), col("id_b"), col("__diag"), col("__sid"))
      .agg(
        min(col("pos_a")).as("start_a"),
        min(col("pos_b")).as("start_b"),
        (max(col("pos_a")) - min(col("pos_a")) + lit(k)).as("length"),
        count(lit(1)).as("n_fingerprints"))
      .select(col("id_a"), col("id_b"), col("start_a"), col("start_b"),
        col("length"), col("n_fingerprints"))
  }

  /** Distinct document pairs sharing at least `minShared` verified
    * substring fingerprints — the pair table for
    * [[Components.keepCanonical]].
    */
  def sharedSubstringPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, window: Int = 16,
      maxDocFreq: Long = 1000L, minShared: Long = 1L,
      materialize: Boolean = true): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    substringMatches(df, idCol, textCol, k, window, maxDocFreq, materialize)
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_fingerprints"))
      .filter(col("shared_fingerprints") >= minShared)
  }

  // ---- prepared index (the incremental form) ---------------------------
  //
  // The self-join form re-fingerprints the whole corpus every run. The
  // incremental deployment — "does today's batch share spans with the
  // standing corpus" — builds the corpus's capped fingerprint table
  // ONCE on disk and lets each batch equi-join it: the substring-level
  // analogue of [[DedupIndex]] (round 8's doc-level lesson applied to
  // the Lee et al. machinery). Per batch, corpus-side cost is a parquet
  // scan of (16 + k)-byte rows; the corpus TEXT is never re-read,
  // re-normalized, or re-winnowed.

  /** Build the on-disk index at `path`: the corpus's winnowing
    * fingerprints with the `maxDocFreq` hot-hash cap applied at WRITE
    * time (boilerplate hashes never even reach disk), plus a 1-row
    * `meta` pinning (k, window, maxDocFreq) so queries cannot drift
    * from the build.
    */
  def writeFingerprintIndex(
      corpus: DataFrame, idCol: String, textCol: String, path: String,
      k: Int = 16, window: Int = 16, maxDocFreq: Long = 1000L): Unit = {
    require(maxDocFreq >= 1, s"maxDocFreq must be >= 1, got $maxDocFreq")
    val fp = fingerprints(corpus, idCol, textCol, k, window)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val rare = fp.groupBy(col("hash"))
        .agg(countDistinct(col(idCol)).as("__df"))
        .filter(col("__df") <= maxDocFreq)
        .select("hash")
      fp.join(rare, Seq("hash"))
        .select(col(idCol).as("corpus_id"), col("hash"), col("pos"),
          col("snippet"))
        .write.mode("overwrite").parquet(s"$path/fingerprints")
      val spark = corpus.sparkSession
      import spark.implicits._
      Seq((k, window, maxDocFreq)).toDF("k", "window", "maxDocFreq")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    } finally fp.unpersist()
  }

  /** Grow the index without rebuilding: the new documents' capped
    * fingerprints land in a fresh `segments/<n>` directory (the
    * [[DedupIndex.appendSegment]] LSM shape). The df cap applies
    * WITHIN the segment only — a hash rare in every segment but hot
    * across them exceeds the global cap until [[compactFingerprintIndex]]
    * re-caps, the same documented trade as the doc-level index.
    */
  def appendToFingerprintIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      newDocs: DataFrame, idCol: String, textCol: String,
      segmentName: Option[String] = None): Unit = {
    val (k, window, cap) = readMeta(spark, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segBase = new org.apache.hadoop.fs.Path(s"$path/segments")
    // segmentName pins the directory instead of the auto-increment —
    // the REPLAY-SAFETY seam for at-least-once streaming ingest
    // ([[graft.streaming.Streaming.substringIngestSink]]): a
    // redelivered batch OVERWRITES its own segment rather than landing
    // a duplicate under a fresh number. "seg" prefix keeps named
    // segments out of the numeric auto-increment's namespace.
    val segDir = segmentName match {
      case Some(n) =>
        require(n.startsWith("seg") && !n.contains('/'),
          s"segment name must start with 'seg' and hold no '/', got $n")
        n
      case None =>
        val next = if (!fs.exists(segBase)) 0
          else fs.listStatus(segBase).toSeq
            .flatMap(_.getPath.getName.toIntOption)
            .foldLeft(-1)(_ max _) + 1
        next.toString
    }
    // tombstone fence — the [[DedupIndex.appendSegment]] contract at
    // substring granularity: re-ingesting a tombstoned id before its
    // stale fingerprint rows are physically purged is refused (clearing
    // the tombstone would un-mask positions/snippets of text that no
    // longer exists). Re-licensing flow: delete → purge or compact →
    // append. One bounded semi-join, checked BEFORE the segment lands.
    tombstones(spark, path).foreach { t =>
      val clash = t.join(
        newDocs.select(col(idCol).as("corpus_id")).distinct(),
        Seq("corpus_id"), "left_semi")
        .limit(1).count()
      require(clash == 0L,
        s"appendToFingerprintIndex: batch re-ingests tombstoned ids " +
          s"at $path — purge those ids or run " +
          "compactFingerprintIndex first, then append")
    }
    // free the name before the segment lands: stale folded-manifest
    // entries drop (stream restarts reuse batchId names a prior
    // compact folded and GC'd) and a folded-but-unGC'd dir holding
    // this name is deleted so its dead rows cannot mask the replayed
    // batch ([[graft.core.Generations.prepareSegmentLanding]])
    graft.core.Generations.prepareSegmentLanding(spark, path, Some(segDir))
    val fp = fingerprints(newDocs, idCol, textCol, k, window)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val rare = fp.groupBy(col("hash"))
        .agg(countDistinct(col(idCol)).as("__df"))
        .filter(col("__df") <= cap).select("hash")
      fp.join(rare, Seq("hash"))
        .select(col(idCol).as("corpus_id"), col("hash"), col("pos"),
          col("snippet"))
        // named (streaming) segments overwrite their own directory on
        // replay; numeric batch appends keep the fail-on-collision
        // contract (two writers racing an auto-increment is a bug)
        .write.mode(if (segmentName.isDefined) "overwrite"
          else "errorifexists")
        .parquet(s"$path/segments/$segDir/fingerprints")
    } finally fp.unpersist()
  }

  /** Delete documents from an on-disk fingerprint index by id — the
    * takedown event at substring granularity, same LSM tombstone
    * discipline as [[DedupIndex.delete]]: ids land as one batch-sized
    * parquet append under `tombstones/`, reads exclusion-filter the
    * id-carrying fingerprint table (one anti-join against the
    * tombstone-sized table), [[compactFingerprintIndex]] folds the
    * purge in physically and clears them, and [[purgeFingerprintIndex]]
    * is the targeted alternative. Honest cap semantics: the write-time
    * `maxDocFreq` cap DROPPED hot hashes from disk, so neither delete
    * nor compact can resurrect a hash whose document frequency falls
    * back under the cap once deleted docs are gone — rebuild for that
    * (the same one-way trade every capped table in this package
    * documents). When the cap never bound, delete-then-match equals
    * match-against-rebuilt-without-deleted (q256 pins it, pre AND post
    * compact).
    */
  def deleteFromFingerprintIndex(path: String, ids: DataFrame): Unit = {
    ids.select(col(ids.columns.head).as("corpus_id")).distinct()
      .write.mode("append").parquet(s"$path/tombstones")
  }

  /** Absence of `tombstones/` is load-bearing ("no pending deletes"),
    * so the crash state that forges absence fails loud: a
    * [[purgeFingerprintIndex]] tombstone swap crashed between its two
    * renames leaves only `tombstones_old` — reading that as "no
    * deletes" would un-mask every still-pending takedown. Both dirs
    * present is fine (swap done, cleanup crashed; live table is the
    * reduced one). Same contract as [[DedupIndex]]'s reader.
    */
  private def tombstones(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/tombstones")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p) ||
      !fs.exists(new org.apache.hadoop.fs.Path(s"$path/tombstones_old")),
      s"substring index at $path has tombstones_old but no tombstones — " +
        "a purge crashed between its two swap renames; rename " +
        "tombstones_old back to tombstones, then re-run purge " +
        "(idempotent)")
    if (fs.exists(p))
      Some(graft.core.ParquetMeta.readPinned(spark, Seq(p.toString)))
    else None
  }

  /** The directory holding the SERVED base `fingerprints` table — the
    * latest committed generation's after [[compactFingerprintIndex]]
    * upgraded the tree ([[graft.core.Generations]]), the index root
    * before. `meta` and `tombstones` stay at the root.
    */
  def servedBaseDir(
      spark: org.apache.spark.sql.SparkSession, path: String): String =
    graft.core.Generations.latest(spark, path)
      .map(_._1).getOrElse(path)

  /** Physical segment dirs (lexicographic — numeric batch appends and
    * named streaming segments coexist; consumers order-independent).
    */
  private def segmentDirs(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[String] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segBase = new org.apache.hadoop.fs.Path(s"$path/segments")
    if (!fs.exists(segBase)) Nil
    else fs.listStatus(segBase).toSeq
      // directories in the segment namespace only (numeric batch
      // appends, "seg"-named streaming segments) — a stray file or
      // tmp/marker dir under segments/ must not become a bogus
      // fingerprint root (the DedupIndex.segmentDirs discipline)
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p =>
        p.getName.toIntOption.isDefined || p.getName.startsWith("seg"))
      .map(_.toString)
      .sortBy(_.split('/').last)
  }

  /** Served segment dirs: physical minus those the latest committed
    * generation folded (crash window before their eager GC).
    */
  private def servedSegmentDirs(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[String] = {
    val folded = graft.core.Generations.latest(spark, path)
      .map(_._3).getOrElse(Set.empty[String])
    segmentDirs(spark, path)
      .filterNot(d => folded.contains(d.split('/').last))
  }

  private def fingerprintRoots(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      excludeSegments: Set[String] = Set.empty): Seq[String] =
    servedBaseDir(spark, path) +:
      servedSegmentDirs(spark, path)
        .filterNot(d => excludeSegments.contains(d.split('/').last))

  /** Targeted physical purge of pending tombstones —
    * [[DedupIndex.purge]] at substring granularity: rewrite ONLY the
    * fingerprint table of each root with the purged ids anti-joined
    * out (filter-only scan+write, no df re-aggregation, segments stay
    * segmented), then clear exactly those ids from the tombstone
    * table. Ids in `ids` that are not tombstoned are ignored (purging
    * a live id would be an undeletable takedown bypass). Crash-safe
    * without a marker: tombstones clear LAST, so partial states still
    * mask and re-running is idempotent; each rewrite swaps in via
    * [[graft.core.FsSwap]].
    */
  def purgeFingerprintIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      ids: DataFrame): Unit = {
    // crashed-compact fence ([[storedFingerprints]]'s guard, repeated
    // here because purge reads roots directly): never rewrite an index
    // whose segment rows may sit both merged and live.
    val cMarker = new org.apache.hadoop.fs.Path(s"$path/compact_pending")
    val mfs = cMarker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!mfs.exists(cMarker),
      s"substring index at $path is mid-compaction (compact_pending " +
        "marker present) — finish the compact recovery first, then " +
        "purge")
    val tombOpt = tombstones(spark, path)
    if (tombOpt.isEmpty) return
    val tomb = tombOpt.get
    val requested = ids.select(col(ids.columns.head).as("corpus_id")).distinct()
    val purged = tomb.join(requested, Seq("corpus_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (purged.isEmpty) return
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      for (root <- fingerprintRoots(spark, path)) {
        val tmp = s"$root/purge_tmp"
        graft.core.ParquetMeta.readPinned(spark, Seq(s"$root/fingerprints"))
          .join(purged, Seq("corpus_id"), "left_anti")
          .write.mode("overwrite").parquet(s"$tmp/fingerprints")
        graft.core.FsSwap.swapIntoPlace(fs, root, tmp, "fingerprints")
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      }
      val remaining = tomb.join(purged, Seq("corpus_id"), "left_anti")
      if (remaining.isEmpty) {
        // aside copy (leftover of a FINISHED swap) clears first: live
        // still exists here, so this can never destroy the only copy,
        // and dropping live first would leave tombstones_old reading
        // as a crashed swap (spurious fail-loud on the next read).
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/tombstones_old"), true)
        fs.delete(new org.apache.hadoop.fs.Path(s"$path/tombstones"), true)
      } else {
        val tmp = s"$path/purge_tmp"
        remaining.write.mode("overwrite").parquet(s"$tmp/tombstones")
        graft.core.FsSwap.swapIntoPlace(fs, path, tmp, "tombstones")
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      }
    } finally purged.unpersist()
  }

  /** Operational stats — [[DedupIndex.stats]] for the substring index:
    * segments a read unions, tombstones pending physical purge, live
    * (tombstone-excluded) fingerprint rows and distinct documents.
    * One count + one distinct aggregate over the served table; q257
    * pins every number against DuckDB replaying the winnowing chain.
    */
  def fingerprintIndexStats(
      spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    // resolve-then-count is eager, so a compact racing this call can
    // GC a resolved segment mid-count — retry re-resolves to the
    // committed generation holding the same rows
    graft.core.Generations.retryOnLostSegments() {
      import spark.implicits._
      val served = storedFingerprints(spark, path)
      val nSegments = (fingerprintRoots(spark, path).size - 1).toLong
      val nTombstones =
        tombstones(spark, path).map(_.distinct().count()).getOrElse(0L)
      Seq(
        ("distinct_docs",
          served.select(col("corpus_id")).distinct().count()),
        ("fingerprint_rows", served.count()),
        ("segments_pending", nSegments),
        ("tombstones_pending", nTombstones))
        .toDF("stat", "value")
    }

  /** [[fingerprintIndexStats]] folded into the operational verdict —
    * [[DedupIndex.maintenanceAdvice]] for the substring family (the
    * same thresholds type: the two doc-level index families share the
    * decision semantics). Two rules over one stats pass, strict
    * integer comparisons:
    *
    *   - `segments`: `segments_pending > maxSegments` — every match
    *     call unions one fingerprint scan per segment, and per-segment
    *     df caps drift from the global cap until a compact re-caps;
    *   - `tombstone_mass`: `100 · tombstones_pending >
    *     maxTombstonePct · distinct_docs` — every read pays an
    *     anti-join against the pending-delete table.
    *
    * Either fired → `compact`; [[purgeFingerprintIndex]] stays the
    * targeted re-licensing path. One row per rule
    * `(rule, observed, bound, fired, advice)`; q264 recomputes rows
    * and verdict from the raw corpus in DuckDB.
    */
  def fingerprintIndexMaintenanceAdvice(
      spark: org.apache.spark.sql.SparkSession, path: String,
      thresholds: DedupIndex.AdviceThresholds =
        DedupIndex.AdviceThresholds()): DataFrame = {
    import spark.implicits._
    val st = fingerprintIndexStats(spark, path)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap // 4 rows
    val rules = Seq(
      ("segments", st("segments_pending"), thresholds.maxSegments),
      ("tombstone_mass", 100L * st("tombstones_pending"),
        thresholds.maxTombstonePct * st("distinct_docs")))
    val advice =
      if (rules.exists { case (_, obs, bound) => obs > bound }) "compact"
      else "none"
    rules.map { case (rule, obs, bound) =>
      (rule, obs, bound, obs > bound, advice)
    }.toDF("rule", "observed", "bound", "fired", "advice")
  }

  /** Measure → decide → ACT in one call — the actuator that completes
    * the third index family ([[graft.sim.Similarity.ivfAutoMaintain]]
    * and [[DedupIndex.autoMaintain]] got theirs in the same promotion):
    * run [[fingerprintIndexMaintenanceAdvice]] and execute the
    * verdict — `compact` → [[compactFingerprintIndex]] (the one
    * maintenance op this family has: it folds segments AND pending
    * tombstones and re-caps document frequency globally; there is no
    * retrain — fingerprints are content-determined, nothing is fit to
    * the corpus), `none` → no filesystem touch. Returns the advice
    * evidence with an `action` column stating what ran, so the
    * decision is auditable after the fact (q267 proves the action
    * happened by replaying the POST-action stats in DuckDB — a
    * skipped compact leaves segments_pending ≠ 0 and fails the
    * compare). Idempotent at the fixpoint: after the action, a second
    * call at the same thresholds advises `none` (spec-pinned).
    */
  def autoMaintainFingerprintIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      thresholds: DedupIndex.AdviceThresholds =
        DedupIndex.AdviceThresholds(),
      excludeSegments: Set[String] = Set.empty): DataFrame = {
    val advice =
      fingerprintIndexMaintenanceAdvice(spark, path, thresholds)
    val verdict = advice.select("advice").head.getString(0)
    if (verdict == "compact")
      compactFingerprintIndex(spark, path, excludeSegments)
    advice.withColumn("action", lit(verdict))
  }

  /** Merge segments into the base at DERIVED-table cost: the stored
    * fingerprints union and re-cap GLOBALLY on document frequency —
    * the corpus text is never re-read. Write-to-temp-then-rename; meta
    * untouched.
    *
    * `excludeSegments` (directory names) are left OUT of the fold —
    * not merged, not manifest-listed, not GC'd, still serving — the
    * replay-idempotency contract for in-loop streaming maintenance
    * ([[graft.streaming.Streaming.substringIngestSink]] passes the
    * current micro-batch's segment, whose stream offsets are not yet
    * committed). With a nonempty exclusion the tombstone tables stay
    * on disk (the mask must survive for the un-folded rows); the next
    * exclusion-free compact or a targeted purge clears them.
    */
  def compactFingerprintIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      excludeSegments: Set[String] = Set.empty,
      graceDepth: Int = 1): Unit = {
    val (_, _, cap) = readMeta(spark, path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tomb = tombstones(spark, path)
    val segs = servedSegmentDirs(spark, path)
      .filterNot(d => excludeSegments.contains(d.split('/').last))
    if (segs.isEmpty && tomb.isEmpty) return
    // storedFingerprints already applies the tombstone exclusion, so
    // pending deletes fold in physically here and the table clears
    val all = storedFingerprints(spark, path, excludeSegments)
    val rare = all.groupBy(col("hash"))
      .agg(countDistinct(col("corpus_id")).as("__df"))
      .filter(col("__df") <= cap).select("hash")
    // generational commit ([[graft.core.Generations]], the
    // DedupIndex.compact discipline): the globally re-capped table
    // lands whole under gen=N+1 and becomes visible in one atomic
    // manifest rename — no marker, no fail-loud window for readers
    // racing the compact; the manifest's folded-segment list covers
    // the crash window before the eager segment GC.
    val gen = graft.core.Generations.latest(spark, path)
    val curN = gen.map(_._2).getOrElse(-1)
    val target = s"$path/generations/gen=${curN + 1}"
    all.join(rare, Seq("hash"))
      .select(col("corpus_id"), col("hash"), col("pos"), col("snippet"))
      .write.mode("overwrite").parquet(s"$target/fingerprints")
    // prior folded names whose dirs a crashed GC left behind carry
    // forward (a dead segment must never re-enter service) and join
    // the GC list below
    val zombies = graft.core.Generations.commitGeneration(
      fs, path, target, segs.map(_.split('/').last).toSet,
      gen.map(_._3).getOrElse(Set.empty))
    // tombstones folded into the committed table; clearing after the
    // commit is benign in the crash window (re-anti-joining removed
    // ids is a no-op). Aside-then-live order as in purge. With excluded
    // segments the mask must SURVIVE (their rows were not anti-joined).
    if (excludeSegments.isEmpty) {
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/tombstones_old"), true)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/tombstones"), true)
    }
    graft.core.Generations.gcAfterCommit(fs, path, curN, segs ++ zombies,
      legacyChildren = Seq("fingerprints"), graceDepth = graceDepth)
  }

  private def readMeta(
      spark: org.apache.spark.sql.SparkSession, path: String): (Int, Int, Long) = {
    // fingerprint-cached one-row parameter table (immutable by API
    // contract) — see [[graft.core.ParquetMeta.cachedRows]]
    val m = graft.core.ParquetMeta.cachedRows(spark, s"$path/meta")
    require(m.length == 1,
      s"malformed substring index meta at $path/meta: ${m.length} rows")
    (m.head.getAs[Int]("k"), m.head.getAs[Int]("window"),
      m.head.getAs[Long]("maxDocFreq"))
  }

  private def storedFingerprints(
      spark: org.apache.spark.sql.SparkSession, path: String,
      excludeSegments: Set[String] = Set.empty): DataFrame = {
    // a compaction crashed after its swap but before the segments/
    // cleanup would union already-merged rows with their still-live
    // segment copies — fail loud. Recovery: if fingerprints_old
    // exists, finish the FsSwap recovery first; otherwise the swapped
    // table is complete — delete segments/, tombstones/, compact_tmp/
    // and the marker.
    val marker = new org.apache.hadoop.fs.Path(s"$path/compact_pending")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(marker),
      s"substring index at $path is mid-compaction (compact_pending " +
        "marker present) — a crashed compactFingerprintIndex may have " +
        "left segment rows both merged and live under segments/; " +
        "delete segments/, tombstones/ and compact_tmp/ (the swapped " +
        "table is complete), then remove the marker")
    // one pinned-schema multi-path relation over base + segments
    // (same rows as the old unionByName of per-root scans — one
    // writer, one schema; per-root schema inference dominated here)
    val unioned = graft.core.ParquetMeta.readPinned(
      spark, fingerprintRoots(spark, path, excludeSegments)
        .map(r => s"$r/fingerprints"))
    // pending deletes exclusion-filter the served rows (one anti-join
    // against the tombstone-sized table) until compact/purge folds
    // them in physically
    tombstones(spark, path)
      .fold(unioned)(t => unioned.join(t, Seq("corpus_id"), "left_anti"))
  }

  /** Verified batch×corpus substring matches served from the index:
    * `(batch_id, corpus_id, pos_b, pos_c, snippet)`. Batch-side hot
    * hashes are capped with the SAME `maxDocFreq` (symmetric contract:
    * a boilerplate line novel to the batch must not blow up either),
    * and snippet equality makes every row exact, as in
    * [[substringMatches]].
    */
  def matchesAgainstIndex(
      spark: org.apache.spark.sql.SparkSession, path: String,
      batch: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (k, window, cap) = readMeta(spark, path)
    val fp = fingerprints(batch, idCol, textCol, k, window)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rare = fp.groupBy(col("hash"))
      .agg(countDistinct(col(idCol)).as("__df"))
      .filter(col("__df") <= cap)
      .select("hash")
    val capped = fp.join(rare, Seq("hash"))
      .select(col(idCol).as("batch_id"), col("hash"),
        col("pos").as("pos_b"), col("snippet"))
    val idx = storedFingerprints(spark, path)
      .select(col("corpus_id"), col("hash"),
        col("pos").as("pos_c"), col("snippet").as("__sc"))
    val out = capped.join(idx,
      capped("hash") === idx("hash") &&
        capped("snippet") === idx("__sc"))
      .select(col("batch_id"), col("corpus_id"), col("pos_b"),
        col("pos_c"), col("snippet"))
      .localCheckpoint(true) // match-sized; releases the fp cache now
    fp.unpersist()
    out
  }

  /** EMPIRICAL (k, window) audit — the substring family's measured
    * table, completing the set the other three candidate-generation
    * families carry (MinHash `lshMeasuredBandingTable`, sign-LSH
    * `signLshMeasuredBandingTable`, IVF `ivfMeasuredRecall`): for
    * every candidate winnowing config, the recall ACTUALLY achieved on
    * a bounded audit sample against EXACT ground truth, and the cost
    * actually paid. One row per (k, window):
    *
    *   - `guarantee_len` — `k + window − 1`: winnowing's detection
    *     guarantee. Shared spans ≥ this length are ALWAYS caught;
    *     the measured region is spans in [matchLen, guarantee_len)
    *     where detection is probabilistic — exactly what the model
    *     cannot predict and this table measures;
    *   - `fp_rows` — selected fingerprint instances over the sample:
    *     the index-size cost driver (the substring family's analogue
    *     of candidate mass);
    *   - `pairs_true` — sample pairs sharing an EXACT normalized
    *     `matchLen`-gram (a pair shares a length-`matchLen` substring
    *     iff it shares one of its grams — exact, not probabilistic,
    *     config-independent);
    *   - `pairs_recovered` / `recall_ppm` — true pairs sharing at
    *     least one selected fingerprint under this config (integral
    *     ppm; 1000000 on a truth-free sample, the families' shared
    *     vacuous-audit convention);
    *   - `cand_pairs` — ALL sample pairs sharing a fingerprint;
    *   - `eligible` / `chosen` — recall target met / minimal
    *     `fp_rows` among eligible, ties to smaller (k, window).
    *     All-false when nothing is eligible.
    *
    * Replayable end-to-end: the gram truth is string equality and the
    * fingerprint chain is q30's polynomial-rolling-hash + windowed-min
    * arithmetic, both plain SQL. Audit-priced like its siblings:
    * the caller owns bounding `sample` (and, as in q30/q45, filtering
    * to single-byte text so byte and character offsets agree);
    * ground truth is an L-gram EQUI-join (never all-pairs), each
    * config is one fingerprint pass, and the output is
    * #configs rows. Truth is exact, so no doc-frequency cap is
    * applied inside the audit — hot grams fan out at most sample².
    */
  def winnowingMeasuredConfigTable(
      sample: DataFrame,
      idCol: String,
      textCol: String,
      matchLen: Int,
      configs: Seq[(Int, Int)],
      targetRecallPpm: Long): DataFrame = {
    require(matchLen >= 1, s"matchLen must be >= 1, got $matchLen")
    require(configs.nonEmpty, "configs must be nonempty")
    require(configs.distinct.size == configs.size,
      s"duplicate configs: $configs")
    configs.foreach { case (k, w) =>
      require(k >= 1 && w >= 1, s"k and window must be >= 1, got ($k, $w)")
    }
    require(targetRecallPpm >= 0L && targetRecallPpm <= 1000000L,
      s"targetRecallPpm must be in [0, 1000000], got $targetRecallPpm")
    val norm = sample.select(col(idCol).as("__gid"),
      TextStats.normalize(col(textCol)).as("__t"))
    val grams = norm.filter(length(col("__t")) >= matchLen)
      .select(col("__gid"), explode(expr(
        s"transform(sequence(0, length(__t) - $matchLen), " +
          s"i -> substring(__t, i + 1, $matchLen))")).as("__g"))
      .distinct()
    // materialized once: the plan below reads the truth set from
    // every config row (pairs_true + the recovered join), and each
    // config's fingerprint table feeds two branches (count + pairs) —
    // without eager materialization the gram equi-join and the
    // winnowing passes re-run per branch (measured 11.4 s → 6.0 s at
    // sf0.1; the residue is fixed per-job overhead across the
    // #configs small jobs, flat in corpus size because the sample is
    // bounded). Both tables are audit-bounded: truth ≤ sample² id
    // pairs, fingerprints ~2/window per sample byte.
    val truthPlan = grams.select(col("__gid").as("__ida"), col("__g"))
      .join(grams.select(col("__gid").as("__idb"), col("__g")), Seq("__g"))
      .filter(col("__ida") < col("__idb"))
      .select(col("__ida"), col("__idb"))
      .distinct()
    // the truth checkpoint and each config's fingerprint checkpoint
    // are INDEPENDENT eager jobs that previously ran serially —
    // overlap them (guide §2.6) so each job's driver-side planning/
    // commit fills the others' scheduler gaps; results land in slots,
    // ordering and values unchanged
    val truthSlot = new java.util.concurrent.atomic.AtomicReference[DataFrame]()
    val fpSlots = new java.util.concurrent.ConcurrentHashMap[Int, DataFrame]()
    graft.core.Par.awaitAll(
      ((() => { truthSlot.set(truthPlan.localCheckpoint(true)); () }): (() => Unit)) +:
        configs.zipWithIndex.map { case ((k, w), i) => () => {
          fpSlots.put(i, fingerprints(sample, idCol, textCol, k, w)
            .select(col(idCol), col("hash"))
            .localCheckpoint(true))
          ()
        }}: _*)
    val truth = truthSlot.get()
    val truthC = truth.agg(count(lit(1)).as("pairs_true"))
    val rows = configs.zipWithIndex.map { case ((k, w), i) =>
      val fps = fpSlots.get(i)
      val fpc = fps.agg(count(lit(1)).as("fp_rows"))
      val fh = fps.select(col(idCol).as("__fid"), col("hash")).distinct()
      val cand = fh.select(col("__fid").as("__ida"), col("hash"))
        .join(fh.select(col("__fid").as("__idb"), col("hash")), Seq("hash"))
        .filter(col("__ida") < col("__idb"))
        .select(col("__ida"), col("__idb"))
        .distinct()
      val candC = cand.agg(count(lit(1)).as("cand_pairs"))
      val recC = truth.join(cand, Seq("__ida", "__idb"))
        .agg(count(lit(1)).as("pairs_recovered"))
      graft.core.Scalars.withScalars(
        graft.core.Scalars.withScalars(
          graft.core.Scalars.withScalars(truthC, fpc), candC), recC)
        .select(lit(k.toLong).as("k"), lit(w.toLong).as("window"),
          lit((k + w - 1).toLong).as("guarantee_len"), col("fp_rows"),
          col("pairs_true"), col("pairs_recovered"), col("cand_pairs"))
    }
    val tbl = rows.reduce(_ unionByName _)
      .withColumn("recall_ppm",
        when(col("pairs_true") === 0L, lit(1000000L))
          .otherwise(expr("(1000000 * pairs_recovered) div pairs_true")))
      .withColumn("eligible", col("recall_ppm") >= targetRecallPpm)
    // pick: minimal index cost among eligible, ties to smaller
    // (k, window) via the unique composite key (configs are distinct
    // and window < 1000000 in any sane call)
    val key = col("k") * lit(1000000L) + col("window")
    val mf = tbl.filter(col("eligible")).agg(min(col("fp_rows")).as("__mf"))
    val sel = graft.core.Scalars.withScalars(tbl.filter(col("eligible")), mf)
      .filter(col("fp_rows") === col("__mf"))
      .agg(min(col("k") * lit(1000000L) + col("window")).as("__mkw"))
    graft.core.Scalars.withScalars(tbl, sel)
      .withColumn("chosen", coalesce(key === col("__mkw"), lit(false)))
      .select(col("k"), col("window"), col("guarantee_len"), col("fp_rows"),
        col("pairs_true"), col("pairs_recovered"), col("recall_ppm"),
        col("cand_pairs"), col("eligible"), col("chosen"))
  }

  /** The measured table's pick as a `(k, window)` config, FAIL-LOUD
    * when no candidate met the target — the substring twin of
    * [[graft.dedup.Dedup.planBandsMeasured]]. Bounded collect: at most
    * one chosen row.
    */
  def planWinnowingMeasured(
      sample: DataFrame,
      idCol: String,
      textCol: String,
      matchLen: Int,
      configs: Seq[(Int, Int)],
      targetRecallPpm: Long): (Int, Int) = {
    val rows = winnowingMeasuredConfigTable(
      sample, idCol, textCol, matchLen, configs, targetRecallPpm)
      .filter(col("chosen"))
      .select(col("k"), col("window"))
      .collect() // bounded: at most one chosen row survives the filter
    require(rows.nonEmpty,
      s"no winnowing config in $configs reached measured recall >= " +
        s"$targetRecallPpm ppm for matchLen=$matchLen on the audit " +
        "sample - add denser configs (smaller k + window) or lower " +
        "the target")
    (rows.head.getLong(0).toInt, rows.head.getLong(1).toInt)
  }

  /** [[substringMatches]] with `(k, window)` chosen by the EMPIRICAL
    * audit: the caller states the span length they must catch, the
    * recall they need, the configs they can afford, and a bounded
    * audit sample — the corpus is then fingerprinted with the cheapest
    * config that PROVABLY met the target on the sample.
    */
  def substringMatchesMeasured(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sample: DataFrame,
      matchLen: Int,
      configs: Seq[(Int, Int)],
      targetRecallPpm: Long = 950000L,
      maxDocFreq: Long = 1000L,
      materialize: Boolean = true): DataFrame = {
    val (k, w) = planWinnowingMeasured(
      sample, idCol, textCol, matchLen, configs, targetRecallPpm)
    graft.core.Logging.log(
      graft.core.Logging.logger("graft.dedup.SubstringDedup"),
      s"substringMatchesMeasured: matchLen=$matchLen " +
        s"target=$targetRecallPpm ppm -> k=$k window=$w")
    substringMatches(df, idCol, textCol, k, w, maxDocFreq, materialize)
  }
}
