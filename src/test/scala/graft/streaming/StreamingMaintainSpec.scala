package graft.streaming

import graft.SparkSpec
import graft.dedup.{DedupIndex, SubstringDedup}
import org.apache.spark.sql.functions._

/** In-loop index maintenance for the streaming ingest sinks
  * (`maintainEvery`) — the round-15 verdict's "last open seam in the
  * index lifecycle": without it every sink appends one segment per
  * micro-batch forever and nothing inside the loop ever folds them.
  * Pins, per contract:
  *
  *   - maintenance fires at exactly the configured batch boundaries
  *     (observable in segments_pending and the generational layout)
  *     and is semantically INVISIBLE — survivors/matches identical to
  *     a maintenance-free run;
  *   - the decision is the measured advice verdict: thresholds that
  *     never fire leave the index untouched (advice `none` performs
  *     no filesystem action);
  *   - a CRASHED in-loop maintenance (simulated as the uncommitted
  *     generation it would leave) does not corrupt the index — the
  *     partial generation is invisible, ingest continues, and the
  *     next maintenance overwrites and commits it;
  *   - [[SubstringDedup.autoMaintainFingerprintIndex]] (the actuator
  *     the third family was owed) executes the advised compact and is
  *     idempotent at the fixpoint.
  */
class StreamingMaintainSpec extends SparkSpec {
  import sqlImplicits._

  private val corpusDocs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "one two three four five six seven"))
  private val block0 = Seq(
    (10L, "alpha beta gamma delta epsilon zeta"), // exact corpus dup
    (11L, "red orange yellow green blue indigo violet"))
  private val block1 = Seq(
    (20L, "red orange yellow green blue indigo"), // near-dup of 11
    (21L, "cat dog bird fish mouse horse"))
  private val block2 = Seq(
    (30L, "cat dog bird fish mouse horse"), // exact dup of 21
    (31L, "north south east west up down"))

  private def stage(root: java.nio.file.Path): Unit = {
    val blocks = Seq(block0, block1, block2)
    blocks.zipWithIndex.foreach { case (b, i) =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_smnt_blk_")
      b.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val it = java.nio.file.Files.list(tmp).iterator()
      var part: java.nio.file.Path = null
      while (it.hasNext) {
        val p = it.next()
        if (p.toString.endsWith(".parquet")) part = p
      }
      val dst = root.resolve(f"block$i%04d.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(
          1700000000000L + i * 60000L))
    }
  }

  private def mkIndex(base: String): String = {
    val indexPath = s"$base/index"
    DedupIndex.write(corpusDocs.toDF("doc_id", "text"),
      "doc_id", "text", indexPath,
      DedupIndex.Params(shingleSize = 1, numHashes = 64, bands = 16))
    indexPath
  }

  private def runSink(src: String, indexPath: String, base: String,
      ckpt: String, maintainEvery: Option[Int],
      thresholds: DedupIndex.AdviceThresholds =
        DedupIndex.AdviceThresholds(),
      maintainLease: Option[(String, Long)] = None): Unit = {
    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src)
    Streaming.dedupIngestSink(
      stream, indexPath, s"$base/survivors", ckpt,
      "doc_id", "text", threshold = 0.8,
      maintainEvery = maintainEvery, maintainThresholds = thresholds,
      maintainLease = maintainLease)
      .awaitTermination()
  }

  private def survivors(base: String): Set[Long] =
    spark.read.parquet(s"$base/survivors")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet

  private def statsMap(indexPath: String): Map[String, Long] =
    DedupIndex.stats(spark, indexPath)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("maintainEvery compacts at the configured batch boundaries, " +
    "invisibly to results") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_smnt_").toString
    val src = java.nio.file.Files.createTempDirectory("graft_smnt_src_")
    stage(src)
    val indexPath = mkIndex(base)
    // batches 0,1,2; (batchId+1) % 2 == 0 fires at batchId 1 only,
    // with maxSegments = 0 advising compact there
    runSink(src.toString, indexPath, base, s"$base/ckpt1", Some(2),
      DedupIndex.AdviceThresholds(maxSegments = 0))
    // identical survivors to DedupIngestSinkSpec's maintenance-free run
    survivors(base) shouldBe Set(11L, 21L, 31L)
    val st = statsMap(indexPath)
    // batch 0 folded in-loop at batchId 1; batch 1's OWN segment is
    // excluded from the fold (its offsets were not yet committed when
    // the maintenance ran — the replay-idempotency contract) and stays
    // pending alongside batch 2's
    st("segments_pending") shouldBe 2L
    st("exact_rows") shouldBe 5L // corpus 2 + survivors 3
    // the in-loop compact committed gen=0 (as _COMMITTED.1); batch
    // 2's append then dropped the GC'd folded entries, superseding
    // the manifest as _COMMITTED.2 — the generation stays committed
    // through the rewrite
    new java.io.File(s"$indexPath/generations/gen=0/_COMMITTED.2")
      .exists() shouldBe true
    // and the folded index still dedups correctly against new batches
    val idx = DedupIndex.read(spark, indexPath)
    DedupIndex.dedupAgainst(
      Seq((40L, "red orange yellow green blue indigo violet"),
        (41L, "totally fresh unseen document text here"))
        .toDF("doc_id", "text"),
      idx, "doc_id", "text", 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe
      Set(41L)
  }

  test("thresholds that never fire leave the index un-maintained " +
    "(advice none => no filesystem action)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_smnt_none_").toString
    val src = java.nio.file.Files.createTempDirectory("graft_smnt_src2_")
    stage(src)
    val indexPath = mkIndex(base)
    runSink(src.toString, indexPath, base, s"$base/ckpt1", Some(1),
      DedupIndex.AdviceThresholds(maxSegments = 1000, maxTombstonePct = 1000000))
    survivors(base) shouldBe Set(11L, 21L, 31L)
    statsMap(indexPath)("segments_pending") shouldBe 3L
    new java.io.File(s"$indexPath/generations").exists() shouldBe false
  }

  test("a crashed in-loop maintenance (uncommitted generation) does " +
    "not corrupt the index: ingest continues and the next " +
    "maintenance overwrites and commits it") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_smnt_crash_").toString
    val src = java.nio.file.Files.createTempDirectory("graft_smnt_src3_")
    stage(src)
    val indexPath = mkIndex(base)
    // the state a maintenance compact killed mid-write leaves: data
    // under gen=0, NO manifest — must stay invisible to every read
    Seq((999L, "garbage from a crashed compact"))
      .toDF("doc_id", "text")
      .write.parquet(s"$indexPath/generations/gen=0/exact")
    runSink(src.toString, indexPath, base, s"$base/ckpt1", Some(2),
      DedupIndex.AdviceThresholds(maxSegments = 0))
    // same results as the clean run — the partial generation never
    // served, and the in-loop compact at batch 1 overwrote + committed
    survivors(base) shouldBe Set(11L, 21L, 31L)
    val st = statsMap(indexPath)
    st("segments_pending") shouldBe 2L // batch 1 (excluded) + batch 2
    st("exact_rows") shouldBe 5L
    DedupIndex.read(spark, indexPath).exact
      .filter($"corpus_id" === 999L).count() shouldBe 0L
  }

  test("substring autoMaintain executes the advised compact and is " +
    "idempotent at the fixpoint") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_smnt_sub_").toString
    val indexPath = s"$base/index"
    SubstringDedup.writeFingerprintIndex(
      corpusDocs.toDF("doc_id", "text"), "doc_id", "text", indexPath,
      k = 8, window = 4, maxDocFreq = 50L)
    SubstringDedup.appendToFingerprintIndex(spark, indexPath,
      block0.toDF("doc_id", "text"), "doc_id", "text")
    SubstringDedup.deleteFromFingerprintIndex(indexPath,
      Seq(2L).toDF("doc_id"))
    val thresholds = DedupIndex.AdviceThresholds(
      maxSegments = 0, maxTombstonePct = 10)
    val acted = SubstringDedup.autoMaintainFingerprintIndex(
      spark, indexPath, thresholds)
    acted.select("action").head().getString(0) shouldBe "compact"
    val st = SubstringDedup.fingerprintIndexStats(spark, indexPath)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    st("segments_pending") shouldBe 0L
    st("tombstones_pending") shouldBe 0L
    st("distinct_docs") shouldBe 3L // 1, 10, 11 (2 tombstoned+folded)
    // fixpoint: the second call advises none and touches nothing
    val again = SubstringDedup.autoMaintainFingerprintIndex(
      spark, indexPath, thresholds)
    again.select("action").head().getString(0) shouldBe "none"
    again.filter(col("fired")).count() shouldBe 0L
  }

  test("substringIngestSink with maintainEvery folds segments " +
    "in-loop; matches equal the maintenance-free run") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_smnt_subsink_").toString
    val src = java.nio.file.Files.createTempDirectory("graft_smnt_src4_")
    stage(src)
    val indexPath = s"$base/index"
    SubstringDedup.writeFingerprintIndex(
      corpusDocs.toDF("doc_id", "text"), "doc_id", "text", indexPath,
      k = 8, window = 4, maxDocFreq = 50L)
    val stream = spark.readStream
      .schema(spark.read.parquet(src.toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src.toString)
    Streaming.substringIngestSink(
      stream, indexPath, s"$base/ckpt", "doc_id", "text",
      maintainEvery = Some(2),
      maintainThresholds = DedupIndex.AdviceThresholds(maxSegments = 0))
      .awaitTermination()
    val st = SubstringDedup.fingerprintIndexStats(spark, indexPath)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // batch 0 folded at batchId 1; batch 1's own segment excluded from
    // the fold (offsets uncommitted), batch 2 pending
    st("segments_pending") shouldBe 2L
    // a probe carrying doc 11's text matches the FOLDED rows (block 0
    // went through the in-loop compact) and one carrying doc 31's
    // matches the still-pending segment — base, folded and pending
    // all serve through one read path
    SubstringDedup.matchesAgainstIndex(spark, indexPath,
      Seq((100L, "red orange yellow green blue indigo violet"))
        .toDF("doc_id", "text"),
      "doc_id", "text")
      .select("corpus_id").collect().map(_.getLong(0)).toSet should
      contain(11L)
    SubstringDedup.matchesAgainstIndex(spark, indexPath,
      Seq((101L, "north south east west up down"))
        .toDF("doc_id", "text"),
      "doc_id", "text")
      .select("corpus_id").collect().map(_.getLong(0)).toSet should
      contain(31L)
  }

  test("ivfIngestSink with maintainEvery folds vector segments " +
    "in-loop at the advice verdict") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_smnt_ivf_").toString
    val indexPath = s"$base/index"
    // two fixed centroid directions, vectors hard-assigned by sign
    def vec(sign: Double, j: Int): Seq[Float] =
      Seq.tabulate(4)(i => (if (i == 0) sign else 0.02 * j * i).toFloat)
    val baseRows = (0 until 8).map(i =>
      (i.toLong, vec(if (i % 2 == 0) 1.0 else -1.0, i)))
    val built = graft.sim.Similarity.buildIvfWithCentroids(
      baseRows.toDF("vec_id", "embedding"), "vec_id", "embedding",
      Seq((0, Array(1f, 0f, 0f, 0f)), (1, Array(-1f, 0f, 0f, 0f))))
    graft.sim.Similarity.writeIvfIndex(built, indexPath)
    val src = java.nio.file.Files.createTempDirectory("graft_smnt_src5_")
    val blocks = Seq(
      (100 until 102).map(i => (i.toLong, vec(1.0, i))),
      (102 until 104).map(i => (i.toLong, vec(-1.0, i))))
    blocks.zipWithIndex.foreach { case (b, i) =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_smnt_vb_")
      b.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val it = java.nio.file.Files.list(tmp).iterator()
      var part: java.nio.file.Path = null
      while (it.hasNext) {
        val p = it.next()
        if (p.toString.endsWith(".parquet")) part = p
      }
      val dst = src.resolve(f"block$i%04d.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(
          1700000000000L + i * 60000L))
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(src.toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src.toString)
    Streaming.ivfIngestSink(
      stream, indexPath, s"$base/ckpt", "vec_id", "embedding",
      maintainEvery = Some(2),
      maintainThresholds = graft.sim.Similarity.IvfAdviceThresholds(
        maxSegments = 0, maxSegmentRowsPct = 1000000,
        maxSkewX100 = 1000000, maxDeletedPct = 1000000))
      .awaitTermination()
    val st = graft.sim.Similarity
      .ivfStats(spark, indexPath, "vec_id", "embedding")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // batch 0 folded at batchId 1; batch 1's own segment is excluded
    // from the fold (offsets uncommitted) and stays pending
    st("segments_pending") shouldBe 1L
    st("base_rows") shouldBe 10L
    st("segment_rows") shouldBe 2L
    new java.io.File(s"$indexPath/generations/gen=0/_COMMITTED.1")
      .exists() shouldBe true
  }

  test("ivfIngestSink with auditQueries heals its own recall drift: " +
    "the in-loop audit fires on measured deficit, the retrain " +
    "restores recall >= target, and the in-flight segment stays " +
    "excluded and geometrically consistent") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_smnt_audit_").toString
    val indexPath = s"$base/index"
    // IvfRecallAuditSpec's planted failure: two cosine clusters, both
    // day-0 centroids in cluster A's halfspace — B's vectors scatter
    // across cells, so a 1-probe B query misses true neighbors
    def vec(sign: Double, j: Int): Seq[Float] =
      Seq.tabulate(4)(i =>
        (if (i == 0) sign else 0.02 * ((j + i) % 5 + 1)).toFloat)
    val corpus = (0 until 16).map(i =>
      (i.toLong, vec(if (i % 2 == 0) 1.0 else -1.0, i)))
    graft.sim.Similarity.writeIvfIndex(
      graft.sim.Similarity.buildIvfWithCentroids(
        corpus.toDF("vec_id", "embedding"), "vec_id", "embedding",
        Seq((0, Array(1f, 0.3f, 0f, 0f)), (1, Array(1f, 0f, 0.3f, 0f)))),
      indexPath)
    val audit = corpus.filter(_._1 % 2 == 1).take(4)
      .map { case (id, v) => (id, v.toArray) }
    val target = 950000L
    def measured(): Long = {
      val m = graft.sim.Similarity.ivfMeasuredRecall(
        spark, indexPath, "vec_id", "embedding", audit,
        k = 6, nProbe = 1)
      m.agg(sum(col("recall_ppm"))).head.getLong(0) / audit.size
    }
    measured() should be < target // the planted failure is real
    // stage two streamed batches (one vector per cluster each)
    val src = java.nio.file.Files.createTempDirectory("graft_smnt_src6_")
    val blocks = Seq(
      Seq((100L, vec(1.0, 3)), (101L, vec(-1.0, 4))),
      Seq((102L, vec(1.0, 5)), (103L, vec(-1.0, 6))))
    blocks.zipWithIndex.foreach { case (b, i) =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_smnt_ab_")
      b.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val it = java.nio.file.Files.list(tmp).iterator()
      var part: java.nio.file.Path = null
      while (it.hasNext) {
        val p = it.next()
        if (p.toString.endsWith(".parquet")) part = p
      }
      val dst = src.resolve(f"block$i%04d.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(
          1700000000000L + i * 60000L))
    }
    val stream = spark.readStream
      .schema(spark.read.parquet(src.toString).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src.toString)
    graft.streaming.Streaming.ivfIngestSink(
      stream, indexPath, s"$base/ckpt", "vec_id", "embedding",
      maintainEvery = Some(2),
      maintainThresholds = graft.sim.Similarity.IvfAdviceThresholds(
        maxSegments = 1000, maxSegmentRowsPct = 1000000,
        maxSkewX100 = 1000000, maxDeletedPct = 1000000),
      auditQueries = audit, auditK = 6, auditNProbe = 1,
      auditTargetPpm = target)
      .awaitTermination()
    // the retrain committed a generation carrying its centroid table
    new java.io.File(s"$indexPath/generations/gen=0/centroids")
      .exists() shouldBe true
    // the stream healed itself: measured recall back at/above target
    measured() should be >= target
    // the in-flight batch-1 segment stayed excluded from the fold and
    // was re-assigned in place under the new centroids
    val st = graft.sim.Similarity
      .ivfStats(spark, indexPath, "vec_id", "embedding")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    st("segments_pending") shouldBe 1L
    st("segment_rows") shouldBe 2L
    st("base_rows") shouldBe 18L // 16 base + batch 0
    val cents = graft.sim.Similarity.readIvfCentroids(spark, indexPath)
    val idx = graft.sim.Similarity.readIvfIndex(
      spark, indexPath, "vec_id", "embedding")
    val stored = idx.assigned.select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expect = graft.sim.Similarity.buildIvfWithCentroids(
      idx.assigned.drop("cell"), "vec_id", "embedding", cents)
      .assigned.select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    stored shouldBe expect
  }

  test("maintainLease coordinates with an external writer: contended " +
    "boundaries SKIP maintenance without failing the stream, free " +
    "boundaries maintain, results identical") {
    // case A: an external maintenance job (a cron compactor) holds a
    // live lease for the whole run — every boundary skips, the stream
    // completes, nothing folds, and the external lease is untouched
    val baseA = java.nio.file.Files
      .createTempDirectory("graft_smnt_leaseA_").toString
    val srcA = java.nio.file.Files.createTempDirectory("graft_smnt_lsrcA_")
    stage(srcA)
    val idxA = mkIndex(baseA)
    val farFuture = System.currentTimeMillis() + 3600000L
    java.nio.file.Files.write(
      java.nio.file.Paths.get(idxA, "_WRITE_LEASE"),
      s"cron\texternal-token\t$farFuture"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    runSink(srcA.toString, idxA, baseA, s"$baseA/ckpt", Some(1),
      DedupIndex.AdviceThresholds(maxSegments = 0),
      maintainLease = Some(("stream", 60000L)))
    val stA = statsMap(idxA)
    stA("segments_pending") shouldBe 3L // nothing folded: every boundary skipped
    new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(idxA, "_WRITE_LEASE")),
      java.nio.charset.StandardCharsets.UTF_8) should
      include("external-token") // the cron's lease survived untouched

    // case B: same run with the lease free — boundaries maintain
    // under the lease and release it; only the in-flight final batch
    // stays pending, and survivors are identical to case A
    val baseB = java.nio.file.Files
      .createTempDirectory("graft_smnt_leaseB_").toString
    val srcB = java.nio.file.Files.createTempDirectory("graft_smnt_lsrcB_")
    stage(srcB)
    val idxB = mkIndex(baseB)
    runSink(srcB.toString, idxB, baseB, s"$baseB/ckpt", Some(1),
      DedupIndex.AdviceThresholds(maxSegments = 0),
      maintainLease = Some(("stream", 60000L)))
    val stB = statsMap(idxB)
    stB("segments_pending") shouldBe 1L // folded in-loop; final batch in flight
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(idxB, "_WRITE_LEASE")) shouldBe false
    survivors(baseA) shouldBe survivors(baseB)
  }
}
