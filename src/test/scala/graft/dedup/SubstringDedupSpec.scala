package graft.dedup

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.WinnowingFingerprints

class SubstringDedupSpec extends SparkSpec {
  import sqlImplicits._

  private def rand(rng: Random, n: Int): String =
    (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString

  test("winnowKeys carries correct byte positions for each fingerprint") {
    val rng = new Random(11)
    val texts = (0 until 40).map(_ => rand(rng, rng.nextInt(150))) ++
      Seq("", "abc", "a" * 40)
    texts.foreach { t =>
      val bytes = t.getBytes("UTF-8")
      val keys = WinnowingFingerprints.winnowKeys(bytes, 16, 16)
      keys.map(_ >>> 32).toSeq shouldBe
        WinnowingFingerprints.winnow(bytes, 16, 16).toSeq
      keys.foreach { key =>
        val hash = key >>> 32
        val pos = (key & 0xFFFFFFFFL).toInt
        // the hash really is the Karp-Rabin hash of the k-gram at pos
        val P = (1L << 31) - 1
        val expect = (pos until pos + 16)
          .foldLeft(0L)((h, j) => (h * 257 + (bytes(j) & 0xFF)) % P)
        hash shouldBe expect
      }
      // selection positions strictly increase
      val poss = keys.map(k => (k & 0xFFFFFFFFL).toInt).toSeq
      poss shouldBe poss.sorted
      poss.distinct.size shouldBe poss.size
    }
  }

  test("a planted shared substring >= window + k - 1 bytes is found") {
    val rng = new Random(23)
    val common = rand(rng, 31) // k + window - 1 with k = window = 16
    val docs = Seq(
      (0L, rand(rng, 60) + common + rand(rng, 60)),
      (1L, rand(rng, 40) + common + rand(rng, 80)),
      (2L, rand(rng, 120))) // unrelated
      .toDF("doc_id", "text")
    val got = SubstringDedup.substringMatches(
      docs, "doc_id", "text", k = 16, window = 16, maxDocFreq = 10)
      .collect()
    got should not be empty
    got.map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe Set((0L, 1L))
    // every reported snippet is a true shared substring of both texts
    got.foreach { r =>
      val snippet = r.getString(4)
      snippet.length shouldBe 16
      common should include(snippet)
    }
  }

  test("snippet verification anchors positions to real content") {
    val rng = new Random(31)
    val common = rand(rng, 40)
    val a = rand(rng, 50) + common + rand(rng, 10)
    val b = common + rand(rng, 90)
    val docs = Seq((0L, a), (1L, b)).toDF("doc_id", "text")
    val got = SubstringDedup.substringMatches(
      docs, "doc_id", "text", k = 16, window = 16, maxDocFreq = 10)
      .collect()
    got should not be empty
    got.foreach { r =>
      val posA = r.getInt(2)
      val posB = r.getInt(3)
      val snippet = r.getString(4)
      a.substring(posA, posA + 16) shouldBe snippet
      b.substring(posB, posB + 16) shouldBe snippet
    }
  }

  test("substrings shorter than k are never reported") {
    val rng = new Random(37)
    val common = rand(rng, 10) // < k = 16
    val docs = Seq(
      (0L, rand(rng, 80) + common + rand(rng, 80)),
      (1L, rand(rng, 80) + common + rand(rng, 80)))
      .toDF("doc_id", "text")
    SubstringDedup.substringMatches(
      docs, "doc_id", "text", k = 16, window = 16, maxDocFreq = 10)
      .collect() shouldBe empty
  }

  test("the document-frequency cap drops boilerplate fingerprints") {
    val rng = new Random(41)
    val boiler = rand(rng, 50)
    // the same boilerplate in 6 documents
    val docs = (0L until 6L).map(i => (i, rand(rng, 30) + boiler + rand(rng, 30)))
      .toDF("doc_id", "text")
    val uncapped = SubstringDedup.substringMatches(
      docs, "doc_id", "text", k = 16, window = 16, maxDocFreq = 100)
    val capped = SubstringDedup.substringMatches(
      docs, "doc_id", "text", k = 16, window = 16, maxDocFreq = 3)
    val nUncapped = uncapped.count()
    val nCapped = capped.count()
    nUncapped should be > 0L
    // interior boilerplate fingerprints (selected in all 6 docs) are
    // dropped; only boundary-window selections — whose winnowing choice
    // depends on the differing flanks, so df stays under the cap — may
    // survive. The cap must do real work: 6 docs of shared boilerplate
    // produce 15 pairs per interior fingerprint.
    nCapped should be < nUncapped
  }

  test("sharedSubstringPairs feeds keepCanonical") {
    val rng = new Random(43)
    val common = rand(rng, 40)
    val docs = Seq(
      (0L, rand(rng, 50) + common),
      (1L, common + rand(rng, 50)),
      (2L, rand(rng, 100)))
      .toDF("doc_id", "text")
    val pairs = SubstringDedup.sharedSubstringPairs(
      docs, "doc_id", "text", k = 16, window = 16, maxDocFreq = 10)
    val kept = Components.keepCanonical(docs, "doc_id", pairs,
      aCol = "id_a", bCol = "id_b")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    kept shouldBe Set(0L, 2L)
  }

  test("spans merge diagonal matches into one exact shared substring") {
    val rng = new Random(47)
    val common = rand(rng, 120) // long shared span -> several fingerprints
    val a = rand(rng, 70) + common + rand(rng, 30)
    val b = rand(rng, 20) + common + rand(rng, 60)
    val docs = Seq((0L, a), (1L, b)).toDF("doc_id", "text")
    val spans = SubstringDedup.substringSpans(
      docs, "doc_id", "text", k = 16, window = 16, maxDocFreq = 10)
      .collect()
    spans should not be empty
    // every span is an exact shared substring of both documents
    spans.foreach { r =>
      val (sa, sb, len) = (r.getInt(2), r.getInt(3), r.getInt(4))
      len should be >= 16
      a.substring(sa, sa + len) shouldBe b.substring(sb, sb + len)
    }
    // the dominant span covers most of the planted common region
    spans.map(_.getInt(4)).max should be >= 60
    // and several fingerprints merged into it
    spans.map(_.getLong(5)).max should be >= 2L
  }

  test("two separated shared substrings produce two spans") {
    val rng = new Random(53)
    val c1 = rand(rng, 40)
    val c2 = rand(rng, 40)
    val a = c1 + rand(rng, 100) + c2
    val b = rand(rng, 50) + c1 + rand(rng, 200) + c2 + rand(rng, 10)
    val docs = Seq((0L, a), (1L, b)).toDF("doc_id", "text")
    val spans = SubstringDedup.substringSpans(
      docs, "doc_id", "text", k = 16, window = 16, maxDocFreq = 10)
      .collect()
    spans.length should be >= 2
    spans.foreach { r =>
      val (sa, sb, len) = (r.getInt(2), r.getInt(3), r.getInt(4))
      a.substring(sa, sa + len) shouldBe b.substring(sb, sb + len)
    }
  }

  test("span merging rejects window > k (gap bytes would be unverified)") {
    val docs = Seq((0L, "x" * 100)).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      SubstringDedup.substringSpans(
        docs, "doc_id", "text", k = 8, window = 16)
    }
  }

  test("dedupAgainst removes exact and near corpus duplicates only") {
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "The quick  brown fox jumps over the LAZY dog"), // exact after normalize
      (11L, "alpha beta gamma delta epsilon zeta eta"), // near (jaccard 6/7)
      (12L, "completely different content here entirely")) // survivor
      .toDF("doc_id", "text")
    val kept = Dedup.dedupAgainst(batch, corpus, "doc_id", "text",
      shingleSize = 1, threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    kept shouldBe Set(12L)
    // higher threshold keeps the near-but-not-exact doc
    val keptStrict = Dedup.dedupAgainst(batch, corpus, "doc_id", "text",
      shingleSize = 1, threshold = 0.99)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    keptStrict shouldBe Set(11L, 12L)
  }

  test("nearDuplicatesAgainst pairs batch with corpus, never corpus with itself") {
    val corpus = Seq(
      (0L, "one two three four"),
      (1L, "one two three four")). // corpus-internal dup must NOT pair
      toDF("doc_id", "text")
    val batch = Seq((10L, "one two three four")).toDF("doc_id", "text")
    val got = Dedup.nearDuplicatesAgainst(batch, corpus, "doc_id", "text",
      shingleSize = 1, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got shouldBe Set((10L, 0L), (10L, 1L))
    // materialize = false: fully lazy (no persist, no checkpoint —
    // the fault-tolerant mode), identical results
    val lazyGot = Dedup.nearDuplicatesAgainst(batch, corpus, "doc_id", "text",
      shingleSize = 1, threshold = 0.9, materialize = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    lazyGot shouldBe got
  }

  test("dedupAgainst matches a brute-force reference on random corpora") {
    // unigram shingles: banded MinHash recall is complete at the q50
    // regime, so survivors must EQUAL the exact cross-Jaccard answer
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    val rng = new scala.util.Random(13)
    def doc(): String =
      Seq.fill(3 + rng.nextInt(6))(words(rng.nextInt(words.size))).mkString(" ")
    for (_ <- 1 to 3) {
      val corpus = (0L until 15L).map(i => (i, doc()))
      val batch = (100L until 115L).map { i =>
        // some batch docs are exact or near copies of corpus docs
        rng.nextInt(3) match {
          case 0 => (i, corpus(rng.nextInt(corpus.size))._2)
          case 1 => (i, corpus(rng.nextInt(corpus.size))._2 + " omega")
          case _ => (i, doc())
        }
      }
      val kept = Dedup.dedupAgainst(
        batch.toDF("doc_id", "text"), corpus.toDF("doc_id", "text"),
        "doc_id", "text",
        shingleSize = 1, numHashes = 64, bands = 16, threshold = 0.9)
        .select("doc_id").collect().map(_.getLong(0)).toSet

      def toks(s: String) = s.toLowerCase.trim.split("\\s+").toSet
      val expect = batch.filter { case (_, t) =>
        val bt = toks(t)
        !corpus.exists { case (_, c) =>
          val ct = toks(c)
          val norm = (x: String) => x.toLowerCase.trim.replaceAll("\\s+", " ")
          norm(c) == norm(t) ||
            bt.intersect(ct).size.toDouble / bt.union(ct).size >= 0.9
        }
      }.map(_._1).toSet
      kept shouldBe expect
    }
  }

  test("fingerprint keys run under forced codegen") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val got = Seq("the quick brown fox jumps over the lazy dog", "")
        .toDF("text")
        .select(WinnowingFingerprints
          .winnowingFingerprintKeys(col("text"), 16, 16).as("keys"))
        .collect().map(_.getSeq[Long](0))
      got(0) should not be empty
      got(1) shouldBe empty
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("index path equals the direct batch-x-corpus fingerprint join") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated corpus document content here now"))
      .toDF("id", "text")
    val batch = Seq(
      (10L, "prefix text then the quick brown fox jumps over the lazy dog tonight suffix"),
      (11L, "nothing shared with anything at all in this one truly"))
      .toDF("id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("substr_idx_").toString
    SubstringDedup.writeFingerprintIndex(
      corpus, "id", "text", path, k = 8, window = 8, maxDocFreq = 10L)
    val viaIndex = SubstringDedup.matchesAgainstIndex(
      spark, path, batch, "id", "text")
      .select($"batch_id", $"corpus_id", $"pos_b", $"pos_c", $"snippet")
      .collect().toSet
    // direct form: fingerprints of each side, capped per side, joined
    val cfp = SubstringDedup.fingerprints(corpus, "id", "text", 8, 8)
    val bfp = SubstringDedup.fingerprints(batch, "id", "text", 8, 8)
    val direct = bfp.select($"id".as("batch_id"), $"hash",
        $"pos".as("pos_b"), $"snippet")
      .join(cfp.select($"id".as("corpus_id"), $"hash",
        $"pos".as("pos_c"), $"snippet".as("__sc")),
        Seq("hash"))
      .filter($"snippet" === $"__sc")
      .select($"batch_id", $"corpus_id", $"pos_b", $"pos_c", $"snippet")
      .collect().toSet
    viaIndex shouldBe direct
    viaIndex.map(_.getLong(0)) shouldBe Set(10L) // doc 11 matches nothing
    viaIndex.map(_.getLong(1)) shouldBe Set(1L) // only the shared span doc
  }

  test("the index caps hot corpus hashes at write time") {
    // the same boilerplate line in 3 corpus docs; cap at 2 drops it
    val boiler = "this exact boilerplate sentence repeats everywhere"
    val corpus = (1L to 3L).map(i => (i, s"$boiler unique$i")).toDF("id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("substr_idx_cap_").toString
    SubstringDedup.writeFingerprintIndex(
      corpus, "id", "text", path, k = 8, window = 8, maxDocFreq = 2L)
    val batch = Seq((9L, boiler)).toDF("id", "text")
    SubstringDedup.matchesAgainstIndex(spark, path, batch, "id", "text")
      .count() shouldBe 0L // boilerplate hashes never reached the index
  }

  test("queries cannot drift from the build (meta pins parameters)") {
    val corpus = Seq((1L, "abcdefghijklmnopqrstuvwxyz and then some more"))
      .toDF("id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("substr_idx_meta_").toString
    SubstringDedup.writeFingerprintIndex(
      corpus, "id", "text", path, k = 12, window = 6)
    // a batch probed through the index uses the STORED k/window: the
    // emitted snippets are k=12 bytes even though the caller never
    // restates the parameters
    val got = SubstringDedup.matchesAgainstIndex(
      spark, path, Seq((2L, "abcdefghijklmnopqrstuvwxyz tail")).toDF("id", "text"),
      "id", "text")
      .select(org.apache.spark.sql.functions.length($"snippet")).distinct().as[Int].collect()
    got.toSeq shouldBe Seq(12)
  }

  test("append + compact: segment growth serves and compaction re-caps") {
    val corpus = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("substr_idx_lsm_").toString
    SubstringDedup.writeFingerprintIndex(
      corpus, "id", "text", path, k = 8, window = 8, maxDocFreq = 10L)
    // grow: a second corpus generation sharing a span with the batch
    val gen2 = Seq((2L, "an entirely new second generation document text"))
      .toDF("id", "text")
    SubstringDedup.appendToFingerprintIndex(spark, path, gen2, "id", "text")
    val batch = Seq((9L, "prefix new second generation document suffix"))
      .toDF("id", "text")
    val beforeCompact = SubstringDedup.matchesAgainstIndex(
      spark, path, batch, "id", "text")
    beforeCompact.select($"corpus_id").distinct()
      .as[Long].collect().toSeq shouldBe Seq(2L) // the segment serves
    // compaction is invisible in results
    SubstringDedup.compactFingerprintIndex(spark, path)
    val afterCompact = SubstringDedup.matchesAgainstIndex(
      spark, path, batch, "id", "text")
    afterCompact.collect().toSet shouldBe beforeCompact.collect().toSet
    // and the segments directory is gone (single base again)
    new java.io.File(s"$path/segments").exists() shouldBe false
  }

  test("tombstone lifecycle: delete masks at read, fence refuses " +
    "re-ingest, purge/compact unlock, answers equal rebuild-without-" +
    "deleted when caps never bind") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "a second corpus document sharing nothing with others"),
      (3L, "third document with its own completely distinct span"))
      .toDF("id", "text")
    val batch = Seq(
      (10L, "prefix the quick brown fox jumps over the lazy dog tonight x"),
      (11L, "also a second corpus document sharing nothing with others y"))
      .toDF("id", "text")
    def build(c: org.apache.spark.sql.DataFrame): String = {
      val p = java.nio.file.Files
        .createTempDirectory("substr_idx_del_").toString
      SubstringDedup.writeFingerprintIndex(
        c, "id", "text", p, k = 8, window = 8, maxDocFreq = 10L)
      p
    }
    def matches(p: String) = SubstringDedup.matchesAgainstIndex(
      spark, p, batch, "id", "text")
      .select($"batch_id", $"corpus_id", $"pos_b", $"pos_c", $"snippet")
      .collect().toSet

    val path = build(corpus)
    val rebuilt = build(corpus.filter($"id" =!= 1L))
    // delete doc 1: served matches equal the rebuild without it
    SubstringDedup.deleteFromFingerprintIndex(path, Seq(1L).toDF("id"))
    matches(path) shouldBe matches(rebuilt)
    matches(path).map(_.getLong(1)) should not contain 1L
    // the fence refuses re-ingesting the tombstoned id...
    val err = intercept[IllegalArgumentException] {
      SubstringDedup.appendToFingerprintIndex(spark, path,
        corpus.filter($"id" === 1L), "id", "text")
    }
    err.getMessage should include("tombstoned")
    // ...but fresh ids still append with deletes pending
    SubstringDedup.appendToFingerprintIndex(spark, path,
      Seq((4L, "a fresh fourth generation document lands fine")).toDF("id", "text"),
      "id", "text")
    // targeted purge clears the tombstone and the append succeeds;
    // the re-licensed doc serves again
    SubstringDedup.purgeFingerprintIndex(spark, path, Seq(1L).toDF("id"))
    new java.io.File(s"$path/tombstones").exists() shouldBe false
    SubstringDedup.appendToFingerprintIndex(spark, path,
      corpus.filter($"id" === 1L), "id", "text")
    matches(path) shouldBe matches(build(corpus.unionByName(
      Seq((4L, "a fresh fourth generation document lands fine"))
        .toDF("id", "text"))))
    // stats read out the maintenance state exactly
    val s1 = SubstringDedup.fingerprintIndexStats(spark, path)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    s1("segments_pending") shouldBe 2L // fresh doc 4 + re-licensed doc 1
    s1("tombstones_pending") shouldBe 0L
    s1("distinct_docs") shouldBe 4L
    // delete again and let COMPACT fold the purge physically
    SubstringDedup.deleteFromFingerprintIndex(path, Seq(2L).toDF("id"))
    val s2 = SubstringDedup.fingerprintIndexStats(spark, path)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    s2("tombstones_pending") shouldBe 1L
    s2("distinct_docs") shouldBe 3L // live view excludes the pending delete
    SubstringDedup.compactFingerprintIndex(spark, path)
    new java.io.File(s"$path/tombstones").exists() shouldBe false
    new java.io.File(s"$path/segments").exists() shouldBe false
    matches(path).map(_.getLong(1)) should not contain 2L
    // physically gone, not just masked — read the SERVED base table
    // (the committed generation after the compact upgraded the tree)
    def servedFp() = spark.read.parquet(
      s"${SubstringDedup.servedBaseDir(spark, path)}/fingerprints")
    servedFp().filter($"corpus_id" === 2L).count() shouldBe 0L
    // purge of a non-tombstoned id is a no-op (never deletes live rows)
    val before = servedFp().count()
    SubstringDedup.deleteFromFingerprintIndex(path, Seq(3L).toDF("id"))
    SubstringDedup.purgeFingerprintIndex(spark, path, Seq(1L).toDF("id"))
    servedFp().count() shouldBe before
    // the compact_pending marker gates reads with documented recovery
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(new org.apache.hadoop.fs.Path(s"$path/compact_pending"),
      true).close()
    intercept[IllegalArgumentException] { matches(path) }
      .getMessage should include("mid-compaction")
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/compact_pending"), false)
    matches(path).map(_.getLong(1)) should not contain 3L // tombstone still pending
  }

  test("compaction enforces the GLOBAL df cap across segments") {
    val boiler = "shared boilerplate sentence across generations"
    val path = java.nio.file.Files
      .createTempDirectory("substr_idx_recap_").toString
    // cap 2: each generation holds 2 docs with the boilerplate -> each
    // segment passes its per-segment cap, but globally df = 4 > 2
    SubstringDedup.writeFingerprintIndex(
      Seq((1L, s"$boiler one"), (2L, s"$boiler two")).toDF("id", "text"),
      "id", "text", path, k = 8, window = 8, maxDocFreq = 2L)
    SubstringDedup.appendToFingerprintIndex(spark, path,
      Seq((3L, s"$boiler three"), (4L, s"$boiler four")).toDF("id", "text"),
      "id", "text")
    val batch = Seq((9L, boiler)).toDF("id", "text")
    SubstringDedup.matchesAgainstIndex(spark, path, batch, "id", "text")
      .count() should be > 0L // pre-compact: per-segment caps both passed
    SubstringDedup.compactFingerprintIndex(spark, path)
    SubstringDedup.matchesAgainstIndex(spark, path, batch, "id", "text")
      .count() shouldBe 0L // global re-cap dropped the hot hashes
  }

  test("fingerprintIndexMaintenanceAdvice folds stats into " +
    "compact/none with exact strict-inequality edges") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "a second corpus document sharing nothing with others"),
      (3L, "third document with its own completely distinct span"))
      .toDF("id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("substr_idx_advice_").toString
    SubstringDedup.writeFingerprintIndex(
      corpus, "id", "text", path, k = 8, window = 8, maxDocFreq = 10L)
    def verdict(th: DedupIndex.AdviceThresholds): String =
      SubstringDedup.fingerprintIndexMaintenanceAdvice(spark, path, th)
        .select("advice").head.getString(0)
    def firedRules(th: DedupIndex.AdviceThresholds): Set[String] =
      SubstringDedup.fingerprintIndexMaintenanceAdvice(spark, path, th)
        .filter(col("fired")).select("rule")
        .collect().map(_.getString(0)).toSet

    verdict(DedupIndex.AdviceThresholds()) shouldBe "none"

    // segment debt, strict edge
    SubstringDedup.appendToFingerprintIndex(spark, path,
      Seq((4L, "a freshly appended fourth document lands here fine"))
        .toDF("id", "text"), "id", "text")
    verdict(DedupIndex.AdviceThresholds(maxSegments = 0)) shouldBe "compact"
    firedRules(DedupIndex.AdviceThresholds(maxSegments = 0)) shouldBe
      Set("segments")
    verdict(DedupIndex.AdviceThresholds(maxSegments = 1)) shouldBe "none"

    // tombstone mass vs distinct served docs, strict edge
    SubstringDedup.deleteFromFingerprintIndex(path, Seq(1L).toDF("id"))
    val st = SubstringDedup.fingerprintIndexStats(spark, path)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    st("tombstones_pending") shouldBe 1L
    st("distinct_docs") shouldBe 3L // 2, 3, 4 — doc 1 masked
    val obs = 100L * st("tombstones_pending")
    val pNoFire = (obs + st("distinct_docs") - 1) / st("distinct_docs")
    verdict(DedupIndex.AdviceThresholds(maxSegments = 100,
      maxTombstonePct = pNoFire - 1)) shouldBe "compact"
    firedRules(DedupIndex.AdviceThresholds(maxSegments = 100,
      maxTombstonePct = pNoFire - 1)) shouldBe Set("tombstone_mass")
    verdict(DedupIndex.AdviceThresholds(maxSegments = 100,
      maxTombstonePct = pNoFire)) shouldBe "none"

    // acting on the advice clears every trigger
    SubstringDedup.compactFingerprintIndex(spark, path)
    verdict(DedupIndex.AdviceThresholds(maxSegments = 0,
      maxTombstonePct = 0)) shouldBe "none"
  }

  test("crashed tombstone swap fails loud; purge refuses a " +
    "mid-compaction index") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "a second corpus document sharing nothing with others"))
      .toDF("id", "text")
    val batch = Seq(
      (10L, "prefix the quick brown fox jumps over the lazy dog tonight x"))
      .toDF("id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("substr_idx_tswap_").toString
    SubstringDedup.writeFingerprintIndex(
      corpus, "id", "text", path, k = 8, window = 8, maxDocFreq = 10L)
    SubstringDedup.deleteFromFingerprintIndex(path, Seq(1L).toDF("id"))
    val live = new java.io.File(s"$path/tombstones")
    val aside = new java.io.File(s"$path/tombstones_old")

    // crash between the purge swap's two renames: only the aside copy
    // survives. Absence must not read as "no pending deletes" — doc 1
    // would silently serve again.
    live.renameTo(aside) shouldBe true
    intercept[IllegalArgumentException] {
      SubstringDedup.matchesAgainstIndex(spark, path, batch, "id", "text")
    }.getMessage should include("tombstones_old")
    intercept[IllegalArgumentException] {
      SubstringDedup.appendToFingerprintIndex(spark, path,
        corpus.filter($"id" === 1L), "id", "text")
    }
    // recovery: rename back; the takedown masks again
    aside.renameTo(live) shouldBe true
    SubstringDedup.matchesAgainstIndex(spark, path, batch, "id", "text")
      .select($"corpus_id").collect().map(_.getLong(0)) should not contain 1L

    // swap-finished-cleanup-crashed (both dirs) is benign, and the
    // next full purge clears the leftover aside copy with the live one
    Seq(9L).toDF("corpus_id").write.parquet(aside.toString)
    SubstringDedup.fingerprintIndexStats(spark, path)
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .toMap.apply("tombstones_pending") shouldBe 1L
    SubstringDedup.purgeFingerprintIndex(spark, path, Seq(1L).toDF("id"))
    live.exists() shouldBe false
    aside.exists() shouldBe false // no spurious crashed-swap state left

    // purge is fenced off a mid-compaction tree like every reader
    SubstringDedup.deleteFromFingerprintIndex(path, Seq(2L).toDF("id"))
    val marker = new java.io.File(s"$path/compact_pending")
    marker.createNewFile() shouldBe true
    intercept[IllegalArgumentException] {
      SubstringDedup.purgeFingerprintIndex(spark, path, Seq(2L).toDF("id"))
    }.getMessage should include("compact_pending")
    marker.delete() shouldBe true
    SubstringDedup.purgeFingerprintIndex(spark, path, Seq(2L).toDF("id"))
    live.exists() shouldBe false
  }
}
