package graft.dedup

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Generation-pointer compaction for the MinHash-dedup and
  * substring-fingerprint index families (round 15 — the
  * [[graft.core.Generations]] discipline the IVF family pioneered):
  * multi-table compacts commit atomically, readers racing one
  * compaction keep a consistent view, uncommitted generations are
  * invisible, stale folded names free up on append.
  */
class DedupGenerationSpec extends SparkSpec {
  import sqlImplicits._

  private val corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta"),
    (2L, "one two three four five six seven"),
    (3L, "red orange yellow green blue indigo"))
  private val params = DedupIndex.Params(
    shingleSize = 1, numHashes = 64, bands = 16)

  private def mkIndex(): String = {
    val path = Files.createTempDirectory("dedup_gen_").toString
    DedupIndex.write(corpus.toDF("doc_id", "text"),
      "doc_id", "text", path, params)
    DedupIndex.appendSegment(spark, path,
      Seq((10L, "cat dog bird fish mouse horse")).toDF("doc_id", "text"),
      "doc_id", "text")
    path
  }

  private def servedIds(path: String): Set[Long] =
    DedupIndex.read(spark, path).exact
      .select("corpus_id").collect().map(_.getLong(0)).toSet

  test("dedup-index compact commits a generation: all three tables " +
    "plus the tombstone fold become visible atomically; grace copy " +
    "and GC follow the shared rule") {
    val path = mkIndex()
    DedupIndex.delete(path, Seq(2L).toDF("doc_id"))
    val want = Set(1L, 3L, 10L)
    servedIds(path) shouldBe want

    DedupIndex.compact(spark, path)
    new java.io.File(s"$path/generations/gen=0/_COMMITTED.1")
      .exists() shouldBe true
    DedupIndex.servedBaseDir(spark, path) shouldBe
      s"$path/generations/gen=0"
    // folded segment GC'd eagerly, tombstones cleared, legacy tables
    // survive one compaction as the grace copy
    new java.io.File(s"$path/segments").exists() shouldBe false
    new java.io.File(s"$path/tombstones").exists() shouldBe false
    new java.io.File(s"$path/exact").exists() shouldBe true
    servedIds(path) shouldBe want
    // the tombstoned doc is physically gone from the served tables
    spark.read.parquet(s"${DedupIndex.servedBaseDir(spark, path)}/exact")
      .filter($"corpus_id" === 2L).count() shouldBe 0L

    // second compact (new segment forces work): legacy tables GC'd,
    // gen=0 becomes the grace copy
    DedupIndex.appendSegment(spark, path,
      Seq((11L, "north south east west up down")).toDF("doc_id", "text"),
      "doc_id", "text")
    DedupIndex.compact(spark, path)
    DedupIndex.servedBaseDir(spark, path) shouldBe
      s"$path/generations/gen=1"
    new java.io.File(s"$path/exact").exists() shouldBe false
    new java.io.File(s"$path/generations/gen=0").exists() shouldBe true
    servedIds(path) shouldBe (want + 11L)
    // meta stays at the root and keeps serving parameters
    DedupIndex.read(spark, path).params shouldBe params
  }

  test("a reader that resolved before the compact keeps a consistent " +
    "view; an uncommitted generation is invisible") {
    val path = mkIndex()
    DedupIndex.compact(spark, path) // upgrade to generational (gen=0)
    val preResolved = DedupIndex.read(spark, path).exact
    // a crashed compact: gen=1 with data but no manifest — invisible
    val partial = new java.io.File(s"$path/generations/gen=1/exact")
    partial.mkdirs() shouldBe true
    DedupIndex.servedBaseDir(spark, path) shouldBe
      s"$path/generations/gen=0"
    // a real compact overwrites the partial gen and commits it
    DedupIndex.appendSegment(spark, path,
      Seq((20L, "kappa lambda mu nu xi omicron")).toDF("doc_id", "text"),
      "doc_id", "text")
    DedupIndex.compact(spark, path)
    DedupIndex.servedBaseDir(spark, path) shouldBe
      s"$path/generations/gen=1"
    // the pre-resolved reader still executes against its grace copy
    preResolved.select("corpus_id").collect()
      .map(_.getLong(0)).toSet shouldBe Set(1L, 2L, 3L, 10L)
    servedIds(path) shouldBe Set(1L, 2L, 3L, 10L, 20L)
  }

  test("a replay-named segment reusing a folded name is not silently " +
    "excluded after its GC (stale manifest cleanup on append)") {
    val path = Files.createTempDirectory("dedup_gen_name_").toString
    DedupIndex.write(corpus.toDF("doc_id", "text"),
      "doc_id", "text", path, params)
    DedupIndex.appendSegment(spark, path,
      Seq((10L, "cat dog bird fish mouse horse")).toDF("doc_id", "text"),
      "doc_id", "text", Some("seg_b00000"))
    DedupIndex.compact(spark, path) // folds + GCs seg_b00000
    DedupIndex.appendSegment(spark, path,
      Seq((30L, "totally fresh streamed content here"))
        .toDF("doc_id", "text"),
      "doc_id", "text", Some("seg_b00000")) // fresh-checkpoint reuse
    servedIds(path) shouldBe Set(1L, 2L, 3L, 10L, 30L)
    DedupIndex.compact(spark, path)
    servedIds(path) shouldBe Set(1L, 2L, 3L, 10L, 30L)
  }

  test("substring-index compact commits generationally with the same " +
    "contract, and purge operates on the served generation") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      // no >= 8-byte substring shared with either batch doc (k = 8)
      (2L, "zz qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg hh"))
      .toDF("id", "text")
    val path = Files.createTempDirectory("substr_gen_").toString
    SubstringDedup.writeFingerprintIndex(
      docs, "id", "text", path, k = 8, window = 8, maxDocFreq = 10L)
    SubstringDedup.appendToFingerprintIndex(spark, path,
      Seq((3L, "third generation document with its own novel span"))
        .toDF("id", "text"), "id", "text")
    val batch = Seq(
      (90L, "xx the quick brown fox jumps over the lazy dog tonight"),
      (91L, "xx third generation document with its own novel span"))
      .toDF("id", "text")
    def matchedCorpus(): Set[Long] =
      SubstringDedup.matchesAgainstIndex(spark, path, batch, "id", "text")
        .select("corpus_id").collect().map(_.getLong(0)).toSet
    matchedCorpus() shouldBe Set(1L, 3L)

    SubstringDedup.compactFingerprintIndex(spark, path)
    new java.io.File(s"$path/generations/gen=0/_COMMITTED.1")
      .exists() shouldBe true
    SubstringDedup.servedBaseDir(spark, path) shouldBe
      s"$path/generations/gen=0"
    new java.io.File(s"$path/segments").exists() shouldBe false
    new java.io.File(s"$path/fingerprints").exists() shouldBe true // grace
    matchedCorpus() shouldBe Set(1L, 3L)

    // delete doc 1, purge it: the SERVED generation's table rewrites
    SubstringDedup.deleteFromFingerprintIndex(path, Seq(1L).toDF("id"))
    SubstringDedup.purgeFingerprintIndex(spark, path, Seq(1L).toDF("id"))
    matchedCorpus() shouldBe Set(3L)
    spark.read.parquet(
      s"${SubstringDedup.servedBaseDir(spark, path)}/fingerprints")
      .filter($"corpus_id" === 1L).count() shouldBe 0L
    // stats resolve the generation
    SubstringDedup.fingerprintIndexStats(spark, path)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      .apply("segments_pending") shouldBe 0L
  }
}
