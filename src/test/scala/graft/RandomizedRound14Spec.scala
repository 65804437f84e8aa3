package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.dedup.{DedupIndex, LshPlan, SubstringDedup}
import graft.sim.Similarity

/** Randomized cross-checks for the round-14 operators — the
  * [[RandomizedRound13Spec]] discipline: each new code path is
  * compared, over seeded random inputs, against an obviously-correct
  * reference (a fresh rebuild, a naive local computation), so the
  * hand-picked spec cases can't accidentally dodge a broken region.
  */
class RandomizedRound14Spec extends SparkSpec {
  import sqlImplicits._

  private val words = Seq("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")
  private def mkDoc(rng: Random): String =
    Seq.fill(3 + rng.nextInt(6))(words(rng.nextInt(words.size))).mkString(" ")

  private val params = DedupIndex.Params(
    shingleSize = 1, numHashes = 64, bands = 16, seed = 42L)

  test("random purge subsets: purge(P) then append(P) equals a rebuild " +
    "over live-minus-(D\\P)-plus-P, and purge+compact equals compact") {
    val rnd = new Random(141)
    (1 to 4).foreach { _ =>
      val corpus = (0L until 20L).map(i => (i, mkDoc(rnd)))
      val batch = (100L until 112L).map { i =>
        if (rnd.nextBoolean()) (i, corpus(rnd.nextInt(20))._2)
        else (i, mkDoc(rnd))
      }.toDF("doc_id", "text")
      val deleted = (0L until 20L).filter(_ => rnd.nextInt(3) == 0)
      if (deleted.nonEmpty) {
        val purgeSet = deleted.filter(_ => rnd.nextBoolean())
        val path = java.nio.file.Files
          .createTempDirectory("rnd14_purge_").toString
        DedupIndex.write(corpus.toDF("doc_id", "text"), "doc_id", "text",
          path, params)
        DedupIndex.delete(path, deleted.toDF("doc_id"))
        DedupIndex.purge(spark, path, purgeSet.toDF("doc_id"))
        def survivors(ix: DedupIndex.Index) =
          DedupIndex.dedupAgainst(batch, ix, "doc_id", "text",
            threshold = 0.9)
            .select("doc_id").collect().map(_.getLong(0)).toSet
        // purge changes nothing semantically until a re-append: the
        // served set is still live-minus-deleted
        val refDeleted = DedupIndex.build(
          corpus.filterNot(c => deleted.contains(c._1))
            .toDF("doc_id", "text"), "doc_id", "text", params)
        survivors(DedupIndex.read(spark, path)) shouldBe survivors(refDeleted)
        // re-append the purged docs: they are live again, the rest of
        // the delete set stays masked
        if (purgeSet.nonEmpty)
          DedupIndex.appendSegment(spark, path,
            corpus.filter(c => purgeSet.contains(c._1))
              .toDF("doc_id", "text"), "doc_id", "text")
        val refRelicensed = DedupIndex.build(
          corpus.filterNot(c =>
            deleted.contains(c._1) && !purgeSet.contains(c._1))
            .toDF("doc_id", "text"), "doc_id", "text", params)
        survivors(DedupIndex.read(spark, path)) shouldBe
          survivors(refRelicensed)
        // compact folds the remaining tombstones; answers unchanged
        DedupIndex.compact(spark, path)
        survivors(DedupIndex.read(spark, path)) shouldBe
          survivors(refRelicensed)
      }
    }
  }

  test("ivfStats matches a naive local recompute over random vectors " +
    "and random base/segment splits") {
    val rnd = new Random(277)
    (1 to 3).foreach { _ =>
      val dim = 6
      val n = 40 + rnd.nextInt(30)
      val data = (0L until n.toLong).map { i =>
        (i, Seq.fill(dim)(rnd.nextFloat() * 2f - 1f))
      }
      val nCells = 3 + rnd.nextInt(4)
      val centroids = (0 until nCells)
        .map(c => (c, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
      val splitAt = 10 + rnd.nextInt(n - 15)
      val (basePart, rest) = data.splitAt(splitAt)
      val dir = java.nio.file.Files
        .createTempDirectory("rnd14_ivfstats_").toString + "/idx"
      Similarity.writeIvfIndex(
        Similarity.buildIvfWithCentroids(
          basePart.toDF("vec_id", "embedding"), "vec_id", "embedding",
          centroids), dir)
      val segs = rest.grouped(math.max(5, rest.size / 2)).toSeq
      segs.foreach { b =>
        Similarity.appendIvfSegment(spark, dir,
          b.toDF("vec_id", "embedding"), "vec_id", "embedding")
      }
      val stats = Similarity.ivfStats(spark, dir, "vec_id", "embedding")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // naive local reference: assign every vector with the same
      // cosine/tie rule, histogram over all centroid cells
      val assign = data.map { case (_, v) =>
        centroids.minBy { case (i, c) =>
          (-Similarity.cosine(v, c.toSeq), i)
        }._1
      }
      val hist = (0 until nCells).map(c => assign.count(_ == c).toLong)
      stats("n_cells") shouldBe nCells.toLong
      stats("base_rows") shouldBe splitAt.toLong
      stats("segment_rows") shouldBe (n - splitAt).toLong
      stats("segments_pending") shouldBe segs.size.toLong
      stats("max_cell_rows") shouldBe hist.max
      stats("min_cell_rows") shouldBe hist.min
      stats("empty_cells") shouldBe hist.count(_ == 0L).toLong
      stats("skew_x100") shouldBe 100L * hist.max * nCells / n
    }
  }

  test("planRecallBounded replays naively across random (n, t, maxMiss)") {
    val rnd = new Random(397)
    (1 to 25).foreach { _ =>
      val n = Seq(8, 12, 16, 24, 32, 48, 64, 96, 128)(rnd.nextInt(9))
      val t = 0.05 + rnd.nextDouble() * 0.9
      val maxMiss = math.pow(10.0, -(2 + rnd.nextInt(8)))
      val (b, r) = LshPlan.planRecallBounded(n, t, maxMiss)
      b * r shouldBe n
      // naive replay: same fold, same eligibility, same pick
      val cands = (1 to n).filter(n % _ == 0).map { bb =>
        val rr = n / bb
        var tr = t
        for (_ <- 1 until rr) tr *= t
        var miss = 1.0 - tr
        val x = 1.0 - tr
        for (_ <- 1 until bb) miss *= x
        (bb, rr, miss)
      }
      val eligible = cands.filter(_._3 <= maxMiss)
      val expect =
        if (eligible.nonEmpty) {
          val byFp = eligible.map { case (bb, rr, _) =>
            val c = LshPlan.candidates(n, t).find(_.bands == bb).get
            (bb, rr, c.fpQ)
          }
          byFp.minBy { case (bb, _, fp) => (fp, -bb) }
        } else cands.minBy { case (bb, _, miss) => (miss, -bb) }
      (b, r) shouldBe ((expect._1, expect._2))
      // the pick's miss bound holds whenever any candidate can hold it
      if (eligible.nonEmpty)
        LshPlan.missAtThreshold(b, r, t) should be <= maxMiss
    }
  }

  test("random substring-index delete/purge lifecycles equal rebuilds " +
    "of the live set (caps not binding)") {
    val rnd = new Random(431)
    def longDoc(seedWords: Seq[String]): String =
      (seedWords ++ Seq.fill(8)(words(rnd.nextInt(words.size))))
        .mkString(" ")
    (1 to 3).foreach { _ =>
      // docs long enough to fingerprint (k = 8, window = 8)
      val corpus = (0L until 10L).map(i => (i, longDoc(Seq(s"anchor$i"))))
      val batch = (50L until 56L).map { i =>
        if (rnd.nextBoolean())
          (i, "pre " + corpus(rnd.nextInt(10))._2 + " post")
        else (i, longDoc(Seq(s"novel$i")))
      }.toDF("id", "text")
      val deleted = (0L until 10L).filter(_ => rnd.nextInt(3) == 0)
      val purgeSet = deleted.filter(_ => rnd.nextBoolean())
      def build(c: Seq[(Long, String)]): String = {
        val p = java.nio.file.Files
          .createTempDirectory("rnd14_substr_").toString
        SubstringDedup.writeFingerprintIndex(
          c.toDF("id", "text"), "id", "text", p,
          k = 8, window = 8, maxDocFreq = 1000L)
        p
      }
      def matches(p: String) = SubstringDedup.matchesAgainstIndex(
        spark, p, batch, "id", "text")
        .select($"batch_id", $"corpus_id", $"pos_b", $"pos_c", $"snippet")
        .collect().toSet
      val path = build(corpus)
      if (deleted.nonEmpty) {
        SubstringDedup.deleteFromFingerprintIndex(path,
          deleted.toDF("id"))
        matches(path) shouldBe matches(
          build(corpus.filterNot(c => deleted.contains(c._1))))
        SubstringDedup.purgeFingerprintIndex(spark, path,
          purgeSet.toDF("id"))
        if (purgeSet.nonEmpty)
          SubstringDedup.appendToFingerprintIndex(spark, path,
            corpus.filter(c => purgeSet.contains(c._1)).toDF("id", "text"),
            "id", "text")
        val live = corpus.filterNot(c =>
          deleted.contains(c._1) && !purgeSet.contains(c._1))
        matches(path) shouldBe matches(build(live))
        SubstringDedup.compactFingerprintIndex(spark, path)
        matches(path) shouldBe matches(build(live))
      }
    }
  }
}
