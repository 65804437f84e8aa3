package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.dedup.{Dedup, DedupIndex, LshPlan}

/** Randomized cross-checks for the round-13 operators — the
  * [[RandomizedRound9bSpec]] discipline: each new code path is
  * compared, over seeded random inputs, against an obviously-correct
  * reference (a fresh rebuild, a naive local computation), so the
  * hand-picked spec cases can't accidentally dodge a broken region.
  */
class RandomizedRound13Spec extends SparkSpec {
  import sqlImplicits._

  private val words = Seq("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa")
  private def mkDoc(rng: Random): String =
    Seq.fill(3 + rng.nextInt(6))(words(rng.nextInt(words.size))).mkString(" ")

  private val params = DedupIndex.Params(
    shingleSize = 1, numHashes = 64, bands = 16, seed = 42L)

  test("random delete sets: delete-then-dedupAgainst equals " +
    "rebuild-without-deleted") {
    val rnd = new Random(131)
    (1 to 6).foreach { _ =>
      val corpus = (0L until 25L).map(i => (i, mkDoc(rnd)))
      val batch = (100L until 115L).map { i =>
        if (rnd.nextBoolean()) (i, corpus(rnd.nextInt(25))._2)
        else (i, mkDoc(rnd))
      }.toDF("doc_id", "text")
      val deleted = (0L until 25L).filter(_ => rnd.nextInt(3) == 0)
      val path = java.nio.file.Files
        .createTempDirectory("rnd13_del_").toString
      DedupIndex.write(corpus.toDF("doc_id", "text"), "doc_id", "text",
        path, params)
      DedupIndex.delete(path, deleted.toDF("doc_id"))
      val viaTombstones = DedupIndex.dedupAgainst(
        batch, DedupIndex.read(spark, path), "doc_id", "text",
        threshold = 0.9)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val rebuilt = DedupIndex.build(
        corpus.filterNot(c => deleted.contains(c._1)).toDF("doc_id", "text"),
        "doc_id", "text", params)
      val viaRebuild = DedupIndex.dedupAgainst(
        batch, rebuilt, "doc_id", "text", threshold = 0.9)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      viaTombstones shouldBe viaRebuild
      // and the physical purge preserves the same answers
      DedupIndex.compact(spark, path)
      DedupIndex.dedupAgainst(
        batch, DedupIndex.read(spark, path), "doc_id", "text",
        threshold = 0.9)
        .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe viaRebuild
    }
  }

  test("LshPlan candidates match a naive BigDecimal-free local replay " +
    "across random (n, t)") {
    val rnd = new Random(77)
    (1 to 25).foreach { _ =>
      val n = Seq(8, 12, 16, 24, 32, 48, 64, 96, 128)(rnd.nextInt(9))
      val t = 0.05 + rnd.nextDouble() * 0.9
      val cs = LshPlan.candidates(n, t)
      // divisor enumeration is complete and exact
      cs.map(_.bands) shouldBe (1 to n).filter(n % _ == 0)
      cs.foreach { c =>
        c.bands * c.rowsPerBand shouldBe n
        // naive replay of the quantized midpoint integral
        var fp = 0L
        var fn = 0L
        for (k <- 0 until 100) {
          val s = (2 * k + 1).toDouble / 200.0
          var sr = s
          for (_ <- 1 until c.rowsPerBand) sr *= s
          var q = 1.0 - sr
          for (_ <- 1 until c.bands) q *= (1.0 - sr)
          val p = 1.0 - q
          if (s < t) fp += math.floor(p * (1L << 30).toDouble / 100.0).toLong
          else fn += math.floor((1.0 - p) * (1L << 30).toDouble / 100.0).toLong
        }
        c.fpQ shouldBe fp
        c.fnQ shouldBe fn
      }
      // the plan is the argmin with ties to more bands
      val (b, r) = LshPlan.plan(n, t)
      b * r shouldBe n
      val best = cs.minBy(c => (c.totalQ, -c.bands))
      (b, r) shouldBe ((best.bands, best.rowsPerBand))
    }
  }

  test("random append/delete interleavings: read equals rebuild of " +
    "the live set") {
    val rnd = new Random(313)
    (1 to 4).foreach { _ =>
      val path = java.nio.file.Files
        .createTempDirectory("rnd13_seq_").toString
      var live = Map.empty[Long, String]
      val base = (0L until 12L).map(i => i -> mkDoc(rnd)).toMap
      DedupIndex.write(base.toSeq.toDF("doc_id", "text"), "doc_id", "text",
        path, params)
      live = base
      var nextId = 50L
      (1 to 4).foreach { _ =>
        if (rnd.nextBoolean() && live.nonEmpty) {
          // delete a random live subset
          val del = live.keys.filter(_ => rnd.nextInt(3) == 0).toSeq
          if (del.nonEmpty) {
            DedupIndex.delete(path, del.toDF("doc_id"))
            live = live -- del
          }
        } else {
          // append a fresh segment (sometimes re-using a deleted id)
          val b = (0 until 4).map { _ =>
            val id = if (rnd.nextBoolean()) nextId else nextId + 100L
            nextId += 1
            id -> mkDoc(rnd)
          }
          DedupIndex.appendSegment(spark, path,
            b.toDF("doc_id", "text"), "doc_id", "text")
          live = live ++ b
        }
      }
      val batch = (900L until 910L).map { i =>
        if (rnd.nextBoolean() && live.nonEmpty)
          (i, live.values.toSeq(rnd.nextInt(live.size)))
        else (i, mkDoc(rnd))
      }.toDF("doc_id", "text")
      def survivors(ix: DedupIndex.Index) =
        DedupIndex.dedupAgainst(batch, ix, "doc_id", "text",
          threshold = 0.9)
          .select("doc_id").collect().map(_.getLong(0)).toSet
      val rebuilt = DedupIndex.build(
        live.toSeq.toDF("doc_id", "text"), "doc_id", "text", params)
      survivors(DedupIndex.read(spark, path)) shouldBe survivors(rebuilt)
    }
  }
}
