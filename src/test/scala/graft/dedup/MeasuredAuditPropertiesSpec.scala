package graft.dedup

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** Property invariants of the measured banding audits over RANDOM
  * corpora (the PropertiesSpec treatment for the round-17 audit
  * family). The load-bearing one is NESTING MONOTONICITY: for the
  * same signature, agreement on a width-r band slice implies
  * agreement on both width-r/2 halves, so when bands divide evenly
  * the recovered-pair and candidate-pair sets can only GROW as bands
  * increase — `pairs_recovered` and `cand_pairs` must be
  * non-decreasing down the divisor chain, independent of the corpus.
  * A slice-arithmetic bug (off-by-one band offsets, wrong widths)
  * breaks this on random data long before it breaks a hand-built
  * fixture. Also pinned per table: the recall_ppm/recovered
  * consistency, the eligibility rule, and at-most-one chosen row
  * with the documented tie-break.
  */
class MeasuredAuditPropertiesSpec extends SparkSpec {
  import sqlImplicits._

  private def forSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    Iterator.continually(gen.sample).flatten.take(n).foreach(body)

  private val genSetCorpus: Gen[Seq[(Long, Seq[Long])]] = for {
    nDocs <- Gen.chooseNum(6, 14)
    seed <- Gen.chooseNum(0, 1000000)
  } yield {
    val rng = new scala.util.Random(seed)
    (0L until nDocs.toLong).map { i =>
      // overlapping families: docs share a base pool so some pairs
      // land near any threshold
      val base = (i % 4) * 50L
      val els = (0 until 8 + rng.nextInt(6))
        .map(_ => base + rng.nextInt(60).toLong + 1L)
      (i, els.distinct)
    }
  }

  private def checkTable(
      rows: Array[(Long, Long, Long, Long, Long, Long, Boolean, Boolean)],
      target: Long): Unit = {
    val byBands = rows.sortBy(_._1)
    // nesting monotonicity along the divisor chain
    byBands.sliding(2).foreach {
      case Array(lo, hi) =>
        withClue(s"bands ${lo._1} -> ${hi._1}: ") {
          hi._4 should be >= lo._4 // pairs_recovered
          hi._6 should be >= lo._6 // cand_pairs
        }
      case _ => ()
    }
    rows.foreach { r =>
      val (_, _, pt, pr, ppm, _, eligible, _) = r
      pr should be <= pt
      val expectPpm = if (pt == 0L) 1000000L else 1000000L * pr / pt
      ppm shouldBe expectPpm
      eligible shouldBe (ppm >= target)
    }
    val chosen = rows.filter(_._8)
    chosen.length should be <= 1
    val eligible = rows.filter(_._7)
    if (eligible.nonEmpty) {
      chosen.length shouldBe 1
      val minCand = eligible.map(_._6).min
      chosen.head._6 shouldBe minCand
      chosen.head._1 shouldBe
        eligible.filter(_._6 == minCand).map(_._1).min
    } else chosen shouldBe empty
  }

  test("MinHash measured table: recovery/candidates monotone in bands, " +
    "ppm exact, at most one chosen (random corpora)") {
    forSamples(genSetCorpus, 4) { corpus =>
      val df = corpus.toDF("id", "els")
      val rows = Dedup.lshMeasuredBandingTable(
        df, "id", "els", numHashes = 8, threshold = 0.4,
        targetRecallPpm = 800000L)
        .orderBy(col("bands")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7)))
      checkTable(rows, 800000L)
    }
  }

  private val genVecCorpus: Gen[Seq[(Long, Seq[Float])]] = for {
    nDocs <- Gen.chooseNum(6, 14)
    seed <- Gen.chooseNum(0, 1000000)
  } yield {
    val rng = new scala.util.Random(seed)
    (0L until nDocs.toLong).map { i =>
      val c = (i % 3).toInt
      val v = Array.tabulate(6)(d =>
        (math.sin((c + 1) * (d + 1) * 0.9) +
          rng.nextGaussian() * 0.3).toFloat)
      (i, v.toSeq)
    }
  }

  test("sign-LSH measured table: same invariants on random vectors") {
    forSamples(genVecCorpus, 4) { corpus =>
      val df = corpus.toDF("id", "vec")
      val rows = graft.sim.Similarity.signLshMeasuredBandingTable(
        df, "id", "vec", numBits = 8, threshold = 0.6,
        targetRecallPpm = 800000L)
        .orderBy(col("bands")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7)))
      checkTable(rows, 800000L)
    }
  }
}
