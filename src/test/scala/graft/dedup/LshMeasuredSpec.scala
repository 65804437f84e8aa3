package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The EMPIRICAL banding audit ([[Dedup.lshMeasuredBandingTable]]) and
  * its actuators ([[Dedup.planBandsMeasured]],
  * [[Dedup.nearDuplicatesBySetsMeasured]]): brute-force reference
  * equality on planted integral sets, target-driven pick movement,
  * the fail-loud no-eligible contract, and actuator ≡ hand-tuned
  * equivalence. The DuckDB oracle (q275) pins the same arithmetic
  * against an independent engine; these tests pin the decision
  * semantics on fixtures small enough to enumerate by hand.
  */
class LshMeasuredSpec extends SparkSpec {
  import sqlImplicits._

  private val P = (1L << 31) - 1

  /** Reference signature: the same affine min-fold the library
    * computes, enumerated driver-side. */
  private def refSig(els: Seq[Long], numHashes: Int, seed: Long): Seq[Long] =
    Dedup.hashParams(numHashes, seed).map { case (a, b) =>
      els.map(e => java.lang.Math.floorMod(a * java.lang.Math.floorMod(e, P) + b, P)).min
    }

  private def refJaccard(x: Set[Long], y: Set[Long]): Double =
    if ((x ++ y).isEmpty) 1.0
    else (x & y).size.toDouble / (x ++ y).size

  test("measured table equals a driver-side brute-force reference " +
    "(recall, candidate mass, eligibility, pick) on planted sets") {
    val numHashes = 8
    val seed = 42L
    val t = 0.5
    val rng = new scala.util.Random(7)
    val corpus: Seq[(Long, Seq[Long])] = (0L until 30L).map { i =>
      // ten base sets, each with two noisy variants → true pairs at
      // varied similarity; elements in [1, 4000)
      val base = (1L + 3 * (i % 10)) * 97L
      val els = (0 until 12).map(j => (base + j * 131L) % 4000L + 1L) ++
        (0 until (i / 10).toInt * 3).map(_ => rng.nextLong(4000L) + 1L)
      (i, els.distinct)
    }
    val df = corpus.toDF("id", "els")
    val got = Dedup.lshMeasuredBandingTable(
      df, "id", "els", numHashes, t, targetRecallPpm = 900000L, seed = seed)
      .orderBy(col("bands"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7)))

    // brute-force reference
    val sigs = corpus.map { case (i, els) => i -> refSig(els, numHashes, seed) }.toMap
    val sets = corpus.map { case (i, els) => i -> els.toSet }.toMap
    val ids = corpus.map(_._1)
    val pairs = for { a <- ids; b <- ids if a < b } yield (a, b)
    val divisors = (1 to numHashes).filter(numHashes % _ == 0)
    val ref = divisors.map { nb =>
      val r = numHashes / nb
      def rec(a: Long, b: Long): Boolean =
        (0 until nb).exists(k =>
          sigs(a).slice(k * r, k * r + r) == sigs(b).slice(k * r, k * r + r))
      val truePairs = pairs.filter { case (a, b) => refJaccard(sets(a), sets(b)) >= t }
      val recovered = truePairs.count { case (a, b) => rec(a, b) }
      val cand = pairs.count { case (a, b) => rec(a, b) }
      val ppm = if (truePairs.isEmpty) 1000000L
        else 1000000L * recovered / truePairs.size
      (nb.toLong, r.toLong, truePairs.size.toLong, recovered.toLong,
        ppm, cand.toLong, ppm >= 900000L)
    }
    val eligible = ref.filter(_._7)
    val chosenBands =
      if (eligible.isEmpty) -1L
      else eligible.filter(_._6 == eligible.map(_._6).min).map(_._1).min
    got.map(g => (g._1, g._2, g._3, g._4, g._5, g._6, g._7)) shouldBe ref
    got.foreach { g => g._8 shouldBe (g._1 == chosenBands) }
    // the audit is non-vacuous on this fixture: recall varies
    got.map(_._5).distinct.size should be > 1
  }

  test("the pick moves with the target: a lax target chooses fewer " +
    "bands (less candidate mass), a strict one escalates") {
    val corpus = (0L until 24L).map { i =>
      val base = (i % 8) * 577L
      (i, (0 until 10).map(j => base + j * 7919L % 3001L + 1L).distinct)
    }
    val df = corpus.toDF("id", "els")
    def chosen(target: Long): Long =
      Dedup.lshMeasuredBandingTable(df, "id", "els", 16, 0.6, target)
        .filter(col("chosen")).select(col("bands")).collect().map(_.getLong(0)).head
    val lax = chosen(100000L)
    val strict = chosen(1000000L)
    lax should be <= strict
    // with a fixture full of exact clones plus singletons, a lax
    // target is satisfiable with a cheaper banding
    val (bLax, _) = Dedup.planBandsMeasured(df, "id", "els", 16, 0.6, 100000L)
    bLax shouldBe lax.toInt
  }

  test("fail-loud when no divisor banding reaches the target") {
    // one true pair (j = 0.8 at t = 0.5) engineered to DISAGREE on the
    // single minhash of numHashes = 1: the pair's min is attained by
    // an element only one side holds
    val numHashes = 1
    val seed = 42L
    val (a, b) = Dedup.hashParams(numHashes, seed).head
    def h(e: Long) = java.lang.Math.floorMod(a * e + b, P)
    val cands = (1L to 200L).sortBy(h)
    val eMin = cands.head          // global min under the permutation
    val shared = cands.drop(1).take(8)  // 8 shared elements, larger h
    val setA = eMin +: shared      // min(A) = h(eMin)
    val setB = shared :+ cands(50) // min(B) ≠ h(eMin)
    refJaccard(setA.toSet, setB.toSet) should be >= 0.5
    refSig(setA, 1, seed) should not be refSig(setB, 1, seed)
    val df = Seq((1L, setA), (2L, setB)).toDF("id", "els")
    val tbl = Dedup.lshMeasuredBandingTable(df, "id", "els", 1, 0.5, 950000L)
      .collect()
    tbl.length shouldBe 1
    tbl.head.getAs[Boolean]("eligible") shouldBe false
    tbl.head.getAs[Boolean]("chosen") shouldBe false
    val ex = intercept[IllegalArgumentException] {
      Dedup.planBandsMeasured(df, "id", "els", 1, 0.5, 950000L)
    }
    ex.getMessage should include("no banding")
  }

  test("nearDuplicatesBySetsMeasured equals nearDuplicatesBySets at " +
    "the measured pick, and recovers pairs a lax model pick misses") {
    val corpus = (0L until 40L).map { i =>
      val base = (i % 10) * 211L
      val extra = if (i >= 30) Seq(10000L + i) else Nil
      (i, ((0 until 9).map(j => base + j * 101L + 1L) ++ extra).distinct)
    }
    val df = corpus.toDF("id", "els")
    val sample = df // the corpus IS the audit sample at this size
    val measured = Dedup.nearDuplicatesBySetsMeasured(
      df, "id", "els", sample, numHashes = 16, threshold = 0.8,
      targetRecallPpm = 990000L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val (bands, rpb) = Dedup.planBandsMeasured(
      sample, "id", "els", 16, 0.8, 990000L)
    (bands * rpb) shouldBe 16
    val tuned = Dedup.nearDuplicatesBySets(
      df, "id", "els", numHashes = 16, bands = bands, threshold = 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    measured shouldBe tuned
    // ground truth: the measured pick met the 0.99 target on this
    // sample, so the pipeline recovers (at least) 99% of true pairs
    val sets = corpus.map { case (i, els) => i -> els.toSet }.toMap
    val ids = corpus.map(_._1)
    val truePairs = (for { x <- ids; y <- ids if x < y } yield (x, y))
      .filter { case (x, y) => refJaccard(sets(x), sets(y)) >= 0.8 }
    truePairs.count(measured.contains).toDouble should be >=
      0.99 * truePairs.size
  }
}
