package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The cosine twin of LshMeasuredSpec: [[Similarity
  * .signLshMeasuredBandingTable]] against a driver-side brute-force
  * reference under the SAME hyperplane family, the fail-loud
  * no-eligible contract, and [[Similarity
  * .embeddingNearDuplicatesMeasured]] ≡ the hand-tuned pipeline at
  * the measured pick. The DuckDB oracle (q276) pins the arithmetic
  * against an independent engine; these pin the decision semantics.
  */
class SignLshMeasuredSpec extends SparkSpec {
  import sqlImplicits._

  private def refSigns(
      v: Seq[Float], planes: Array[Array[Double]]): Seq[Int] =
    planes.toSeq.map { p =>
      var acc = 0.0
      var i = 0
      val n = math.min(v.length, p.length)
      while (i < n) { acc += v(i).toDouble * p(i); i += 1 }
      if (acc >= 0) 1 else 0
    }

  private def refCosine(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
    dot / (na * nb)
  }

  test("measured table equals a driver-side brute-force reference on " +
    "planted clustered vectors") {
    val numBits = 4
    val seed = 42L
    val dim = 8
    val t = 0.7
    val rng = new scala.util.Random(11)
    // five cluster centers, six noisy members each → true pairs at
    // varied cosine plus cross-cluster negatives
    val corpus: Seq[(Long, Seq[Float])] = (0 until 30).map { i =>
      val c = i % 5
      val base = Array.tabulate(dim)(d =>
        math.sin((c + 1) * (d + 1) * 0.7))
      val noisy = base.map(x => (x + rng.nextGaussian() * 0.2).toFloat)
      (i.toLong, noisy.toSeq)
    }
    val df = corpus.toDF("id", "vec")
    val got = Similarity.signLshMeasuredBandingTable(
      df, "id", "vec", numBits, t, targetRecallPpm = 900000L, seed = seed)
      .orderBy(col("bands"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7)))

    val planes = Similarity.hyperplanes(numBits, dim, seed)
    val sigs = corpus.map { case (i, v) => i -> refSigns(v, planes) }.toMap
    val vecs = corpus.toMap
    val ids = corpus.map(_._1)
    val pairs = for { a <- ids; b <- ids if a < b } yield (a, b)
    val divisors = (1 to numBits).filter(numBits % _ == 0)
    val ref = divisors.map { nb =>
      val r = numBits / nb
      def rec(a: Long, b: Long): Boolean =
        (0 until nb).exists(k =>
          sigs(a).slice(k * r, k * r + r) == sigs(b).slice(k * r, k * r + r))
      val truePairs = pairs.filter { case (a, b) =>
        refCosine(vecs(a), vecs(b)) >= t }
      val recovered = truePairs.count { case (a, b) => rec(a, b) }
      val cand = pairs.count { case (a, b) => rec(a, b) }
      val ppm = if (truePairs.isEmpty) 1000000L
        else 1000000L * recovered / truePairs.size
      (nb.toLong, r.toLong, truePairs.size.toLong, recovered.toLong,
        ppm, cand.toLong, ppm >= 900000L)
    }
    got.map(g => (g._1, g._2, g._3, g._4, g._5, g._6, g._7)) shouldBe ref
    val eligible = ref.filter(_._7)
    val chosenBands =
      if (eligible.isEmpty) -1L
      else eligible.filter(_._6 == eligible.map(_._6).min).map(_._1).min
    got.foreach { g => g._8 shouldBe (g._1 == chosenBands) }
  }

  test("fail-loud when the single-plane banding splits a true pair") {
    val seed = 42L
    val dim = 4
    val p = Similarity.hyperplanes(1, dim, seed).head
    // w near-orthogonal to the plane, nudged to either side: cosine
    // (v1, v2) ≈ 1 but the single sign bit differs
    val w = Array(p(1), -p(0), p(3), -p(2)) // seed direction, not parallel to p
    val wp = w.zip(p).map { case (x, y) => x * y }.sum
    val pp = p.map(x => x * x).sum
    val orth = w.zip(p).map { case (x, y) => x - wp / pp * y } // exact orthogonal component
    val eps = 1e-3
    val v1 = orth.zip(p).map { case (x, y) => (x + eps * y).toFloat }.toSeq
    val v2 = orth.zip(p).map { case (x, y) => (x - eps * y).toFloat }.toSeq
    refCosine(v1, v2) should be >= 0.9
    refSigns(v1, Array(p)) should not be refSigns(v2, Array(p))
    val df = Seq((1L, v1), (2L, v2)).toDF("id", "vec")
    val tbl = Similarity.signLshMeasuredBandingTable(
      df, "id", "vec", 1, 0.9, 950000L).collect()
    tbl.length shouldBe 1
    tbl.head.getAs[Boolean]("eligible") shouldBe false
    tbl.head.getAs[Boolean]("chosen") shouldBe false
    val ex = intercept[IllegalArgumentException] {
      Similarity.planSignBandsMeasured(df, "id", "vec", 1, 0.9, 950000L)
    }
    ex.getMessage should include("no banding")
  }

  test("embeddingNearDuplicatesMeasured equals the hand-tuned pipeline " +
    "at the measured pick and meets the target on the sample") {
    val rng = new scala.util.Random(23)
    val dim = 8
    val corpus = (0 until 40).map { i =>
      val c = i % 8
      val base = Array.tabulate(dim)(d => math.cos((c + 1) * (d + 2) * 0.53))
      (i.toLong, base.map(x => (x + rng.nextGaussian() * 0.15).toFloat).toSeq)
    }
    val df = corpus.toDF("id", "vec")
    val t = 0.8
    val target = 950000L
    val measured = Similarity.embeddingNearDuplicatesMeasured(
      df, "id", "vec", sample = df, numBits = 8, threshold = t,
      targetRecallPpm = target)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val (bands, bits) = Similarity.planSignBandsMeasured(
      df, "id", "vec", 8, t, target)
    (bands * bits) shouldBe 8
    val tuned = Similarity.embeddingNearDuplicates(
      df, "id", "vec", t, bits = bits, bands = bands)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    measured shouldBe tuned
    val vecs = corpus.toMap
    val ids = corpus.map(_._1)
    val truePairs = (for { a <- ids; b <- ids if a < b } yield (a, b))
      .filter { case (a, b) => refCosine(vecs(a), vecs(b)) >= t }
    truePairs.count(measured.contains).toDouble should be >=
      (target.toDouble / 1000000.0) * truePairs.size
  }
}
