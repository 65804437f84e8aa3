package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DpCountsSpec extends SparkSpec {
  import sqlImplicits._

  private def krHash(s: String): Long =
    graft.functions.KrHash.hash(s.getBytes("UTF-8"))

  /** Driver-side reference of the mechanism's noise for one key. */
  private def refNoise(keyStr: String, salt: String, s: Int): Long = {
    def draw(h: Long): Long = {
      val h2 = (h * h) % 2147483647L
      val ctz =
        if (h2 == 0L) 31L
        else math.min(java.lang.Long.numberOfTrailingZeros(h2).toLong, 31L)
      ctz / s
    }
    draw(krHash(s"a:$salt:$keyStr")) - draw(krHash(s"b:$salt:$keyStr"))
  }

  test("audit noise matches the driver-side reference, counts exact") {
    val df = Seq.tabulate(300)(i => (s"k${i % 7}", i))
      .toDF("k", "v").repartition(5)
    val got = DpCounts.audit(df, Seq("k"), salt = "rel1", epsilonLog2Units = 2)
      .orderBy(col("k")).collect()
    assert(got.length === 7)
    got.foreach { r =>
      val k = r.getString(0)
      val expectN = Seq.tabulate(300)(i => s"k${i % 7}").count(_ == k)
      assert(r.getLong(1) === expectN)
      assert(r.getLong(2) === refNoise(k, "rel1", 2))
      assert(r.getLong(3) === r.getLong(1) + r.getLong(2))
    }
  }

  test("release is deterministic across runs and partitionings") {
    val df1 = Seq.tabulate(200)(i => (s"g${i % 11}", i)).toDF("k", "v")
    val df2 = df1.repartition(13)
    val a = DpCounts.noisyCounts(df1, Seq("k"), "s0", 1).orderBy("k").collect()
    val b = DpCounts.noisyCounts(df2, Seq("k"), "s0", 1).orderBy("k").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("different salts give different noise (rotation matters)") {
    val df = Seq.tabulate(500)(i => (s"k${i % 97}", i)).toDF("k", "v")
    val a = DpCounts.audit(df, Seq("k"), "saltA", 1)
      .select("k", "noise").as[(String, Long)].collect().toMap
    val b = DpCounts.audit(df, Seq("k"), "saltB", 1)
      .select("k", "noise").as[(String, Long)].collect().toMap
    assert(a.keySet === b.keySet)
    assert(a.count { case (k, n) => b(k) != n } > 10)
  }

  test("noise distribution is symmetric-ish two-sided geometric") {
    // 4000 distinct keys, one row each: n = 1, so noisy_n - 1 = noise
    val df = Seq.tabulate(4000)(i => (s"u$i", 1)).toDF("k", "v")
    val noise = DpCounts.audit(df, Seq("k"), "dist", 1)
      .select("noise").as[Long].collect()
    val zeroFrac = noise.count(_ == 0L).toDouble / noise.length
    // P(noise = 0) for alpha = 1/2 two-sided geometric: sum p(x)^2 over
    // geometric(1/2) = sum (2^-(k+1))^2 = 1/3
    assert(math.abs(zeroFrac - 1.0 / 3.0) < 0.05)
    val mean = noise.sum.toDouble / noise.length
    assert(math.abs(mean) < 0.1)
    // both tails occur
    assert(noise.exists(_ >= 2L))
    assert(noise.exists(_ <= -2L))
  }

  test("larger epsilon (more log2 units) means smaller noise") {
    val df = Seq.tabulate(3000)(i => (s"u$i", 1)).toDF("k", "v")
    def meanAbs(s: Int): Double = {
      val n = DpCounts.audit(df, Seq("k"), "eps", s)
        .select("noise").as[Long].collect()
      n.map(math.abs).sum.toDouble / n.length
    }
    assert(meanAbs(1) > meanAbs(3))
  }

  test("clampNonNegative floors the release at zero") {
    val df = Seq.tabulate(400)(i => (s"u$i", 1)).toDF("k", "v")
    val rel = DpCounts.noisyCounts(df, Seq("k"), "cl", 1,
      clampNonNegative = true)
      .select("noisy_n").as[Long].collect()
    assert(rel.forall(_ >= 0L))
    val raw = DpCounts.noisyCounts(df, Seq("k"), "cl", 1)
      .select("noisy_n").as[Long].collect()
    assert(raw.exists(_ < 0L)) // n = 1 with noise <= -2 happens
  }
}
