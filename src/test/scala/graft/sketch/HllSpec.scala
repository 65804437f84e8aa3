package graft.sketch

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {
  import sqlImplicits._

  private def values(n: Int, group: String, seed: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(_ => (group, s"v${rnd.nextInt(n)}"))
      .toDF("g", "v")
  }

  test("estimate is within HLL error bounds of the exact distinct count") {
    // m = 256 → standard error 1.04/sqrt(256) ≈ 6.5%; assert 4 sigma.
    val df = values(20000, "a", 7)
    val exact = df.select(countDistinct($"v")).as[Long].head()
    val est = Hll.distinctEstimate(df, Seq("g"), $"v", p = 8)
      .select($"est_distinct").as[Double].head()
    assert(exact > 640, s"raw-range precondition: exact=$exact must exceed 2.5m")
    math.abs(est - exact) / exact.toDouble should be < 0.26
  }

  test("sketch of a union equals the max-merge of the parts' sketches") {
    val a = values(5000, "g1", 1)
    val b = values(5000, "g1", 2)
    val whole = Hll.sketch(a.union(b), Seq("g"), $"v", p = 8)
    val merged = Hll.merge(Seq("g"),
      Hll.sketch(a, Seq("g"), $"v", p = 8),
      Hll.sketch(b, Seq("g"), $"v", p = 8))
    whole.except(merged).count() shouldBe 0
    merged.except(whole).count() shouldBe 0
  }

  test("merge is idempotent: merging a sketch with itself changes nothing") {
    val s = Hll.sketch(values(1000, "g", 3), Seq("g"), $"v", p = 6)
    val twice = Hll.merge(Seq("g"), s, s)
    s.except(twice).count() shouldBe 0
    twice.except(s).count() shouldBe 0
  }

  test("sketch and estimate are layout-independent") {
    val df = values(3000, "g", 11)
    val base = Hll.distinctEstimate(df, Seq("g"), $"v", p = 8).collect()
    val re = Hll.distinctEstimate(df.repartition(7, $"v"), Seq("g"), $"v", p = 8).collect()
    base shouldBe re
  }

  test("registers are exact: s_scaled + groups' zero buckets reconcile") {
    val df = values(2000, "g", 5)
    val sk = Hll.sketch(df, Seq("g"), $"v", p = 6)
    val est = Hll.estimate(sk, Seq("g"), p = 6).head()
    val m = 64
    val r = Hll.HashBits - 6 + 1
    val rows = sk.select($"rho").as[Int].collect()
    val expectedS = rows.map(rho => 1L << (r - rho)).sum +
      (m - rows.length).toLong * (1L << r)
    est.getAs[Long]("v_zero") shouldBe (m - rows.length).toLong
    est.getAs[Long]("s_scaled") shouldBe expectedS
  }

  test("rho is the exact bit-length rank, never a float-log artifact") {
    // Craft hashes at power-of-two boundaries via direct computation:
    // every rho in [1, w+1] is representable and max-aggregated.
    val df = Seq.tabulate(512)(i => ("g", s"tok$i")).toDF("g", "v")
    val sk = Hll.sketch(df, Seq("g"), $"v", p = 8)
    val rhos = sk.select($"rho").as[Int].collect()
    all(rhos) should be >= 1
    all(rhos) should be <= Hll.HashBits - 8 + 1
  }

  test("p out of range fails loudly") {
    val df = Seq(("g", "x")).toDF("g", "v")
    an[IllegalArgumentException] should be thrownBy
      Hll.sketch(df, Seq("g"), $"v", p = 3)
    an[IllegalArgumentException] should be thrownBy
      Hll.estimate(df, Seq("g"), p = 17)
  }
}
