package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CountMinSpec extends SparkSpec {
  import sqlImplicits._

  private def toks(vs: String*) = vs.toDF("v")

  test("estimates never underestimate and hit exactly without collisions") {
    val data = toks((Seq.fill(7)("alpha") ++ Seq.fill(3)("beta") ++
      Seq("gamma")): _*)
    val sk = CountMin.sketch(data, "v", depth = 4, width = 1024)
    val est = CountMin.estimate(sk, data, "v", depth = 4, width = 1024)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est("alpha") should be >= 7L
    est("beta") should be >= 3L
    est("gamma") should be >= 1L
    // wide sketch, 3 values: no collisions — exact
    est shouldBe Map("alpha" -> 7L, "beta" -> 3L, "gamma" -> 1L)
  }

  test("unseen values estimate 0 (all cells untouched) or collide upward") {
    val sk = CountMin.sketch(toks("x", "x"), "v", depth = 4, width = 1024)
    val est = CountMin.estimate(sk, toks("zzzz"), "v", depth = 4, width = 1024)
      .head().getLong(1)
    est should be >= 0L
    est should be <= 2L // at most the whole corpus
  }

  test("merging batch sketches equals the sketch of the concatenation") {
    val a = toks("x", "y", "x")
    val b = toks("y", "z")
    val merged = CountMin.mergeSketches(
      CountMin.sketch(a, "v", 3, 64), CountMin.sketch(b, "v", 3, 64))
    val whole = CountMin.sketch(a.unionAll(b), "v", 3, 64)
    merged.except(whole).count() shouldBe 0
    whole.except(merged).count() shouldBe 0
  }

  test("overestimate property holds under forced collisions") {
    // width 2: everything collides; estimates still >= exact counts
    val data = toks((1 to 50).flatMap(i => Seq.fill(i % 5 + 1)(s"t$i")): _*)
    val sk = CountMin.sketch(data, "v", depth = 3, width = 2)
    val exact = data.groupBy("v").count()
    val est = CountMin.estimate(sk, data, "v", depth = 3, width = 2)
    val joined = est.join(exact, est("value") === exact("v"))
      .select(col("est"), col("count")).collect()
    all(joined.map(r => r.getLong(0) >= r.getLong(1))) shouldBe true
  }

  test("the cell table is bounded by depth x width") {
    val data = toks((1 to 500).map(i => s"tok$i"): _*)
    val sk = CountMin.sketch(data, "v", depth = 4, width = 16)
    sk.count() should be <= (4L * 16L)
    sk.select(max("row")).head().getInt(0) should be <= 3
    sk.select(max("cell")).head().getLong(0) should be <= 15L
  }

  test("NULL values raise instead of silently undercounting") {
    val data = Seq(Option("x"), None).toDF("v")
    val e = intercept[Exception] {
      CountMin.sketch(data, "v").collect()
    }
    e.getMessage should include("NULL")
  }
}
