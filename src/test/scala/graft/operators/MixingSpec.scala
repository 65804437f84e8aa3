package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MixingSpec extends SparkSpec {
  import sqlImplicits._

  // 60 / 30 / 10 split over three strata
  private lazy val corpus =
    ((0 until 60).map(i => (i.toLong, "big")) ++
      (60 until 90).map(i => (i.toLong, "mid")) ++
      (90 until 100).map(i => (i.toLong, "rare"))).toDF("id", "s")

  test("rarest stratum keeps rate 1 and rates fall with share") {
    val rates = Mixing.temperatureRates(corpus, "s", alpha = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    rates("rare") shouldBe 1.0
    assert(rates("mid") < 1.0 && rates("big") < rates("mid"))
    // alpha=0.5 downsampling ratio is sqrt(p_rare/p_s)
    rates("big") shouldBe math.sqrt(10.0 / 60.0) +- 1e-15
    rates("mid") shouldBe math.sqrt(10.0 / 30.0) +- 1e-15
  }

  test("mix moves the empirical shares toward the temperature target") {
    val kept = Mixing.mixByTemperature(corpus, "s", "id", alpha = 0.5)
      .groupBy("s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    kept("rare") shouldBe 10L // rate 1: everything survives
    // expectations: 60·0.408=24.5, 30·0.577=17.3; allow sampling noise
    assert(kept("big") < 40L && kept("big") > 10L)
    assert(kept("mid") < 25L && kept("mid") > 8L)
  }

  test("alpha=1 is the identity mix") {
    Mixing.mixByTemperature(corpus, "s", "id", alpha = 1.0)
      .count() shouldBe 100L
  }

  test("same seed reproduces the exact row set; seeds differ") {
    def ids(seed: Long) =
      Mixing.mixByTemperature(corpus, "s", "id", alpha = 0.5, seed = seed)
        .select("id").collect().map(_.getLong(0)).toSet
    ids(7L) shouldBe ids(7L)
    ids(7L) should not be ids(8L)
  }

  test("weighted rates follow token mass, not document counts") {
    // few HUGE docs in stratum "heavy" vs many small docs in "light":
    // by document count light dominates, by token mass heavy does —
    // the weighted form must downsample heavy, not light
    val df = (Seq((0L, "heavy", 10000L), (1L, "heavy", 10000L)) ++
      (2 until 42).map(i => (i.toLong, "light", 100L))).toDF("id", "s", "tok")
    val unweighted = Mixing.temperatureRates(df, "s", alpha = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val weighted = Mixing.temperatureRatesWeighted(df, "s", "tok", alpha = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    unweighted("heavy") shouldBe 1.0 // by doc count, heavy is the rare one
    weighted("light") shouldBe 1.0 // by token mass, light is the rare one
    // alpha=0.5: rate ratio is sqrt(w_light / w_heavy)
    weighted("heavy") shouldBe math.sqrt(4000.0 / 20000.0) +- 1e-15
    // and the row filter applies the weighted rates
    val kept = Mixing.mixByTemperatureWeighted(df, "s", "id", "tok", 0.5)
      .groupBy("s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    kept("light") shouldBe 40L // rate 1: everything survives
  }

  test("zero-weight strata fail loudly instead of silently vanishing") {
    val df = Seq((0L, "a", 0L), (1L, "b", 100L)).toDF("id", "s", "tok")
    val ex = intercept[Exception] {
      Mixing.temperatureRatesWeighted(df, "s", "tok", alpha = 0.5).collect()
    }
    ex.getMessage should include("non-positive")
  }

  test("rejects out-of-range alpha") {
    intercept[IllegalArgumentException] {
      Mixing.temperatureRates(corpus, "s", alpha = 0.0)
    }
    intercept[IllegalArgumentException] {
      Mixing.temperatureRates(corpus, "s", alpha = 1.5)
    }
  }

  test("NULL-stratum rows are mixed at their own rate, not dropped") {
    // NULL is the rarest stratum -> rate 1 -> every NULL row survives;
    // a plain equi-join would silently drop all of them
    val withNulls =
      ((0 until 60).map(i => (i.toLong, "big")) ++
        (60 until 70).map(i => (i.toLong, null: String))).toDF("id", "s")
    val rates = Mixing.temperatureRates(withNulls, "s", alpha = 0.5)
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(3)).toMap
    rates(None) shouldBe 1.0 // a rate row exists for the NULL stratum
    val kept = Mixing.mixByTemperature(withNulls, "s", "id", alpha = 0.5)
    kept.filter(col("s").isNull).count() shouldBe 10L
    kept.columns.toSeq shouldBe Seq("id", "s") // no helper columns leak
  }

  test("plans no nested-loop join and no corpus-sized shuffle groupings") {
    val plan = Mixing.mixByTemperature(corpus, "s", "id")
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }
}
