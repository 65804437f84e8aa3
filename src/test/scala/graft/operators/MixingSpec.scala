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

  test("token-budget selection matches a driver-side reference") {
    val rng = new scala.util.Random(9)
    val docs = (0L until 120L)
      .map(i => (i, if (i % 3 == 0) "a" else "b", 10L + rng.nextInt(90)))
      .toDF("id", "s", "n_tok")
    val budgets = Seq(("a", 400L), ("b", 700L)).toDF("s", "budget")
    val got = Mixing.sampleToTokenBudget(docs, "s", "id", "n_tok", budgets)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // reference: same hash order, same inclusive-cumsum rule
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ord = docs.select(col("id"),
        Splits.bucketOf(col("id"), "", 1 << 20).as("o"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = rows.groupBy(_._2).toSeq.flatMap { case (s, ds) =>
      val budget = Map("a" -> 400L, "b" -> 700L)(s)
      var acc = 0L
      ds.sortBy { case (id, _, _) => (ord(id), id) }.toSeq.flatMap {
        case (id, _, n) =>
          acc += n
          if (acc <= budget) Some(id -> acc) else None
      }
    }
    // the per-stratum cumsum stops at the FIRST crossing; docs after it
    // in hash order are excluded even if they would individually fit
    got shouldBe expect.toMap
    // budgets respected exactly
    got.values.max should be <= 700L
  }

  test("token-budget selection fails loudly on a stratum without a budget") {
    val docs = Seq((1L, "a", 5L), (2L, "zz", 5L)).toDF("id", "s", "n_tok")
    val budgets = Seq(("a", 100L)).toDF("s", "budget")
    val e = intercept[Exception] {
      Mixing.sampleToTokenBudget(docs, "s", "id", "n_tok", budgets).collect()
    }
    e.getMessage should include("no budget row")
  }

  test("token-budget selection is salt-independent between salts, stable within") {
    val docs = (0L until 80L).map(i => (i, "a", 25L)).toDF("id", "s", "n_tok")
    val budgets = Seq(("a", 500L)).toDF("s", "budget")
    def ids(salt: String) =
      Mixing.sampleToTokenBudget(docs, "s", "id", "n_tok", budgets, salt)
        .collect().map(_.getLong(0)).toSet
    ids("x") shouldBe ids("x")    // deterministic
    ids("x") should not be ids("y") // independent selections per salt
    ids("x").size shouldBe 20     // 500 / 25
  }

  test("repeat rates are size-preserving and upsample the rare stratum") {
    val rates = Mixing.temperatureRepeatRates(corpus, "s", alpha = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // Σ n_s · rate_s = N (IEEE rounding only)
    val mass = rates.map { case (_, n, rate) => n * rate }.sum
    mass shouldBe 100.0 +- 1e-9
    val byS = rates.map { case (s, _, r) => s -> r }.toMap
    assert(byS("rare") > 1.0, "rare stratum must upsample")
    assert(byS("big") < 1.0, "dominant stratum must downsample")
    // rate_s = p_s^(α-1) / Σ p_t^α, sequential fold in stratum order
    val shares = Map("big" -> 0.6, "mid" -> 0.3, "rare" -> 0.1)
    val den = Seq("big", "mid", "rare").map(s => math.sqrt(shares(s))).sum
    byS("rare") shouldBe (math.sqrt(0.1) / 0.1) / den +- 1e-12
  }

  test("upsampling emits floor(rate) copies plus a reproducible fractional extra") {
    val df = (0L until 200L).map(i => (i, "a")).toDF("id", "s")
    val rates = Seq(("a", 2.3)).toDF("s", "rate")
    val out = Mixing.upsampleWithRates(df, "s", "id", rates, seed = 5L)
    val perDoc = out.groupBy("id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    perDoc.size shouldBe 200 // rate >= 1: every doc survives
    all(perDoc.values) should (be(2L) or be(3L))
    // expectation ~30% get the third copy; loose band for a 200-draw sample
    val thirds = perDoc.values.count(_ == 3L)
    assert(thirds > 30 && thirds < 90, s"got $thirds thirds")
    // copy index is 0-based and dense per doc
    out.filter(col("id") === 0L)
      .select("copy").collect().map(_.getLong(0)).sorted shouldBe
      (0L until perDoc(0L)).toArray
    // bit-for-bit reproducible
    out.collect().toSet shouldBe
      Mixing.upsampleWithRates(df, "s", "id", rates, seed = 5L).collect().toSet
  }

  test("rate-0 strata vanish; fractional-only strata keep ~rate of rows once") {
    val df = ((0L until 100L).map(i => (i, "keepish")) ++
      (100L until 150L).map(i => (i, "gone"))).toDF("id", "s")
    val rates = Seq(("keepish", 0.4), ("gone", 0.0)).toDF("s", "rate")
    val out = Mixing.upsampleWithRates(df, "s", "id", rates)
    out.filter(col("s") === "gone").count() shouldBe 0L
    val kept = out.filter(col("s") === "keepish").count()
    assert(kept > 20L && kept < 60L, s"got $kept")
    out.groupBy("id").count().collect().foreach(_.getLong(1) shouldBe 1L)
  }

  test("upsampling fails loudly on missing, null, negative, or excessive rates") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    def run(rates: org.apache.spark.sql.DataFrame, maxRate: Double = 100.0) =
      Mixing.upsampleWithRates(df, "s", "id", rates, maxRate = maxRate).collect()
    intercept[Exception] { run(Seq(("a", 1.0)).toDF("s", "rate")) }
      .getMessage should include("no rate row")
    intercept[Exception] {
      run(Seq(("a", 1.0), ("b", -0.5)).toDF("s", "rate"))
    }.getMessage should include("negative rate")
    intercept[Exception] {
      run(Seq(("a", 1.0), ("b", 500.0)).toDF("s", "rate"))
    }.getMessage should include("maxRate")
  }

  test("mixByTemperatureWithRepeats preserves corpus size in expectation") {
    val out = Mixing.mixByTemperatureWithRepeats(corpus, "s", "id", alpha = 0.5)
    val n = out.count()
    // E[n] = 100; bands generous for one 100-row draw
    assert(n > 70L && n < 130L, s"got $n")
    // rare stratum upsampled: more rows out than in
    assert(out.filter(col("s") === "rare").count() > 10L)
    out.columns.toSeq shouldBe Seq("id", "s", "copy")
  }

  test("NULL-stratum rows upsample at their own rate, not dropped") {
    val withNulls =
      ((0 until 90).map(i => (i.toLong, "big")) ++
        (90 until 100).map(i => (i.toLong, null: String))).toDF("id", "s")
    val out = Mixing.mixByTemperatureWithRepeats(withNulls, "s", "id")
    assert(out.filter(col("s").isNull).count() > 10L,
      "NULL stratum is the rare one and must upsample")
  }

  test("matchDistribution: ref bucket keeps all, others near target mix") {
    // 600 a / 200 b / 100 c, target 1:1:1 → c is scarcest (ref, rate
    // 1), a keeps ~1/6, b keeps ~1/2
    val rows = ((0 until 600).map(i => (i.toLong, "a")) ++
      (600 until 800).map(i => (i.toLong, "b")) ++
      (800 until 900).map(i => (i.toLong, "c"))).toDF("id", "s")
    val out = Mixing.matchDistribution(rows, "s", "id",
      Seq("a" -> 1L, "b" -> 1L, "c" -> 1L))
    val byS = out.groupBy(col("s")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byS("c") shouldBe 100L // reference bucket fully kept
    assert(byS("a") > 60 && byS("a") < 140, s"a=${byS("a")}")
    assert(byS("b") > 60 && byS("b") < 140, s"b=${byS("b")}")
    // deterministic: rerun and repartition select the same rows
    val again = Mixing.matchDistribution(rows.repartition(7), "s", "id",
      Seq("a" -> 1L, "b" -> 1L, "c" -> 1L))
    again.collect().map(r => r.getLong(0)).sorted shouldBe
      out.collect().map(r => r.getLong(0)).sorted
  }

  test("matchDistribution: off-target buckets drop; absent targets raise") {
    val rows = ((0 until 50).map(i => (i.toLong, "a")) ++
      (50 until 60).map(i => (i.toLong, "junk"))).toDF("id", "s")
    val out = Mixing.matchDistribution(rows, "s", "id", Seq("a" -> 1L))
    out.filter(col("s") === "junk").count() shouldBe 0L // whitelist
    out.filter(col("s") === "a").count() shouldBe 50L
    an[IllegalArgumentException] should be thrownBy {
      Mixing.matchDistribution(rows, "s", "id",
        Seq("a" -> 1L, "missing" -> 1L))
    }
  }
}
