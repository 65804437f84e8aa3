package graft.eval

import java.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ports of the reference eval suite: evaluator sizing golden pairs
  * (`tests/tensorflow/test_evaluator_conf_helper.py`), the eval-only
  * golden losses `[20.0, 4.0, 16.0, 2.0, 4.0]`
  * (`tests/tensorflow/test_keras_bootstrap_helper.py:59-82`), and the
  * seeded-bootstrap reproduction contract (`:85-135`).
  */
class EvalSpec extends SparkSpec {
  import sqlImplicits._

  // --- evaluator sizing ---

  test("eval params golden pairs") {
    EvalConfig.getEvalParams(50, 1, 50000, 100000) shouldBe
      EvalParams(5, 50000, 1000, 1)
    EvalConfig.getEvalParams(50, 1, 5000000, 50000) shouldBe
      EvalParams(5, 5000000, 50000, 2)
  }

  test("eval params reject non-positive inputs") {
    val bad = Seq(
      (0, 1, 5000000, 50000), (50, 0, 5000000, 50000),
      (50, 1, 0, 50000), (50, 1, 5000000, 0),
      (-50, 1, 5000000, 50000), (50, -1, 5000000, 50000),
      (50, 1, -5000000, 50000), (50, 1, 5000000, -50000))
    bad.foreach { case (w, e, n, m) =>
      an[IllegalArgumentException] should be thrownBy {
        EvalConfig.getEvalParams(w, e, n, m)
      }
    }
  }

  // --- eval-only metrics over predictions ---

  private val evalDf = Seq(
    (13.0, 3.0), (2.0, 1.0), (6.0, 7.0), (33.0, 3.0), (5.0, 9.0))

  test("eval-only golden losses [20, 4, 16, 2, 4]") {
    // model outputs sum/prod exactly; labels offset by +2 / +4
    val df = evalDf.map { case (f1, f2) =>
      (f1 + f2, f1 * f2, f1 + f2 + 2.0, f1 * f2 + 4.0)
    }.toDF("pred_add", "pred_multiply", "label_add", "label_multiply")
    val outputs = Seq(
      BootstrapEval.OutputSpec("add", "pred_add", "label_add"),
      BootstrapEval.OutputSpec("multiply", "pred_multiply", "label_multiply"))
    val r = BootstrapEval.evaluateFromPredictions(df, outputs)
    r("loss") shouldBe 20.0
    r("add_loss") shouldBe 4.0
    r("multiply_loss") shouldBe 16.0
    r("add_root_mean_squared_error") shouldBe 2.0
    r("multiply_root_mean_squared_error") shouldBe 4.0
  }

  // --- seeded local bootstrap: equals hand-rolled resampling ---

  private def predictionRows(noiseSeed: Long): Seq[Map[String, Double]] = {
    val rng = new Random(noiseSeed)
    evalDf.map { case (f1, f2) =>
      val noise = rng.nextDouble()
      Map(
        "pred_add" -> (f1 + f2), "pred_multiply" -> (f1 * f2),
        "label_add" -> (f1 + f2 + noise), "label_multiply" -> (f1 * f2 + 2 * noise),
        "weight_add" -> 1.0, "weight_multiply" -> 1.0)
    }
  }

  test("seeded bootstrap equals hand-rolled resampling with the same RNG") {
    val rows = predictionRows(1L)
    val outputs = Seq(
      BootstrapEval.OutputSpec("add", "pred_add", "label_add"),
      BootstrapEval.OutputSpec("multiply", "pred_multiply", "label_multiply"))

    val results = BootstrapEval.evaluateBootstrapLocal(rows, outputs, 2, seed = 0L)

    // hand-rolled: same RNG, same draw order
    val rng = new Random(0L)
    def roundMetrics(): Map[String, Double] = {
      val idx = BootstrapEval.resampleIndices(rows.size, rng)
      val counts = new Array[Double](rows.size)
      idx.foreach(counts(_) += 1.0)
      def wmse(pred: String, label: String): Double = {
        val num = rows.zipWithIndex.map { case (r, i) =>
          counts(i) * math.pow(r(pred) - r(label), 2)
        }.sum
        num / counts.sum
      }
      Map(
        "add_loss" -> wmse("pred_add", "label_add"),
        "multiply_loss" -> wmse("pred_multiply", "label_multiply"))
    }
    val r1 = roundMetrics()
    val r2 = roundMetrics()
    results("add_loss")(0) shouldBe r1("add_loss") +- 1e-9
    results("multiply_loss")(0) shouldBe r1("multiply_loss") +- 1e-9
    results("add_loss")(1) shouldBe r2("add_loss") +- 1e-9
    results("multiply_loss")(1) shouldBe r2("multiply_loss") +- 1e-9
    results("loss")(0) shouldBe (r1("add_loss") + r1("multiply_loss")) +- 1e-9
    results("add_root_mean_squared_error")(0) shouldBe
      math.sqrt(r1("add_loss")) +- 1e-9
  }

  test("weighted bootstrap multiplies metric weights into resample counts") {
    val rows = predictionRows(2L).zipWithIndex.map { case (r, i) =>
      r + ("weight_add" -> (i + 1.0)) + ("weight_multiply" -> (5.0 - i))
    }
    val outputs = Seq(
      BootstrapEval.OutputSpec("add", "pred_add", "label_add", Some("weight_add")),
      BootstrapEval.OutputSpec("multiply", "pred_multiply", "label_multiply", Some("weight_multiply")))
    val results = BootstrapEval.evaluateBootstrapLocal(rows, outputs, 2, seed = 0L)

    val rng = new Random(0L)
    val idx = BootstrapEval.resampleIndices(rows.size, rng)
    val counts = new Array[Double](rows.size)
    idx.foreach(counts(_) += 1.0)
    val w = rows.zipWithIndex.map { case (r, i) => counts(i) * r("weight_add") }
    val num = rows.zipWithIndex.map { case (r, i) =>
      w(i) * math.pow(r("pred_add") - r("label_add"), 2)
    }.sum
    results("add_loss")(0) shouldBe (num / w.sum) +- 1e-9
  }

  test("distributed bootstrap is deterministic and round-count shaped") {
    val df = (1L to 200L).map { i =>
      (i, i.toDouble, i.toDouble + (if (i % 3 == 0) 1.5 else -0.5))
    }.toDF("id", "pred", "label")
    val outputs = Seq(BootstrapEval.OutputSpec("m", "pred", "label"))
    val a = BootstrapEval.evaluateBootstrap(df, col("id"), outputs, 5, seed = 7L)
    val b = BootstrapEval.evaluateBootstrap(df, col("id"), outputs, 5, seed = 7L)
    a("m_loss").size shouldBe 5
    a shouldBe b
    // bootstrap losses scatter around the full-data loss
    val full = BootstrapEval.evaluateFromPredictions(df, outputs)("m_loss")
    all(a("m_loss")) shouldBe full +- 1.0
    // different seeds give different resamples
    val c = BootstrapEval.evaluateBootstrap(df, col("id"), outputs, 5, seed = 8L)
    c("m_loss") should not be a("m_loss")
  }

  test("column-form bootstrap equals the exploded form (bit-identical exact metrics)") {
    val df = (1L to 300L).map { i =>
      (i, i * 0.5, i * 0.5 + (i % 7) * 0.1)
    }.toDF("id", "pred", "label").repartition(5)
    val outputs = Seq(BootstrapEval.OutputSpec("m", "pred", "label"))
    def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.Column,
        Seq[BootstrapEval.OutputSpec], Int, Seq[BootstrapEval.Metric], Long,
        Option[(org.apache.spark.sql.Column, org.apache.spark.sql.Column) =>
          org.apache.spark.sql.Column]) => org.apache.spark.sql.DataFrame) =
      f(df, col("id"), outputs, 10, Seq(BootstrapEval.mseExact), 5L,
        Some(BootstrapEval.portableUniform(5L) _))
        .select("round", "m_loss", "m_loss_exact")
        .collect()
        .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    val wide = run(BootstrapEval.bootstrapMetricsDfWide)
    val exploded = run(BootstrapEval.bootstrapMetricsDf)
    wide.map(_._1).toSeq shouldBe exploded.map(_._1).toSeq
    // decimal-exact metric: bit-identical between the two shapes
    wide.map(_._3).toSeq shouldBe exploded.map(_._3).toSeq
    // plain-double loss: same arithmetic, order-dependent rounding only
    wide.zip(exploded).foreach { case (w, e) => w._2 shouldBe e._2 +- 1e-9 }
  }

  test("portable uniform is in [0,1) and yields Poisson weights with mean ~1") {
    val df = (0L until 5000L).toDF("id")
      .withColumn("round", lit(0))
      .withColumn("u", BootstrapEval.portableUniform(42L)(col("id"), col("round")))
    val us = df.select("u").collect().map(_.getDouble(0))
    all(us) should (be >= 0.0 and be < 1.0)
    // decent mixing: mean of the uniforms near 1/2
    us.sum / us.length shouldBe 0.5 +- 0.02
    val wMean = df.select(BootstrapEval.poissonInverseCdf(col("u")).as("w"))
      .agg(avg("w")).collect().head.getDouble(0)
    wMean shouldBe 1.0 +- 0.05
  }

  test("mseExact equals mse up to rounding and is order-independent") {
    val rows = (0 until 1000).map(i => (i.toLong, 1.0 + i * 0.001, 1.0 + i * 0.0013))
    val df = rows.toDF("id", "pred", "label")
    def loss(d: org.apache.spark.sql.DataFrame, m: BootstrapEval.Metric): Double =
      d.agg(m.agg(col("pred"), col("label"), lit(1.0)).as("v")).collect().head.getDouble(0)
    val exact = loss(df, BootstrapEval.mseExact)
    val plain = loss(df, BootstrapEval.mse)
    // scale-6 quantization of each term bounds the drift at n·5e-7/sum(w)
    exact shouldBe plain +- 1e-6
    // identical regardless of partitioning (the point of decimal sums)
    loss(df.repartition(7), BootstrapEval.mseExact) shouldBe exact
  }

  test("grouped bootstrap equals per-group filtering (draw is group-free)") {
    val df = (0 until 120).map(i =>
      (i.toLong, if (i % 3 == 0) "a" else "b",
        i.toDouble / 10.0, i.toDouble / 11.0))
      .toDF("id", "g", "label", "pred")
    val outs = Seq(BootstrapEval.OutputSpec("m", "pred", "label"))
    val grouped = BootstrapEval.bootstrapMetricsByGroup(
      df, col("id"), Seq("g"), outs, nbBootstrap = 5, seed = 7L,
      metrics = Seq(BootstrapEval.mseExact))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getAs[Double]("m_loss_exact"))
      .toMap
    for (g <- Seq("a", "b")) {
      val solo = BootstrapEval.bootstrapMetricsDf(
        df.filter(col("g") === g), col("id"), outs, nbBootstrap = 5,
        seed = 7L, metrics = Seq(BootstrapEval.mseExact))
        .collect()
        .map(r => r.getInt(0) -> r.getAs[Double]("m_loss_exact")).toMap
      for (r <- 0 until 5)
        grouped((g, r)) shouldBe solo(r) // bit-equal: same draws, same sums
    }
  }

  test("poisson inverse cdf maps uniforms to small counts with mean ~1") {
    val df = (0 until 10000).map(i => (i + 0.5) / 10000.0).toDF("u")
    val counts = df.select(BootstrapEval.poissonInverseCdf(col("u")).as("k"))
      .groupBy("k").count().collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    counts(0.0).toDouble shouldBe 3679.0 +- 10 // e^-1
    counts(1.0).toDouble shouldBe 3679.0 +- 10
    val mean = counts.map { case (k, n) => k * n }.sum / 10000.0
    mean shouldBe 1.0 +- 0.01
  }
}
