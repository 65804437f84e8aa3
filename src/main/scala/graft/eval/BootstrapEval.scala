package graft.eval

import java.util.Random

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bootstrap confidence-interval evaluation of model metrics over a
  * predictions table, re-expressing
  * `ml_hadoop_experiment/tensorflow/keras_bootstrap_helper.py:14-100`.
  *
  * The reference's "eval-only model rebuild" (clone the model as identity
  * layers so loss/metrics can be recomputed from cached predictions) is,
  * engine-side, just weighted aggregation expressions over a
  * (prediction, label, weight) DataFrame — no model involved. Each
  * bootstrap round resamples n rows with replacement, which is
  * equivalently a per-row integer resample-count used as a weight
  * multiplier (`np.unique(..., return_counts)` in the reference).
  *
  * Two execution shapes:
  *   - [[evaluateBootstrapLocal]] — the faithful port: seeded RNG draw of
  *     n indices per round over collected predictions; results equal a
  *     hand-rolled resample with the same RNG (the reference's own test
  *     contract, `tests/tensorflow/test_keras_bootstrap_helper.py:79-135`);
  *   - [[evaluateBootstrap]] — the 100 TB shape: Poisson(1) resample
  *     weights derived from a seeded per-(row, round) hash (standard
  *     distributed bootstrap — multinomial counts converge to iid
  *     Poisson(1) as n grows). One `explode` over rounds + one partial
  *     aggregation per round: a single shuffle of B×|metrics| partial
  *     states regardless of input size, no driver collect.
  */
object BootstrapEval {

  /** A named metric over (prediction, label, weight) columns. */
  final case class Metric(name: String, agg: (Column, Column, Column) => Column)

  /** Weighted mean squared error. */
  val mse: Metric = Metric("loss",
    (p, l, w) => sum(w * (p - l) * (p - l)) / sum(w))

  /** Weighted MSE with decimal-exact partial sums: each term is cast to
    * decimal(27,6) so the distributed sum is order-independent, then a
    * single IEEE divide. Bit-for-bit reproducible across engines — the
    * variant to use when results feed an external comparison. Scale 6 is
    * deliberate: it keeps the sums' unscaled integers below 2^53, so
    * decimal→double conversion is an exact integer load plus one
    * correctly-rounded divide in any engine (at scale 12 an engine that
    * converts via wide-int→double then ÷10^scale double-rounds and can
    * drift a ULP).
    */
  val mseExact: Metric = Metric("loss_exact",
    (p, l, w) => sum((w * (p - l) * (p - l)).cast("decimal(27,6)")).cast("double") /
      sum(w.cast("decimal(27,6)")).cast("double"))

  /** Weighted root mean squared error. */
  val rmse: Metric = Metric("root_mean_squared_error",
    (p, l, w) => sqrt(sum(w * (p - l) * (p - l)) / sum(w)))

  /** Weighted mean absolute error. */
  val mae: Metric = Metric("mean_absolute_error",
    (p, l, w) => sum(w * abs(p - l)) / sum(w))

  /** Weighted accuracy of a thresholded binary prediction. */
  def accuracy(threshold: Double = 0.5): Metric = Metric("accuracy",
    (p, l, w) => sum(w * when((p >= threshold).cast("int") === l.cast("int"), 1.0)
      .otherwise(0.0)) / sum(w))

  /** One model output to evaluate: prediction column, label column, and
    * an optional per-row metric weight (the reference's
    * `weight_transform`).
    */
  final case class OutputSpec(
      name: String,
      predCol: String,
      labelCol: String,
      weightCol: Option[String] = None)

  /** Evaluate loss + metrics once over the full table (the eval-only
    * rebuild, reference `build_eval_only_model`): per-output losses, a
    * total loss (sum over outputs), and each requested metric per output.
    * Returns names in the reference's order:
    * total loss, per-output losses, then per-output metrics.
    */
  def evaluateFromPredictions(
      df: DataFrame,
      outputs: Seq[OutputSpec],
      metrics: Seq[Metric] = Seq(rmse),
      resampleWeight: Column = lit(1.0)): Map[String, Double] = {
    val aggs = outputs.map { o =>
      val w = resampleWeight * o.weightCol.map(col).getOrElse(lit(1.0))
      s"${o.name}_loss" -> mse.agg(col(o.predCol), col(o.labelCol), w)
    } ++ outputs.flatMap { o =>
      val w = resampleWeight * o.weightCol.map(col).getOrElse(lit(1.0))
      metrics.map(m => s"${o.name}_${m.name}" ->
        m.agg(col(o.predCol), col(o.labelCol), w))
    }
    val row = df.agg(aggs.head._2.as(aggs.head._1),
      aggs.tail.map { case (n, c) => c.as(n) }: _*).collect().head
    val values = aggs.map { case (n, _) => n -> row.getAs[Double](n) }.toMap
    values + ("loss" -> outputs.map(o => values(s"${o.name}_loss")).sum)
  }

  /** Faithful local bootstrap (reference `evaluate_bootstrap`): draw n
    * indices with replacement per round using the seeded `rng`, convert
    * to per-row counts, evaluate weighted metrics. Driver-side over a
    * collected predictions table — use [[evaluateBootstrap]] at scale.
    */
  def evaluateBootstrapLocal(
      rows: Seq[Map[String, Double]],
      outputs: Seq[OutputSpec],
      nbBootstrap: Int,
      metrics: Seq[Metric] = Seq(rmse),
      seed: Long = 0L): Map[String, Seq[Double]] = {
    val rng = new Random(seed)
    val n = rows.size
    val rounds = (0 until nbBootstrap).map { _ =>
      val counts = new Array[Double](n)
      (0 until n).foreach(_ => counts(rng.nextInt(n)) += 1.0)
      evaluateLocalRound(rows, outputs, metrics, counts)
    }
    flattenRounds(rounds)
  }

  /** Resample n indices with the same RNG contract as
    * [[evaluateBootstrapLocal]] — test hook for the reference's
    * "equals hand-rolled resampling with the same seed" contract.
    */
  def resampleIndices(n: Int, rng: Random): Seq[Int] =
    (0 until n).map(_ => rng.nextInt(n))

  private def evaluateLocalRound(
      rows: Seq[Map[String, Double]],
      outputs: Seq[OutputSpec],
      metrics: Seq[Metric],
      counts: Array[Double]): Map[String, Double] = {
    def weighted(o: OutputSpec): Seq[(Double, Double, Double)] =
      rows.zipWithIndex.map { case (r, i) =>
        val w = counts(i) * o.weightCol.map(r).getOrElse(1.0)
        (r(o.predCol), r(o.labelCol), w)
      }
    def wMse(xs: Seq[(Double, Double, Double)]): Double = {
      val sw = xs.map(_._3).sum
      xs.map { case (p, l, w) => w * (p - l) * (p - l) }.sum / sw
    }
    val losses = outputs.map(o => s"${o.name}_loss" -> wMse(weighted(o)))
    val ms = outputs.flatMap { o =>
      metrics.map { m =>
        val xs = weighted(o)
        val v = m.name match {
          case "root_mean_squared_error" => math.sqrt(wMse(xs))
          case "loss" => wMse(xs)
          case "mean_absolute_error" =>
            xs.map { case (p, l, w) => w * math.abs(p - l) }.sum / xs.map(_._3).sum
          case other => throw new IllegalArgumentException(
            s"local bootstrap does not implement metric $other")
        }
        s"${o.name}_${m.name}" -> v
      }
    }
    (losses ++ ms).toMap + ("loss" -> losses.map(_._2).sum)
  }

  private def flattenRounds(rounds: Seq[Map[String, Double]]): Map[String, Seq[Double]] =
    rounds.head.keys.map(k => k -> rounds.map(_(k))).toMap

  /** Default per-(row, round) uniform draw in [0,1): xxhash64-based —
    * the best-mixing choice when no external system needs to reproduce
    * the weights.
    */
  def xxhashUniform(seed: Long)(rowKey: Column, round: Column): Column =
    (pmod(xxhash64(rowKey, round, lit(seed)), lit(1000000L)).cast("double") + 0.5) / 1000000.0

  /** Portable uniform draw in [0,1): two affine-mod rounds over the
    * 31-bit Mersenne prime (products stay under 2^63, safe in ANSI
    * mode). Every step is plain integer arithmetic expressible in any
    * ANSI SQL engine, so an external system can reproduce the resample
    * weights bit-for-bit — use for cross-engine verification.
    *
    * Precondition: `rowKey >= 0`. Spark's `pmod` is nonnegative while
    * the SQL `%` most engines replay this with is sign-preserving, so a
    * negative key silently breaks the cross-engine contract (the two
    * differ exactly when the dividend is negative). Map signed keys
    * through `abs`/`hash` first if needed.
    */
  def portableUniform(seed: Long)(rowKey: Column, round: Column): Column = {
    val p = 2147483647L // 2^31 - 1
    val h1 = pmod(pmod(rowKey, lit(p)) * lit(1103515245L) + round * lit(12345L) + lit(seed), lit(p))
    val h2 = pmod(h1 * lit(784588716L) + lit(997L), lit(p))
    (h2.cast("double") + lit(0.5)) / lit(p.toDouble)
  }

  /** Column-form bootstrap (one aggregate, zero row amplification): the
    * B per-round weights are computed as B columns and every round's
    * metrics run as expressions of ONE global aggregate, then the wide
    * 1×(B×M) row is unpivoted to (round, metrics…) rows.
    *
    * MEASURED SLOWER than the explode form ([[bootstrapMetricsDf]], the
    * default) and kept as the documented alternative + equivalence
    * witness (bit-identical decimal-exact metrics, pinned in EvalSpec).
    * Why the "B× row amplification" argument fails in practice: the
    * explode is pipelined inside whole-stage codegen — the B copies are
    * never materialized or shuffled, so amplification costs only the
    * per-(row, round) expression evaluation, which BOTH forms pay
    * (B weight columns here). Meanwhile this form's single aggregate
    * carries B×4 aggregate functions, whose generated update method
    * stops being JIT-friendly: at sf0.1 / local[32] / B=20 this runs
    * ~3.9s vs ~2.3s for the explode form, insensitive to
    * `codegen.maxFields`, `hugeMethodLimit`, and `methodSplitThreshold`.
    * The per-round aggregate work (B×|metrics| updates per input row) is
    * identical in both shapes at any scale.
    */
  def bootstrapMetricsDfWide(
      df: DataFrame,
      rowKey: Column,
      outputs: Seq[OutputSpec],
      nbBootstrap: Int,
      metrics: Seq[Metric] = Seq(rmse),
      seed: Long = 0L,
      uniform: Option[(Column, Column) => Column] = None): DataFrame = {
    val draw = uniform.getOrElse(xxhashUniform(seed) _)
    // lit(r) stays IntegerType to hash identically to the exploded
    // form's sequence-element round column. Two projections on purpose:
    // poissonInverseCdf is a when-chain that repeats its argument in
    // every branch, so feeding it the full uniform-hash expression would
    // duplicate that subtree ~10x per round — materialize the uniforms
    // as columns first, then fold the cheap column refs.
    val passthrough =
      outputs.flatMap(o => Seq(o.predCol, o.labelCol) ++ o.weightCol).distinct
    val uniforms = df.select(
      (passthrough.map(col) ++
        (0 until nbBootstrap).map(r => draw(rowKey, lit(r)).as(s"__u_$r"))): _*)
    val weighted = uniforms.select(
      (passthrough.map(col) ++
        (0 until nbBootstrap).map(r =>
          poissonInverseCdf(col(s"__u_$r")).as(s"__w_$r"))): _*)
    def aggName(o: OutputSpec, metric: String, r: Int) = s"${o.name}_${metric}__$r"
    val aggs: Seq[(String, Column)] = (0 until nbBootstrap).flatMap { r =>
      outputs.map { o =>
        val w = col(s"__w_$r") * o.weightCol.map(col).getOrElse(lit(1.0))
        aggName(o, "loss", r) -> mse.agg(col(o.predCol), col(o.labelCol), w)
      } ++ outputs.flatMap { o =>
        val w = col(s"__w_$r") * o.weightCol.map(col).getOrElse(lit(1.0))
        metrics.map(m => aggName(o, m.name, r) ->
          m.agg(col(o.predCol), col(o.labelCol), w))
      }
    }
    val wide = weighted.agg(
      aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
    val metricNames = outputs.map(o => s"${o.name}_loss") ++
      outputs.flatMap(o => metrics.map(m => s"${o.name}_${m.name}"))
    val roundStructs = (0 until nbBootstrap).map { r =>
      struct(lit(r).as("round") +:
        metricNames.map(n => col(s"${n}__$r").as(n)): _*)
    }
    wide.select(explode(array(roundStructs: _*)).as("__m"))
      .select(col("__m.*"))
      .orderBy(col("round"))
  }

  /** Per-round bootstrap metrics as a DataFrame (one row per round,
    * ordered by `round`) — the distributed execution shape behind
    * [[evaluateBootstrap]]: each row exploded into (round, row) pairs
    * weighted by a Poisson(1) count derived deterministically from
    * `draw(rowKey, round)`, then a partial+final aggregation per round —
    * a single shuffle of B×|metrics| partial states at any input size.
    *
    * The explode never materializes: it is pipelined with the partial
    * aggregate inside one whole-stage-codegen stage, which is why this
    * form measures faster than the column form
    * ([[bootstrapMetricsDfWide]], see its Scaladoc for the numbers) —
    * the small per-round agg function count keeps the generated update
    * loop JIT-hot.
    */
  def bootstrapMetricsDf(
      df: DataFrame,
      rowKey: Column,
      outputs: Seq[OutputSpec],
      nbBootstrap: Int,
      metrics: Seq[Metric] = Seq(rmse),
      seed: Long = 0L,
      uniform: Option[(Column, Column) => Column] = None): DataFrame = {
    val draw = uniform.getOrElse(xxhashUniform(seed) _)
    val rounds = df
      .withColumn("__round", explode(sequence(lit(0), lit(nbBootstrap - 1))))
      .withColumn("__u", draw(rowKey, col("__round")))
      .withColumn("__w", poissonInverseCdf(col("__u")))
    val aggs = outputs.map { o =>
      val w = col("__w") * o.weightCol.map(col).getOrElse(lit(1.0))
      s"${o.name}_loss" -> mse.agg(col(o.predCol), col(o.labelCol), w)
    } ++ outputs.flatMap { o =>
      val w = col("__w") * o.weightCol.map(col).getOrElse(lit(1.0))
      metrics.map(m => s"${o.name}_${m.name}" ->
        m.agg(col(o.predCol), col(o.labelCol), w))
    }
    rounds.groupBy(col("__round").as("round"))
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
      .orderBy(col("round"))
  }

  /** Per-GROUP bootstrap metrics — one row per (group…, round): the
    * per-slice evaluation with uncertainty a corpus datasheet wants
    * ("is quality flat across languages, within resampling noise?").
    * Same explode + Poisson(1) weighting + partial/final aggregation
    * as [[bootstrapMetricsDf]] with the group columns joining the
    * round key — still ONE shuffle of |groups|×B×|metrics| partial
    * states at any input size.
    *
    * The resample draw depends only on (rowKey, round) — NOT the
    * group — so a row carries the same weight under any slicing:
    * grouped rounds are exact partitions of the global round
    * (Σ_g groupMetricNumerator = globalNumerator), and slicing is
    * pure reporting, never a different experiment.
    */
  def bootstrapMetricsByGroup(
      df: DataFrame,
      rowKey: Column,
      groupCols: Seq[String],
      outputs: Seq[OutputSpec],
      nbBootstrap: Int,
      metrics: Seq[Metric] = Seq(rmse),
      seed: Long = 0L,
      uniform: Option[(Column, Column) => Column] = None): DataFrame = {
    require(groupCols.nonEmpty,
      "bootstrapMetricsByGroup: no group columns — use bootstrapMetricsDf")
    require(!groupCols.contains("round"),
      "group columns may not be named 'round'")
    val draw = uniform.getOrElse(xxhashUniform(seed) _)
    val rounds = df
      .withColumn("__round", explode(sequence(lit(0), lit(nbBootstrap - 1))))
      .withColumn("__u", draw(rowKey, col("__round")))
      .withColumn("__w", poissonInverseCdf(col("__u")))
    val aggs = outputs.map { o =>
      val w = col("__w") * o.weightCol.map(col).getOrElse(lit(1.0))
      s"${o.name}_loss" -> mse.agg(col(o.predCol), col(o.labelCol), w)
    } ++ outputs.flatMap { o =>
      val w = col("__w") * o.weightCol.map(col).getOrElse(lit(1.0))
      metrics.map(m => s"${o.name}_${m.name}" ->
        m.agg(col(o.predCol), col(o.labelCol), w))
    }
    rounds
      .groupBy((groupCols.map(col) :+ col("__round").as("round")): _*)
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
      .orderBy((groupCols.map(col) :+ col("round")): _*)
  }

  def evaluateBootstrap(
      df: DataFrame,
      rowKey: Column,
      outputs: Seq[OutputSpec],
      nbBootstrap: Int,
      metrics: Seq[Metric] = Seq(rmse),
      seed: Long = 0L): Map[String, Seq[Double]] = {
    val aggNames = outputs.map(o => s"${o.name}_loss") ++
      outputs.flatMap(o => metrics.map(m => s"${o.name}_${m.name}"))
    val result = bootstrapMetricsDf(df, rowKey, outputs, nbBootstrap, metrics, seed)
      .collect()
    val byMetric = aggNames.map { name =>
      name -> result.map(_.getAs[Double](name)).toSeq
    }.toMap
    byMetric + ("loss" -> result.map { r =>
      outputs.map(o => r.getAs[Double](s"${o.name}_loss")).sum
    }.toSeq)
  }

  /** Poisson(1) quantile as a when-chain over the cumulative distribution
    * (k ≤ 8 covers 1 - 1e-6 of the mass). Pure expression — codegen, no
    * UDF, deterministic given the uniform input.
    */
  private[eval] def poissonInverseCdf(u: Column): Column = {
    val e = math.exp(-1.0)
    var cum = 0.0
    var fact = 1.0
    val cdf = (0 to 8).map { k =>
      if (k > 0) fact *= k
      cum += e / fact
      (k, cum)
    }
    cdf.foldRight(lit(9.0): Column) { case ((k, p), rest) =>
      when(u <= p, lit(k.toDouble)).otherwise(rest)
    }
  }
}
