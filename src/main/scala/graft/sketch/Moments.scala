package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable moments sketch — per-group exact-integer power sums
  * `(n, Σq, Σq², Σq³, Σq⁴)` over a quantized numeric column, the
  * numeric-distribution member of the sketch family: [[Hll]] answers
  * "how many DISTINCT", [[CountMin]] "how often does v occur",
  * [[FrequentItems]] "which are the heaviest", [[SourceSketch]] "how
  * similar are groups" — and this answers "what does the numeric
  * column LOOK like per group" (location, spread, tail asymmetry,
  * tail weight) in O(groups) state however large the corpus.
  *
  * Why power sums and not the finished statistics: sums are the
  * mergeable form. They add across shards/days/batches (associative,
  * commutative, order-independent — exact integers), while mean /
  * variance / skewness do not; the finished statistics are derived
  * AFTER the final merge. This is the same raw-vs-finished split the
  * reference's bootstrap evaluator uses for its metric aggregation
  * (`ml_hadoop_experiment/tensorflow/keras_bootstrap_helper.py:40-100`
  * computes the raw predictions exactly once and derives every
  * finished bootstrap metric afterwards by re-weighting them): keep
  * the raw additive state, finish the statistics at the end.
  *
  * Exactness: values quantize to `⌊x · 10^decimals⌋` longs (decimal
  * quantization — [[graft.sim.EmbeddingDrift]] uses binary 2^k; here
  * decimal keeps the oracle arithmetic human-readable), and every
  * power sum is an exact decimal(38,0) integer. The derived stats
  * need exactly ONE IEEE divide each off exact integer numerators /
  * denominators: `mean_q = Σq/n`, `var_q² = (n·Σq² − (Σq)²)/n²`, and
  * the unnormalized third/fourth central moments
  * `m3·n³ = n²Σq³ − 3nΣqΣq² + 2(Σq)³`,
  * `m4·n⁴ = n³Σq⁴ − 4n²ΣqΣq³ + 6n(Σq)²Σq² − 3(Σq)⁴`
  * stay exact integers (skew/kurtosis finishing needs pow(·,3/2) —
  * not bit-replayable across engines, so the operator returns the
  * exact central-moment numerators instead and leaves the last
  * normalization to the caller).
  *
  * Overflow contract: every term above is bounded by `8·(n·B)⁴` for
  * `B = max|q|` (each power sum satisfies `|Σqᵏ| ≤ n·Bᵏ`), so the
  * sketch carries `q_absmax` (maxes merge like sums) and [[finish]]
  * fail-louds when `8·(n·B)⁴` could exceed the exact decimal(38,0)
  * range — checked in log-space doubles with 10× headroom BEFORE any
  * decimal multiply can silently overflow to NULL. Lower `decimals`
  * or pre-bucket oversized groups; at `decimals = 0` and values ≤
  * 10³ the contract holds to n = 10⁶ rows per group, at values ≤ 10
  * to n = 10⁸.
  *
  * Scale shape: ONE map-side-combinable aggregate; the shuffle
  * carries `|groups|` rows of seven integers, never values. Merging
  * sketches from two corpora is a `|groups|`-sized union+sum.
  */
object Moments {

  /** `(group, n, q_absmax, s1, s2, s3, s4)` — exact power sums of
    * `q = ⌊value · 10^decimals⌋` per group. NULL values raise — a
    * silent drop would bias every moment.
    */
  def sketch(
      df: DataFrame, groupCol: String, valueCol: String,
      decimals: Int = 0): DataFrame = {
    require(decimals >= 0 && decimals <= 9,
      s"decimals must be in [0, 9], got $decimals")
    val scale = math.pow(10.0, decimals) // exact for decimals <= 9
    val q = when(col(valueCol).isNull,
      raise_error(lit(s"Moments.sketch: NULL $valueCol — drop " +
        "explicitly, a silent skip would bias every moment")))
      .otherwise(floor(col(valueCol).cast("double") * lit(scale))
        .cast("long"))
    df.select(col(groupCol).as("group"), q.cast("decimal(38,0)").as("q"))
      .groupBy(col("group"))
      .agg(
        count(lit(1)).as("n"),
        max(abs(col("q"))).as("q_absmax"),
        sum(col("q")).as("s1"),
        sum(col("q") * col("q")).as("s2"),
        sum(col("q") * col("q") * col("q")).as("s3"),
        sum(col("q") * col("q") * col("q") * col("q")).as("s4"))
  }

  /** Element-wise sum (max for `q_absmax`) of two sketch tables built
    * with the SAME `decimals` — the sketch of the concatenated
    * corpora.
    */
  def mergeSketches(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("group"))
      .agg(sum(col("n")).as("n"),
        max(col("q_absmax")).as("q_absmax"),
        sum(col("s1")).as("s1"), sum(col("s2")).as("s2"),
        sum(col("s3")).as("s3"), sum(col("s4")).as("s4"))

  /** Finished per-group statistics off a (merged) sketch table:
    * exact integer central-moment numerators plus `mean_q` and
    * `var_q2` (population variance, in q² units) as the only IEEE
    * results — one divide each, deterministic.
    */
  def finish(sk: DataFrame): DataFrame = {
    val n = col("n").cast("decimal(38,0)")
    val s1 = col("s1")
    val s2 = col("s2")
    val s3 = col("s3")
    val s4 = col("s4")
    val two = lit(new java.math.BigDecimal(2))
    val three = lit(new java.math.BigDecimal(3))
    val four = lit(new java.math.BigDecimal(4))
    val six = lit(new java.math.BigDecimal(6))
    // log10(8·(n·B)⁴) ≤ 37 ⇔ log10 n + log10 B ≤ (37 − log10 8)/4.
    // Doubles only compare magnitudes here (10× headroom below the
    // decimal(38,0) range); all RESULT arithmetic stays exact decimal.
    val guardOk = log(10.0, greatest(n.cast("double"), lit(1.0))) +
      log(10.0, greatest(col("q_absmax").cast("double"), lit(1.0))) <=
      lit((37.0 - math.log10(8.0)) / 4.0)
    val guarded = when(!guardOk,
      raise_error(concat(
        lit("Moments.finish: 8·(n·max|q|)⁴ may exceed the exact "),
        lit("decimal(38,0) range for group "), col("group").cast("string"),
        lit(" — lower decimals or pre-bucket the group"))))
    sk.select(col("group"), col("n"), col("q_absmax"), s1, s2, s3, s4,
        guarded.otherwise(n * s2 - s1 * s1).as("var_num"),
        guarded.otherwise(
          n * n * s3 - three * n * s1 * s2 + two * s1 * s1 * s1)
          .as("m3_n3"),
        guarded.otherwise(
          n * n * n * s4 - four * n * n * s1 * s3 +
            six * n * s1 * s1 * s2 - three * s1 * s1 * s1 * s1)
          .as("m4_n4"))
      .withColumn("mean_q",
        s1.cast("double") / col("n").cast("double"))
      .withColumn("var_q2",
        col("var_num").cast("double") /
          (col("n").cast("double") * col("n").cast("double")))
      .drop("var_num")
  }

  /** Flag per-group k-sigma outliers with ZERO floating point: the
    * gate `(q − μ)² > k²σ²` cross-multiplies to
    * `(q·n − Σq)² > k²·(n·Σq² − (Σq)²)` — exact integers end to end
    * (μ = Σq/n and σ² = (n·Σq² − (Σq)²)/n² never materialize), so
    * the flag is bit-replayable (q129) with no epsilon anywhere.
    * The anomaly gate a curation pipeline puts on numeric columns
    * (lengths, scores, latencies) per group.
    *
    * Output: input columns + `q` (the quantized value) +
    * `is_outlier`. Same overflow contract style as [[finish]]:
    * fail-louds when `max(4, k²)·(n·max|q|)²` could leave exact
    * decimal(38,0) range. Scale shape: one [[sketch]] aggregate +
    * one equi-join of the |groups|-sized stats table back onto the
    * rows (broadcast-sized by construction).
    */
  def flagOutliers(
      df: DataFrame, groupCol: String, valueCol: String,
      decimals: Int = 0, k: Int = 3): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val scale = math.pow(10.0, decimals)
    val stats = sketch(df, groupCol, valueCol, decimals)
      .select(col("group").as("__grp"), col("n").as("__n"),
        col("q_absmax").as("__b"), col("s1").as("__s1"),
        col("s2").as("__s2"))
    val kk = math.max(4L, k.toLong * k.toLong)
    val guardOk = log(10.0, greatest(col("__n").cast("double"), lit(1.0))) +
      log(10.0, greatest(col("__b").cast("double"), lit(1.0))) <=
      lit((37.0 - math.log10(kk.toDouble)) / 2.0)
    val q = floor(col(valueCol).cast("double") * lit(scale))
      .cast("long").cast("decimal(38,0)")
    val n = col("__n").cast("decimal(38,0)")
    val lhs = (q * n - col("__s1")) * (q * n - col("__s1"))
    val rhs = lit(new java.math.BigDecimal(k.toLong * k.toLong)) *
      (n * col("__s2") - col("__s1") * col("__s1"))
    df.join(stats, col(groupCol) === col("__grp"))
      .withColumn("q", q.cast("long"))
      .withColumn("is_outlier",
        when(!guardOk, raise_error(concat(
          lit("Moments.flagOutliers: k²·(n·max|q|)² may exceed exact "),
          lit("decimal(38,0) range for group "), col("__grp").cast("string"))))
          .otherwise(lhs > rhs))
      .drop("__grp", "__n", "__b", "__s1", "__s2")
  }
}
