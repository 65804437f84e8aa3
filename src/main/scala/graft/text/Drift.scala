package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus drift report: per-token KL(A‖B) contributions between two
  * corpora's unigram token distributions — the "did the new crawl's
  * language shift under the filters" monitoring step a 100 TB ingest
  * pipeline runs on every batch (compare this month's corpus against
  * last month's; compare post-filter against pre-filter; compare a
  * source against the mix).
  *
  * With add-one smoothing over the UNION vocabulary (so both sides
  * assign every token positive mass):
  *
  *   KL(A‖B) = Σ_t p_A(t) · (log2 p_A(t) − log2 p_B(t))
  *
  * and the per-token summand is this operator's output row. Tokens
  * over-represented in A push positive contributions to the top of the
  * report; the total (Σ of `contrib_q40`) is the corpus-level
  * statistic.
  *
  * Exactness: probabilities are Q20 fixed-point integers
  * `s = max(⌊2²⁰(n+1)/(N+V)⌋, 1)` and log2 is the integer
  * square-and-shift expression ([[graft.functions.ILog2Q20]], the
  * [[Dsir]]/[[NgramLm]] machinery), so every contribution is an exact
  * 64-bit integer (`Q40`: probability Q20 × log Q20), order-independent
  * under any partitioning, and bit-replayable in SQL (q79) — no IEEE
  * transcendentals anywhere. The fixed-point value approximates real
  * KL within quantization error; as a DRIFT SIGNAL the defined
  * deterministic statistic is the point, not the 21st decimal.
  *
  * Scale shape: one explode+count aggregate per corpus (map-side
  * combinable; the shuffle carries DISTINCT tokens, never documents),
  * a full-outer equi-join of the two distinct-token tables, map-only
  * native-codegen arithmetic, and ONE bounded driver collect of the
  * two (N, V) scalar rows (exactly one row per side — needed up front
  * to fail loudly on fixed-point overflow before any work is wasted).
  */
object Drift {

  private val Scale = graft.text.Dsir.Scale // 2^20

  /** `(token, n_a, n_b, contrib_q40)`, the full union-vocabulary table
    * (callers order/limit for a top-movers report; Σ contrib_q40 is
    * the corpus-level KL in Q40). Tokens are whitespace words of the
    * [[TextStats.normalize]]d text; NULL texts contribute nothing.
    */
  def tokenKlContributions(
      a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def counts(df: DataFrame, out: String): DataFrame =
      df.select(explode(split(TextStats.normalize(col(textCol)), " "))
          .as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token")).agg(count(lit(1)).as(out))

    val ca = counts(a, "n_a")
    val cb = counts(b, "n_b")
    val joined = ca.join(cb, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      // both the scalar aggregate below and the final projection read
      // this join; materialize once (same contract as NgramLm.fit)
      .localCheckpoint(true)

    // bounded collect: exactly ONE row (two sums + a count) — needed
    // driver-side to guard the fixed-point range before computing
    val scalars = joined.agg(
      sum(col("n_a")).as("na"), sum(col("n_b")).as("nb"),
      count(lit(1)).as("v")).head
    val (na, nb, v) = (scalars.getLong(0), scalars.getLong(1), scalars.getLong(2))
    require(na > 0 && nb > 0,
      s"tokenKlContributions: empty corpus (N_a=$na, N_b=$nb) — KL undefined")
    // (n+1)·2^20 must fit a Long: n ≤ N, so N < 2^43 (~8.8e12 tokens
    // per side) is the exact-integer ceiling; fail loudly, don't wrap.
    require(na < (Long.MaxValue / Scale) - 1 && nb < (Long.MaxValue / Scale) - 1,
      s"tokenKlContributions: corpus too large for Q20 fixed point " +
        s"(N_a=$na, N_b=$nb >= 2^43) — pre-aggregate or sample first")

    val withP = joined
      .withColumn("__sa",
        greatest(expr(s"((n_a + 1L) * ${Scale}L) div ${na + v}L"), lit(1L)))
      .withColumn("__sb",
        greatest(expr(s"((n_b + 1L) * ${Scale}L) div ${nb + v}L"), lit(1L)))
      .withColumn("__la", graft.functions.ILog2Q20.ilog2Q20(col("__sa")))
      .withColumn("__lb", graft.functions.ILog2Q20.ilog2Q20(col("__sb")))
    withP.select(col("token"), col("n_a"), col("n_b"),
      (col("__sa") * (col("__la") - col("__lb"))).as("contrib_q40"))
  }

  /** Jensen–Shannon contributions `(token, n_a, n_b, contrib_q40)` —
    * the SYMMETRIC, BOUNDED member of the drift family:
    * [[tokenKlContributions]]' KL(A‖B) is direction-dependent and a
    * token near-absent from B can dominate the sum unboundedly; JSD
    * treats the corpora symmetrically and is bounded (≤ 1 bit), which
    * makes thresholds transferable across corpus pairs — the usual
    * dashboard choice. `Σ contrib_q40 / 2` is the corpus JSD in Q40
    * log2 units.
    *
    * Exactness: computed ON THE QUANTIZED Q20 probabilities (the same
    * add-one-smoothed `s = max(⌊(n+1)·2²⁰/(N+V)⌋, 1)` as the KL path)
    * with the mixture as the integer half `m = (s_a + s_b) div 2` —
    * every term integer, order-independent, replayed in DuckDB via the
    * q79 recursive-CTE ilog2 (q224). Per-token contribution
    * `s_a·(L(s_a)−L(m)) + s_b·(L(s_b)−L(m))` is ≥ 0 up to the one-ulp
    * quantization of `m`.
    *
    * Scale shape: identical to the KL path — two token aggregates, one
    * full-outer join (shuffle carries DISTINCT tokens), a 1-row scalar
    * guard, map-only scoring.
    */
  def tokenJsdContributions(
      a: DataFrame, b: DataFrame, textCol: String): DataFrame = {
    def counts(df: DataFrame, out: String): DataFrame =
      df.select(explode(split(TextStats.normalize(col(textCol)), " "))
          .as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token")).agg(count(lit(1)).as(out))

    val joined = counts(a, "n_a")
      .join(counts(b, "n_b"), Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .localCheckpoint(true)

    val scalars = joined.agg(
      sum(col("n_a")).as("na"), sum(col("n_b")).as("nb"),
      count(lit(1)).as("v")).head // bounded: ONE row
    val (na, nb, v) = (scalars.getLong(0), scalars.getLong(1), scalars.getLong(2))
    require(na > 0 && nb > 0,
      s"tokenJsdContributions: empty corpus (N_a=$na, N_b=$nb) — JSD undefined")
    require(na < (Long.MaxValue / Scale) - 1 && nb < (Long.MaxValue / Scale) - 1,
      s"tokenJsdContributions: corpus too large for Q20 fixed point " +
        s"(N_a=$na, N_b=$nb >= 2^43) — pre-aggregate or sample first")

    joined
      .withColumn("__sa",
        greatest(expr(s"((n_a + 1L) * ${Scale}L) div ${na + v}L"), lit(1L)))
      .withColumn("__sb",
        greatest(expr(s"((n_b + 1L) * ${Scale}L) div ${nb + v}L"), lit(1L)))
      .withColumn("__sm", expr("(__sa + __sb) div 2L"))
      .withColumn("__la", graft.functions.ILog2Q20.ilog2Q20(col("__sa")))
      .withColumn("__lb", graft.functions.ILog2Q20.ilog2Q20(col("__sb")))
      .withColumn("__lm", graft.functions.ILog2Q20.ilog2Q20(col("__sm")))
      .select(col("token"), col("n_a"), col("n_b"),
        (col("__sa") * (col("__la") - col("__lm")) +
          col("__sb") * (col("__lb") - col("__lm"))).as("contrib_q40"))
  }

  /** Population stability index contributions over a PRE-BINNED
    * feature — the industry-standard "did this feature's distribution
    * shift" gate (scorecard monitoring; the usual rules of thumb
    * PSI < 0.1 stable / > 0.25 shifted transfer after dividing by
    * ln 2, since this variant is log2-based for exactness):
    *
    *   PSI = Σ_b (p_A(b) − p_B(b)) · (log2 p_A(b) − log2 p_B(b))
    *
    * Per-bin summands are this operator's output rows (every one is
    * ≥ 0, so the report ranks which bins MOVED — the actionable part
    * KS's single max-statistic doesn't give); Σ `contrib_q40` is the
    * corpus-level index. Same exactness contract as
    * [[tokenKlContributions]]: add-one-smoothed Q20 fixed-point
    * probabilities over the union bin set, integer square-and-shift
    * log2, exact Q40 integer products — order-independent,
    * engine-replayable (q114), no IEEE transcendentals.
    *
    * Binning is the CALLER's (integer buckets, quantile ids,
    * categorical values) because the binning rule is part of the
    * monitored contract — an operator that re-derives bins from data
    * would silently move the goalposts between runs. Scale shape: one
    * count aggregate per side (shuffle carries DISTINCT bins), a
    * full-outer join of two bin-sized tables, map-only native-codegen
    * arithmetic, ONE bounded (N, V) scalar collect for the up-front
    * fixed-point range guard.
    */
  def psiContributions(
      a: DataFrame, b: DataFrame, binCol: String): DataFrame = {
    def counts(df: DataFrame, out: String): DataFrame =
      df.select(when(col(binCol).isNull,
          raise_error(lit(s"psiContributions: NULL $binCol — bin " +
            "explicitly, a silent drop would shift the distribution")))
          .otherwise(col(binCol)).as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(out))

    val joined = counts(a, "n_a")
      .join(counts(b, "n_b"), Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
      .localCheckpoint(true)

    val scalars = joined.agg(
      sum(col("n_a")).as("na"), sum(col("n_b")).as("nb"),
      count(lit(1)).as("v")).head
    val (na, nb, v) =
      (scalars.getLong(0), scalars.getLong(1), scalars.getLong(2))
    require(na > 0 && nb > 0,
      s"psiContributions: empty side (N_a=$na, N_b=$nb) — PSI undefined")
    require(na < (Long.MaxValue / Scale) - 1 && nb < (Long.MaxValue / Scale) - 1,
      s"psiContributions: side too large for Q20 fixed point " +
        s"(N_a=$na, N_b=$nb >= 2^43) — pre-aggregate or sample first")

    joined
      .withColumn("__sa",
        greatest(expr(s"((n_a + 1L) * ${Scale}L) div ${na + v}L"), lit(1L)))
      .withColumn("__sb",
        greatest(expr(s"((n_b + 1L) * ${Scale}L) div ${nb + v}L"), lit(1L)))
      .withColumn("__la", graft.functions.ILog2Q20.ilog2Q20(col("__sa")))
      .withColumn("__lb", graft.functions.ILog2Q20.ilog2Q20(col("__sb")))
      .select(col("bin"), col("n_a"), col("n_b"),
        ((col("__sa") - col("__sb")) * (col("__la") - col("__lb")))
          .as("contrib_q40"))
  }
}
