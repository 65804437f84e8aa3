package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space drift monitor — per-group exact-integer centroid
  * sums and the pairwise cosine between group centroids. The
  * embedding-marginal member of the drift family: [[graft.text.Drift]]
  * watches the token distribution, [[graft.eval.Ranking.ksStatistic]]
  * watches numeric marginals, and this watches where each group
  * (source, ingest batch, label) LIVES in embedding space — a cheap
  * per-batch answer to "did the new crawl's content move" and "which
  * sources are semantically close" before any quadratic document-level
  * comparison ([[SemDeDup]], [[Similarity]]) is spent.
  *
  * Exactness: coordinates quantize to `⌊x · 2^quantBits⌋` longs (the
  * [[KMeans]] convention) and per-(group, dim) sums are exact integers
  * — order-independent under any partitioning, mergeable across
  * batches (sum of sums), and SQL-replayable (q113). Cosine needs no
  * division by group counts at all: `cos(S_a/n_a, S_b/n_b) =
  * cos(S_a, S_b)`, so it is computed straight off the integer sum
  * vectors — exact decimal(38,0) dot/norm accumulators (a per-group
  * `‖S‖² ≤ 10³⁷` guard makes every cross term safe by Cauchy–Schwarz),
  * then one deterministic cast and IEEE sqrt/divide per pair.
  *
  * Scale shape: one map-side-combinable (group, dim) aggregate (the
  * shuffle carries `|groups| · dim` rows, never vectors), a
  * `|groups|`-sized norm table, and a pairwise join that is quadratic
  * in |groups| BY DESIGN (the sketch-level quadratic that replaces the
  * corpus-level one — same contract as
  * [[graft.sketch.SourceSketch]]). Nothing collects to the driver.
  */
object EmbeddingDrift {

  /** `(group, dim, s_q, n)` — exact quantized coordinate sums per
    * group and dimension; `n` is the group's vector count (repeated
    * per dim so the table is self-contained for merging: element-wise
    * `sum(s_q)`/`sum-consistent n` across batches is the union's
    * table). NULL vectors raise — a silent drop would shift the
    * centroid.
    */
  def centroidSums(
      df: DataFrame, groupCol: String, vecCol: String,
      quantBits: Int = 20): DataFrame = {
    require(quantBits >= 1 && quantBits <= 40,
      s"quantBits must be in [1, 40], got $quantBits")
    val scale = math.pow(2.0, quantBits) // exact power of two
    val vec = when(col(vecCol).isNull,
      raise_error(lit(s"centroidSums: NULL $vecCol — drop explicitly, " +
        "a silent skip would shift the centroid")))
      .otherwise(col(vecCol))
    df.select(col(groupCol).as("group"),
        posexplode(transform(vec,
          x => floor(x.cast("double") * lit(scale)).cast("long")))
          .as(Seq("dim", "q")))
      .groupBy(col("group"), col("dim"))
      .agg(sum(col("q")).as("s_q"), count(lit(1)).as("n"))
  }

  /** Pairwise `(group_a, group_b, n_a, n_b, cos)` over the centroid
    * sums of [[centroidSums]], group_a < group_b. Zero-norm groups
    * (all-zero or cancelling sums) emit NULL cos — undefined, not
    * silently 0.
    */
  def centroidCosineFromSums(sums: DataFrame): DataFrame = {
    val dec = (c: Column) => c.cast("decimal(19,0)")
    // ‖S‖² ≤ 1e37 makes every pairwise term safe: |Σ s_a·s_b| ≤
    // √(‖S_a‖²·‖S_b‖²) ≤ 1e37 < decimal(38,0) — Cauchy–Schwarz, also
    // valid for the partial sums of absolute products.
    val norms = sums
      .groupBy(col("group"))
      .agg(sum(dec(col("s_q")) * dec(col("s_q"))).as("norm2"),
        max(col("n")).as("n"))
      .withColumn("norm2",
        when(col("norm2") > lit(new java.math.BigDecimal(
            java.math.BigInteger.TEN.pow(37))),
          raise_error(concat(lit("centroidCosine: ‖S‖² exceeds the "),
            lit("exact-decimal ceiling 1e37 for group "),
            col("group").cast("string"),
            lit(" — lower quantBits or pre-scale the vectors"))))
          .otherwise(col("norm2")))

    val a = sums.select(col("group").as("group_a"), col("dim"),
      col("s_q").as("sa"))
    val b = sums.select(col("group").as("group_b"), col("dim"),
      col("s_q").as("sb"))
    val dots = a.join(b, Seq("dim"))
      .filter(col("group_a") < col("group_b"))
      .groupBy(col("group_a"), col("group_b"))
      .agg(sum(dec(col("sa")) * dec(col("sb"))).as("dot"))

    dots
      .join(norms.select(col("group").as("group_a"),
        col("norm2").as("na2"), col("n").as("n_a")), Seq("group_a"))
      .join(norms.select(col("group").as("group_b"),
        col("norm2").as("nb2"), col("n").as("n_b")), Seq("group_b"))
      .select(col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        when(col("na2") > 0 && col("nb2") > 0,
          col("dot").cast("double") /
            (sqrt(col("na2").cast("double")) *
              sqrt(col("nb2").cast("double")))).as("cos"))
  }

  /** End-to-end: vectors → pairwise group-centroid cosine matrix. */
  def centroidCosine(
      df: DataFrame, groupCol: String, vecCol: String,
      quantBits: Int = 20): DataFrame =
    centroidCosineFromSums(centroidSums(df, groupCol, vecCol, quantBits))
}
