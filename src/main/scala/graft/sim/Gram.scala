package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact Gram/covariance accumulation + driver-side PCA — the
  * embedding-space analysis step before the ANN family commits to a
  * layout: decorrelate/whiten vectors, pick how many dimensions carry
  * the variance (a 64-dim corpus whose top 8 components hold 95%
  * wants an 8-dim IVF), and monitor drift structurally (q113 compares
  * means; eigenstructure says whether the SHAPE moved).
  *
  * Split follows the sketch-family raw-vs-finished contract
  * ([[graft.sketch.Moments]]): the distributed part accumulates the
  * mergeable EXACT form — quantized component sums `s_i` and
  * upper-triangle product sums `s_ij` (integer, order- and
  * partition-independent, one aggregate) — and the finishing
  * (covariance = G/n − μμᵀ, then eigenvectors) happens on the driver
  * over a d×d table, because d² is a CONSTANT (64² longs = 32 KB)
  * while n is the corpus: collecting d² is the bounded-collect
  * contract, iterating eigensolvers over the cluster would be
  * orchestration with no data to distribute.
  *
  * Scale shape: the accumulate pass explodes each vector to its d +
  * d(d+1)/2 quantized terms and feeds ONE map-side-combinable
  * aggregate — partial state is d² groups per partition regardless of
  * rows, the shuffle carries d² rows total. (An explode-free
  * array-buffer aggregator would save the row expansion's CPU; the
  * explode form is chosen because every term is then plain SQL and
  * the oracle replays the entire accumulation bit-for-bit.)
  */
object Gram {

  /** Exact accumulation table: `(i, j, n, s)` where
    * `j = -1` rows carry `s = Σ q_i` (component sums) and `i <= j`
    * rows carry `s = Σ q_i·q_j` (upper-triangle products);
    * `q = ⌊x·10^decimals⌋`. NULL or empty vectors raise; dimension
    * mismatches raise (a ragged corpus would silently mis-add).
    */
  def accumulate(
      df: DataFrame, vecCol: String, dim: Int,
      decimals: Int = 3): DataFrame = {
    require(dim >= 1, s"dim must be >= 1, got $dim")
    require(decimals >= 0 && decimals <= 6,
      s"decimals must be in [0, 6], got $decimals")
    val scale = math.pow(10.0, decimals)
    val q = df
      .select(when(col(vecCol).isNull || size(col(vecCol)) =!= dim,
        raise_error(concat(lit(s"Gram.accumulate: $vecCol NULL or not "),
          lit(s"$dim-dimensional — a ragged corpus would mis-add"))))
        .otherwise(transform(col(vecCol),
          x => floor(x.cast("double") * scale).cast("long"))).as("q"))
    // one row per (i=idx, j=-1) component term and (i<=j) product term
    val terms = q.select(explode(
      concat(
        transform(sequence(lit(0), lit(dim - 1)),
          i => struct(i.as("i"), lit(-1).as("j"),
            element_at(col("q"), i + 1).as("t"))),
        flatten(transform(sequence(lit(0), lit(dim - 1)),
          i => transform(sequence(i, lit(dim - 1)),
            j => struct(i.as("i"), j.as("j"),
              (element_at(col("q"), i + 1) *
                element_at(col("q"), j + 1)).as("t"))))))).as("e"))
    terms
      .groupBy(col("e.i").as("i"), col("e.j").as("j"))
      .agg(count(lit(1)).as("n"), sum(col("e.t")).as("s"))
  }

  /** Element-wise sum of two accumulation tables built with the SAME
    * (dim, decimals) — the accumulation of the concatenated corpora
    * (the [[graft.sketch.Moments.mergeSketches]] contract).
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy(col("i"), col("j"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))

  /** Mean vector implied by an [[accumulate]] table, in original
    * units (the `j = -1` rows divided by n and the quantization
    * scale).
    */
  def meanVector(acc: DataFrame, dim: Int, decimals: Int): Array[Double] = {
    val scale = math.pow(10.0, decimals)
    val mean = new Array[Double](dim)
    acc.filter(col("j") === -1).collect() // bounded: d rows
      .foreach { r =>
        mean(r.getAs[Int]("i")) =
          r.getAs[Long]("s").toDouble / r.getAs[Long]("n") / scale
      }
    mean
  }

  /** Map-only projection of `vecCol` onto `components` (typically
    * [[principalComponents]] output) after centering on `means`:
    * appends `outCol` as a k-dim double array. The dimension-reduction
    * step before a cheaper ANN layout — pure column algebra
    * (`zip_with` + `aggregate` folds over literal component arrays),
    * no UDF, no shuffle.
    */
  def projectTo(
      df: DataFrame, vecCol: String, outCol: String,
      components: Seq[Array[Double]], means: Array[Double]): DataFrame = {
    require(components.nonEmpty, "projectTo needs at least one component")
    val meanArr = array(means.toSeq.map(lit): _*)
    val centered = zip_with(col(vecCol), meanArr,
      (x, m) => x.cast("double") - m)
    val proj = array(components.map { comp =>
      aggregate(
        zip_with(centered, array(comp.toSeq.map(lit): _*),
          (x, w) => x * w),
        lit(0.0), (acc, v) => acc + v)
    }: _*)
    df.withColumn(outCol, proj)
  }

  /** Driver-side finish: top-`k` principal components of the
    * covariance implied by an [[accumulate]] table. Returns
    * `(eigenvalue, eigenvector)` pairs, eigenvalues descending, in
    * ORIGINAL (unquantized) units. Jacobi rotations on the d×d
    * symmetric matrix — O(d³) driver work on a constant-sized object.
    * Eigenvector sign is fixed deterministically (largest-|component|
    * entry made positive).
    */
  def principalComponents(
      acc: DataFrame, dim: Int, decimals: Int, k: Int): Seq[(Double, Array[Double])] = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim], got $k")
    val rows = acc.collect() // bounded: d + d(d+1)/2 rows by contract
    require(rows.nonEmpty, "empty accumulation table")
    val n = rows.head.getAs[Long]("n").toDouble
    val scale = math.pow(10.0, decimals)
    val mean = new Array[Double](dim)
    val cov = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      val (i, j, s) = (r.getAs[Int]("i"), r.getAs[Int]("j"), r.getAs[Long]("s"))
      if (j == -1) mean(i) = s / n / scale
      else { cov(i)(j) = s / n / (scale * scale); cov(j)(i) = cov(i)(j) }
    }
    for (i <- 0 until dim; j <- 0 until dim)
      cov(i)(j) -= mean(i) * mean(j)

    // cyclic Jacobi until off-diagonal mass is negligible
    val v = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (off > 1e-12 && sweep < 64) {
      off = 0.0
      for (p <- 0 until dim; qq <- (p + 1) until dim) {
        off += cov(p)(qq) * cov(p)(qq)
        if (math.abs(cov(p)(qq)) > 1e-15) {
          val theta = 0.5 * math.atan2(
            2 * cov(p)(qq), cov(qq)(qq) - cov(p)(p))
          val (c, s) = (math.cos(theta), math.sin(theta))
          for (r <- 0 until dim) {
            val (a, b) = (cov(r)(p), cov(r)(qq))
            cov(r)(p) = c * a - s * b; cov(r)(qq) = s * a + c * b
          }
          for (r <- 0 until dim) {
            val (a, b) = (cov(p)(r), cov(qq)(r))
            cov(p)(r) = c * a - s * b; cov(qq)(r) = s * a + c * b
          }
          for (r <- 0 until dim) {
            val (a, b) = (v(r)(p), v(r)(qq))
            v(r)(p) = c * a - s * b; v(r)(qq) = s * a + c * b
          }
        }
      }
      sweep += 1
    }
    (0 until dim)
      .map(i => (cov(i)(i), Array.tabulate(dim)(r => v(r)(i))))
      .sortBy(-_._1)
      .take(k)
      .map { case (ev, vec) =>
        val m = vec.indices.maxBy(i => math.abs(vec(i)))
        (ev, if (vec(m) < 0) vec.map(-_) else vec)
      }
  }
}
