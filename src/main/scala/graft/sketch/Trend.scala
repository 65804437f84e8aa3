package graft.sketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bivariate co-moment sketch + per-group OLS trend — the sketch
  * family's two-variable member: [[Moments]] describes ONE numeric
  * column per group; this relates TWO (`y` over `x`), answering the
  * monitoring questions a corpus pipeline actually asks — "is this
  * source's quality score drifting DOWN over ingest days", "does doc
  * length trend with date crawled" — as a closed-form least-squares
  * line per group, no training loop.
  *
  * The sketch is exact-integer co-moment sums `(n, Σx, Σy, Σx², Σxy)`
  * over decimally-quantized values — the mergeable form ([[Moments]]'
  * raw-vs-finished split): sums add across shards/days/batches; the
  * line is derived after the final merge. Closed forms clear μ out:
  *
  *   slope_q     = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *   intercept_q = (Σy·Σx² − Σx·Σxy) / (n·Σx² − (Σx)²)
  *
  * — both ONE IEEE divide of exact decimal(38,0) integers, so results
  * are bit-replayable. A group whose x is constant has no line: the
  * denominator is zero and both outputs are NULL (deliberately not an
  * error — "one ingest day so far" is data, not a bug). Outputs are in
  * quantized units (`y_q per x_q`); rescaling by 10^(dx−dy) is the
  * caller's one multiply, kept OUT of here so the oracle divide stays
  * the last operation.
  *
  * Overflow contract ([[Moments.finish]] style): every term is
  * bounded by `2·(n·Bx·By)·max(n·Bx, ...)` ≤ `2·n²·B²` for
  * `B = max(|x|,|y|)` — the sketch carries both absmaxes and
  * [[fitLines]] fail-louds in log-space when `2·(n·B)²` could leave
  * the exact decimal(38,0) range.
  *
  * Scale shape: ONE map-side-combinable aggregate; the shuffle
  * carries `|groups|` rows of seven integers. Merging two corpora's
  * sketches is a `|groups|`-sized union+sum ([[mergeSketches]]).
  */
object Trend {

  /** `(group, n, x_absmax, y_absmax, sx, sy, sxx, sxy)` — exact
    * co-moment sums of `⌊·10^decimals⌋`-quantized x and y per group.
    * NULLs raise ([[Moments]] contract: a silent drop biases the fit).
    */
  def sketch(
      df: DataFrame, groupCol: String, xCol: String, yCol: String,
      xDecimals: Int = 0, yDecimals: Int = 0): DataFrame = {
    require(xDecimals >= 0 && xDecimals <= 9,
      s"xDecimals must be in [0, 9], got $xDecimals")
    require(yDecimals >= 0 && yDecimals <= 9,
      s"yDecimals must be in [0, 9], got $yDecimals")
    def q(c: String, decimals: Int) =
      when(col(c).isNull,
        raise_error(lit(s"Trend.sketch: NULL $c — drop explicitly, " +
          "a silent skip would bias the fit")))
        .otherwise(floor(col(c).cast("double") *
          lit(math.pow(10.0, decimals))).cast("long"))
    df.select(col(groupCol).as("group"),
        q(xCol, xDecimals).cast("decimal(38,0)").as("x"),
        q(yCol, yDecimals).cast("decimal(38,0)").as("y"))
      .groupBy(col("group"))
      .agg(
        count(lit(1)).as("n"),
        max(abs(col("x"))).as("x_absmax"),
        max(abs(col("y"))).as("y_absmax"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
  }

  /** Element-wise sum (max for absmaxes) of two sketch tables built
    * with the SAME decimals — the sketch of the concatenated corpora.
    */
  def mergeSketches(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("group"))
      .agg(sum(col("n")).as("n"),
        max(col("x_absmax")).as("x_absmax"),
        max(col("y_absmax")).as("y_absmax"),
        sum(col("sx")).as("sx"), sum(col("sy")).as("sy"),
        sum(col("sxx")).as("sxx"), sum(col("sxy")).as("sxy"))

  /** Finished per-group line: sketch columns + `slope_q` /
    * `intercept_q` (NULL when x is constant within the group).
    */
  def fitLines(sk: DataFrame): DataFrame = {
    val n = col("n").cast("decimal(38,0)")
    // log10(2·(n·B)²) ≤ 37 ⇔ log10 n + log10 B ≤ (37 − log10 2)/2,
    // B = max absmax. Doubles compare magnitudes only (10× headroom);
    // result arithmetic stays exact decimal.
    val b = greatest(col("x_absmax"), col("y_absmax"))
    val guardOk = log(10.0, greatest(n.cast("double"), lit(1.0))) +
      log(10.0, greatest(b.cast("double"), lit(1.0))) <=
      lit((37.0 - math.log10(2.0)) / 2.0)
    def guarded(c: org.apache.spark.sql.Column) =
      when(!guardOk, raise_error(concat(
        lit("Trend.fitLines: 2·(n·max|q|)² may exceed the exact "),
        lit("decimal(38,0) range for group "), col("group").cast("string"),
        lit(" — lower decimals or pre-bucket the group"))))
        .otherwise(c)
    sk
      .withColumn("__den", guarded(n * col("sxx") - col("sx") * col("sx")))
      .withColumn("slope_q",
        when(col("__den") === 0, lit(null).cast("double"))
          .otherwise((n * col("sxy") - col("sx") * col("sy"))
            .cast("double") / col("__den").cast("double")))
      .withColumn("intercept_q",
        when(col("__den") === 0, lit(null).cast("double"))
          .otherwise((col("sy") * col("sxx") - col("sx") * col("sxy"))
            .cast("double") / col("__den").cast("double")))
      .drop("__den")
  }
}
