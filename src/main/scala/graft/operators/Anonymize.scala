package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity suppression — the record-level privacy gate that runs
  * beside PII redaction ([[graft.text.Redact]] scrubs VALUES inside
  * text; this suppresses ROWS whose quasi-identifier combination is
  * rare enough to re-identify someone). A row is k-anonymous when at
  * least `k` rows share its full quasi-identifier (QI) tuple; rows in
  * smaller groups are suppressed (Sweeney 2002). North-star extension
  * (SURVEY §2.11).
  *
  * NULL handling: NULL is a QI value like any other (grouping treats
  * the whole tuple null-safely) — a null zip code shared by 3 rows is
  * a group of 3, not 3 singletons; anything else would leak through
  * missing data.
  *
  * Scale shape: one map-side-combinable `groupBy(qi).count`, then one
  * inner equi-join of the rows against the qualifying groups. The
  * group table is bounded by the QI domain (≪ rows for any QI worth
  * the name), so AQE turns the join-back into a broadcast at runtime;
  * a window `count over (partition by qi)` would plan the same
  * exchange but lose the map-side combine and add a sort. Suppression
  * is exact, not sketched — an undercounted group would leak rows.
  */
object Anonymize {

  private def nsEq(a: DataFrame, b: DataFrame, cols: Seq[String]): Column =
    cols.map(c => a(c) <=> b(c)).reduce(_ && _)

  /** Per-QI-group audit: `(qiCols…, n, at_risk)` where `at_risk` marks
    * groups smaller than `k` — what a privacy review reads before
    * anyone decides to suppress, generalize, or collect more data.
    */
  def groupSizes(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "groupSizes needs at least one QI column")
    require(k >= 1, s"k must be >= 1, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("at_risk", col("n") < k)
  }

  /** Rows whose QI group has at least `k` members; everything else is
    * suppressed. Output schema = input schema.
    */
  def suppressBelowK(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    val keep = groupSizes(df, qiCols, k)
      .filter(!col("at_risk"))
      .select(qiCols.map(col): _*)
    val d = df.as("d")
    val g = keep.as("g")
    d.join(g, nsEq(d, g, qiCols), "inner")
      .select(df.columns.toSeq.map(c => d(c).as(c)): _*)
  }
}
