package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: match each left row to the single most recent right row
  * with `right.ts <= left.ts` within the same key group — the canonical
  * event-stream enrichment operator (pandas `merge_asof`, DuckDB
  * `ASOF JOIN`) that Spark lacks natively.
  *
  * Two implementations:
  *   - [[joinAsOf]] (this file): composed from built-ins per the
  *     preference order — union the tagged sides, one window pass
  *     carries the latest right payload forward, filter back to left
  *     rows. One shuffle + one sort over |L|+|R| rows.
  *   - [[graft.plans.AsOfJoinExec]]: the custom physical operator
  *     (sort-merge within co-partitioned sorted partitions), same
  *     semantics, streaming O(1) state per key group.
  *
  * Tie rule: right rows at exactly `left.ts` match (<=); among right
  * rows sharing (keys, ts), callers should pre-aggregate to one row —
  * the window form takes the *last* in (ts, side) order, which is
  * engine-dependent otherwise.
  *
  * 100 TB notes: both forms shuffle each side once by key. The composed
  * form sorts |L|+|R| rows per partition; at heavy skew (one hot key)
  * use [[Skew]] salting on the key plus per-salt as-of with boundary
  * stitching, or pre-bucket both sides by key.
  */
object AsOf {

  /** Composed as-of left join. Output: every `left` column, then each
    * right payload column (right columns minus keys minus `tsCol`), then
    * `<tsCol>_right` — all right-side fields null when no match exists.
    */
  def joinAsOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one key column")
    val leftPayload = left.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq
    val rightPayload = right.columns.filterNot(c => keys.contains(c) || c == tsCol).toSeq

    // tag and align the two sides on a common schema
    val taggedLeft = left.select(
      (keys.map(col) :+ col(tsCol) :+ lit(1).as("__is_left")) ++
        leftPayload.map(col) :+
        lit(null).cast(rightStructType(right, rightPayload, tsCol)).as("__right"): _*)
    val taggedRight = right.select(
      (keys.map(col) :+ col(tsCol) :+ lit(0).as("__is_left")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct((col(tsCol).as(s"${tsCol}_right") +: rightPayload.map(col)): _*).as("__right"): _*)

    // right rows order before left rows at equal ts, so ts-equal matches
    // are included (<= semantics); the window carries the latest right
    // struct forward within each key group
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__is_left").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = taggedLeft.unionByName(taggedRight)
      .withColumn("__match", last(when(col("__is_left") === 0, col("__right")), ignoreNulls = true).over(w))

    matched.filter(col("__is_left") === 1).select(
      (keys.map(col) :+ col(tsCol)) ++
        leftPayload.map(col) ++
        rightPayload.map(c => col(s"__match.$c").as(c)) :+
        col(s"__match.${tsCol}_right").as(s"${tsCol}_right"): _*)
  }

  private def rightStructType(
      right: DataFrame, rightPayload: Seq[String], tsCol: String) =
    org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField(
        s"${tsCol}_right", right.schema(tsCol).dataType) +:
        rightPayload.map(c =>
          org.apache.spark.sql.types.StructField(c, right.schema(c).dataType)))
}
