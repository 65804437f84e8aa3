package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Dense global row enumeration — contiguous ids `0..n−1` in a given
  * total order. The training-data uses: stable example ids for packed /
  * sharded corpora, vocab ids after a frequency sort, positional ids
  * for parallel array sinks.
  *
  * The naive form — `row_number() OVER (ORDER BY …)` with no partition
  * — moves the ENTIRE dataset through one window partition (Spark even
  * warns "Moving all data to a single partition"). This operator is the
  * scale-safe equivalent: a range repartition + per-partition sort
  * (the same machinery as a global `orderBy`, shuffle carries rows once
  * and each partition sorts locally), then the classic two-job
  * enumeration — count rows per partition (a #partitions-sized driver
  * array, the repo's bounded-collect contract), then add each
  * partition's running offset to its local index. `zipWithIndex` is
  * exactly that two-level scan; the per-partition imperative step is
  * the documented "genuine per-partition logic" RDD exception — no
  * window, no driver data path proportional to rows.
  *
  * Determinism contract: `orderCols` must be a TOTAL order (include a
  * unique tie-break column). Under that contract the assignment is a
  * pure function of the data — layout- and partitioning-independent
  * (range boundaries may move; the global order, and therefore every
  * id, cannot), which is what the q105 oracle's `row_number()` replay
  * checks end to end.
  */
object Enumerate {

  /** Append `idCol` = the row's 0-based position in the `orderCols`
    * total order.
    */
  def denseIds(
      df: DataFrame, orderCols: Seq[String], idCol: String = "dense_id"): DataFrame = {
    require(orderCols.nonEmpty, "denseIds needs at least one order column")
    require(!df.columns.contains(idCol),
      s"column $idCol already exists on the input")
    val sorted = df
      .repartitionByRange(orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = sorted.schema.add(idCol, LongType, nullable = false)
    val rows = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ idx)
    }
    df.sparkSession.createDataFrame(rows, schema)
  }
}
