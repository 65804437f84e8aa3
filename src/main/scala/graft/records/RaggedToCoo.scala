package graft.records

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ragged array → rank-2 sparse COO conversion
  * (`ml_hadoop_experiment/tensorflow/numpy_to_sparse_tensors.py:13-57`).
  *
  * Two forms:
  *   - [[createSparseStacked]], the local batch converter used inside
  *     scoring operators (mirrors `create_sparse_np_stacked`, including
  *     the all-empty shortcut);
  *   - [[posexplodeCoo]], the distributed form: `posexplode` of an array
  *     column *is* the COO triple (row id, position, value) — Catalyst
  *     Generate, pipelined, no shuffle, arbitrarily large inputs.
  */
object RaggedToCoo {

  /** Reference `_generate_increments` (`numpy_to_sparse_tensors.py:13-29`):
    * `[2,3] -> [0,1,0,1,2]` — within-row position counters. Trailing zero
    * sizes contribute nothing.
    */
  def generateIncrements(sizes: Seq[Int]): Seq[Long] =
    sizes.iterator.flatMap(n => 0L until n.toLong).toSeq

  /** Local ragged→COO: (indices, values, denseShape) with
    * `denseShape = [nRows, maxLen]` and indices in row-major order.
    */
  def createSparseStacked[T](features: Seq[collection.Seq[T]]): (Seq[(Long, Long)], Seq[T], (Long, Long)) = {
    val lengths = features.map(_.size)
    val maxLen = if (lengths.isEmpty) 0 else lengths.max
    val denseShape = (features.size.toLong, maxLen.toLong)
    if (maxLen == 0) return (Seq.empty, Seq.empty, denseShape)
    val values = features.flatten
    val rowIds = lengths.zipWithIndex.flatMap { case (n, row) => Seq.fill(n)(row.toLong) }
    val positions = generateIncrements(lengths)
    (rowIds.zip(positions), values, denseShape)
  }

  /** Distributed COO: one output row per array element, columns
    * (rowId, pos, value). The caller provides the row-identifier column;
    * `posexplode` drops null/empty arrays, matching the sparse semantics
    * (no entries for empty rows).
    */
  def posexplodeCoo(df: DataFrame, rowId: Column, arrayCol: Column): DataFrame =
    df.select(rowId.as("row_id"), posexplode(arrayCol).as(Seq("pos", "value")))
}
