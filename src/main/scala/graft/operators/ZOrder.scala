package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-dimensional layout
  * technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleave the
  * bits of several sort keys so that range-partitioning by the single
  * interleaved value co-locates rows that are close in EVERY key.
  * Sorting by (a, b) prunes scans filtered on `a` but scatters `b`;
  * z-ordering keeps both dimensions' parquet row-group min/max stats
  * tight, so selective filters on EITHER column (or both) skip most
  * files — at 100 TB, data-skipping effectiveness IS query latency for
  * point-ish queries.
  *
  * Scale shape: the z-value is a map-only codegen'd projection
  * (shift/and/or algebra, no UDF); the layout write is one
  * `repartitionByRange` exchange on the z-value (range boundaries by
  * sampling, Spark-standard) plus a per-partition sort. All integer
  * arithmetic — the z-value replays exactly in any engine with bit
  * operators (q96).
  */
object ZOrder {

  /** Morton-interleaved z-value of two non-negative columns using the
    * low `bits` bits of each (values are masked, so out-of-range high
    * bits degrade locality gracefully instead of erroring): bit i of
    * `a` lands at position 2i, bit i of `b` at 2i+1.
    */
  def zValue2(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(1L), 2 * i) +
        shiftleft(shiftright(bl, i).bitwiseAND(1L), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** `df` plus `outCol` = the z-value of (`aCol`, `bCol`). */
  def withZValue(
      df: DataFrame, aCol: String, bCol: String,
      bits: Int = 16, outCol: String = "zvalue"): DataFrame =
    df.withColumn(outCol, zValue2(col(aCol), col(bCol), bits))

  /** Write `df` z-ordered by (`aCol`, `bCol`): range-partition on the
    * z-value into `nFiles` output partitions, sort within each, write
    * parquet (the z-value itself is not persisted — it is a layout
    * key, reproducible from the data). Readers filtering on either
    * column skip files via row-group min/max stats.
    */
  def writeZOrdered(
      df: DataFrame, aCol: String, bCol: String, path: String,
      nFiles: Int, bits: Int = 16): Unit = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    withZValue(df, aCol, bCol, bits, "__z")
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
