package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.KrHash

/** Deterministic stride-scheduled interleaving — the ORDER a mixed
  * corpus streams into training. [[Mixing]] decides HOW MUCH of each
  * source to take; this decides WHERE each row lands in the epoch:
  * weight-proportional and evenly spread (a 3:1 mix must read
  * A,A,A,B,A,A,A,B…, not all of A then all of B — with
  * sequential-epoch training, source order IS curriculum, and
  * accidental source ordering is a known loss-spike source), with no
  * RNG anywhere, so the epoch order is bit-reproducible across
  * runs/retries/cluster sizes and replayable in SQL (q126).
  *
  * Stride scheduling (the classic proportional-share scheduler): each
  * source emits at virtual times `(r+1) · stride_s` for per-source
  * rank `r`, `stride_s = ⌊W · 2²⁰ / w_s⌋` — heavier sources tick
  * faster, so any prefix of the merged timeline holds each source in
  * ≈ its weight share (off by at most one tick per source). Rows
  * within a source are pre-shuffled by KR hash (an epoch order that
  * follows ingest order is the other classic curriculum accident).
  *
  * Exactness: ranks are [[Enumerate.denseIds]] positions (global
  * enumeration minus per-source offsets — per-source `row_number`
  * without a row-scale window partition; the offsets are a
  * #sources-bounded cumsum, q105's contract), virtual times are exact
  * integer products, and the final position is a second enumeration
  * in `(vtime, source, rank)` order — a TOTAL order, so the
  * permutation is a pure function of the data. A `|df| · max stride`
  * overflow guard fail-louds off the source counts the offsets
  * already collect.
  *
  * Scale shape: two [[Enumerate.denseIds]] passes (range shuffle +
  * two-level scan each), one broadcast-sized offsets join; the
  * driver sees one row per SOURCE, never per row.
  */
object Interleave {

  /** `(input columns…, src_rank, vtime, position)` — `position` is the
    * row's 0-based slot in the interleaved epoch. `weights` maps every
    * source to a positive integer share (missing source raises —
    * silently dropping a source would starve it; drop explicitly).
    * `idCol` must be unique per row (it tie-breaks both orders).
    */
  def stridedOrder(
      df: DataFrame, sourceCol: String, idCol: String,
      weights: Map[String, Long], salt: String = "mix"): DataFrame = {
    require(weights.nonEmpty, "stridedOrder: need at least one weight")
    require(weights.values.forall(_ > 0),
      s"stridedOrder: weights must be positive, got $weights")
    val totalW = weights.values.sum
    val strides = weights.map { case (s, w) =>
      s -> (totalW * (1L << 20)) / w
    }
    val maxStride = strides.values.max

    val hashed = df
      .withColumn("__h",
        KrHash.krHash(concat(lit(salt), col(idCol).cast("string"))))
    val global = Enumerate.denseIds(hashed,
      Seq(sourceCol, "__h", idCol), "__g")

    // per-source start offsets: one row per source, q105's bounded-
    // collect contract (the same table sizes the overflow guard)
    val counts = global.groupBy(col(sourceCol)).agg(count(lit(1)).as("__c"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    val nRows = counts.map(_._2).sum
    require(nRows + 1 <= Long.MaxValue / math.max(maxStride, 1L),
      s"stridedOrder: |df| = $nRows rows at max stride $maxStride " +
        "overflows exact long virtual time — reduce the weight skew")
    counts.foreach { case (s, _) =>
      require(weights.contains(s),
        s"stridedOrder: source '$s' has no weight — a silent drop " +
          "would starve it; drop the rows explicitly or add a weight")
    }
    val starts = {
      var acc = 0L
      counts.map { case (s, c) => val st = acc; acc += c; s -> st }
    }
    val startExpr = starts.foldLeft(lit(null).cast("long")) {
      case (e, (s, st)) => when(col(sourceCol) === s, lit(st)).otherwise(e)
    }
    val strideExpr = strides.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("long")) {
        case (e, (s, st)) => when(col(sourceCol) === s, lit(st)).otherwise(e)
      }

    val timed = global
      .withColumn("src_rank", col("__g") - startExpr)
      .withColumn("vtime", (col("src_rank") + 1L) * strideExpr)
      .drop("__g")
    Enumerate.denseIds(timed, Seq("vtime", sourceCol, "src_rank"),
        "position")
      .drop("__h")
  }
}
