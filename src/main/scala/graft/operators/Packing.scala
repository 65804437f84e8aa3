package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the "concatenate every document's tokens, then
  * chop into fixed-length training sequences" step that turns a curated
  * corpus into LM training batches. Each document occupies the token
  * interval `[start, start + n)` of the virtual concatenated stream
  * (in a caller-chosen total order) and is emitted once per training
  * sequence it overlaps, with the slice coordinates a loader needs:
  * `(seq_id, id, seq_off, doc_off, n_tok)`.
  *
  * The global `start` offsets are a PREFIX SUM — the textbook
  * sequential scan that a naive Spark translation expresses as a
  * single-partition global window (`sum(n) over (order by key)`), a
  * non-starter at 100 TB: all rows funnel through one task. This
  * operator computes the same integers with the classic two-level
  * distributed scan:
  *
  *   1. coarse buckets from the order key (`key div bucketWidth`);
  *   2. one tiny aggregate: per-bucket token totals (#buckets rows,
  *      map-side combinable), cumulated on the driver into exclusive
  *      bucket offsets (bounded by #buckets, never by rows — the same
  *      contract as the IVF centroid collect);
  *   3. broadcast the (bucket, offset) table back; each row's start is
  *      `bucket offset + within-bucket running sum`, a window
  *      PARTITIONED BY BUCKET — every partition bounded by
  *      `bucketWidth` keys, all buckets in parallel.
  *
  * All arithmetic is integer, so the result is bit-deterministic and
  * replays in SQL as a plain global-window cumsum.
  */
object Packing {

  /** One output row per (document, sequence) overlap.
    *
    * @param orderCol    numeric column defining the concatenation
    *                    order; must be unique per row (`idCol` breaks
    *                    window ties defensively, but distinct rows with
    *                    equal keys make `start` order-dependent).
    * @param nTokCol     per-row unit count (tokens, chars, bytes…);
    *                    rows with 0 units are dropped (they occupy no
    *                    stream interval). Negative counts throw.
    * @param seqLen      training sequence length in the same units.
    * @param bucketWidth order-key span per scan bucket: sized so one
    *                    bucket's rows fit a task comfortably (dense
    *                    keys: ~rows per bucket; sparse keys: smaller
    *                    effective buckets — only the #buckets driver
    *                    cumsum cares, and it is bounded by
    *                    keyRange / bucketWidth).
    * @param maxBuckets  hard cap on occupied buckets, enforced BEFORE
    *                    the driver-side cumsum collect. A sparse 64-bit
    *                    order key (e.g. a hash id, which [[Splits]]
    *                    deliberately encourages) puts ~one row per
    *                    bucket, turning the "one row per bucket" collect
    *                    into an unbounded driver collect; this guard
    *                    fails loudly instead of OOMing the driver — the
    *                    same contract as `Components.maxDriverEdges` and
    *                    `SemDeDup.maxClusterSize`. The fix at scale is a
    *                    wider `bucketWidth` (or a denser order key), not
    *                    a bigger cap.
    */
  def packSequences(
      df: DataFrame, idCol: String, orderCol: String, nTokCol: String,
      seqLen: Long, bucketWidth: Long = 1L << 16,
      maxBuckets: Long = 4000000L): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    require(maxBuckets >= 1, s"maxBuckets must be >= 1, got $maxBuckets")

    // fail loudly on NULL or negative counts — a silent filter would
    // hide upstream tokenizer bugs AND corrupt every downstream offset
    val rows = df.select(
      col(idCol),
      col(orderCol).cast("long").as("__ord"),
      when(col(nTokCol).isNull || col(nTokCol).cast("long") < 0L,
        raise_error(concat(
          lit(s"packSequences: null or negative $nTokCol for $idCol="),
          col(idCol).cast("string"))))
        .otherwise(col(nTokCol).cast("long")).as("__n"))
      .filter(col("__n") =!= 0L)
    // `div` (integral divide) not `/`: long `/` goes through IEEE
    // doubles and mis-buckets keys above 2^53. Truncating division is
    // monotone in the key, which is all bucketing needs.
    val guarded = rows
      .withColumn("__b", expr(s"__ord div ${bucketWidth}L"))
      // materialize ONCE: both the totals collect below and the final
      // windowed plan read this narrow 4-column projection — without a
      // checkpoint the whole upstream pipeline runs twice (and the
      // raise_error guard fires here, before any partial output)
      .localCheckpoint(true)

    // count buckets FIRST (one cheap aggregate over the checkpointed
    // narrow projection) so an over-sparse order key fails loudly here
    // instead of as a silent driver OOM in the collect below
    val nBuckets = guarded.agg(countDistinct(col("__b"))).head.getLong(0)
    require(nBuckets <= maxBuckets,
      s"packSequences: $nBuckets occupied buckets exceeds maxBuckets=" +
        s"$maxBuckets — the driver-side bucket cumsum would collect one " +
        s"row per bucket. Widen bucketWidth (currently $bucketWidth) or " +
        s"use a denser order key.")

    // tiny agg: per-bucket totals -> driver-side exclusive prefix
    val totals = guarded.groupBy(col("__b")).agg(sum(col("__n")).as("__t"))
      .collect() // bounded: one row per bucket, nBuckets <= maxBuckets
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (b, t) => val o = acc; acc += t; (b, o) }
    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = broadcast(
      offsets.toSeq.toDF("__b2", "__off"))

    val w = Window.partitionBy(col("__b"))
      .orderBy(col("__ord"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val started = guarded
      .join(offsetDf, col("__b") === col("__b2"))
      .withColumn("__start", col("__off") + sum(col("__n")).over(w) - col("__n"))

    val L = lit(seqLen)
    started
      // __start >= 0 always (counts are non-negative), so truncating
      // `div` equals floor division and stays exact past 2^53
      .withColumn("seq_id", explode(sequence(
        expr(s"__start div ${seqLen}L"),
        expr(s"(__start + __n - 1) div ${seqLen}L"))))
      .select(
        col("seq_id"),
        col(idCol),
        greatest(lit(0L), col("__start") - col("seq_id") * L).as("seq_off"),
        greatest(lit(0L), col("seq_id") * L - col("__start")).as("doc_off"),
        (least((col("seq_id") + 1L) * L, col("__start") + col("__n"))
          - greatest(col("seq_id") * L, col("__start"))).as("n_tok"))
  }
}
