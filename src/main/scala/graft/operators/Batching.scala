package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.KrHash

/** Length-bucketed batch assignment — the padding-efficiency step
  * between curation and the training loop: batching sequences of
  * wildly different lengths together pads every row to the batch max
  * (a 2 000-token outlier in a batch of 200-token rows wastes 90% of
  * the batch's FLOPs), so rows are first routed to caller-owned
  * length buckets and batches are formed WITHIN a bucket; every row
  * then pads only to its bucket's bound. The complement of
  * [[Packing]]: packing concatenates short docs into full sequences
  * (pretraining), bucketed batching groups same-length sequences
  * (SFT / inference, where examples must stay separate).
  *
  * Buckets are the CALLER's ascending inclusive upper bounds —
  * deriving them from data would move the goalposts between runs
  * (the [[graft.text.Drift]] PSI argument); a length past the last
  * bound raises. Within a bucket, rows are KR-hash shuffled (batch
  * composition should not mirror ingest order — the [[Interleave]]
  * curriculum argument at batch granularity) and ranked scale-safely:
  * [[Enumerate.denseIds]] global positions minus per-bucket offsets
  * (a #buckets-bounded collect), never a row-scale window partition.
  * Then `batch_idx = rank div B`, `pos_in_batch = rank mod B` —
  * exact integer arithmetic end to end, SQL-replayable (q127).
  *
  * Scale shape: one enumeration (range shuffle + two-level scan) +
  * a literal bucket CASE chain; the driver sees one row per BUCKET.
  * The per-batch padding waste `Σ(bound − len)` is an ordinary
  * aggregate downstream of the assignment.
  */
object Batching {

  /** `(input columns…, bucket_bound, batch_idx, pos_in_batch)` —
    * `bucket_bound` the row's padded length, `(bucket_bound,
    * batch_idx)` the batch key. `idCol` must be unique (rank
    * tie-break); NULL/negative lengths and lengths past the last
    * bound raise.
    */
  def lengthBucketedBatches(
      df: DataFrame, idCol: String, lenCol: String,
      boundaries: Seq[Long], batchSize: Int,
      salt: String = "batch"): DataFrame = {
    require(boundaries.nonEmpty, "need at least one bucket boundary")
    require(boundaries == boundaries.sorted && boundaries.distinct == boundaries,
      s"boundaries must be strictly ascending, got $boundaries")
    require(boundaries.head >= 1, s"boundaries must be >= 1, got $boundaries")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")

    val len = when(col(lenCol).isNull || col(lenCol) < 0L,
      raise_error(lit(s"lengthBucketedBatches: NULL or negative $lenCol " +
        "— drop explicitly, a silent skip would hide tokenizer bugs")))
      .otherwise(col(lenCol).cast("long"))
    // first bound >= len, else raise: an over-long row silently put in
    // the top bucket would overflow the training sequence length
    val bound = boundaries.reverse.foldLeft(
      raise_error(concat(
        lit(s"lengthBucketedBatches: $lenCol "), col(lenCol).cast("string"),
        lit(s" exceeds the last bucket bound ${boundaries.last}")))
        .cast("long")) {
      case (e, b) => when(len <= b, lit(b)).otherwise(e)
    }

    val hashed = df
      .withColumn("bucket_bound", bound)
      .withColumn("__h",
        KrHash.krHash(concat(lit(salt), col(idCol).cast("string"))))
    val global = Enumerate.denseIds(hashed,
      Seq("bucket_bound", "__h", idCol), "__g")

    val counts = global.groupBy(col("bucket_bound"))
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val starts = {
      var acc = 0L
      counts.map { case (b, c) => val st = acc; acc += c; b -> st }
    }
    val startExpr = starts.foldLeft(lit(null).cast("long")) {
      case (e, (b, st)) => when(col("bucket_bound") === b, lit(st)).otherwise(e)
    }

    global
      .withColumn("__rank", col("__g") - startExpr)
      .withColumn("batch_idx", expr(s"__rank div $batchSize"))
      .withColumn("pos_in_batch", col("__rank") % batchSize)
      .drop("__g", "__h", "__rank")
  }
}
