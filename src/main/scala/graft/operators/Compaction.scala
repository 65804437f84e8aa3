package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Small-file compaction planning — the maintenance pass every
  * long-lived 100 TB table needs: streaming sinks, incremental index
  * segments ([[graft.dedup.DedupIndex]]'s LSM growth) and per-day
  * appends all accumulate files far below the scan-efficient size, and
  * read fan-in degrades until someone rewrites them. This operator
  * produces the REWRITE PLAN — which files merge into which output
  * group — as a deterministic function of the manifest, so the
  * expensive rewrite can be scheduled, resumed, and audited.
  *
  * Policy: ordered cumulative packing. Files are taken in `pathCol`
  * order (lexicographic path order preserves the partition/time
  * locality the writer already gave the data — merging a day's small
  * files with each other, not with files from another year) and each
  * file joins group `floor(exclusive-prefix-bytes / targetBytes)` — the
  * bin its FIRST byte falls into on the virtual concatenated byte
  * stream. Groups fill to ≥ targetBytes (the last file of a group may
  * overhang — files are not splittable in a rewrite, so a group can
  * exceed target by at most one file), group ids are dense from 0, and
  * the whole plan replays as a window cumsum in any SQL engine.
  *
  * Scale shape: the manifest is #files-sized, and the prefix sum rides
  * the [[Packing]] two-level distributed scan over [[Enumerate]] dense
  * ids — no global single-partition window at any step. Zero-byte
  * files occupy no interval and land in group −1: a delete-only group
  * (nothing to rewrite; remove the file) kept visible in the plan
  * rather than silently dropped.
  */
object Compaction {

  /** `(path, bytes, group)` for every manifest row. NULL or negative
    * byte counts raise (a silent default would corrupt every group
    * boundary after the bad row).
    */
  def planCompaction(
      manifest: DataFrame, pathCol: String, bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    val slim = manifest.select(
      col(pathCol),
      when(col(bytesCol).isNull || col(bytesCol).cast("long") < 0L,
        raise_error(concat(
          lit(s"planCompaction: null or negative $bytesCol for "),
          col(pathCol).cast("string"))))
        .otherwise(col(bytesCol).cast("long")).as("__bytes"))
    val ordered = Enumerate.denseIds(slim, Seq(pathCol), "__ord")
    val grouped = Packing
      .packSequences(ordered, pathCol, "__ord", "__bytes",
        seqLen = targetBytes)
      .filter(col("doc_off") === 0L) // the file's first byte names its group
      .select(col(pathCol), col("seq_id").as("group"))
    slim
      .join(grouped, Seq(pathCol), "left")
      .select(col(pathCol), col("__bytes").as(bytesCol),
        coalesce(col("group"), lit(-1L)).as("group"))
  }

  /** Per-group rollup of a [[planCompaction]] result: `(group,
    * n_files, total_bytes)` — the work units a rewrite scheduler
    * dispatches (and the place to see the −1 delete-only group's file
    * count). #groups-sized.
    */
  def groupStats(plan: DataFrame, bytesCol: String): DataFrame =
    plan.groupBy(col("group"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(bytesCol)).as("total_bytes"))
}
