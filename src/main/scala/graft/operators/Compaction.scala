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

  /** Scheme-free absolute path — `input_file_name()` reports
    * `file:///a/b` while filesystem listings say `/a/b`; both normalize
    * here so plan paths and scan-tagged rows join exactly.
    */
  private def normalizePath(p: org.apache.spark.sql.Column) =
    regexp_replace(p, "^[a-zA-Z0-9.+-]+:/+", "/")

  /** `input_file_name()` reports the percent-ENCODED URI string
    * (space → `%20`) while `Path.toUri.getPath` listings are decoded;
    * decode before joining or every file whose path contains an
    * encodable character silently drops from the plan join. A literal
    * `+` in a URI path means `+` (never space), but `url_decode`
    * follows form-encoding and would turn it into one — protect it as
    * `%2B` first so the decode round-trips it.
    */
  private def decodeFileUri(p: org.apache.spark.sql.Column) =
    url_decode(regexp_replace(p, "\\+", "%2B"))

  /** Manifest of a directory's parquet part files as `(path, bytes)`,
    * paths normalized scheme-free. Driver-side filesystem listing —
    * #files-sized, the same bounded contract as the TFRecord manifest.
    */
  def parquetManifest(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      val p = f.getPath.toUri.getPath // scheme-free
      if (f.isFile && p.endsWith(".parquet") &&
          !p.split('/').last.startsWith("_") &&
          !p.split('/').last.startsWith("."))
        out += ((p, f.getLen))
    }
    out.toSeq.toDF("path", "bytes")
  }

  /** Execute a [[planCompaction]] result over parquet files: every
    * planned file's rows move (ONE shuffle, hash-partitioned by group —
    * a group's rows land wholly in one task) to their group's writer,
    * which emits exactly one file per group under
    * `outDir/group=N/`. The delete-only group (−1) is not read or
    * rewritten — its files are the caller's delete list. Returns the
    * rewrite receipt `(group, n_files_in, n_rows)` (from the plan and
    * the data that MOVED, so a receipt/readback mismatch means a file
    * changed under the rewrite). The plan's path list is collected to
    * drive the scan — #files-sized by the manifest contract.
    *
    * Hive-partition column types: the read-back `group` directory key
    * is whatever the reader infers; the receipt keeps the plan's long.
    */
  def compactParquet(
      plan: DataFrame, pathCol: String, outDir: String): DataFrame = {
    val spark = plan.sparkSession
    val planned = plan.filter(col("group") >= 0L)
      .select(normalizePath(col(pathCol)).as("__path"), col("group"))
    val paths = planned.select(col("__path")).collect().map(_.getString(0))
    require(paths.nonEmpty, "compactParquet: plan has no rewritable groups")
    val data = spark.read.parquet(paths.toIndexedSeq: _*)
      .withColumn("__path", normalizePath(decodeFileUri(input_file_name())))
    // Left join + raise on miss: only planned paths were passed to the
    // scan, so an unmatched row can only mean a path-normalization
    // mismatch — fail loudly rather than silently lose that file's rows.
    data.join(broadcast(planned), Seq("__path"), "left")
      .withColumn("group",
        when(col("group").isNull, raise_error(concat(
          lit("compactParquet: scanned file missing from plan "),
          lit("(path normalization mismatch): "), col("__path"))))
          .otherwise(col("group")))
      .drop("__path")
      .repartition(col("group"))
      .write.partitionBy("group").mode("overwrite").parquet(outDir)
    val receipt = plan.filter(col("group") >= 0L)
      .groupBy(col("group")).agg(count(lit(1)).as("n_files_in"))
    val rows = spark.read.parquet(outDir)
      .groupBy(col("group").cast("long").as("group"))
      .agg(count(lit(1)).as("n_rows"))
    receipt.join(rows, Seq("group"), "left")
      .select(col("group"), col("n_files_in"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"))
  }
}
