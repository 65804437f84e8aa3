package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Tolerant JSONL corpus ingestion — the interchange format of LLM
  * data pipelines (one JSON document per line, usually gzip shards
  * from a crawler or an upstream vendor). At 100 TB two things are
  * non-negotiable:
  *
  *   - an EXPLICIT schema: `inferSchema` is a full extra pass over
  *     every byte before the real read, and a vendor adding one field
  *     to one shard silently changes the inferred schema of the whole
  *     corpus run-to-run;
  *   - corrupt-line TOLERANCE with an audit trail: crawler output
  *     reliably contains truncated lines (killed workers, partial
  *     flushes). FAILFAST aborts a day-long job on line 3 of shard
  *     40961; silent dropping (DROPMALFORMED) hides data loss. The
  *     right contract is PERMISSIVE + a corrupt-record column: good
  *     rows flow, bad lines are counted and quarantined, and the
  *     caller decides the threshold at which a shard is rejected.
  *
  * Scale shape: Spark's native JSON reader (codegen'd Jackson per
  * partition, no shuffle); the valid/corrupt split is a map-only
  * filter. Corrupt-line counting is one map-side-combinable aggregate.
  */
object JsonCorpus {

  /** Column holding the raw text of unparseable lines. */
  val CorruptCol = "_corrupt_record"

  /** Read JSONL under `path` with `schema`, PERMISSIVE: parsed columns
    * for good lines, the raw line in [[CorruptCol]] (and NULL data
    * columns) for bad ones.
    *
    * Implemented as a text scan + `from_json` expression rather than
    * `spark.read.json`: Spark REFUSES queries over raw JSON files that
    * reference only the corrupt column (SPARK-21610) — the blessed
    * workaround is caching the parsed frame, which is not an option
    * when the frame is the corpus. Parsing as an expression has no
    * such restriction, costs the same single Jackson pass, and keeps
    * the corrupt-audit aggregate cache-free at any scale.
    */
  def readJsonl(
      spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val full = schema.add(CorruptCol, StringType)
    spark.read.text(path)
      .select(from_json(col("value"), full, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> CorruptCol)).as("__r"))
      .select(col("__r.*"))
  }

  /** (valid rows without the audit column, corrupt lines only). */
  def splitValid(df: DataFrame): (DataFrame, DataFrame) = (
    df.filter(col(CorruptCol).isNull).drop(CorruptCol),
    df.filter(col(CorruptCol).isNotNull).select(col(CorruptCol)))

  /** Valid rows with a constant `n_corrupt` audit column attached via
    * a 1-row broadcast hash join ([[graft.core.Scalars]] — BNLJ-free),
    * so a downstream shard-acceptance filter can gate on the corrupt
    * rate without a second pass or a driver collect.
    */
  def readJsonlWithAudit(
      spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val raw = readJsonl(spark, path, schema)
    val (valid, corrupt) = splitValid(raw)
    graft.core.Scalars.withScalars(
      valid, corrupt.agg(count(lit(1)).as("n_corrupt")))
  }

  /** Write `df` as JSONL text shards under `path` (Spark's native JSON
    * sink: one line per row, codegen'd, no shuffle).
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
