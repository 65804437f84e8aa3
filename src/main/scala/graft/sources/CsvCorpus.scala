package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Tolerant CSV/TSV corpus ingestion — the other interchange format
  * vendors actually ship (metadata tables, label files, crawl
  * manifests). Same non-negotiables as [[JsonCorpus]] at 100 TB: an
  * EXPLICIT schema (no `inferSchema` extra pass, no run-to-run schema
  * drift from one odd shard) and PERMISSIVE corrupt-row tolerance with
  * an audit trail (a truncated or mistyped row must be counted and
  * quarantined, not abort the job or vanish).
  *
  * Implemented as a text scan + `from_csv` expression for the same
  * reason [[JsonCorpus]] uses `from_json`: corrupt-column-only queries
  * over `spark.read.csv` hit the SPARK-21610 restriction; the
  * expression form costs the same single Univocity pass, no caching
  * requirement. Scale shape: map-only, no shuffle; the corrupt audit
  * is one map-side-combinable aggregate.
  */
object CsvCorpus {

  /** Column holding the raw text of unparseable lines. */
  val CorruptCol: String = JsonCorpus.CorruptCol

  /** Read delimiter-separated lines under `path` with `schema`,
    * PERMISSIVE: parsed columns for good rows, the raw line in
    * [[CorruptCol]] (and NULL data columns) for malformed ones (wrong
    * field count, failed type cast). No header handling — corpus
    * shards are headerless by contract (a header row would parse as
    * one corrupt line per shard; strip upstream or filter the audit).
    */
  def readCsv(
      spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ","): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val full = schema.add(CorruptCol, StringType)
    spark.read.text(path)
      .select(from_csv(col("value"), full, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> CorruptCol,
        "sep" -> delimiter)).as("__r"))
      .select(col("__r.*"))
  }

  /** (valid rows without the audit column, corrupt lines only). */
  def splitValid(df: DataFrame): (DataFrame, DataFrame) = (
    df.filter(col(CorruptCol).isNull).drop(CorruptCol),
    df.filter(col(CorruptCol).isNotNull).select(col(CorruptCol)))

  /** Valid rows with a constant `n_corrupt` audit column attached via
    * a 1-row broadcast hash join ([[graft.core.Scalars]] — BNLJ-free).
    */
  def readCsvWithAudit(
      spark: SparkSession, path: String, schema: StructType,
      delimiter: String = ","): DataFrame = {
    val raw = readCsv(spark, path, schema, delimiter)
    val (valid, corrupt) = splitValid(raw)
    graft.core.Scalars.withScalars(
      valid, corrupt.agg(count(lit(1)).as("n_corrupt")))
  }

  /** Write `df` as headerless CSV shards under `path` (native sink:
    * one line per row, codegen'd, no shuffle).
    */
  def writeCsv(df: DataFrame, path: String, delimiter: String = ","): Unit =
    df.write.mode("overwrite").option("sep", delimiter).csv(path)
}
