package graft.vocab

import java.net.URI

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** Vocabulary construction: distributed per-column distinct-value+count
  * aggregation with threshold filtering, emitting one `<key>.voc` text
  * file per logical key.
  *
  * Re-expresses `ml_hadoop_experiment/tensorflow/vocabulary.py:11-121`
  * Spark-first: instead of `rdd.flatMap(...).reduceByKey(...)` the value
  * stream is built with one scan — each row emits, per (key, column),
  * a struct holding the key and the column's values as an array; two
  * `explode`s flatten that to (key, value) pairs and a hash aggregate
  * counts them. Catalyst plans this as Generate → partial hash agg →
  * shuffle → final agg, i.e. the map-side combine the reference got from
  * `reduceByKey`, and AQE's partition coalescing replaces the
  * hand-rolled `ceil(numPartitions / 4)` shuffle coarsening.
  *
  * 100 TB notes: one pass over the fact table, partial aggregation keyed
  * by (key, value) — cardinality is vocabulary-sized (≪ row count), so
  * the shuffle is tiny; the final `collect` is driver-side by design
  * (vocabularies are small by construction — same contract as the
  * reference, which collects before writing `.voc` files).
  *
  * Values are normalized to strings at aggregation time, matching the
  * `.voc` file contract (the reference stringifies at write time;
  * counting by string is equivalent whenever distinct values have
  * distinct string forms, which holds for the supported int/long/string
  * vocab columns).
  */
object Vocabulary {

  /** Distributed (key, value, count) aggregation over the columns feeding
    * each vocabulary key (reference `_get_vocab_values`,
    * `vocabulary.py:32-55`). Array-typed columns contribute their
    * elements, not the list itself; nulls are skipped. A threshold ≤ 1 is
    * trivially true and adds no filter node (the reference's job-avoidance
    * guard, `vocabulary.py:44-48`).
    */
  def vocabCounts(
      df: DataFrame,
      keyToColumns: Map[String, Seq[String]],
      threshold: Int = 0): DataFrame = {
    val pairs = for {
      (key, cols) <- keyToColumns.toSeq
      c <- cols
      if df.columns.contains(c)
    } yield (key, c)
    require(pairs.nonEmpty, "no vocabulary column present in the DataFrame")
    val structs = pairs.map { case (key, c) =>
      val values = df.schema(c).dataType match {
        case ArrayType(_, _) => col(c).cast("array<string>")
        case _ => array(col(c).cast("string"))
      }
      struct(lit(key).as("key"), values.as("values"))
    }
    val counts = df
      .select(explode(array(structs: _*)).as("kv"))
      .select(col("kv.key").as("key"), explode(col("kv.values")).as("value"))
      .filter(col("value").isNotNull)
      .groupBy(col("key"), col("value"))
      .count()
    if (threshold > 1) counts.filter(col("count") >= threshold) else counts
  }

  /** Collect vocabulary values per key (driver-side; vocab-sized). */
  def vocabValues(
      df: DataFrame,
      keyToColumns: Map[String, Seq[String]],
      threshold: Int = 0): Map[String, Seq[String]] =
    vocabCounts(df, keyToColumns, threshold)
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.map(_.getString(1)).toSeq }

  /** One vocabulary file per column (reference
    * `gen_vocab_files_from_list`, `vocabulary.py:92-105`).
    */
  def genVocabFiles(
      df: DataFrame,
      columns: Seq[String],
      path: String,
      threshold: Int): Seq[String] =
    genVocabFiles(df, columns.map(c => c -> Seq(c)).toMap, path, threshold)

  /** Merged-key form: several columns can feed one vocabulary file
    * (reference `gen_vocab_files_from_dict`, `vocabulary.py:108-121`).
    * Writes `<key>.voc` for *every* key — empty when no value survived —
    * and drops empty-string modalities ("not supported by Tensorflow",
    * `vocabulary.py:66-68`).
    */
  def genVocabFiles(
      df: DataFrame,
      keyToColumns: Map[String, Seq[String]],
      path: String,
      threshold: Int = 0): Seq[String] = {
    val values = vocabValues(df, keyToColumns, threshold)
    writeVocabFiles(df, values, path, keyToColumns.keys.toSeq)
  }

  /** Driver-side `.voc` writer through the Hadoop FileSystem API
    * (reference `_write_vocab_files`, `vocabulary.py:58-80`).
    */
  private[vocab] def writeVocabFiles(
      df: DataFrame,
      values: Map[String, Seq[String]],
      path: String,
      keys: Seq[String]): Seq[String] = {
    val conf = df.sparkSession.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new URI(path), conf)
    val dir = new Path(path)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    keys.map { key =>
      val file = new Path(dir, s"$key.voc")
      val out = fs.create(file, true)
      try {
        val content = values.getOrElse(key, Nil).filter(_ != "").mkString("\n")
        out.write(content.getBytes("UTF-8"))
      } finally out.close()
      file.toString
    }
  }
}
