package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Encoding-quality signals — the web-scale corpus triage step that
  * catches documents mangled before they ever reached the pipeline:
  * lossy transcodes (U+FFFD replacement characters), binary spill
  * (C0/C1 control characters), and the classic UTF-8-bytes-decoded-
  * as-Latin-1 mojibake ("café" read back as "cafÃ©",
  * a smart quote as "â€™"). Corrupt documents poison
  * tokenizers (one mojibake sequence explodes into several rare
  * tokens) and dedup (corrupted copies stop matching their clean
  * originals), so curation pipelines score and drop them first.
  *
  * Scale shape: map-only — a handful of codegen'd `length`/`replace`/
  * `regexp_replace` projections over the scan; no shuffle, no UDF, no
  * driver state. Every count is exact integer arithmetic on both
  * engines, so the signals replay as plain SQL (q89).
  */
object Encoding {

  /** C0 controls except \t\n\r, plus DEL — printable-text spill from
    * binary sources. Kept to the Java∩RE2 regex subset.
    */
  private[text] val ControlRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Lead sequences of the common UTF-8-as-Latin-1 double-decodes
    * (explicit escapes — several contain characters that are invisible
    * or easily mangled in source):
    * "â€" opens the corrupted smart-quote/dash family
    * (’ “ ” – …), "Ã"+second-byte covers
    * corrupted Latin letters, "Â " is a corrupted no-break
    * space. Matching the lead sequence counts each artifact once
    * without enumerating every second byte.
    */
  private[text] val MojibakeMarkers: Seq[String] = Seq(
    "Ã©", // corrupted é (é)
    "Ã¨", // corrupted è (è)
    "Ã ", // corrupted à (à)
    "Ã±", // corrupted ñ (ñ)
    "Ã¼", // corrupted ü (ü)
    "Ã¶", // corrupted ö (ö)
    "â€", // corrupted smart-quote/dash lead
    "Â ") // corrupted no-break space

  /** U+FFFD REPLACEMENT CHARACTER — a decoder already lost data. */
  private[text] val ReplacementChar = "�"

  private def countOccurrences(text: Column, marker: String): Column =
    ((length(text) - length(replace(text, lit(marker), lit("")))) /
      lit(marker.length)).cast("long")

  /** `df` plus exact per-document encoding signals:
    *   - `n_chars`: character count;
    *   - `n_replacement`: U+FFFD replacement characters (lossy
    *     transcode);
    *   - `n_control`: C0 controls (minus \t\n\r) and DEL;
    *   - `n_mojibake`: occurrences of the [[MojibakeMarkers]] lead
    *     sequences;
    *   - `bad_char_frac`: (n_replacement + n_control) / n_chars
    *     (0.0 for empty documents);
    *   - `enc_clean`: no replacement, control, or mojibake hits.
    */
  def withEncodingQuality(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val nChars = length(t).cast("long")
    val nRepl = countOccurrences(t, ReplacementChar)
    val nCtl = (length(t) -
      length(regexp_replace(t, ControlRe, ""))).cast("long")
    val nMoji = MojibakeMarkers
      .map(countOccurrences(t, _))
      .reduce(_ + _)
    df.withColumn("n_chars", nChars)
      .withColumn("n_replacement", nRepl)
      .withColumn("n_control", nCtl)
      .withColumn("n_mojibake", nMoji)
      .withColumn("bad_char_frac",
        when(col("n_chars") === 0L, lit(0.0))
          .otherwise((col("n_replacement") + col("n_control"))
            .cast("double") / col("n_chars").cast("double")))
      .withColumn("enc_clean",
        col("n_replacement") === 0L && col("n_control") === 0L &&
          col("n_mojibake") === 0L)
  }
}
