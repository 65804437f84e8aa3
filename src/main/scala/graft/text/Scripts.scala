package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unicode script-mix profile — per-document character counts by
  * script block and a dominant-script label. The multilingual-corpus
  * routing step that runs BEFORE any trained language-ID
  * ([[TextStats.langId]] assumes Latin text; routing Cyrillic or CJK
  * documents through a Latin stopword model misclassifies silently):
  * script detection is exact, deterministic, and two orders of
  * magnitude cheaper than classification, so at 100 TB it is the
  * first partitioning key of a multilingual pipeline (route per
  * script, then language-ID within the Latin shard).
  *
  * Counts are computed as `length(text) − length(regexp_replace(text,
  * clazz, ''))` over explicit BMP code-point-range classes — NOT
  * `\p{Script=...}` properties, whose names and Unicode-version
  * semantics differ between regex engines. Explicit ranges sit in the
  * Java∩RE2 subset ([[Redact]]'s portability contract), all ranges are
  * BMP (identical char-length semantics in both engines), and the
  * whole operator is a map-only codegen'd projection: zero shuffle,
  * zero UDF.
  *
  * Block coverage (documented, not exhaustive — the long tail lands in
  * the implicit "other" remainder): Latin incl. Latin-1/Extended-A/B
  * letters (multiplication/division signs excluded), Cyrillic,
  * Greek, Arabic, CJK = kana + unified ideographs (incl. ext-A) +
  * Hangul syllables, ASCII digits.
  */
object Scripts {

  /** (label, regex character class) in dominant-tiebreak priority
    * order. */
  val blocks: Seq[(String, String)] = Seq(
    "latin" -> "[A-Za-z\\x{C0}-\\x{D6}\\x{D8}-\\x{F6}\\x{F8}-\\x{24F}]",
    "cyrillic" -> "[\\x{400}-\\x{4FF}]",
    "greek" -> "[\\x{370}-\\x{3FF}]",
    "cjk" -> "[\\x{3040}-\\x{30FF}\\x{3400}-\\x{4DBF}\\x{4E00}-\\x{9FFF}\\x{AC00}-\\x{D7AF}]",
    "arabic" -> "[\\x{600}-\\x{6FF}]",
    "digit" -> "[0-9]")

  private def blockCount(text: Column, clazz: String): Column =
    length(text) - length(regexp_replace(text, clazz, ""))

  /** Appends `n_<block>` counts, `n_total` (character count), and
    * `dominant_script` (first block in [[blocks]] order attaining the
    * maximum count; `none` when no block matches — whitespace,
    * punctuation, or empty text). NULL text profiles as NULL counts
    * and NULL dominant (absent input stays visibly absent).
    */
  def withScriptProfile(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    val counted = blocks.foldLeft(df) { case (acc, (name, clazz)) =>
      acc.withColumn(s"n_$name", blockCount(text, clazz))
    }
    val counts = blocks.map { case (name, _) => col(s"n_$name") }
    val m = greatest(counts: _*)
    val dominant = blocks.foldLeft(Option.empty[Column]) {
      case (acc, (name, _)) =>
        Some(acc match {
          case None => when(col(s"n_$name") === m, name)
          case Some(c) => c.when(col(s"n_$name") === m, name)
        })
    }.get // unreachable otherwise(): some count always equals the max
    counted
      .withColumn("n_total", length(text))
      .withColumn("dominant_script",
        when(text.isNull, lit(null).cast("string"))
          .when(m === 0, "none")
          .otherwise(dominant))
  }
}
