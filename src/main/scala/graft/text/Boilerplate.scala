package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML/boilerplate removal — the first step of every web-corpus
  * pipeline (C4, RefinedWeb, Gopher): strip markup down to visible
  * text, then drop navigation/legal boilerplate lines before the
  * quality filters ever see the document.
  *
  * Scale shape: pure Column algebra — `regexp_replace`/`replace`
  * chains and an `ArrayFilter` higher-order function, all map-only,
  * no UDF, no shuffle. At 100 TB this pipelines inside the scan stage;
  * cost is the regex automata per row.
  *
  * Cross-engine contract (same as [[Redact]]): patterns stay inside
  * the Java-regex ∩ RE2 common subset — inline `(?is)` flags,
  * character classes, non-greedy `.*?`, anchors; no lookaround.
  * Entity decoding is a fixed `replace` chain with `&amp;` LAST, so
  * double-encoded text (`&amp;lt;`) decodes one level per pass exactly
  * the same way in both engines. Whitespace is collapsed with `\s+`,
  * whose ASCII meaning agrees across engines (the corpus contract is
  * ASCII whitespace; `\x0B` is the one Java-only member and never
  * survives upstream ingestion).
  *
  * North-star extension per SURVEY §2.11 (not in the reference).
  */
object Boilerplate {

  /** `<script ...> ... </script>` including contents — removed FIRST,
    * because script bodies legally contain bare `<` (e.g. `if (1 < 2)`)
    * that would desynchronize the generic tag pattern.
    */
  val ScriptPattern = """(?is)<script\b[^>]*>.*?</script\s*>"""

  /** `<style ...> ... </style>` including CSS contents. */
  val StylePattern = """(?is)<style\b[^>]*>.*?</style\s*>"""

  /** HTML comments, dot-matches-newline. */
  val CommentPattern = """(?s)<!--.*?-->"""

  /** Any remaining tag. Applied after the block patterns above. */
  val TagPattern = """<[^>]*>"""

  /** Literal entity decodes in application order — `&amp;` LAST so an
    * `&amp;lt;` decodes to `&lt;` (one level), never to `<`.
    */
  val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&#39;" -> "'",
    "&nbsp;" -> " ",
    "&amp;" -> "&")

  /** Decode [[Entities]] as a literal `replace` chain. */
  def decodeEntities(c: Column): Column =
    Entities.foldLeft(c) { case (acc, (e, r)) => replace(acc, lit(e), lit(r)) }

  /** Markup → visible text: script/style/comment blocks out first, then
    * every remaining tag (each replaced by a space so `a</p><p>b` does
    * not fuse into `ab`), entity decode, whitespace collapse, trim.
    */
  def stripHtml(c: Column): Column = {
    val noBlocks = Seq(ScriptPattern, StylePattern, CommentPattern)
      .foldLeft(c)((acc, p) => regexp_replace(acc, p, " "))
    val noTags = regexp_replace(noBlocks, TagPattern, " ")
    trim(regexp_replace(decodeEntities(noTags), """\s+""", " "))
  }

  /** Lowercase substrings that mark a line as boilerplate (C4 drops
    * lines mentioning javascript; cookie banners and legal footers are
    * the RefinedWeb additions).
    */
  val BoilerplateMarkers: Seq[String] =
    Seq("javascript", "cookie", "all rights reserved", "terms of use", "©")

  /** C4-style line-level cleanup over a `\n`-separated document: keep a
    * line only if (after trimming) it has at least `minWords`
    * whitespace-split words, ends in terminal punctuation (`.` `!` `?`),
    * and contains no [[BoilerplateMarkers]] (case-insensitive). Kept
    * lines are re-joined with `\n` UNtrimmed, preserving original
    * intra-line content. Returns the empty string when nothing survives.
    */
  def cleanLines(text: Column, minWords: Int = 3): Column = {
    val kept = filter(split(text, "\n"), l => {
      val t = trim(l)
      val enoughWords = size(split(t, " ")) >= lit(minWords)
      val endsPunct = t.rlike("""[.!?]$""")
      val noMarker = BoilerplateMarkers
        .map(m => !lower(t).contains(lit(m)))
        .reduce(_ && _)
      enoughWords && endsPunct && noMarker
    })
    array_join(kept, "\n")
  }

  /** Input plus `<textCol>_clean` (markup stripped) and its length —
    * one projection, no shuffle.
    */
  def withStrippedHtml(df: DataFrame, textCol: String): DataFrame = {
    val clean = stripHtml(col(textCol))
    df.withColumn(s"${textCol}_clean", clean)
      .withColumn("n_chars_clean", length(clean).cast("long"))
  }
}
