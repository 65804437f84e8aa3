package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide LINE-level deduplication — the C4 preprocessing step
  * the document-level family (exact / MinHash / SimHash / substring)
  * does not cover: boilerplate LINES (navigation text, license
  * headers, cookie banners) repeat across millions of otherwise
  * distinct documents. C4 removes every repeated occurrence and keeps
  * exactly one; this operator implements that contract: a line
  * survives iff it is the FIRST occurrence of its content in the
  * corpus, ordered by (document id, line index), and every document is
  * reassembled from its surviving lines with intra-document order
  * preserved.
  *
  * Scale shape (the 100 TB story):
  *   - one explode to (doc, idx, line) rows;
  *   - the first-occurrence resolution groups by a 128-bit line
  *     fingerprint and takes `min(struct(doc, idx))` — a map-side
  *     combinable hash aggregate; the shuffle carries (fingerprint,
  *     doc, idx), NEVER the line text;
  *   - survivors are an equi-join of the line table against the
  *     (fingerprint → first occurrence) table on the fingerprint —
  *     no self-join, no window over the full line table (a global
  *     `row_number` per fingerprint would sort every group; min-struct
  *     is the aggregate form of the same answer for keep-first=1);
  *   - reassembly groups surviving lines by document; per-document
  *     state is bounded by the document itself (a document's own lines
  *     always fit — they arrived in one row).
  *
  * Documents whose every line is dropped are kept with an empty text
  * (the caller decides whether to filter them — dropping rows silently
  * would violate the engine's fail-loud/keep-visible convention).
  */
object LineDedup {

  /** (idCol, outputCol, n_lines_before, n_lines_after) per input row.
    *
    * @param delimiter line separator, split AND re-join token (a
    *                  literal string, regex-quoted for the split)
    * @param normalizeLines compare lines by their normalized form
    *                       (trim/lower/collapse-whitespace) while
    *                       reassembling the ORIGINAL line text
    */
  def dedupLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      delimiter: String = "\n",
      outputCol: String = "text_dedup",
      normalizeLines: Boolean = false): DataFrame = {
    require(delimiter.nonEmpty, "delimiter must be non-empty")
    val id = col(idCol)
    val lineKey: Column => Column =
      if (normalizeLines) l => md5(graft.text.TextStats.normalize(l))
      else l => md5(l)

    val lines = df
      .select(id, posexplode(
        split(col(textCol), java.util.regex.Pattern.quote(delimiter)))
        .as(Seq("__idx", "__line")))
      .withColumn("__fp", lineKey(col("__line")))

    // first corpus-wide occurrence per line content: min over the
    // (doc, idx) pair — struct min is lexicographic, so this is
    // "smallest doc id, then smallest index within it"
    val firsts = lines
      .groupBy(col("__fp"))
      .agg(min(struct(id.as("d"), col("__idx").as("i"))).as("__first"))

    val surviving = lines.join(firsts, "__fp")
      .filter(id === col("__first.d") && col("__idx") === col("__first.i"))

    val reassembled = surviving
      .groupBy(id)
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("__idx"), col("__line")))),
            s => s.getField("__line")),
          delimiter).as(outputCol),
        count(lit(1)).as("n_lines_after"))

    // keep fully-gutted documents (empty output) and carry the before
    // count from a cheap map-side size()
    df.select(id,
        size(split(col(textCol), java.util.regex.Pattern.quote(delimiter)))
          .cast("long").as("n_lines_before"))
      .join(reassembled, Seq(idCol), "left")
      .select(id,
        coalesce(col(outputCol), lit("")).as(outputCol),
        col("n_lines_before"),
        coalesce(col("n_lines_after"), lit(0L)).as("n_lines_after"))
  }
}
