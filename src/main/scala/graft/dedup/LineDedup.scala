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
    * Execution (round 9 — line text never rides ANY shuffle): the
    * exploded line table drops text right after fingerprinting, so the
    * first-occurrence aggregate shuffles (fp, doc, idx) only; the
    * aggregate's output IS the survivor list — `min(struct(doc, idx))`
    * per fingerprint — which collapses to one (doc → surviving index
    * array) row per document (ints only). One equi-join of that tiny
    * table against the original frame on the id, and each document
    * rebuilds ITSELF map-side by filtering its own split by index
    * membership. The previous join-back-on-fingerprint shape (kept
    * below as the equivalence witness) shuffled line text twice —
    * through the fp join and again through the reassembly groupBy.
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
    val parts = split(col(textCol), java.util.regex.Pattern.quote(delimiter))

    // (fp, doc, idx) — text dropped BEFORE the shuffle
    val lines = df
      .select(id, posexplode(parts).as(Seq("__idx", "__line")))
      .select(id, col("__idx"), lineKey(col("__line")).as("__fp"))

    // first corpus-wide occurrence per line content: min over the
    // (doc, idx) pair — struct min is lexicographic, so this is
    // "smallest doc id, then smallest index within it"; its output is
    // exactly the survivor set, no join-back needed
    val keep = lines
      .groupBy(col("__fp"))
      .agg(min(struct(id.as("d"), col("__idx").as("i"))).as("__first"))
      .groupBy(col("__first.d").as("__kid"))
      .agg(sort_array(collect_list(col("__first.i"))).as("__keep"))

    // per-document index arrays are bounded by the document's own line
    // count (they arrived in one row), so the collect_list is safe
    df.join(keep, id === col("__kid"), "left")
      .select(id,
        coalesce(
          array_join(
            filter(parts, (l, i) => array_contains(col("__keep"), i)),
            delimiter),
          lit("")).as(outputCol),
        size(parts).cast("long").as("n_lines_before"),
        when(col("__keep").isNull, lit(0L))
          .otherwise(size(col("__keep")).cast("long")).as("n_lines_after"))
  }

  /** Join-back-on-fingerprint form — the pre-round-9 shape, kept as
    * the equivalence witness (LineDedupSpec pins identical output on
    * random corpora). Shuffles line text twice; do not use at scale.
    */
  private[graft] def dedupLinesJoined(
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
