package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-size overlapping document chunking — the embedding/RAG prep
  * step: each document becomes `ceil((len − overlap) / step)` chunks of
  * `chunkSize` characters starting every `step = chunkSize − overlap`
  * characters, so consecutive chunks share `overlap` characters and no
  * chunk is fully contained in its predecessor (the tail chunk is
  * emitted only while it extends coverage; a document shorter than one
  * chunk yields exactly one chunk).
  *
  * Scale shape: map-only — a `sequence` explode plus `substring`
  * projections over the scan; output size is input size ×
  * `chunkSize / step`, the caller's explicit redundancy choice. All
  * arithmetic is integer and `substring` is character-based in every
  * engine, so the chunking replays exactly in SQL.
  */
object Chunking {

  /** One row per chunk: `(idCol, chunk_id, chunk_start, chunk_text)`
    * with 0-based `chunk_id` and `chunk_start`. Empty documents yield
    * no chunks.
    */
  def chunk(
      df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val step = chunkSize - overlap
    val len = length(col(textCol)).cast("long")
    val n = greatest(lit(1L),
      floor((len - overlap + step - 1L) / lit(step.toLong)).cast("long"))
    df.filter(length(col(textCol)) > 0)
      .withColumn("chunk_id", explode(sequence(lit(0L), n - 1L)))
      .select(
        col(idCol),
        col("chunk_id"),
        (col("chunk_id") * step).as("chunk_start"),
        substr(col(textCol), col("chunk_id") * step + 1L, lit(chunkSize))
          .as("chunk_text"))
  }

  /** Sentence-boundary-aware chunking: one row per chunk `(idCol,
    * chunk_id, chunk_start, chunk_len, chunk_text)` where chunks pack
    * consecutive sentences greedily up to `maxChars` and NEVER split
    * mid-sentence — the retrieval-quality form of [[chunk]] (no
    * embedding sees half a claim). Spans come from the one-pass native
    * [[graft.functions.SentenceChunks]] expression (boundary = `.!?`
    * followed by space or end-of-text; oversized single sentences form
    * their own chunk, visible as `chunk_len > maxChars`); the text is
    * sliced once here. Map-only; empty and all-space documents yield
    * no chunks.
    */
  def chunkBySentences(
      df: DataFrame, idCol: String, textCol: String,
      maxChars: Int): DataFrame =
    df.select(
        col(idCol), col(textCol),
        posexplode(graft.functions.SentenceChunks
          .sentenceChunks(col(textCol), maxChars))
          .as(Seq("chunk_id", "__s")))
      .select(
        col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        col("__s.start").cast("long").as("chunk_start"),
        col("__s.len").cast("long").as("chunk_len"),
        substr(col(textCol), col("__s.start").cast("long") + 1L,
          col("__s.len").cast("long")).as("chunk_text"))
}
