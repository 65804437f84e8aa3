package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: tokenization,
  * quality scoring, language identification, and document fingerprinting.
  *
  * Everything here is pure Column algebra over `functions._` (split,
  * higher-order array functions, regexp) — codegen-friendly, map-only, no
  * UDFs, no shuffle: at 100 TB these run as a single pipelined pass over
  * the scan with column pruning intact. North-star extension per
  * SURVEY §2.11 (not in the reference).
  */
object TextStats {

  /** Whitespace tokens (training-data pipelines normalize upstream;
    * `tokenizeRegex` handles BPE-ish word splitting).
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Evaluate `c` once per row and pass the result to `f` as a bound
    * lambda variable. Higher-order array functions run interpreted with
    * no subexpression elimination, so an expression referenced k times
    * inside (or as the input of) several lambdas is re-evaluated k
    * times per row — for a `split(regexp_replace(...))` token array
    * that k× re-tokenization dominates the operator (measured 10×
    * overhead in langId). `transform` over a one-element array is the
    * Column-algebra form of a `let` binding.
    */
  def bindOnce(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** BPE-ish tokenizer: letter runs, digit runs, or single non-space
    * symbols — the shape GPT-style pre-tokenizers use.
    */
  def tokenizeRegex(text: Column): Column =
    filter(
      split(text,
        """(?=[^\p{L}\p{N}])|(?<=[^\p{L}\p{N}])|(?<=\p{L})(?=\p{N})|(?<=\p{N})(?=\p{L})"""),
      t => t =!= "" && t =!= " ")

  /** Token count on whitespace. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Ratio of tokens found in `set`, as a double in [0, 1]. */
  def tokenSetRatio(text: Column, set: Seq[String]): Column =
    bindOnce(tokens(text)) { ts =>
      size(filter(ts, t => t.isin(set.map(lit): _*))).cast("double") / size(ts)
    }

  /** Quality-scoring feature columns: length, token stats, punctuation /
    * digit / uppercase ratios, stopword ratio. All single-divide doubles
    * so results are bit-reproducible across engines.
    */
  def withQualityStats(
      df: DataFrame,
      textCol: String,
      stopwords: Seq[String] = EnglishStopwords): DataFrame = {
    val t = col(textCol)
    val ts = tokens(t)
    df.withColumn("n_chars_text", length(t))
      .withColumn("n_tokens", size(ts))
      .withColumn("avg_token_len",
        (length(t) - (size(ts) - lit(1))).cast("double") / size(ts))
      .withColumn("punct_ratio",
        (length(t) - length(regexp_replace(t, "[.,;:!?'\"()]", ""))).cast("double") / length(t))
      .withColumn("digit_ratio",
        (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast("double") / length(t))
      .withColumn("upper_ratio",
        (length(t) - length(regexp_replace(t, "[A-Z]", ""))).cast("double") / length(t))
      .withColumn("stopword_ratio",
        bindOnce(ts)(t0 =>
          size(filter(t0, x => x.isin(stopwords.map(lit): _*))).cast("double") / size(t0)))
  }

  val EnglishStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "it", "that", "this", "for", "on", "with", "as", "at", "by")

  /** Marker stopword sets per language for the n-gram-free language-ID
    * heuristic. Public knowledge (most frequent function words).
    */
  val LanguageMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "are", "was", "it", "that", "this"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "un", "des", "du", "sur"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "von"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "un", "una", "del", "en"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不", "这", "人"))

  /** Language-ID: argmax of per-language marker-token counts over the
    * lowercased token stream; ties and no-marker rows resolve to the
    * earliest language in declaration order ("en" first). A single
    * Column expression — no shuffle, no UDF. Implemented as
    * `array_position(scores, array_max(scores))` (first index of the
    * max) rather than a fold of `when`s: the fold duplicates every
    * previous score expression per language and the tree grows
    * exponentially — the array form measured ~5× faster at sf0.1.
    */
  def langId(text: Column, markers: Seq[(String, Seq[String])] = LanguageMarkers): Column =
    // bind the token array AND the score array once each: the token
    // array feeds |markers| filter lambdas and the score array is
    // referenced twice by the argmax — without the bindings the
    // tokenization would run ~2×|markers| times per row
    bindOnce(tokens(lower(text))) { ts =>
      bindOnce(array(markers.map { case (_, words) =>
        size(filter(ts, t => t.isin(words.map(lit): _*)))
      }: _*)) { scores =>
        element_at(
          typedlit(markers.map(_._1)),
          array_position(scores, array_max(scores)).cast("int"))
      }
    }

  /** 64-bit fingerprint of normalized text (xxhash64 — cheap, fixed seed,
    * stable across Spark versions). For cross-engine-checkable pipelines
    * use [[fingerprintMd5]].
    */
  def fingerprint64(text: Column): Column = xxhash64(normalize(text))

  /** Hex MD5 fingerprint of normalized text — portable across engines. */
  def fingerprintMd5(text: Column): Column = md5(normalize(text))

  /** Normalization for fingerprinting/dedup: lowercase, trim, collapse
    * whitespace runs.
    */
  def normalize(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Winnowing (rolling-hash) document fingerprints over the normalized
    * text: position-local k-gram minima whose count scales with document
    * length — any shared substring of ≥ `window + k - 1` bytes yields a
    * shared fingerprint (containment/plagiarism detection, vs the
    * whole-document [[fingerprint64]]). Native expression:
    * [[graft.functions.WinnowingFingerprints]].
    */
  def winnowingFingerprints(text: Column, k: Int = 5, window: Int = 4): Column =
    graft.functions.WinnowingFingerprints.winnowingFingerprints(normalize(text), k, window)
}
