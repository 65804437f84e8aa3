package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Splits

/** Consistent pseudonymization — replace each PII entity inside text
  * with a token derived FROM THE ENTITY VALUE, so the same email
  * renders as the same `<EMAIL-314159>` everywhere it occurs.
  * [[Redact]]'s flat masks destroy referential structure (every email
  * becomes the same `<EMAIL>`, so "how many distinct contacts, who
  * co-occurs with whom" die with the PII); pseudonyms keep the
  * structure — dedup keys, entity co-occurrence, per-entity frequency
  * — while the raw value leaves the corpus. The standard trade in
  * privacy-preserving corpus analytics.
  *
  * HONESTY NOTE on strength: the token is the replayable Karp-Rabin
  * squared hash mod `space` — CONSISTENT and collision-bounded, but
  * not cryptographic: an adversary with candidate entities can
  * enumerate-and-match (and `space` is small by design). This is
  * pseudonymization for analytics; adversarial re-identification
  * resistance needs a keyed MAC in place of the hash (a drop-in swap
  * at [[Splits.squaredHash]]'s call site) and a large token space —
  * at which point the oracle can no longer replay it, which is
  * exactly the trade.
  *
  * Mechanics: the text splits around the pattern's matches
  * (`split` keeps boundary empties, so #segments = #matches + 1),
  * each match maps to its token inside a higher-order `transform`
  * (the hash expression composes over the lambda variable — still
  * codegen-friendly column algebra, no UDF), and `zip_with` stitches
  * segment‖token pairs back together. Same shape replays in DuckDB
  * via regexp_split_to_array / regexp_extract_all / list_transform.
  *
  * Patterns obey [[Redact]]'s cross-engine contract (Java regex ∩
  * RE2). Scale shape: map-only column algebra — no shuffle, no state,
  * no entity dictionary (the value IS the key, which is what makes it
  * consistent across shards with zero coordination).
  */
object Pseudonymize {

  /** `text` with every `pattern` match replaced by
    * `<tag-hash(match) mod space>`; same match text → same token.
    */
  def pseudonymize(
      text: Column, pattern: String, tag: String,
      space: Long = 1000000L, salt: String = ""): Column = {
    require(space >= 1, s"space must be >= 1, got $space")
    val segs = split(text, pattern, -1)
    val ms = regexp_extract_all(text, lit(pattern), lit(0))
    val tokens = transform(ms, m =>
      concat(lit(s"<$tag-"),
        (Splits.squaredHash(m, salt) % space).cast("string"), lit(">")))
    concat(
      concat_ws("",
        zip_with(slice(segs, lit(1), size(ms)), tokens,
          (s, p) => concat(s, p))),
      element_at(segs, size(segs)))
  }

  /** Convenience: emails pseudonymized in `textCol` → `outCol`, using
    * [[Redact.EmailPattern]].
    */
  def withPseudonymizedEmails(
      df: DataFrame, textCol: String, outCol: String = "text_pseudo",
      space: Long = 1000000L, salt: String = ""): DataFrame =
    df.withColumn(outCol,
      pseudonymize(col(textCol), Redact.EmailPattern, "EMAIL", space, salt))
}
