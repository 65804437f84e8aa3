package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Confusable-skeleton normalization — fold Unicode homoglyphs onto
  * their ASCII lookalikes and strip invisible characters, so that
  * spoofed text ("pаypаl" with Cyrillic а, words split by zero-width
  * spaces) keys the same as its plain form. The anti-evasion layer of
  * the dedup family: exact dedup (q08) hashes BYTES, and one swapped
  * homoglyph is a different document to it — SEO spam and template
  * farms exploit exactly that. A simplified, curated instance of
  * Unicode TS #39's skeleton operation (the full confusables table is
  * thousands of pairs; this carries the Cyrillic/Greek letter
  * lookalikes and invisibles that dominate real spoofing) — extend
  * [[Mapped]] to widen coverage, the machinery is size-independent.
  *
  * The whole fold is ONE `translate` (1:1 char map; trailing
  * from-chars with no to-char are deleted — that handles the
  * invisibles) plus a lowercase — both engine-portable SQL-standard
  * functions, so skeleton keys replay in the oracle exactly. Compose
  * with [[graft.functions.NfcNormalize]] upstream when combining-mark
  * forms are also in play (NFC folds é vs e+◌́; this folds е vs e).
  *
  * Scale shape: map-only codegen'd expression — no shuffle, no state.
  * Downstream, [[graft.dedup.Dedup]]'s exact/near machinery runs on
  * skeleton keys unchanged.
  */
object Confusables {

  /** Homoglyph → ASCII pairs (Cyrillic and Greek letter lookalikes,
    * both cases; uppercase maps to uppercase, [[skeleton]] lowercases
    * after).
    */
  val Mapped: Seq[(Char, Char)] = Seq(
    // Cyrillic lowercase: \u0430 \u0435 \u043E \u0440 \u0441 \u0445 \u0443 \u0456 \u0455 \u0458
    '\u0430' -> 'a', '\u0435' -> 'e', '\u043E' -> 'o', '\u0440' -> 'p',
    '\u0441' -> 'c', '\u0445' -> 'x', '\u0443' -> 'y', '\u0456' -> 'i',
    '\u0455' -> 's', '\u0458' -> 'j',
    // Cyrillic uppercase
    '\u0410' -> 'A', '\u0412' -> 'B', '\u0415' -> 'E', '\u041A' -> 'K',
    '\u041C' -> 'M', '\u041D' -> 'H', '\u041E' -> 'O', '\u0420' -> 'P',
    '\u0421' -> 'C', '\u0422' -> 'T', '\u0425' -> 'X', '\u0423' -> 'Y',
    // Greek lowercase omicron / alpha / nu / iota
    '\u03BF' -> 'o', '\u03B1' -> 'a', '\u03BD' -> 'v', '\u03B9' -> 'i',
    // Greek uppercase
    '\u0391' -> 'A', '\u0392' -> 'B', '\u0395' -> 'E', '\u0396' -> 'Z',
    '\u0397' -> 'H', '\u0399' -> 'I', '\u039A' -> 'K', '\u039C' -> 'M',
    '\u039D' -> 'N', '\u039F' -> 'O', '\u03A1' -> 'P', '\u03A4' -> 'T',
    '\u03A5' -> 'Y', '\u03A7' -> 'X')

  /** Invisible characters deleted by the fold: zero-width space /
    * non-joiner / joiner, BOM, soft hyphen.
    */
  val Invisible: String = "\u200B\u200C\u200D\uFEFF\u00AD"

  /** translate() source: mapped chars first, then the deleted tail. */
  val From: String = Mapped.map(_._1).mkString + Invisible

  /** translate() target: one ASCII char per mapped char; nothing for
    * the invisible tail (translate deletes unpaired from-chars).
    */
  val To: String = Mapped.map(_._2).mkString

  /** The skeleton key: homoglyphs folded, invisibles stripped,
    * lowercased. Two texts that render alike (under this table) get
    * equal skeletons.
    */
  def skeleton(c: Column): Column = lower(translate(c, From, To))

  /** Convenience: append `outCol` = skeleton of `inCol`. */
  def withSkeleton(
      df: org.apache.spark.sql.DataFrame, inCol: String,
      outCol: String = "skeleton"): org.apache.spark.sql.DataFrame =
    df.withColumn(outCol, skeleton(col(inCol)))
}
