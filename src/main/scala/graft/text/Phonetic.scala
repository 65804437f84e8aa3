package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Phonetic blocking for entity resolution — group candidate records
  * by how a name SOUNDS before any expensive pairwise compare. The
  * record-linkage sibling of the document near-dup family: documents
  * block on shingles/bands ([[graft.dedup.Dedup]]), short name strings
  * block on phonetic codes, because their variation is misspelling of
  * sounds ("Smith"/"Smyth", "Ashcraft"/"Ashcroft"), not token overlap.
  *
  * [[soundex]] is American Soundex built ENTIRELY from engine-portable
  * primitives (upper / translate / per-digit `d+` collapses / concat —
  * no backreferences, so the chain runs identically under Java regex
  * and RE2): H/W delete before collapsing (they are "transparent":
  * same-code letters across them merge), vowels map to 0 so they BREAK
  * runs before being dropped, the first letter's own code collapses
  * into it, 3 digits zero-padded. PhoneticSpec pins conformance
  * against Spark's native `soundex()` on the classic vectors and a
  * 1000-name random sweep — the point of rebuilding it from
  * primitives is that the ORACLE can replay the identical chain,
  * which a black-box builtin cannot give.
  *
  * Scale shape: map-only column algebra. Blocking + bounded in-block
  * verify is the caller's join ([[blockingKey]] feeds a plain
  * group/self-join; the verify predicate — `levenshtein` ≤ k — is
  * codegen'd and engine-portable too).
  */
object Phonetic {

  private val Consonants = "BFPVCGJKQSXZDTLMNR"
  private val Codes = "111122222222334556"

  /** American Soundex of `c` (letters-only input contract: characters
    * outside A-Za-z are stripped first; a name with NO letters raises
    * — a silent empty code would collide every such record into one
    * block).
    */
  def soundex(c: Column): Column = {
    val letters = regexp_replace(upper(c), "[^A-Z]", "")
    val guarded = when(letters === "" || c.isNull,
      raise_error(concat(lit("Phonetic.soundex: no letters in name "),
        coalesce(c, lit("NULL")))))
      .otherwise(letters)
    // vowels -> 0 (kept: they break runs before dropping), H/W deleted
    // (transparent: same-code letters across them merge in the
    // collapse). The first letter's code participates in the collapse
    // (so "Pfister" merges F into P), then drops — EXCEPT when the
    // first letter is H/W, which has no code at all: dropping a
    // character there would eat the second letter's code ("Wright"
    // must keep R's 6).
    def digitsOf(s: Column) = translate(s, Consonants + "AEIOUY" + "HW",
      Codes + "000000")
    val first = substring(guarded, 1, 1)
    val firstCode = digitsOf(first) // "" for H/W, "0" vowel, else digit
    val combined = concat(firstCode, digitsOf(substring(guarded, 2, 1000000)))
    val collapsed = (1 to 6).foldLeft(combined) { (acc, d) =>
      regexp_replace(acc, s"$d+", d.toString)
    }
    val tail = when(firstCode === "", collapsed)
      .otherwise(substring(collapsed, 2, 1000000))
    val kept = regexp_replace(tail, "0", "")
    concat(first, rpad(substring(kept, 1, 3), 3, "0"))
  }

  /** Blocking key: soundex of each of the first `words`
    * whitespace-separated words (concatenated) plus a coarse length
    * bucket. More words = finer blocks — one word over a small
    * first-token vocabulary (brands, colors) grows blocks LINEARLY
    * with the corpus and the in-block quadratic eats the run
    * (measured: one-word blocking over part names went superlinear at
    * ×10 rows); names shorter than `words` use what they have.
    */
  def blockingKey(c: Column, lenBucket: Int = 4, words: Int = 2): Column = {
    require(lenBucket >= 1, s"lenBucket must be >= 1, got $lenBucket")
    require(words >= 1, s"words must be >= 1, got $words")
    concat(
      concat_ws("",
        transform(slice(split(c, "\\s+"), 1, words), w => soundex(w))),
      lit(":"), floor(length(c) / lenBucket).cast("long").cast("string"))
  }

  /** Candidate pairs within blocks verified by edit distance:
    * `(id_a, id_b, name_a, name_b, dist)` with `id_a < id_b`,
    * `dist <= maxDistance`. One shuffle on the blocking key; pairwise
    * work is per-block quadratic BY DESIGN (that is what blocking is
    * for), so blocks are CAPPED at `maxBlockSize` — the lowest ids
    * survive (deterministic, layout-independent), the tail degrades
    * recall instead of degrading into an accidental all-pairs join:
    * the [[graft.dedup.Dedup]] `maxBucketSize` contract applied to
    * record linkage. Widen the key (`words`, `lenBucket`) before
    * raising the cap.
    */
  def matchPairs(
      df: DataFrame, idCol: String, nameCol: String,
      maxDistance: Int = 2, lenBucket: Int = 4, words: Int = 2,
      maxBlockSize: Int = 256): DataFrame = {
    require(maxDistance >= 0, s"maxDistance must be >= 0, got $maxDistance")
    require(maxBlockSize >= 2, s"maxBlockSize must be >= 2, got $maxBlockSize")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("blk")).orderBy(col("id"))
    val keyed = df.select(col(idCol).as("id"), col(nameCol).as("name"))
      .withColumn("blk", blockingKey(col("name"), lenBucket, words))
      // WindowGroupLimit shape: bounded per-block heap on the map side
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxBlockSize)
      .drop("__rn")
    val a = keyed.select(col("blk"), col("id").as("id_a"),
      col("name").as("name_a"))
    val b = keyed.select(col("blk"), col("id").as("id_b"),
      col("name").as("name_b"))
    a.join(b, "blk")
      .filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= maxDistance)
      .select(col("id_a"), col("id_b"), col("name_a"), col("name_b"),
        col("dist"))
  }
}
