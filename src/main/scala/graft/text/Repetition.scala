package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based quality signals for training-data filtering — the
  * family popularized by the Gopher/MassiveText filtering rules
  * (Rae et al. 2021, "Scaling Language Models", §A1.1): documents whose
  * content is dominated by repeated lines or repeated word n-grams are
  * boilerplate/spam and get dropped before training.
  *
  * Everything is pure Column algebra over the token array (split +
  * higher-order functions) — map-only, no shuffle, no UDF: per-document
  * signals at 100 TB stay a single pipelined pass over the scan, and
  * the filter predicate composes into the same stage. The top-n-gram
  * signal is O(grams × distinct) comparisons per row (interpreted HOF);
  * that is quadratic in *document* length only — independent of corpus
  * size — and bounded in practice by the tokenizer's document cap.
  *
  * Definitions (documented here because "duplicate fraction" has
  * several published variants; specs pin each):
  *   - duplicate occurrence fraction: occurrences beyond each distinct
  *     value's first, over total occurrences — `(n - distinct) / n`.
  *   - duplicate char fraction: characters of those excess occurrences
  *     over total characters of all occurrences.
  *   - top n-gram char fraction: `count(gram) * chars(gram)` over the
  *     document's char length; ties on count break toward the
  *     lexicographically greatest gram (deterministic across engines).
  */
object Repetition {

  /** Word n-grams as space-joined strings (empty array when the
    * document has fewer than `n` tokens).
    */
  def ngrams(tokens: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    when(size(tokens) >= n,
      transform(sequence(lit(0), size(tokens) - n),
        i => concat_ws(" ", slice(tokens, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** `(occurrences - distinct) / occurrences` over an array; 0.0 for
    * empty arrays. Integer-valued operands, so the single divide is
    * bit-reproducible across engines.
    */
  def dupOccurrenceFraction(values: Column): Column =
    TextStats.bindOnce(values) { vs =>
      when(size(vs) > 0,
        (size(vs) - size(array_distinct(vs))).cast("double") / size(vs))
        .otherwise(lit(0.0))
    }

  /** Characters inside duplicate occurrences (each distinct value's
    * occurrences beyond the first) over total characters of all
    * occurrences; 0.0 when the array is empty or all-empty-string.
    */
  def dupCharFraction(values: Column): Column =
    TextStats.bindOnce(values) { vs =>
      val totalChars = aggregate(vs, lit(0L), (acc, x) => acc + length(x))
      val distinctChars = aggregate(array_distinct(vs), lit(0L),
        (acc, x) => acc + length(x))
      when(totalChars > 0,
        (totalChars - distinctChars).cast("double") / totalChars)
        .otherwise(lit(0.0))
    }

  /** Fraction of the document's characters covered by its most frequent
    * word n-gram: `count * length(gram) / length(text)`. Ties on count
    * resolve to the lexicographically greatest gram (struct max), so
    * the result is deterministic and engine-portable. 0.0 when the
    * document has fewer than `n` tokens.
    */
  def topNgramCharFraction(text: Column, n: Int): Column =
    TextStats.bindOnce(ngrams(TextStats.tokens(text), n)) { g =>
      TextStats.bindOnce(
        array_max(transform(array_distinct(g), x =>
          struct(size(filter(g, y => y === x)).as("c"), x.as("gram"))))) {
        top =>
          when(size(g) > 0,
            (top.getField("c") * length(top.getField("gram"))).cast("double") /
              length(text))
            .otherwise(lit(0.0))
      }
    }

  /** `dupOccurrenceFraction` over word n-grams. */
  def dupNgramFraction(text: Column, n: Int): Column =
    dupOccurrenceFraction(ngrams(TextStats.tokens(text), n))

  /** Newline-split lines with surrounding whitespace trimmed and empty
    * lines dropped (blank lines are formatting, not content).
    */
  def lines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")

  /** Fraction of lines that are repeats of an earlier line. */
  def dupLineFraction(text: Column): Column =
    dupOccurrenceFraction(lines(text))

  /** Fraction of line characters inside repeated lines. */
  def dupLineCharFraction(text: Column): Column =
    dupCharFraction(lines(text))

  /** Append the standard repetition-signal columns:
    * `dup_line_frac`, `dup_line_char_frac`, and per n in `ngramNs`
    * `dup_{n}gram_frac` / `top_{n}gram_char_frac`.
    */
  def withRepetitionStats(
      df: DataFrame,
      textCol: String,
      ngramNs: Seq[Int] = Seq(2, 3, 4)): DataFrame = {
    val t = col(textCol)
    val base = df
      .withColumn("dup_line_frac", dupLineFraction(t))
      .withColumn("dup_line_char_frac", dupLineCharFraction(t))
    ngramNs.foldLeft(base) { (d, n) =>
      d.withColumn(s"dup_${n}gram_frac", dupNgramFraction(t, n))
        .withColumn(s"top_${n}gram_char_frac", topNgramCharFraction(t, n))
    }
  }
}
