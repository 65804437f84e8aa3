package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition-based quality signals for training-data filtering — the
  * family popularized by the Gopher/MassiveText filtering rules
  * (Rae et al. 2021, "Scaling Language Models", §A1.1): documents whose
  * content is dominated by repeated lines or repeated word n-grams are
  * boilerplate/spam and get dropped before training.
  *
  * Everything is map-only — no shuffle, no UDF: per-document signals
  * at 100 TB stay a single pipelined pass over the scan, and the filter
  * predicate composes into the same stage. The n-gram signals run on
  * the native one-pass codegen expression
  * [[graft.functions.NgramRepetition]] (O(len) per document); the
  * composed higher-order-function forms (`...Hof`) are kept as the
  * executable definition of the semantics and pinned bit-equivalent in
  * RepetitionSpec — the HOF form is O(grams × distinct) interpreted
  * comparisons per document, which measured as 31% of the whole bench
  * (q38, 17.6 s) before the native replacement.
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

  /** One-pass native n-gram statistics struct
    * `(total, distinct, top_count, top_chars)` — see
    * [[graft.functions.NgramRepetition]]. Compute this once per (row,
    * n) and derive several signals from it via [[dupFractionFromStats]]
    * / [[topCharFractionFromStats]].
    */
  def ngramStats(text: Column, n: Int): Column =
    graft.functions.NgramRepetition.ngramRepetition(text, n)

  /** `(total - distinct) / total` from an [[ngramStats]] struct; 0.0
    * when the document has fewer than `n` tokens. Integer-valued
    * operands and a single divide — bit-reproducible across engines.
    */
  def dupFractionFromStats(stats: Column): Column =
    when(stats.getField("total") > 0,
      (stats.getField("total") - stats.getField("distinct")).cast("double") /
        stats.getField("total"))
      .otherwise(lit(0.0))

  /** `top_count * top_chars / length(text)` from an [[ngramStats]]
    * struct; 0.0 when the document has fewer than `n` tokens.
    */
  def topCharFractionFromStats(stats: Column, text: Column): Column =
    when(stats.getField("total") > 0,
      (stats.getField("top_count") * stats.getField("top_chars"))
        .cast("double") / length(text))
      .otherwise(lit(0.0))

  /** Fraction of the document's characters covered by its most frequent
    * word n-gram: `count * length(gram) / length(text)`. Ties on count
    * resolve to the lexicographically greatest gram, so the result is
    * deterministic and engine-portable. 0.0 when the document has fewer
    * than `n` tokens.
    */
  def topNgramCharFraction(text: Column, n: Int): Column =
    TextStats.bindOnce(ngramStats(text, n))(topCharFractionFromStats(_, text))

  /** `dupOccurrenceFraction` over word n-grams. */
  def dupNgramFraction(text: Column, n: Int): Column =
    TextStats.bindOnce(ngramStats(text, n))(dupFractionFromStats)

  /** Composed higher-order-function form of [[topNgramCharFraction]] —
    * the executable definition of the semantics (struct-max tie-break),
    * kept as the bit-equivalence witness for the native expression.
    */
  private[graft] def topNgramCharFractionHof(text: Column, n: Int): Column =
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

  /** Composed form of [[dupNgramFraction]] — equivalence witness. */
  private[graft] def dupNgramFractionHof(text: Column, n: Int): Column =
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
    *
    * The native stats struct is computed ONCE per (row, n) in its own
    * projection and both fractions derive from it in the next —
    * CollapseProject keeps the split because inlining would duplicate
    * the non-cheap expression, so this is the Column-algebra form of a
    * per-n `let` binding shared across output columns.
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
      d.withColumn(s"__stats_$n", ngramStats(t, n))
        .withColumn(s"dup_${n}gram_frac",
          dupFractionFromStats(col(s"__stats_$n")))
        .withColumn(s"top_${n}gram_char_frac",
          topCharFractionFromStats(col(s"__stats_$n"), t))
        .drop(s"__stats_$n")
    }
  }
}
