package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based document quality filtering with AUDIT REASON CODES — the
  * C4 (Raffel et al. 2020 §2.2) / Gopher (Rae et al. 2021 A.1.1)
  * recipe as a first-class stage: each document is tested against a
  * named rule set and carries the names of every rule it failed, so a
  * curation run can report WHY each document was dropped (per-rule
  * drop rates are the standard pipeline health metric) and re-admit
  * documents when a rule is retired, without recomputing anything.
  *
  * Scale shape: map-only — every rule is a column predicate over the
  * scan; the reason list is a compile-time-bounded array of rule
  * names. No UDFs, no shuffle; per-rule drop rates are one
  * map-combinable aggregate over the result.
  *
  * All rule arithmetic is single-divide doubles over integer token
  * stats, so the decisions replay bit-exactly in SQL.
  */
object QualityFilter {

  /** A named reject rule: `fails` is true when the document VIOLATES
    * the rule. Names become the audit codes in `fail_reasons`.
    */
  final case class Rule(name: String, fails: Column)

  /** The Gopher-flavored core rule set over whitespace tokens:
    * word-count bounds, mean-word-length bounds, and a minimum
    * stopword ratio (the "real language vs keyword soup" test).
    * Thresholds are the paper defaults; override per corpus.
    */
  def gopherRules(
      text: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      minStopwordRatio: Double = 0.06,
      stopwords: Seq[String] = TextStats.EnglishStopwords): Seq[Rule] = {
    val wc = TextStats.tokenCount(text)
    // mean word length from the text algebra (chars minus separators):
    // the avg_token_len expression of TextStats.withQualityStats
    val meanLen = (length(text) - (wc - lit(1))).cast("double") / wc
    val stopRatio = TextStats.tokenSetRatio(text, stopwords)
    Seq(
      Rule("too_few_words", wc < minWords),
      Rule("too_many_words", wc > maxWords),
      Rule("mean_word_length", meanLen < minMeanWordLen || meanLen > maxMeanWordLen),
      Rule("low_stopword_ratio", stopRatio < minStopwordRatio))
  }

  /** `df` plus `fail_reasons` (the '|'-joined names of violated rules,
    * in rule order — a plain string so it sorts, groups and exports
    * anywhere) and `keep` (no rule violated). Filtering is the
    * caller's `filter(col("keep"))`; auditing is a groupBy on
    * `fail_reasons`.
    */
  def withQualityFilter(
      df: DataFrame, textCol: String,
      rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    require(rules.forall(_.name.nonEmpty),
      "rule names must be non-empty (an empty code would make a failing " +
        "document's fail_reasons empty — i.e. keep=true)")
    require(rules.map(_.name).distinct.size == rules.size,
      s"duplicate rule names in ${rules.map(_.name)}")
    require(rules.forall(!_.name.contains("|")),
      s"rule names may not contain '|' (the audit-code separator): " +
        rules.map(_.name).filter(_.contains("|")).mkString(", "))
    require(!rules.exists(_.name == "null_text"),
      "'null_text' is the reserved code for the built-in NULL-text guard")
    // a NULL text makes every rule predicate NULL (never true), which
    // would sail garbage rows through the filter — reject explicitly.
    // The guard covers textCol: rules must be predicates over textCol
    // (a rule built on a DIFFERENT nullable column needs its own
    // isNull rule).
    //
    // A rule predicate that itself evaluates to NULL on non-NULL text
    // (e.g. a ratio over zero tokens — Spark's Divide returns NULL on a
    // zero divisor) counts as NOT VIOLATED, made explicit here with
    // coalesce rather than left to concat_ws's NULL-skipping: "the rule
    // could not be evaluated" is not evidence of a violation, and the
    // built-in gopherRules bound every such case by too_few_words
    // anyway. Callers who want NULL-is-reject semantics add their own
    // `Rule("x_unevaluable", pred.isNull)` alongside.
    val reasons = when(col(textCol).isNull, lit("null_text"))
      .otherwise(concat_ws("|",
        rules.map(r => when(coalesce(r.fails, lit(false)), r.name)): _*))
    df.withColumn("fail_reasons", reasons)
      .withColumn("keep", col("fail_reasons") === "")
  }

  /** Per-rule drop rates: `(rule, n_failed)` — one row per rule that
    * rejected at least one document (the pipeline health metric).
    * One map-combinable aggregate; the explode is over the bounded
    * per-row reason list, not the corpus text.
    */
  def dropRates(filtered: DataFrame): DataFrame =
    filtered
      .filter(!col("keep"))
      .select(explode(split(col("fail_reasons"), "\\|")).as("rule"))
      .filter(col("rule") =!= "")
      .groupBy(col("rule")).agg(count(lit(1)).as("n_failed"))
}
