package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-key ordered event-SEQUENCE pattern matching — MATCH_RECOGNIZE
  * lite (complex-event-processing over a history table): map each
  * event type to a one-character symbol, fold every key's ordered
  * history into a symbol string, and count regex matches. The regex
  * generalizes what [[Cohorts.orderedFunnel]] fixes structurally:
  * a funnel is the pattern `v.*c.*p`; this operator also expresses
  * repetition (`vc+p`), immediacy (`vp`), and alternation (`(c|s)p`).
  * North-star extension (SURVEY §2.11).
  *
  * Scale shape: ONE groupBy over a `(key, ts, tie, symbol)` projection
  * — the shuffle carries one char plus the order columns per event,
  * never the event row. Per-key state is that key's symbol string:
  * bounded by the key's own event count, the same contract as any
  * per-key window/session operator (a key whose history cannot fit an
  * executor needs time-slicing upstream, not this operator).
  *
  * Determinism contract: `(tsCol, tieCols…)` must totally order each
  * key's events (as in [[Scd]]/[[Enumerate]]). Patterns must stick to
  * the regex subset with identical greedy-leftmost non-overlapping
  * match semantics in Java regex and RE2 (literals, classes,
  * alternation, `* + ? {n,m}` — no lookaround, no backreferences), so
  * engines replay each other exactly.
  */
object Patterns {

  /** Per key: the ordered symbol string, its length, and the number of
    * non-overlapping `pattern` matches. Events whose type is not in
    * `symbols` are dropped before the fold (unmapped noise must not
    * break adjacency — map it explicitly to a sentinel symbol if
    * adjacency through it matters).
    */
  def matchPattern(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      typeCol: String,
      symbols: Map[String, String],
      pattern: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "matchPattern needs at least one key column")
    require(symbols.nonEmpty, "matchPattern needs a symbol mapping")
    require(symbols.values.forall(_.length == 1),
      s"symbols must map to single characters, got ${symbols.values}")
    val sym = symbols.tail.foldLeft(
      when(col(typeCol) === symbols.head._1, lit(symbols.head._2))) {
      case (acc, (t, s)) => acc.when(col(typeCol) === t, lit(s))
    }
    val ordKeys: Seq[Column] = (col(tsCol) +: tieCols.map(col)) :+ col("__sym")
    val seqStr = array_join(
      transform(array_sort(collect_list(struct(ordKeys: _*))),
        s => s.getField("__sym")), "")
    df.withColumn("__sym", sym)
      .filter(col("__sym").isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(seqStr.as("seq"))
      .select((keyCols.map(col) :+ col("seq") :+
        length(col("seq")).cast("long").as("seq_len") :+
        size(regexp_extract_all(col("seq"), lit(pattern), lit(0)))
          .cast("long").as("n_matches")): _*)
  }
}
