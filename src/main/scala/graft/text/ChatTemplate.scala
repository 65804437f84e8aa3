package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chat-template assembly with loss masks — the supervised-fine-tuning
  * data-prep step: multi-turn conversations arrive as one ROW PER TURN
  * `(conversation, turn index, role, text)` and must leave as one row
  * per conversation carrying the rendered training string plus the
  * CHARACTER SPANS the loss is computed on (assistant turns only —
  * training on user/system turns teaches the model to hallucinate
  * users). Downstream tokenizers map char spans to token masks; chars
  * are the tokenizer-independent contract.
  *
  * Rendering: each turn becomes `<|role|>text` followed by a newline;
  * spans are half-open `[start, end)` char offsets of each assistant
  * turn's TEXT (tags and newline excluded — the loss should not train
  * the tag either; include it upstream by widening the span contract,
  * not by guessing here).
  *
  * Exactness: offsets are cumulative sums of exact integer char
  * lengths in (turnCol) order — deterministic, SQL-replayable (q123).
  * Duplicate turn indices within a conversation raise (the render
  * order would be shuffle-dependent); NULL text/role raise.
  *
  * Scale shape: ONE shuffle on the conversation id (window cumsum +
  * grouped assembly run on the same partitioning — Catalyst reuses
  * the exchange); conversations are short (10²-ish turns), so the
  * per-group sort is bounded and no conversation outgrows a task.
  * The reference has no chat surface; this is north-star §2.11
  * territory alongside [[Chunking]] and
  * [[graft.operators.Packing]] (chunk → render → pack is the SFT
  * pipeline order).
  */
object ChatTemplate {

  /** One row per conversation: `(conv, n_turns, text, total_chars,
    * loss_spans)` — `loss_spans` as `"start-end;start-end"` in turn
    * order (the joined-string form the oracle protocol requires of
    * list outputs), empty string when no assistant turn exists.
    */
  def render(
      df: DataFrame, convCol: String, turnCol: String,
      roleCol: String, textCol: String,
      lossRole: String = "assistant"): DataFrame = {
    val guard = (c: String) => when(col(c).isNull,
      raise_error(lit(s"ChatTemplate.render: NULL $c — drop explicitly, " +
        "a silent skip would shift every span after it")))
      .otherwise(col(c))
    val wTurn = Window.partitionBy(col("conv")).orderBy(col("turn"))
    val turns = df.select(
        col(convCol).as("conv"),
        guard(turnCol).cast("long").as("turn"),
        guard(roleCol).as("role"),
        guard(textCol).as("text"))
      // duplicate detection rides the SAME (conv)-partitioned window
      // as the offset cumsum (lag of the sorted turns), not a second
      // (conv, turn)-keyed exchange
      .withColumn("turn",
        when(lag(col("turn"), 1).over(wTurn) === col("turn"),
          raise_error(concat(
            lit("ChatTemplate.render: duplicate turn index "),
            col("turn").cast("string"), lit(" in conversation "),
            col("conv").cast("string"),
            lit(" — render order would be shuffle-dependent"))))
          .otherwise(col("turn")))
      // rendered turn: <|role|>text\n ; span covers text only
      .withColumn("rendered",
        concat(lit("<|"), col("role"), lit("|>"), col("text"), lit("\n")))
      .withColumn("turn_len", length(col("rendered")).cast("long"))
      .withColumn("tag_len", length(col("role")).cast("long") + 4L)
      .withColumn("start",
        coalesce(sum(col("turn_len"))
          .over(wTurn.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
          + col("tag_len"))
      .withColumn("end", col("start") + length(col("text")).cast("long"))
    turns
      .groupBy(col("conv"))
      .agg(
        count(lit(1)).as("n_turns"),
        concat_ws("", sort_array(collect_list(
          struct(col("turn"), col("rendered")))).getField("rendered"))
          .as("text"),
        sum(col("turn_len")).as("total_chars"),
        array_join(sort_array(collect_list(
          when(col("role") === lossRole,
            struct(col("turn"),
              concat_ws("-", col("start"), col("end")).as("span")))))
          .getField("span"), ";").as("loss_spans"))
  }
}
