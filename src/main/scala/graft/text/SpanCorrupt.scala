package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T5/UL2-style span-corruption pair generation — the denoising
  * objective's DATA step: mask a deterministic subset of fixed-length
  * token spans in each document and emit the (input, target) pair,
  * with `<extra_id_k>` sentinels numbering masked spans in order.
  *
  *   text:   "a b c d e f"     (spanLen 2 → spans [a b][c d][e f])
  *   masked: span 1            (hash-selected)
  *   input:  "a b <extra_id_0> e f"
  *   target: "<extra_id_0> c d"
  *
  * The mask decision per (document, span) is [[graft.operators.Splits
  * .bucketOf]] — a pure function of (id, span index, salt), so the
  * corruption is reproducible row-for-row across reruns, retries and
  * repartitions (training-data generation must never depend on
  * partition layout), distinct salts give independent corruptions
  * (epoch re-rolls), and another engine can replay the exact pair set
  * (q72). Fixed-length spans with one sentinel per masked span — the
  * mean-span-3.0 Poisson lengths of the T5 paper trade replayability
  * for a distribution match the objective does not need.
  *
  * Scale shape: explode to (doc, span) rows, a map-only hash decision,
  * a per-document window for sentinel numbering (bounded by the
  * document's own span count), and an ordered reassembly per document
  * — the LineDedup shape; no global window, no driver state.
  */
object SpanCorrupt {

  /** (idCol, input_text, target_text, n_spans, n_masked) per document.
    *
    * @param maskRate fraction of spans to mask, in [0, 1] — realized
    *                 per-span by hash bucket, so the EXPECTED rate;
    *                 exact per-document counts vary (as in T5)
    * @param spanLen  tokens per span (the last span may be shorter)
    */
  def spanCorrupt(
      df: DataFrame, idCol: String, textCol: String,
      maskRate: Double, spanLen: Int = 3, salt: String = "",
      buckets: Int = 1000000): DataFrame = {
    require(maskRate >= 0.0 && maskRate <= 1.0,
      s"maskRate must be in [0, 1], got $maskRate")
    require(spanLen >= 1, s"spanLen must be >= 1, got $spanLen")
    val threshold = math.round(maskRate * buckets)

    val toks = split(col(textCol), " ")
    val spans = df
      .select(col(idCol), toks.as("__toks"))
      .select(col(idCol),
        posexplode(
          transform(
            sequence(lit(0),
              ((size(col("__toks")) - lit(1)) / lit(spanLen)).cast("int")),
            j => array_join(
              slice(col("__toks"), j * spanLen + 1, lit(spanLen)), " ")))
          .as(Seq("__j", "__span")))

    val spanKey = concat(col(idCol).cast("string"), lit("#"),
      col("__j").cast("string"))
    val flagged = spans.withColumn("__masked",
      graft.operators.Splits.bucketOf(spanKey, salt, buckets) < threshold)

    // sentinel id = number of masked spans BEFORE this one (exclusive
    // running count); window bounded by the document's span count
    val w = Window.partitionBy(col(idCol)).orderBy(col("__j"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val numbered = flagged
      .withColumn("__k",
        sum(col("__masked").cast("long")).over(w) -
          col("__masked").cast("long"))
      .withColumn("__sentinel",
        concat(lit("<extra_id_"), col("__k").cast("string"), lit(">")))

    numbered
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("__j"),
              when(col("__masked"), col("__sentinel"))
                .otherwise(col("__span")).as("__piece")))),
            s => s.getField("__piece")),
          " ").as("input_text"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__masked"),
                struct(col("__j"),
                  concat(col("__sentinel"), lit(" "), col("__span"))
                    .as("__piece"))))),
            s => s.getField("__piece")),
          " ").as("target_text"),
        count(lit(1)).as("n_spans"),
        sum(col("__masked").cast("long")).as("n_masked"))
  }
}
