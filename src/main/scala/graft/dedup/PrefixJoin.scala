package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Prefix-filtered EXACT set-similarity join (AllPairs / PPJoin family:
  * Bayardo et al., WWW 2007; Vernica et al., SIGMOD 2010 for the
  * shuffle-join form). The exact complement to the MinHash-LSH path
  * ([[Dedup.nearDuplicates]]): LSH trades recall for speed; this
  * returns EVERY pair with Jaccard ≥ t, using the prefix-filtering
  * theorem to avoid the all-pairs comparison:
  *
  *   order every document's distinct tokens by a global canonical order
  *   (ascending document frequency, then token — rarest first); if two
  *   sets have Jaccard ≥ t and pass the size filter
  *   `q·min(|a|,|b|) ≥ p·max(|a|,|b|)`, they must share a token within
  *   their first `|r| − ⌈t·|r|⌉ + 1` tokens. Only prefix tokens are
  *   joined — and because the canonical order puts each document's
  *   RAREST tokens in its prefix, per-token fan-out is skewed toward
  *   df≈1 tokens instead of boilerplate.
  *
  * The threshold is a RATIONAL `p/q`, never a double: `⌈t·|r|⌉` is
  * `(p·|r| + q − 1) div q` and the final acceptance is
  * `q·|a∩b| ≥ p·|a∪b|` — exact 64-bit integers on both engines, so the
  * filter is provably lossless (a float `ceil(0.6·5)` is 4, not 3, on
  * IEEE doubles — that one-token-short prefix would silently drop true
  * pairs). The oracle (q104) replays the brute-force all-pairs
  * SEMANTIC definition on a bounded slice, which is precisely the
  * exactness claim; PrefixJoinSpec pins prefix-path ≡ brute-force on
  * random corpora at full width.
  *
  * Scale shape: one postings shuffle for df, one per-doc window for
  * ranks (partitioned by doc — never global), an equi-join on prefix
  * tokens, and an array-intersect verify on candidate pairs only.
  */
object PrefixJoin {

  /** All pairs `(id_a < id_b, jaccard)` with
    * `jaccard(tokens_a, tokens_b) ≥ tNum/tDen` over DISTINCT-token
    * sets. `tokens` must be an array column; empty sets never pair.
    */
  def prefixJaccardJoin(
      docs: DataFrame,
      idCol: String,
      tokens: Column,
      tNum: Int,
      tDen: Int,
      materialize: Boolean = true): DataFrame = {
    require(tNum > 0 && tNum <= tDen,
      s"threshold must be a rational in (0,1]: got $tNum/$tDen")
    // the distinct-token sets feed FOUR plan branches (df counts, the
    // rank window, and both verify-join sides) and the prefix table
    // two — materialize each once (the tokenize-once contract shared
    // with Decontaminate/Relevance/NgramLm; `materialize = false`
    // stays fully lazy/fault-tolerant and recomputes per branch)
    val sets0 = docs
      .select(col(idCol).as("id"), array_distinct(tokens).as("toks"))
      .filter(size(col("toks")) > 0)
    val sets = if (materialize) sets0.localCheckpoint(true) else sets0
    val posts = sets.select(
      col("id"), size(col("toks")).cast("long").as("sz"),
      explode(col("toks")).as("tok"))
    val dfreq = posts.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val ranked = posts.join(dfreq, "tok")
      .withColumn("rk",
        row_number().over(
          Window.partitionBy(col("id")).orderBy(col("df"), col("tok"))))
    // minOverlap(r) = ⌈(p/q)·|r|⌉ exactly; prefix = |r| − minOverlap + 1.
    val prefix0 = ranked
      .filter(col("rk") <=
        col("sz") - expr(s"($tNum * sz + $tDen - 1) div $tDen") + 1)
      .select(col("id"), col("sz"), col("tok"))
    val prefix = if (materialize) prefix0.localCheckpoint(true) else prefix0
    val cands = prefix.as("a")
      .join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          lit(tDen.toLong) * least(col("a.sz"), col("b.sz")) >=
            lit(tNum.toLong) * greatest(col("a.sz"), col("b.sz")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val inter = size(array_intersect(col("ta"), col("tb"))).cast("long")
    val uni = size(col("ta")).cast("long") + size(col("tb")).cast("long") - inter
    cands
      .join(sets.select(col("id").as("id_a"), col("toks").as("ta")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("toks").as("tb")), "id_b")
      .filter(lit(tDen.toLong) * inter >= lit(tNum.toLong) * uni)
      .select(col("id_a"), col("id_b"),
        (inter.cast("double") / uni.cast("double")).as("jaccard"))
  }
}
