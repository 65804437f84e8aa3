package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Enumerate

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
  * The canonical order is materialized as a DENSE INTEGER TOKEN ID
  * ([[Enumerate.denseIds]] over the vocabulary-sized df table — never a
  * partitionless window): ascending id IS ascending (df, token), so a
  * document's canonical token ranking is just its id array sorted —
  * the prefix is a map-only `slice`, no per-doc rank window — and the
  * verify step intersects small long arrays instead of re-comparing
  * strings (token strings never travel past the vocabulary join).
  *
  * The threshold is a RATIONAL `p/q`, never a double: `⌈t·|r|⌉` is
  * `(p·|r| + q − 1) div q` and the final acceptance is
  * `q·|a∩b| ≥ p·|a∪b|` — exact 64-bit integers on both engines, so the
  * filter is provably lossless (a float `ceil(0.6·5)` is 4, not 3, on
  * IEEE doubles — that one-token-short prefix would silently drop true
  * pairs). `|a∩b|` is invariant under the token→id bijection, so the
  * id-space intersect proves the same Jaccard. The oracle (q104)
  * replays the brute-force all-pairs SEMANTIC definition on a bounded
  * slice, which is precisely the exactness claim; PrefixJoinSpec pins
  * prefix-path ≡ brute-force on random corpora at full width.
  *
  * Scale shape: one postings shuffle for df, the vocabulary-sized id
  * assignment, one group-by to rebuild each doc as a sorted id array,
  * an equi-join on prefix ids, and a long-array intersect on candidate
  * pairs only.
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
    // postings feed two branches (df counts + the id join) —
    // materialize once (the tokenize-once contract shared with
    // Decontaminate/Relevance/NgramLm; `materialize = false` stays
    // fully lazy/fault-tolerant and recomputes per branch)
    val posts0 = docs
      .select(col(idCol).as("id"), explode(array_distinct(tokens)).as("tok"))
    val posts = if (materialize) posts0.localCheckpoint(true) else posts0
    val dfreq = posts.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    // dense id in (df, tok) order — strict total order since tok is
    // unique after the group-by
    val tids = Enumerate.denseIds(dfreq, Seq("df", "tok"), "tid")
      .select(col("tok"), col("tid"))
    // each doc as its sorted-ascending id array = canonical ranking
    val sets0 = posts.join(tids, "tok")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("tid"))).as("toks"))
      .withColumn("sz", size(col("toks")).cast("long"))
    // sets feed three branches (prefix + both verify sides)
    val sets = if (materialize) sets0.localCheckpoint(true) else sets0
    // minOverlap(r) = ⌈(p/q)·|r|⌉ exactly; prefix = |r| − minOverlap + 1
    // — a map-only slice of the canonical array, no rank window
    val prefixLen =
      (col("sz") - expr(s"($tNum * sz + $tDen - 1) div $tDen") + 1).cast("int")
    val prefix = sets.select(col("id"), col("sz"),
      explode(slice(col("toks"), lit(1), prefixLen)).as("tid"))
    val cands = prefix.as("a")
      .join(prefix.as("b"),
        col("a.tid") === col("b.tid") && col("a.id") < col("b.id") &&
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
