package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ILog2Q20.ilog2Q20

/** Character-entropy quality signal — the cheap gibberish / binary-noise
  * / template detector used alongside the C4-Gopher predicate filters
  * ([[QualityFilter]]) and the mojibake counters ([[Encoding]]):
  * natural prose sits near ~4.1 bits/char, base64 and random bytes near
  * 6, "aaaaaa…" and single-char floods near 0, so both tails of the
  * per-doc entropy distribution are drop candidates.
  *
  * Shannon entropy `H = log2(n) − (Σ c_i·log2 c_i)/n` is computed in
  * Q20 *integer* fixed point via the [[graft.functions.ILog2Q20]]
  * square-and-shift expression (`L(x) = ⌊2^20·log2 x⌋`): the numerator
  * `n·L(n) − Σ c_i·L(c_i)` is an exact 64-bit integer, order-
  * independent, and the emitted bits-per-char value is that integer
  * over `n·2^20` in ONE IEEE divide — so DuckDB replays every row
  * bit-for-bit with the q79-style 20-round recursive-CTE log (oracle
  * q103). Accuracy: each floor loses < 2^−20 bits, total error
  * < (n+1)·2^−20/n ≈ one Q20 ulp — far below any filtering threshold.
  *
  * Plan shape: explode chars → two hash aggregates. The only shuffle
  * carries `(doc, distinct char)` rows — bounded by document count ×
  * alphabet size, not corpus bytes — and partial aggregation combines
  * map-side. No UDFs, no windows, no driver state.
  *
  * Overflow: `n·L(n) ≤ n·63·2^20` stays in range for documents up to
  * ~2^37 chars — fail-loud guard at 2^36.
  */
object Entropy {

  /** Q20 integer `⌊2^20·log2(c)⌋` of a positive count column. */
  private def log2Q20(c: Column): Column =
    ilog2Q20(shiftleft(c, 20))

  /** Per-id character entropy: `(id…, n_chars, distinct_chars,
    * entropy_num_q20, entropy_bits)`. Rows whose text has no characters
    * produce no output row (entropy of an empty string is undefined);
    * callers that need them keep a left join on the id.
    */
  def charEntropy(df: DataFrame, idCols: Seq[String], text: Column): DataFrame = {
    require(idCols.nonEmpty, "charEntropy needs at least one id column")
    val chars = df
      .select((idCols.map(col) :+
        explode(split(text, "")).as("__ch")): _*)
      .filter(length(col("__ch")) === 1)
    val counts = chars
      .groupBy((idCols.map(col) :+ col("__ch")): _*)
      .agg(count(lit(1)).as("__c"))
    // Guard woven into the load-bearing column (a dropped side column
    // would be pruned before it could ever raise).
    val nGuarded = when(col("__n") >= (1L << 36),
      raise_error(concat(lit("charEntropy: document of "),
        col("__n").cast("string"),
        lit(" chars exceeds the 2^36 Q20 ceiling"))))
      .otherwise(col("__n"))
    counts
      .groupBy(idCols.map(col): _*)
      .agg(
        sum(col("__c")).as("__n"),
        count(lit(1)).as("distinct_chars"),
        sum(col("__c") * log2Q20(col("__c"))).as("__sum_clog"))
      .withColumn("n_chars", nGuarded)
      .withColumn("entropy_num_q20",
        col("n_chars") * log2Q20(col("n_chars")) - col("__sum_clog"))
      .withColumn("entropy_bits",
        col("entropy_num_q20").cast("double") /
          (col("n_chars") * lit(1048576L)).cast("double"))
      .select((idCols.map(col) :+ col("n_chars") :+ col("distinct_chars") :+
        col("entropy_num_q20") :+ col("entropy_bits")): _*)
  }
}
