package graft.sketch

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Half-life decayed counters — recency-weighted activity scoring in
  * exact integer arithmetic. The freshness member of the sketch
  * family: [[Hll]] counts distinct, [[CountMin]] counts occurrences,
  * this counts occurrences THAT STILL MATTER — "how active was this
  * domain/user/source, weighting last hour over last week" — the
  * crawl-scheduling and trending-source signal.
  *
  * Exponential decay with an arbitrary λ needs transcendentals; a
  * half-life of exactly one age unit needs only shifts: a row aged
  * `a` units contributes `2^shift >> a` — an exact power of two (or 0
  * past age `shift`), so sums are exact integers, order-independent,
  * SQL-replayable (q130). Scores are mergeable (sum across
  * shards/batches of the SAME age epoch) and ADVANCEABLE: when the
  * clock ticks `e` units, `score >> e` is the floor of the TRUE total
  * decayed mass — the aggregate carries every row's binary dust and
  * floors ONCE, whereas re-deriving from re-aged rows floors each row
  * separately (a row past age `shift` floors to 0 individually but
  * its dust still counts in the advanced aggregate). So
  * `advance(sk, e)` ≥ the re-derived sketch, exactly equal while
  * every row stays within age `shift − e` — both directions pinned in
  * DecaySpec. Yesterday's sketch advances into today's frame and
  * merges with today's batch without ever re-reading history.
  *
  * Ages ≥ 63 clamp to a zero contribution explicitly — a raw long
  * shift wraps at 64 (`x >> 64 == x` in two's-complement Java/SQL
  * semantics), which would resurrect ancient rows at full weight.
  * NULL/negative ages raise (an age from the future is an upstream
  * clock bug, not a datum).
  *
  * Scale shape: ONE map-side-combinable `groupBy.sum`; the shuffle
  * carries |groups| rows.
  */
object Decay {

  /** `(group, score_q)` — `score_q = Σ 2^shift >> min(age, 63)` in
    * `2^shift` units of "fresh rows".
    */
  def halfLifeCounts(
      df: DataFrame, groupCol: String, ageCol: String,
      shift: Int = 20): DataFrame = {
    require(shift >= 1 && shift <= 40, s"shift must be in [1, 40], got $shift")
    val unit = 1L << shift
    val age = when(col(ageCol).isNull || col(ageCol) < 0,
      raise_error(lit(s"halfLifeCounts: NULL or negative $ageCol — an " +
        "age from the future is an upstream clock bug, not a datum")))
      .otherwise(col(ageCol).cast("long"))
    df.select(col(groupCol).as("group"), age.as("__age"))
      .withColumn("__contrib",
        when(col("__age") >= 63L, lit(0L))
          .otherwise(expr(s"shiftright(${unit}L, cast(__age as int))")))
      .groupBy(col("group"))
      .agg(sum(col("__contrib")).as("score_q"))
  }

  /** Sum of two counter tables over the SAME age epoch and `shift`. */
  def mergeCounts(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("group"))
      .agg(sum(col("score_q")).as("score_q"))

  /** Advance a counter table by `epochs` age units: every row the
    * sketch summarizes gets `epochs` units older, exactly.
    */
  def advance(sk: DataFrame, epochs: Int): DataFrame = {
    require(epochs >= 0, s"epochs must be >= 0, got $epochs")
    if (epochs == 0) sk
    else sk.withColumn("score_q",
      if (epochs >= 63) lit(0L)
      else expr(s"shiftright(score_q, $epochs)"))
  }
}
