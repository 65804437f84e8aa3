package graft.sim

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed bounded top-k aggregator (the `TypedImperativeAggregate`-style
  * piece SURVEY §4.2 reserves for similarity search): keeps the k best
  * (score desc, id asc) per group with O(k) state, so
  * `df.groupBy("query_id").agg(topK(...))` runs as a partial+final
  * aggregate — per-partition truncation before the shuffle, exactly the
  * property the two-stage heap in [[Similarity.bruteForceTopK]] builds
  * by hand.
  *
  * Use via `org.apache.spark.sql.functions.udaf`:
  * {{{
  * val topK = udaf(new TopKAggregator(10))
  * scored.groupBy($"query_id").agg(topK($"vec_id", $"score").as("top"))
  * }}}
  */
final case class Scored(id: Long, score: Double)

class TopKAggregator(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0)

  // total order on (score desc, id asc) via Double.compare, so NaN ranks
  // above every finite score — the same convention as BoundedTopK and
  // Spark's window sort; naive `>`/`==` comparisons would silently
  // reject every candidate once a NaN entered the buffer
  private def beats(a: Scored, b: Scored): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  private def trim(s: Seq[Scored]): Seq[Scored] =
    s.sortWith(beats).take(k)

  override def zero: Seq[Scored] = Seq.empty
  override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] =
    if (buf.size < k) buf :+ a
    else {
      // avoid re-sorting on every row once the buffer is warm: only
      // insert when the candidate beats the current worst
      val sorted = trim(buf)
      val worst = sorted.last
      if (beats(a, worst)) trim(sorted.init :+ a)
      else sorted
    }
  override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] = trim(b1 ++ b2)
  override def finish(buf: Seq[Scored]): Seq[Scored] = trim(buf)
  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

object TopKAggregator {
  /** Untyped-agg handle: `topK(col("id"), col("score"))`. */
  def udafFor(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k), Encoders.product[Scored])
}
