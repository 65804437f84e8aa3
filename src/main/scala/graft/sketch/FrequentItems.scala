package graft.sketch

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Space-saving heavy-hitter sketch (Metwally, Agrawal, El Abbadi:
  * "Efficient computation of frequent and top-k elements in data
  * streams", ICDT 2005) + an exact verification pass.
  *
  * The problem at 100 TB: `groupBy(token).count()` over a web-scale
  * token stream shuffles *every distinct token* — hash aggregation
  * spills once distinct cardinality beats executor memory, and the
  * shuffle carries billions of single-digit counts that a HAVING clause
  * immediately discards. Space-saving keeps a bounded `capacity`-entry
  * summary per partition (merged pairwise at the driver-bound final
  * step) with the classic guarantee: any item whose true count exceeds
  * `N / capacity` is present in the summary, and each reported count
  * overestimates by at most its tracked `error`. The sketch is
  * candidate generation only — a second exact pass counts just the
  * candidates (a broadcast-filtered aggregation over a vanishing
  * fraction of the stream), so the final answer carries no
  * approximation at all. Same two-phase shape as the LSH dedup
  * pipelines: bounded approximate recall stage, exact verify stage.
  */
object FrequentItems {

  /** Bounded summary: item -> (count, error). `total` is the number of
    * updates folded in (trimming on merge preserves it), which drives
    * the completeness guarantee `count(item) > total/capacity ⇒ item
    * present`.
    */
  final case class Summary(
      capacity: Int,
      total: Long,
      counts: Map[String, (Long, Long)]) {

    def candidates: Seq[String] = counts.keys.toSeq.sorted

    /** Items that *might* reach `threshold` (no false negatives when
      * `threshold > total / capacity`).
      */
    def mightReach(threshold: Long): Seq[String] =
      counts.collect { case (item, (c, _)) if c >= threshold => item }
        .toSeq.sorted
  }

  final class Buffer(val capacity: Int) extends Serializable {
    var total: Long = 0L
    val counts = new mutable.HashMap[String, (Long, Long)]

    def add(item: String, inc: Long, err: Long): Unit = {
      total += inc
      counts.get(item) match {
        case Some((c, e)) => counts.update(item, (c + inc, e + err))
        case None if counts.size < capacity => counts.update(item, (inc, err))
        case None =>
          // evict the minimum-count entry; the newcomer inherits its
          // count as the error bound (it may have occurred that often
          // while untracked)
          val (minItem, (minC, _)) = counts.minBy { case (k, (c, _)) => (c, k) }
          counts.remove(minItem)
          counts.update(item, (minC + inc, minC + err))
      }
    }

    /** Standard merged-space-saving: sum common entries; an item present
      * in only one side may have occurred up to the other side's minimum
      * count unseen, so that minimum joins its error bound. Then trim to
      * the top `capacity` by count.
      */
    def merge(other: Buffer): Buffer = {
      val out = new Buffer(capacity)
      out.total = total + other.total
      val thisMin = if (counts.size < capacity) 0L
        else counts.valuesIterator.map(_._1).min
      val otherMin = if (other.counts.size < other.capacity) 0L
        else other.counts.valuesIterator.map(_._1).min
      val all = counts.keySet ++ other.counts.keySet
      val merged = all.iterator.map { item =>
        // an item absent from a side's summary occurred at most that
        // side's minimum count unseen there — inject it as count AND
        // error so the merged count stays an overestimate
        val (c1, e1) = counts.getOrElse(item, (thisMin, thisMin))
        val (c2, e2) = other.counts.getOrElse(item, (otherMin, otherMin))
        item -> (c1 + c2, e1 + e2)
      }.toSeq
      merged.sortBy { case (k, (c, _)) => (-c, k) }.take(capacity)
        .foreach { case (k, (c, e)) => out.counts.update(k, (c, e)) }
      out
    }
  }

  /** Typed Aggregator over a string item column. The buffer is a plain
    * JVM object within a partition (O(1)-ish updates); Kryo serializes
    * it only at shuffle/merge boundaries.
    */
  final class SpaceSavingAgg(capacity: Int)
      extends Aggregator[String, Buffer, Summary] {
    override def zero: Buffer = new Buffer(capacity)
    override def reduce(b: Buffer, item: String): Buffer = {
      if (item != null) b.add(item, 1L, 0L)
      b
    }
    override def merge(a: Buffer, b: Buffer): Buffer = a.merge(b)
    override def finish(b: Buffer): Summary =
      Summary(b.capacity, b.total, b.counts.toMap)
    override def bufferEncoder: Encoder[Buffer] = Encoders.kryo[Buffer]
    override def outputEncoder: Encoder[Summary] = Encoders.product[Summary]
  }

  /** One-pass bounded-memory summary of `itemCol`. */
  def summarize(df: DataFrame, itemCol: String, capacity: Int): Summary = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val agg = udaf(new SpaceSavingAgg(capacity))
    df.select(agg(col(itemCol)).as("s"))
      .as(Encoders.product[Tuple1[Summary]])
      .head()._1
  }

  /** EXACT frequent items: every `itemCol` value occurring at least
    * `threshold` times, with its exact count — computed without a full
    * groupBy of the stream. Pass 1 sketches candidates (bounded memory,
    * no correctness role beyond completeness); pass 2 counts only the
    * candidate items. Requires `threshold > N / capacity` (checked
    * after the sketch pass, when N is known) — below that the sketch
    * cannot promise completeness and the caller should raise `capacity`
    * or fall back to the plain aggregation.
    */
  def frequentItems(
      df: DataFrame, itemCol: String,
      threshold: Long, capacity: Int): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    val summary = summarize(df, itemCol, capacity)
    require(summary.total < threshold * capacity.toLong,
      s"capacity $capacity cannot guarantee completeness at threshold " +
        s"$threshold over ${summary.total} items (need capacity > " +
        s"${summary.total / threshold}); raise capacity")
    val cands = summary.mightReach(threshold)
    if (cands.isEmpty) {
      df.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        new org.apache.spark.sql.types.StructType()
          .add("item", "string").add("count", "long"))
    } else {
      df.filter(col(itemCol).isInCollection(cands))
        .groupBy(col(itemCol).as("item"))
        .agg(count(lit(1)).as("count"))
        .filter(col("count") >= threshold)
    }
  }
}
