package graft.eval

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructType}

/** Isotonic calibration (pool-adjacent-violators) — the FIX for the
  * miscalibration [[Ranking.calibrationTable]] (q80) measures and
  * [[Ranking.calibrationSummary]] (q81) gates on: learn the
  * monotone-non-decreasing map from a classifier's quantized score to
  * an empirical probability, so "keep everything the quality model
  * scores above 0.9" means what it says before the threshold prunes a
  * corpus. (Zadrozny & Elkan 2002's isotonic recipe; PAVA is Ayer et
  * al. 1955.)
  *
  * Exactness: predictions arrive QUANTIZED (`predQ ∈ [0, scale]`, the
  * q80 contract), so the sufficient statistics are one bounded
  * `(group, predQ) → (n, n_pos)` bin table. PAVA runs on the driver
  * over that table — comparisons between pool means `p_i/n_i` are done
  * by BigInt cross-multiplication (never IEEE), so pooling is exact —
  * and each bin's calibrated value is emitted as the exact rational
  * `(cal_num, cal_den)` = (pool positives, pool size) plus ONE
  * correctly-rounded IEEE divide. Equal rationals divide to identical
  * doubles whatever representative interval produced them, so the
  * result is bit-stable across engines; the q207 oracle replays the
  * fit through isotonic regression's minimax characterization
  * `fit_i = max_{j≤i} min_{k≥i} mean(y[j..k])` (Robertson/Wright/
  * Dykstra 1988, eq. 1.3.5) — B³ interval rows over a B-bin table.
  *
  * Scale shape: ONE map-side-combinable aggregate reduces the corpus
  * to the bin table (shuffle carries (group, predQ) cells, never
  * rows); the driver collect is bounded by `maxBins` with the
  * fail-loud [[graft.sim.KMeans]]/[[graft.text.Dsir]] bounded-collect
  * contract. The mapping table is what ships — apply it with
  * [[applyCalibration]]'s broadcast join (bin-table-sized build side).
  */
object Isotonic {

  /** The fitted mapping: one row per observed `(group…, predQ)` bin —
    * `(groupCols…, predQ, n, n_pos, cal_num, cal_den, calibrated)`
    * with `calibrated = cal_num / cal_den` non-decreasing in `predQ`
    * within each group. Labels must be 0/1 and `predQ` a non-negative
    * integer; NULLs and other values raise.
    */
  def fitCalibration(
      df: DataFrame, groupCols: Seq[String], predQCol: String,
      labelCol: String, maxBins: Long = 1000000L): DataFrame = {
    require(maxBins >= 1, s"maxBins must be >= 1, got $maxBins")
    val predQ = when(
      col(predQCol).isNull || col(predQCol).cast("long") < 0L,
      raise_error(lit(s"fitCalibration: NULL or negative $predQCol — " +
        "quantized predictions are non-negative integers")))
      .otherwise(col(predQCol).cast("long"))
    val label = when(
      col(labelCol).isNull ||
        (col(labelCol).cast("long") =!= 0L &&
          col(labelCol).cast("long") =!= 1L),
      raise_error(lit(s"fitCalibration: $labelCol must be 0 or 1")))
      .otherwise(col(labelCol).cast("long"))
    val bins = df
      .select((groupCols.map(col) :+ predQ.as("predQ") :+
        label.as("__y")): _*)
      .groupBy((groupCols :+ "predQ").map(col): _*)
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
      .localCheckpoint(true) // the count guard + collect both read it

    val nBins = bins.count()
    require(nBins > 0, "fitCalibration: input is empty")
    require(nBins <= maxBins,
      s"fitCalibration: $nBins (group, predQ) bins exceeds maxBins=" +
        s"$maxBins — quantize predictions coarser (the q80 contract) " +
        "or raise the cap knowingly")

    val g = groupCols.size
    val rows = bins.collect() // bounded: nBins <= maxBins
    val out = rows
      .groupBy(r => (0 until g).map(r.get).toIndexedSeq)
      .toSeq
      .flatMap { case (key, binRows) =>
        val sorted = binRows.sortBy(_.getLong(g)) // by predQ
        // PAVA stack: pools carry (first bin idx, n, pos); merge while
        // the previous pool's mean EXCEEDS the top's (exact cross-mul)
        final case class Pool(from: Int, n: Long, pos: Long)
        val stack = scala.collection.mutable.ArrayBuffer.empty[Pool]
        sorted.zipWithIndex.foreach { case (r, i) =>
          stack += Pool(i, r.getLong(g + 1), r.getLong(g + 2))
          while (stack.size >= 2 && {
            val a = stack(stack.size - 2); val b = stack.last
            BigInt(a.pos) * b.n > BigInt(b.pos) * a.n
          }) {
            val b = stack.remove(stack.size - 1)
            val a = stack.remove(stack.size - 1)
            stack += Pool(a.from, a.n + b.n, a.pos + b.pos)
          }
        }
        // emit one row per input bin with its pool's rational value
        val pools = stack.toIndexedSeq
        sorted.zipWithIndex.map { case (r, i) =>
          val p = pools(pools.lastIndexWhere(_.from <= i))
          // Seq[Any]: an unascribed mixed Long/Double Seq weak-conforms
          // to Seq[Double] and silently widens every long
          Row.fromSeq(key ++ Seq[Any](r.getLong(g), r.getLong(g + 1),
            r.getLong(g + 2), p.pos, p.n,
            p.pos.toDouble / p.n.toDouble))
        }
      }
    val schema = StructType(bins.schema.fields.take(g))
      .add("predQ", LongType, nullable = false)
      .add("n", LongType, nullable = false)
      .add("n_pos", LongType, nullable = false)
      .add("cal_num", LongType, nullable = false)
      .add("cal_den", LongType, nullable = false)
      .add("calibrated", DoubleType, nullable = false)
    df.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(out: _*)),
      schema)
  }

  /** `df` plus `calCol` = the fitted probability for the row's
    * `(group…, predQ)` bin — a broadcast join against the
    * bin-table-sized mapping. Rows whose bin the fit never saw get
    * NULL (an unseen score is not a calibrated one; gate or clamp
    * explicitly).
    */
  def applyCalibration(
      df: DataFrame, mapping: DataFrame, groupCols: Seq[String],
      predQCol: String, calCol: String = "calibrated"): DataFrame = {
    require(!df.columns.contains(calCol),
      s"column $calCol already exists on the input")
    val m = mapping.select(
      (groupCols.zipWithIndex.map { case (c, i) => col(c).as(s"__g$i") } :+
        col("predQ").as("__pq") :+ col("calibrated").as(calCol)): _*)
    // null-safe equality on group keys: fitCalibration's groupBy
    // RETAINS null keys, so a NULL-group bin the fit produced must
    // match NULL-group rows here — a plain === would treat a seen bin
    // as unseen (null === null is null)
    val cond = groupCols.zipWithIndex
      .map { case (c, i) => df(c) <=> m(s"__g$i") }
      .foldLeft(df(predQCol).cast("long") === m("__pq"))(_ && _)
    df.join(broadcast(m), cond, "left")
      .select(df.columns.map(df(_)) :+ m(calCol): _*)
  }
}
