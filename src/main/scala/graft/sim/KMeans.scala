package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed k-means (Lloyd's algorithm) over an
  * embedding column — corpus clustering for data curation: domain
  * discovery, cluster-balanced sampling, per-cluster quality triage
  * (the SemDeDup / DoReMi-style preprocessing steps).
  *
  * Why a bespoke k-means: floating-point summation is not associative,
  * so a naive distributed centroid update (`avg` over a shuffled
  * partitioning) produces run-to-run different centroids — fine for ML,
  * fatal for a verifiable pipeline. Here every centroid update
  * accumulates QUANTIZED INTEGERS: each coordinate contributes
  * `floor(x · 2^quantBits)` as a long, integer sums are exact and
  * order-independent under any partitioning, and the centroid is
  * recovered with two IEEE divides. Results are bit-identical across
  * cluster sizes, retries and engines — the oracle replays all
  * iterations in SQL.
  *
  * Precision contract: quantization truncates coordinates to
  * `2^-quantBits` (default ~1e-6) per update — far below any clustering
  * signal. Overflow safety: per-cluster sums stay exact while
  * `clusterSize · 2^quantBits · maxAbs < 2^63` (ANSI mode throws rather
  * than wrapping if violated) — the default 20 bits supports ~10^12
  * unit-scale vectors per cluster.
  *
  * Scale shape (per iteration):
  *   - assignment is MAP-ONLY: centroids travel as a k×dim literal
  *     (bounded, like the IVF centroid table) and each row computes its
  *     distance array in one projection — no join, no shuffle;
  *   - the update is one posexplode + hash aggregate on (cluster, dim):
  *     k×dim groups, map-side combinable, so the shuffle carries only
  *     partitions × k × dim partial sums regardless of corpus size;
  *   - the k×dim sum table collects to the driver (bounded, same
  *     contract as IVF's centroid sample), never the data.
  *
  * The assignment's distance fold runs on the native codegen
  * expression [[graft.functions.L2DistancesFold]] — one flat k×dim
  * loop per row instead of k interpreted higher-order-function folds.
  * The composed HOF form is kept as the executable definition of the
  * arithmetic and pinned bit-equivalent in KMeansSpec.
  */
object KMeans {

  /** Squared-L2 distances from `vec` (float array, cast to double) to
    * each centroid, as a k-element array in centroid order. Sequential
    * fold in dimension order — deterministic and SQL-replayable.
    */
  private[sim] def distances(vec: Column, cents: Seq[Array[Double]]): Column =
    graft.functions.L2DistancesFold.l2Distances(vec, cents)

  /** Composed higher-order-function form of [[distances]] — the
    * equivalence witness for the native expression (same sequential
    * fold, same IEEE order).
    */
  private[sim] def distancesHof(vec: Column, cents: Seq[Array[Double]]): Column = {
    // bind the cast-to-double array once (interpreted HOFs re-evaluate
    // referenced subtrees per element — see TextStats.bindOnce)
    graft.text.TextStats.bindOnce(transform(vec, _.cast("double"))) { v =>
      array(cents.map { c =>
        val cl = array(c.map(lit).toIndexedSeq: _*)
        aggregate(
          zip_with(v, cl, (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x)
      }.toIndexedSeq: _*)
    }
  }

  /** 0-based index of the first minimum — ties break toward the lower
    * centroid index, replayed in SQL as `ORDER BY dist, cid`.
    */
  private[sim] def argmin(dists: Column): Column =
    (array_position(dists, array_min(dists)) - 1L).cast("int")

  /** `iters` Lloyd rounds from deterministic init (the vectors of the k
    * smallest ids, in id order). Returns the k centroids, index-aligned
    * with [[assign]]'s cluster column. Empty clusters keep their
    * previous centroid.
    */
  def fit(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, quantBits: Int = 20): Array[Array[Double]] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(quantBits >= 1 && quantBits <= 40,
      s"quantBits must be in [1, 40], got $quantBits")
    val init = df.select(col(idCol), col(vecCol))
      .orderBy(col(idCol)).limit(k) // TakeOrderedAndProject: bounded k·dim
      .collect()
    require(init.length == k, s"need at least $k rows, got ${init.length}")
    var cents = init.map(
      _.getAs[scala.collection.Seq[Float]](1).map(_.toDouble).toArray)
    val scale = math.pow(2.0, quantBits) // exact power of two

    for (_ <- 0 until iters) {
      // cluster BEFORE posexplode: a generator-level distance expression
      // would re-evaluate the k-fold distance array once per dimension
      val sums = df
        .select(col(vecCol).as("__v"),
          argmin(distances(col(vecCol), cents.toIndexedSeq)).as("__c"))
        .select(col("__c"), posexplode(col("__v")).as(Seq("__pos", "__x")))
        .select(col("__c"), col("__pos"),
          floor(col("__x").cast("double") * lit(scale)).as("__q"))
        .groupBy(col("__c"), col("__pos"))
        .agg(sum(col("__q")).as("__s"), count(lit(1)).as("__n"))
        .collect() // bounded: k × dim rows
      val byCluster = sums.groupBy(_.getInt(0))
      cents = Array.tabulate(k) { c =>
        byCluster.get(c) match {
          case None => cents(c) // empty cluster: centroid unchanged
          case Some(rows) =>
            val dim = rows.map(_.getInt(1)).max + 1
            val out = new Array[Double](dim)
            rows.foreach { r =>
              // same divide shape as the SQL replay: (sum / 2^bits) / n
              out(r.getInt(1)) =
                (r.getLong(2).toDouble / scale) / r.getLong(3).toDouble
            }
            out
        }
      }
    }
    cents
  }

  /** (id, cluster, dist): nearest-centroid assignment with squared-L2
    * distance. Map-only — one projection over the scan.
    */
  def assign(
      df: DataFrame, idCol: String, vecCol: String,
      cents: Seq[Array[Double]]): DataFrame =
    df.select(col(idCol), distances(col(vecCol), cents).as("__d"))
      .select(col(idCol), argmin(col("__d")).as("cluster"),
        array_min(col("__d")).as("dist"))

  /** Fit + assign in one call: `iters` deterministic Lloyd rounds, then
    * the final (id, cluster, dist) assignment.
    */
  def kmeans(
      df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, quantBits: Int = 20): DataFrame =
    assign(df, idCol, vecCol,
      fit(df, idCol, vecCol, k, iters, quantBits).toIndexedSeq)
}
