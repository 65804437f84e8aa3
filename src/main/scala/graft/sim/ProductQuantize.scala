package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze & Schmid 2011) — the memory leg
  * of billion-scale ANN: split each vector into `nSub` contiguous
  * sub-vectors, quantize each against its own small codebook, and keep
  * only the code ids. A 64-dim float vector (256 B) becomes `nSub`
  * small integers; queries score compressed codes with an
  * ASYMMETRIC DISTANCE COMPUTATION (ADC) — the query stays exact, each
  * subspace contributes a lookup-table distance to the doc's assigned
  * centroid — so a 100 TB vector corpus serves from a codes table ~64×
  * smaller, scanned without touching a single original float. The
  * standard composition is IVF-PQ: [[Similarity.buildIvf]] prunes to
  * ~nProbe/nCells of the corpus, ADC ranks the survivors, and an exact
  * rerank over the few ADC winners (vectors fetched by id) restores
  * precision — each stage is an operator here.
  *
  * Codebooks: [[codebooksFromRows]] takes the `nCodes` lowest-id
  * corpus rows as centroids — fully deterministic and engine-replayable
  * (q66's centroid protocol), which is what the oracle needs. The
  * caller-supplied [[Codebooks]] seam accepts centroids from anywhere;
  * production would hand each subspace to [[KMeans]] (its
  * deterministic quantized-sum trainer) and pass the results in.
  *
  * Plan shape: [[encode]] is MAP-ONLY whole-stage codegen — per
  * subspace a native [[graft.functions.L2DistancesFold]] (one flat
  * k×dim loop, centroid matrix as a codegen reference object) and an
  * `array_position(d, array_min(d))` first-minimum argmin; no UDF, no
  * shuffle, no driver loop. [[adcTopK]] broadcasts per-query lookup
  * tables (nSub × nCodes doubles) as literal arrays, scores with
  * `element_at` sums in fixed subspace order, and keeps top-k with the
  * two-stage bounded window of q12.
  *
  * Determinism: sub-distances are the L2DistancesFold sequential fold
  * (`acc + (x−c)·(x−c)` seeded 0.0, dimension order); the ADC sum
  * accumulates in subspace order with fixed parenthesization; argmin
  * and top-k tie-break on the lowest code / id — so DuckDB replays
  * codes, ADC scores, and ranking bit-for-bit (q185).
  */
object ProductQuantize {

  /** `codes(s)(c)` = centroid `c` of subspace `s`; all subspaces share
    * `nCodes` centroids of dimension `subDim`.
    */
  final case class Codebooks(
      nSub: Int, subDim: Int, codes: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]) {
    require(nSub > 0 && codes.length == nSub, "one codebook per subspace")
    require(codes.forall(_.nonEmpty), "empty codebook")
    require(codes.flatten.forall(_.length == subDim),
      s"all centroids must have dimension $subDim")
    def nCodes: Int = codes.head.length
  }

  /** Deterministic codebooks from the `nCodes` lowest-id corpus rows
    * (collect bounded by `nCodes` — a handful of centroids, never the
    * corpus): row ranked `c` contributes its `s`-th sub-vector as
    * centroid `c` of subspace `s`.
    */
  def codebooksFromRows(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nSub: Int,
      nCodes: Int): Codebooks = {
    val rows = corpus
      .select(col(idCol), col(vecCol).cast("array<double>"))
      .orderBy(col(idCol))
      .limit(nCodes)
      .collect()
      .map(_.getSeq[Double](1))
    require(rows.nonEmpty, "corpus has no rows to sample codebooks from")
    val dim = rows.head.length
    require(dim % nSub == 0, s"dim $dim not divisible by nSub=$nSub")
    val subDim = dim / nSub
    Codebooks(nSub, subDim,
      IndexedSeq.tabulate(nSub) { s =>
        rows.toIndexedSeq.map(v =>
          v.slice(s * subDim, (s + 1) * subDim).toIndexedSeq)
      })
  }

  /** The `codes array<int>` column: `codes[s]` = 0-based first-minimum
    * L2 centroid of subspace `s`. Whole-stage codegen end to end.
    */
  private def codesColumn(vecCol: String, cb: Codebooks): Column = {
    val v = col(vecCol).cast("array<double>")
    val codeCols = (0 until cb.nSub).map { s =>
      val sub = slice(v, s * cb.subDim + 1, cb.subDim)
      val d = graft.functions.L2DistancesFold.l2Distances(
        sub, cb.codes(s).map(_.toArray))
      (array_position(d, array_min(d)) - 1).cast("int")
    }
    array(codeCols: _*)
  }

  /** PQ-encode the corpus: `(idCol, codes array<int>)`. Map-only
    * whole-stage codegen; the vectors never shuffle.
    */
  def encode(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      cb: Codebooks): DataFrame =
    corpus.select(col(idCol), codesColumn(vecCol, cb).as("codes"))

  /** `d²(q_s, centroid)` — identical arithmetic to L2DistancesFold's
    * fold (seeded 0.0, dimension order).
    */
  private def d2f(q: Array[Float], c: IndexedSeq[Double]): Double = {
    var acc = 0.0
    var j = 0
    while (j < c.length) {
      val diff = q(j).toDouble - c(j)
      acc += diff * diff
      j += 1
    }
    acc
  }

  /** Per-query LUT: `lut(s)(c)` = d² from the query's subspace-`s`
    * slice to centroid `c` of codebook `s`.
    */
  private def lutsFor(
      qv: Array[Float], cb: Codebooks): IndexedSeq[IndexedSeq[Double]] = {
    val dim = cb.nSub * cb.subDim
    require(qv.length == dim, s"query dim ${qv.length}, expected $dim")
    (0 until cb.nSub).map { s =>
      val qs = qv.slice(s * cb.subDim, (s + 1) * cb.subDim)
      cb.codes(s).map(c => d2f(qs, c))
    }
  }

  /** ADC top-k over an encoded corpus: per query, the `k` ids with the
    * smallest approximate squared-L2 distance
    * `Σ_s d²(q_s, centroid[s][codes[s]])` (sum in subspace order).
    * Ascending distance, ties by ascending id — total order.
    * Output: `(query_id, vec_id, adist)`.
    */
  def adcTopK(
      encoded: DataFrame,
      idCol: String,
      queries: Seq[(Long, Array[Float])],
      cb: Codebooks,
      k: Int): DataFrame = {
    require(queries.nonEmpty, "adcTopK needs at least one query")
    val perQuery = queries.map { case (qid, qv) => (qid, lutsFor(qv, cb)) }

    // ONE scan of the codes table: the Q flattened LUTs join in with
    // the constant-key broadcast-HASH-join trick (core/Scalars — a
    // plain crossJoin of a tiny side plans a BroadcastNestedLoopJoin,
    // which the engine bans, and a `lit` key constant-folds back into
    // one — the key must derive from each side's own columns), then
    // element_at lookups sum left-assoc in subspace order — all codegen
    val spark = encoded.sparkSession
    import spark.implicits._
    val qdf = perQuery
      .map { case (qid, luts) => (qid, luts.flatten.toSeq) }
      .toDF("query_id", "lut")
    val nCodes = cb.nCodes
    val joined = encoded
      .withColumn("__k", pmod(hash(col(idCol)), lit(1)))
      .join(broadcast(qdf.withColumn(
        "__k", pmod(hash(col("query_id")), lit(1)))), "__k")
    val terms = (0 until cb.nSub).map { s =>
      element_at(col("lut"), lit(s * nCodes) + col("codes").getItem(s) + 1)
    }
    val scored = joined.select(
      col("query_id"),
      col(idCol).cast("long").as("vec_id"),
      terms.reduceLeft(_ + _).as("adist"))

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("vec_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  // ---- IVF-PQ: the composed billion-scale layout ----

  /** An on-disk IVF-PQ index: per-cell PQ code lists + centroids +
    * codebooks. `cells` is `(idCol, codes, cell)`, read back from a
    * cell-partitioned parquet so a probe's cell filter is real
    * partition pruning.
    */
  final case class IvfPq(
      cells: DataFrame,
      centroids: Seq[(Int, Array[Float])],
      cb: Codebooks,
      idCol: String)

  /** Write the IVF-PQ index: the assigned corpus of `index` is
    * PQ-encoded (map-only codegen) and written partitioned by cell —
    * the [[Similarity.writeIvfIndex]] layout with codes instead of
    * vectors, so each cell directory is ~64× smaller and an ADC probe
    * of `nProbe` of `nCells` cells reads only those directories.
    * Centroids and codebooks are stored alongside (nCells +
    * nSub·nCodes rows).
    */
  def writeIvfPq(
      index: Similarity.IvfIndex, cb: Codebooks, path: String): Unit = {
    val spark = index.assigned.sparkSession
    import spark.implicits._
    index.assigned
      .select(col(index.idCol), codesColumn(index.vecCol, cb).as("codes"),
        col("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(s"$path/cells")
    index.centroids.map { case (c, v) => (c, v.toSeq) }
      .toDF("cell", "centroid")
      .repartition(1).write.mode("overwrite").parquet(s"$path/centroids")
    (for (s <- 0 until cb.nSub; c <- 0 until cb.nCodes)
      yield (s, c, cb.codes(s)(c)))
      .toDF("s", "code", "centroid")
      .repartition(1).write.mode("overwrite").parquet(s"$path/codebooks")
  }

  /** Read an IVF-PQ index written by [[writeIvfPq]]. The returned
    * `cells` DataFrame is partition-pruned by any `cell` filter
    * [[ivfAdcTopK]] applies.
    */
  def readIvfPq(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      idCol: String): IvfPq = {
    val cells = spark.read.parquet(s"$path/cells")
    val centroids = spark.read.parquet(s"$path/centroids")
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).toSeq
    val cbRows = spark.read.parquet(s"$path/codebooks")
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getSeq[Double](2).toIndexedSeq))
      .toMap
    val nSub = cbRows.keys.map(_._1).max + 1
    val nCodes = cbRows.keys.map(_._2).max + 1
    val cb = Codebooks(nSub, cbRows.head._2.length,
      IndexedSeq.tabulate(nSub)(s => IndexedSeq.tabulate(nCodes)(c => cbRows((s, c)))))
    IvfPq(cells, centroids, cb, idCol)
  }

  /** IVF-PQ serving: per query, pick the `nProbe` nearest-cosine cells
    * ([[Similarity.ivfTopK]]'s probe rule — lowest cell id on ties),
    * then ADC-rank ONLY those cells' code lists. The cell filter is a
    * literal `isin` over the union of probed cells (partition pruning
    * at the scan — the 100 TB read-path win), the per-query (cell,
    * LUT) pairs broadcast in on a cell equi-join (hash, not BNLJ), and
    * the bounded top-k window finishes. With `nProbe = nCells` this is
    * exactly [[adcTopK]] over the whole corpus (pinned in
    * ProductQuantizeSpec).
    */
  def ivfAdcTopK(
      index: IvfPq,
      queries: Seq[(Long, Array[Float])],
      k: Int,
      nProbe: Int): DataFrame = {
    require(queries.nonEmpty, "ivfAdcTopK needs at least one query")
    val cb = index.cb
    val perQuery = queries.map { case (qid, qv) =>
      val probes = index.centroids
        .sortBy { case (c, cv) => (-Similarity.cosine(qv, cv), c) }
        .take(nProbe).map(_._1)
      (qid, probes, lutsFor(qv, cb).flatten.toSeq)
    }

    val spark = index.cells.sparkSession
    import spark.implicits._
    val probedCells = perQuery.flatMap(_._2).distinct
    val qcell = perQuery
      .flatMap { case (qid, probes, lut) => probes.map(c => (qid, c, lut)) }
      .toDF("query_id", "cell", "lut")

    val nCodes = cb.nCodes
    val joined = index.cells
      .filter(col("cell").isin(probedCells: _*))
      .join(broadcast(qcell), Seq("cell"))
    val terms = (0 until cb.nSub).map { s =>
      element_at(col("lut"), lit(s * nCodes) + col("codes").getItem(s) + 1)
    }
    val scored = joined.select(
      col("query_id"),
      col(index.idCol).cast("long").as("vec_id"),
      terms.reduceLeft(_ + _).as("adist"))

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist").asc, col("vec_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
