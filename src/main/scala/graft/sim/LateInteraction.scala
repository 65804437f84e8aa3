package graft.sim

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Late-interaction (MaxSim) retrieval scoring — the ColBERT family
  * (Khattab & Zaharia 2020): a query and a document are each a BAG of
  * token embeddings, and the relevance score is
  *
  *   score(q, d) = Σ_i max_j cos(q_i, d_j)
  *
  * i.e. every query token independently finds its best-matching
  * document token. Compared to single-vector cosine (q12/q26), MaxSim
  * preserves term-level matching — "which exact phrase matched" — at
  * the cost of T× the vector payload. It is the standard shape for
  * retrieval-mined training data where pooled vectors wash out rare
  * terms.
  *
  * Token matrices: the engine treats a token-embedding column as
  * `array<array<float>>`. Corpora that carry only a pooled vector can
  * derive a deterministic pseudo-token matrix by splitting the flat
  * vector into `nSub` contiguous sub-vectors ([[subVectors]]) — the
  * same trick product quantization uses for subspaces; it keeps every
  * query oracle-replayable because the split is pure arithmetic on the
  * stored floats.
  *
  * Scale shape: queries (Q × T × subDim floats) are broadcast; the
  * corpus is scanned ONCE map-only, each task keeping Q bounded top-k
  * heaps (the [[Similarity.bruteForceTopK]] two-stage profile — partial
  * heaps per partition, then a final per-query top-k over P·Q·k rows).
  * No shuffle touches the vectors. The serving path composes with the
  * prepared IVF index: [[maxSimFromCandidates]] reranks a bounded
  * candidate set (e.g. [[Similarity.ivfTopK]] over pooled vectors) so
  * only ~nProbe/nCells of the corpus is ever scored — first-stage
  * recall from the cheap pooled index, term-level precision from the
  * MaxSim rerank, which is exactly how ColBERT-scale deployments run.
  *
  * Determinism: per-token cosines use [[Similarity.cosine]]'s
  * sequential double folds; the per-query-token max is order-free; the
  * final sum accumulates in token order (left fold), so DuckDB replays
  * the score bit-for-bit with sliced lists and a fixed-parenthesization
  * sum (q183).
  */
object LateInteraction {

  /** Split a flat vector into `nSub` contiguous sub-vectors (the
    * pseudo-token matrix). Requires `v.length % nSub == 0`.
    */
  def subVectors(nSub: Int)(v: collection.Seq[Float]): Array[Array[Float]] = {
    require(nSub > 0 && v.length % nSub == 0,
      s"vector length ${v.length} not divisible by nSub=$nSub")
    val sub = v.length / nSub
    Array.tabulate(nSub) { i =>
      val a = new Array[Float](sub)
      var j = 0
      while (j < sub) { a(j) = v(i * sub + j); j += 1 }
      a
    }
  }

  /** MaxSim score: Σ over query tokens (in order) of the max cosine
    * against any document token. Sum is a sequential left fold so the
    * IEEE result is replayable.
    */
  def maxSim(q: Array[Array[Float]], d: Array[Array[Float]]): Double = {
    var acc = 0.0
    var i = 0
    while (i < q.length) {
      var best = Double.NegativeInfinity
      var j = 0
      while (j < d.length) {
        val c = Similarity.cosine(q(i), d(j))
        if (c > best) best = c
        j += 1
      }
      acc += (if (best == Double.NegativeInfinity) 0.0 else best)
      i += 1
    }
    acc
  }

  private val resultSchema = StructType(Seq(
    StructField("query_id", LongType, nullable = false),
    StructField("vec_id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  /** Brute-force MaxSim top-k over a pooled-vector corpus: each flat
    * `vecCol` is split into `nSub` pseudo-token sub-vectors and scored
    * against the broadcast query token matrices. Ties broken by
    * ascending id (total order — oracle-checkable).
    */
  def maxSimTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: Seq[(Long, Array[Array[Float]])],
      nSub: Int,
      k: Int): DataFrame = {
    val spark = corpus.sparkSession
    val bc = spark.sparkContext.broadcast(queries)
    val idIdx = corpus.schema.fieldIndex(idCol)
    val vecIdx = corpus.schema.fieldIndex(vecCol)

    // stage 1: per-partition top-k per query, bounded state
    val partial = corpus.mapPartitions { rows =>
      val qs = bc.value
      val heaps = qs.map { case (qid, _) =>
        qid -> new Similarity.BoundedTopK(k)
      }.toMap
      rows.foreach { row =>
        val id = row.getLong(idIdx)
        val toks = subVectors(nSub)(row.getSeq[Float](vecIdx))
        qs.foreach { case (qid, qtoks) =>
          heaps(qid).offer(id, maxSim(qtoks, toks))
        }
      }
      heaps.iterator.flatMap { case (qid, heap) =>
        heap.results.map { case (id, score) => Row(qid, id, score) }
      }
    }(Encoders.row(resultSchema))

    // stage 2: global top-k per query over P×Q×k rows
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    partial.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** MaxSim rerank over an EXTERNAL candidate set — the serving shape.
    * `candidates` carries `(query_id, vec_id)` pairs from any first
    * stage (typically [[Similarity.ivfTopK]] on the pooled vectors, so
    * the corpus scan is already partition-pruned); this attaches the
    * corpus vectors to the candidate ids with a broadcast semi-join
    * (candidate set is Q×candidateK — bounded by contract), scores
    * each pair with MaxSim, and keeps the top `k` per query.
    *
    * Pinned ≡ [[maxSimTopK]] when the candidate set is the whole
    * corpus (LateInteractionSpec).
    */
  def maxSimFromCandidates(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      candidates: DataFrame,
      queries: Seq[(Long, Array[Array[Float]])],
      nSub: Int,
      k: Int): DataFrame = {
    val spark = corpus.sparkSession
    val bcq = spark.sparkContext.broadcast(queries.toMap)

    // candidate ids → corpus vectors: broadcast the bounded pair set
    // onto the corpus scan (no corpus shuffle)
    val pairs = candidates.select(
      col("query_id").cast(LongType).as("query_id"),
      col("vec_id").cast(LongType).as("vec_id"))
    val withVec = corpus
      .select(col(idCol).cast(LongType).as("vec_id"), col(vecCol).as("__v"))
      .join(broadcast(pairs), Seq("vec_id"))

    val qIdx = withVec.schema.fieldIndex("query_id")
    val idIdx = withVec.schema.fieldIndex("vec_id")
    val vIdx = withVec.schema.fieldIndex("__v")
    val scored = withVec.mapPartitions { rows =>
      val qs = bcq.value
      rows.flatMap { row =>
        val qid = row.getLong(qIdx)
        qs.get(qid).map { qtoks =>
          val toks = subVectors(nSub)(row.getSeq[Float](vIdx))
          Row(qid, row.getLong(idIdx), maxSim(qtoks, toks))
        }
      }
    }(Encoders.row(resultSchema))

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
