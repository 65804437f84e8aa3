package graft.sim

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Johnson-Lindenstrauss random projection — the DATA-INDEPENDENT
  * complement to [[Gram]]'s PCA: project `dim`-dimensional embeddings
  * onto `k` pseudo-random ±1 directions. No fit pass, no training-set
  * coupling, distance preservation within (1±ε) w.h.p. for
  * k = O(log n / ε²) (Achlioptas 2003 for the ±1-entry form) — the
  * standard cheap preprocessing before LSH/clustering when even one
  * Gram-accumulation pass over 100 TB is too much, and the projection
  * must be reproducible across engines and reruns.
  *
  * The sign matrix is derived entry-by-entry from the engine's
  * replayable squared Karp-Rabin hash (`s_ij = ±1` by the parity of
  * `krHash²("i:j[:salt]") mod p`) — no RNG stream, no stored artifact:
  * any engine regenerates the identical matrix from (dim, k, salt)
  * alone, and the q182 oracle does exactly that in SQL. Projections
  * accumulate left-to-right over the input index (the [[Similarity.dot]]
  * order), so outputs are bit-exact IEEE doubles cross-engine.
  *
  * Scale shape: map-only — the k×dim sign matrix (a few KB) rides the
  * closure; one pass, no shuffle, no driver state.
  */
object RandomProjection {

  /** The deterministic ±1 sign for matrix entry (row j, input i). */
  def sign(i: Int, j: Int, salt: String): Int = {
    val key = if (salt.isEmpty) s"$i:$j" else s"$i:$j:$salt"
    val h = graft.functions.KrHash.hash(
      key.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sq = (h * h) % ((1L << 31) - 1)
    if (sq % 2 == 0) 1 else -1
  }

  /** The full k×dim sign matrix (`matrix(j)(i)`). */
  def signMatrix(dim: Int, k: Int, salt: String): Array[Array[Int]] =
    Array.tabulate(k, dim)((j, i) => sign(i, j, salt))

  /** `df` plus `outCol`: the k-dim projection
    * `y_j = Σ_i x_i · s_ij` (i ascending, 0-based; float inputs
    * widened to double per element — the cross-engine fold contract).
    * Unscaled: callers needing the JL isometry divide by `√k`
    * downstream; cosine/argmax users don't need to.
    */
  def project(
      df: DataFrame, vecCol: String, dim: Int, k: Int,
      salt: String = "", outCol: String = "proj"): DataFrame = {
    require(dim >= 1 && k >= 1, s"need dim, k >= 1, got dim=$dim k=$k")
    val m = signMatrix(dim, k, salt)
    val bc = df.sparkSession.sparkContext.broadcast(m)
    val vecIdx = df.schema.fieldIndex(vecCol)
    val outSchema = df.schema.add(outCol, ArrayType(DoubleType, false), false)
    df.mapPartitions { rows =>
      val mat = bc.value
      rows.map { row =>
        val vec = row.getSeq[Float](vecIdx)
        val n = math.min(dim, vec.length)
        val y = new Array[Double](k)
        var j = 0
        while (j < k) {
          val signs = mat(j)
          var acc = 0.0
          var i = 0
          while (i < n) { acc += vec(i).toDouble * signs(i); i += 1 }
          y(j) = acc
          j += 1
        }
        Row.fromSeq(row.toSeq :+ (y.toSeq: Seq[Double]))
      }
    }(Encoders.row(outSchema))
  }
}
