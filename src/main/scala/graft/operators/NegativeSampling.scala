package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.KrHash

/** Deterministic negative sampling for contrastive training — k
  * pseudo-random negatives per anchor WITHOUT a per-anchor random
  * draw (irreproducible) or a candidate cross-join (quadratic). The
  * ring strategy: lay every example on a circle in KR-hash order
  * ([[Enumerate.denseIds]] gives positions 0..N−1), then for each
  * sampling rank j take the example `o_j` seats clockwise, where
  * `o_j = 1 + (kr(salt#j) mod (N−1))` is a global per-rank rotation.
  * Hash order makes ring neighbors unrelated to any data attribute,
  * so a fixed rotation IS a pseudo-random pairing — the same
  * share-the-shuffle economics as in-batch negatives (every example
  * serves as anchor and as negative), but layout-independent and
  * bit-reproducible across runs/retries/cluster sizes (q124 replays
  * it in SQL).
  *
  * Rotations never alias: `1 ≤ o_j ≤ N−1` excludes self by
  * construction. A negative that happens to share the anchor's label
  * (a false negative for the contrastive loss) is FLAGGED
  * (`same_label`), not silently replaced — replacement would need
  * data-dependent probing chains; the standard practice is to flag
  * and let the loss mask it (or oversample k and drop flagged rows
  * upstream of batching). Distinct ranks can collide on the same
  * negative only if two rotations coincide (probability ~k²/N) —
  * callers needing strict distinctness dedup on (anchor, neg_id).
  *
  * Scale shape: one [[Enumerate.denseIds]] enumeration (range
  * shuffle + two-level scan, no global window), one k-way explode,
  * and ONE equi-join on ring position — shuffle rows `k·N`, driver
  * sees exactly one scalar (N, which sizing the rotations needs).
  */
object NegativeSampling {

  /** `(anchor_id, neg_rank, neg_id, same_label)` for `neg_rank` =
    * 1..k. `idCol` must be unique (it tie-breaks the ring order);
    * NULL ids/labels raise; N < 2 raises (no possible negative).
    */
  def ringNegatives(
      df: DataFrame, idCol: String, labelCol: String,
      k: Int = 4, salt: String = "neg"): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val guard = (c: String) => when(col(c).isNull,
      raise_error(lit(s"ringNegatives: NULL $c — drop explicitly, a " +
        "silent skip would shift every ring position")))
      .otherwise(col(c))
    val keyed = df.select(guard(idCol).as("id"), guard(labelCol).as("label"))
      .withColumn("__h",
        KrHash.krHash(concat(lit(salt), col("id").cast("string"))))
    val ring = Enumerate.denseIds(keyed, Seq("__h", "id"), "pos")
      .select(col("id"), col("label"), col("pos"))
      .localCheckpoint(true) // anchors and negatives both read it
    val n = ring.count()
    require(n >= 2, s"ringNegatives: need at least 2 rows, got $n")

    val rotations = (1 to k).map { j =>
      val h = KrHash.hash(s"$salt#$j".getBytes("UTF-8"))
      (j, 1L + java.lang.Math.floorMod(h, n - 1L))
    }
    val offs = explode(array(rotations.map { case (j, o) =>
      struct(lit(j).as("key"), lit(o).as("value"))
    }: _*)).as("rot")

    val anchors = ring.select(col("id").as("anchor_id"),
        col("label").as("anchor_label"), col("pos"), offs)
      .select(col("anchor_id"), col("anchor_label"),
        col("rot.key").as("neg_rank"),
        pmod(col("pos") + col("rot.value"), lit(n)).as("neg_pos"))
    anchors
      .join(ring.select(col("pos").as("neg_pos"),
        col("id").as("neg_id"), col("label").as("neg_label")), "neg_pos")
      .select(col("anchor_id"), col("neg_rank"), col("neg_id"),
        (col("anchor_label") === col("neg_label")).as("same_label"))
  }
}
