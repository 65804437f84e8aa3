package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar int8 embedding quantization — the storage/compute half of a
  * 100 TB similarity stack.
  *
  * A float32 embedding column dominates corpus bytes (a 256-dim vector
  * is 1 KB/row; at 10^11 rows that is 100 TB of vectors alone).
  * Symmetric per-vector int8 cuts it 4× — `scale = max|v| / 127`,
  * `code_i = clamp(round(v_i / scale), ±127)` — and turns candidate
  * scoring into integer dot products (SIMD-friendly, no float loads),
  * with the float vectors touched only by the exact rerank of the few
  * surviving candidates. Same candidates-then-verify shape as the LSH
  * and sketch pipelines.
  *
  * All arithmetic is carried out in doubles with round-half-up
  * expressed as `floor(x + 0.5)` — both deterministic IEEE-754 forms
  * any engine reproduces bit-for-bit (q36 replays them in DuckDB).
  * Vectors of all zeros get `scale = 0` and all-zero codes. The scale
  * is a separate column bound once per row (`withScale`), not inlined
  * into the per-element lambda — interpreted HOF lambdas re-evaluate
  * referenced subtrees per element, which would make an inlined
  * `array_max` O(dim²) per vector.
  */
object Quantize {

  /** `max|v| / 127` in double arithmetic; 0.0 for empty/all-zero vectors. */
  def int8Scale(vec: Column): Column =
    coalesce(
      array_max(transform(vec, x => abs(x.cast("double")))) / lit(127.0),
      lit(0.0))

  /** Clamped round-half-up codes against a prebound scale column. */
  def int8Codes(vec: Column, scale: Column): Column =
    transform(vec, x =>
      when(scale === 0.0, lit(0))
        .otherwise(least(greatest(
          floor(x.cast("double") / scale + lit(0.5)), lit(-127L)), lit(127L))
          .cast("int")))

  /** Reconstruction: `codes_i * scale` as doubles (exact float algebra —
    * int widens exactly, one IEEE multiply).
    */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale)

  /** Integer dot product of two int8 code vectors, accumulated in longs
    * (127² · dim never overflows). The cheap scoring kernel for
    * quantized candidate ranking; rescale by `scaleA * scaleB` to
    * approximate the float dot product.
    */
  def dotInt(codesA: Column, codesB: Column): Column =
    aggregate(
      zip_with(codesA, codesB, (a, b) => (a * b).cast("long")),
      lit(0L), (acc, x) => acc + x)
}
