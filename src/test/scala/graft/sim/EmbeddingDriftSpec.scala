package graft.sim

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EmbeddingDriftSpec extends SparkSpec {
  import sqlImplicits._

  private def vecs(rows: (String, Seq[Float])*) =
    rows.toDF("g", "vec")

  test("centroid sums are exact quantized integers") {
    val sums = EmbeddingDrift.centroidSums(
      vecs("a" -> Seq(1f, 2f), "a" -> Seq(3f, -1f)), "g", "vec")
      .orderBy("dim").collect()
    val q = 1L << 20
    sums.map(r => (r.getInt(1), r.getLong(2), r.getLong(3))) shouldBe
      Array((0, 4 * q, 2L), (1, 1 * q, 2L))
  }

  test("summing batch sums equals the union's sums (mergeable)") {
    val all = vecs("a" -> Seq(1f, 0f), "a" -> Seq(0f, 1f),
      "b" -> Seq(2f, 2f), "a" -> Seq(5f, 3f))
    val b1 = all.limit(2)
    val b2 = all.except(b1)
    val merged = EmbeddingDrift.centroidSums(b1, "g", "vec")
      .unionByName(EmbeddingDrift.centroidSums(b2, "g", "vec"))
      .groupBy("group", "dim")
      .agg(sum("s_q").as("s_q"), sum("n").as("n"))
    val whole = EmbeddingDrift.centroidSums(all, "g", "vec")
    merged.except(whole).count() shouldBe 0
    whole.except(merged).count() shouldBe 0
  }

  test("pairwise centroid cosine matches hand arithmetic") {
    // A centroid along x, C along the diagonal: cos = 1/sqrt(2);
    // B orthogonal to A: cos = 0
    val df = vecs(
      "a" -> Seq(1f, 0f), "a" -> Seq(1f, 0f),
      "b" -> Seq(0f, 2f),
      "c" -> Seq(3f, 3f))
    val m = EmbeddingDrift.centroidCosine(df, "g", "vec")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(4)).toMap
    m(("a", "b")) shouldBe 0.0
    m(("a", "c")) shouldBe (1.0 / math.sqrt(2.0)) +- 1e-12
    m(("b", "c")) shouldBe (1.0 / math.sqrt(2.0)) +- 1e-12
  }

  test("zero-norm groups emit NULL cosine, not 0") {
    val df = vecs("a" -> Seq(1f, 0f), "z" -> Seq(0f, 0f))
    val r = EmbeddingDrift.centroidCosine(df, "g", "vec").head()
    r.isNullAt(4) shouldBe true
  }

  test("NULL vectors raise instead of silently shifting the centroid") {
    val df = Seq(("a", Some(Seq(1f))), ("a", None))
      .toDF("g", "vec")
    val e = intercept[Exception] {
      EmbeddingDrift.centroidSums(df, "g", "vec").collect()
    }
    e.getMessage should include("NULL")
  }

  test("counts ride along for both groups in the matrix") {
    val df = vecs("a" -> Seq(1f), "a" -> Seq(2f), "b" -> Seq(3f))
    val r = EmbeddingDrift.centroidCosine(df, "g", "vec").head()
    (r.getLong(2), r.getLong(3)) shouldBe ((2L, 1L))
  }
}
