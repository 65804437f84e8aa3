package graft.dedup

import graft.SparkSpec

class ContainmentSpec extends SparkSpec {
  import sqlImplicits._

  private val short = "alpha beta gamma delta epsilon zeta"
  private val long = short +
    " eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau"
  private val other = "one two three four five six seven eight nine ten"

  private def pairs(docs: Seq[(Long, String)], threshold: Double,
      maxDocFreq: Long = 1000L) =
    Dedup.containmentNearDuplicates(
      docs.toDF("doc_id", "text"), "doc_id", "text",
      shingleSize = 3, threshold = threshold, maxDocFreq = maxDocFreq)
      .orderBy("id_a", "id_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

  test("a short doc pasted inside a long one scores containment 1.0") {
    val got = pairs(Seq((1L, short), (2L, long), (3L, other)), 0.9)
    got shouldBe Seq((1L, 2L, 1.0))
  }

  test("the same pair is invisible to Jaccard at the same threshold") {
    // the asymmetry that motivates the operator: 4 shared shingles out
    // of 4 ∪ 17 → Jaccard 4/17 ≈ 0.24, containment 4/4 = 1.0
    val df = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val j = Dedup.nearDuplicatesBySets(
      df.select(org.apache.spark.sql.functions.col("doc_id"),
        Dedup.shingles(org.apache.spark.sql.functions.col("text"), 3)
          .as("__set")),
      "doc_id", "__set", numHashes = 64, bands = 64, threshold = 0.9)
      .collect()
    j shouldBe empty
    pairs(Seq((1L, short), (2L, long)), 0.9)
      .map(p => (p._1, p._2)) shouldBe Seq((1L, 2L))
  }

  test("containment is min-normalized and symmetric in pair order") {
    // id order in the pair is (smaller id, larger id) regardless of
    // which doc is the contained one
    val got = pairs(Seq((5L, long), (9L, short)), 0.9)
    got shouldBe Seq((5L, 9L, 1.0))
  }

  test("hot shingles above maxDocFreq are excluded from the universe") {
    // "x y z" appears in every doc; with maxDocFreq=2 it is dropped, so
    // docs sharing ONLY that shingle produce no pair
    val docs = Seq(
      (1L, "x y z a b c"), (2L, "x y z d e f"), (3L, "x y z g h i"))
    pairs(docs, 0.01, maxDocFreq = 2L) shouldBe empty
    // with the cap lifted the shared shingle produces pairs again
    pairs(docs, 0.01, maxDocFreq = 10L).map(p => (p._1, p._2)) shouldBe
      Seq((1L, 2L), (1L, 3L), (2L, 3L))
  }

  test("docs shorter than the shingle size never pair") {
    pairs(Seq((1L, "one two"), (2L, "one two")), 0.1) shouldBe empty
  }
}
