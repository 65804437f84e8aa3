package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RelevanceSpec extends SparkSpec {
  import sqlImplicits._

  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry")
  ).toDF("doc_id", "text")

  test("postings carry tf and document length") {
    val got = Relevance.postings(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getInt(3))).toSet
    got shouldBe Set(
      (1L, "apple", 2L, 3), (1L, "banana", 1L, 3),
      (2L, "banana", 1L, 2), (2L, "cherry", 1L, 2),
      (3L, "cherry", 3L, 3))
  }

  test("empty and space-padded docs contribute no postings and no dl mass") {
    val padded = Seq((1L, "apple  banana"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val got = Relevance.postings(padded, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getInt(3))).toSet
    // split-on-space yields "" tokens for doubled/leading spaces and for
    // empty docs; none of them may surface as terms or count toward dl
    got shouldBe Set((1L, "apple", 1L, 2), (1L, "banana", 1L, 2))
  }

  test("document frequencies count docs per term") {
    val got = Relevance.docFrequencies(
      Relevance.postings(docs, "doc_id", "text"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("apple" -> 1L, "banana" -> 2L, "cherry" -> 2L)
  }

  test("tf-idf with the rational idf matches hand arithmetic") {
    val got = Relevance.withTfIdf(docs, "doc_id", "text",
      idf = Relevance.rationalIdf)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(4))
      .toMap
    // N=3; idf(df) = (3 - df + 0.5) / (df + 0.5)
    got((1L, "apple")) shouldBe 2.0 * (2.5 / 1.5)
    got((3L, "cherry")) shouldBe 3.0 * (1.5 / 2.5)
  }

  test("bm25 matches a brute-force computation and ranks as expected") {
    val k1 = 1.2; val b = 0.75
    val n = 3.0; val avgdl = 8.0 / 3.0
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def term(tf: Double, dl: Double, df: Double) =
      idf(df) * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    val got = Relevance.bm25(docs, "doc_id", "text",
      query = Seq("apple", "cherry"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.keySet shouldBe Set(1L, 2L, 3L) // doc 1 has apple; 2,3 have cherry
    got(1L) shouldBe term(2, 3, 1) +- 1e-12
    got(2L) shouldBe term(1, 2, 2) +- 1e-12
    got(3L) shouldBe term(3, 3, 2) +- 1e-12
    // the rare term (apple, df=1) dominates the common one
    assert(got(1L) > got(3L) && got(3L) > got(2L))
  }

  test("duplicate query terms don't double-count") {
    val once = Relevance.bm25(docs, "doc_id", "text", Seq("cherry"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val twice = Relevance.bm25(docs, "doc_id", "text", Seq("cherry", "cherry"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    twice shouldBe once
  }

  test("scoring filters postings before the stats join (no corpus-wide join)") {
    // materialize = false: the default eagerly checkpoints (plan shows
    // only the checkpoint scan); the lazy form exposes the real plan
    val plan = Relevance.bm25(docs, "doc_id", "text", Seq("apple"),
      materialize = false)
      .queryExecution.executedPlan.toString
    // the per-term stats join must be fed by the isInCollection filter
    plan should include ("apple")
    // 1-row corpus scalars attach via a constant-key broadcast HASH
    // join — never a nested-loop operator
    plan should not include ("BroadcastNestedLoopJoin")
    plan should not include ("CartesianProduct")
    plan should include ("BroadcastHashJoin")
  }
}
