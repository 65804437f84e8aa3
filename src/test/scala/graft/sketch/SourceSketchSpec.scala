package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SourceSketchSpec extends SparkSpec {
  import sqlImplicits._

  private def corpus(rows: (String, String)*) =
    rows.toDF("source", "text")

  test("signatures emit exactly numHashes components per non-empty group") {
    val sigs = SourceSketch.signatures(
      corpus("a" -> "x y z", "a" -> "y z", "b" -> "p q"),
      "source", "text", numHashes = 16)
    val counts = sigs.groupBy("group").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts shouldBe Map("a" -> 16L, "b" -> 16L)
  }

  test("groups with no tokens emit no rows (absence is the merge identity)") {
    val sigs = SourceSketch.signatures(
      corpus("a" -> "x", "empty" -> "   ", "nul" -> null),
      "source", "text", numHashes = 8)
    sigs.select("group").distinct().as[String].collect().toSet shouldBe Set("a")
  }

  test("merging batch signatures equals the signature of the union corpus") {
    val all = corpus(
      "a" -> "alpha beta gamma", "a" -> "delta epsilon",
      "b" -> "beta zeta", "b" -> "eta theta iota")
    val batch1 = all.limit(2)
    val batch2 = all.except(batch1)
    val merged = SourceSketch.mergeSignatures(
      SourceSketch.signatures(batch1, "source", "text", 32),
      SourceSketch.signatures(batch2, "source", "text", 32))
    val whole = SourceSketch.signatures(all, "source", "text", 32)
    merged.except(whole).count() shouldBe 0
    whole.except(merged).count() shouldBe 0
  }

  test("identical vocabularies estimate 1.0; disjoint estimate 0.0") {
    val df = corpus(
      "a" -> "one two three", "b" -> "one two three",
      "c" -> "four five six seven")
    val m = SourceSketch.similarityMatrix(df, "source", "text", 64)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getDouble(3)).toMap
    m(("a", "b")) shouldBe 1.0
    m(("a", "c")) shouldBe 0.0
    m(("b", "c")) shouldBe 0.0
  }

  test("estimate tracks exact Jaccard within sketch error") {
    // 40 shared + 30/30 exclusive tokens: J = 40/100 = 0.4
    val shared = (1 to 40).map(i => s"s$i")
    val aTok = shared ++ (1 to 30).map(i => s"a$i")
    val bTok = shared ++ (1 to 30).map(i => s"b$i")
    val df = corpus("a" -> aTok.mkString(" "), "b" -> bTok.mkString(" "))
    val est = SourceSketch.similarityMatrix(df, "source", "text", 128)
      .head().getDouble(3)
    est shouldBe 0.4 +- 0.15 // ~1/sqrt(128) std error
  }

  test("similarity is computed off the signature table, not the corpus") {
    // row count of the pairwise stage's input is |groups| * numHashes
    val sigs = SourceSketch.signatures(
      corpus("a" -> "x y", "b" -> "y z", "c" -> "z w"),
      "source", "text", numHashes = 8)
    sigs.count() shouldBe 24
    val sim = SourceSketch.similarityFromSignatures(sigs, 8)
    sim.count() shouldBe 3 // all unordered pairs
    sim.select(max(col("matches"))).head().getLong(0) should be <= 8L
  }
}
