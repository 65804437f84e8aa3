package graft.text

import graft.SparkSpec

class TextRankSpec extends SparkSpec {
  import sqlImplicits._

  private def edges(texts: Seq[String], window: Int) =
    TextRank.cooccurrenceEdges(texts.toDF("text"), "text", window)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("window-2 pairs are positions i with i+1 and i+2, both directions") {
    edges(Seq("a b c d"), 2) shouldBe Set(
      ("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d"),
      ("b", "a"), ("c", "a"), ("c", "b"), ("d", "b"), ("d", "c"))
  }

  test("normalization folds case/whitespace; repetition self-loops kept") {
    edges(Seq("A  a"), 1) shouldBe Set(("a", "a"))
    edges(Seq("Key   VALUE"), 1) shouldBe Set(("key", "value"), ("value", "key"))
  }

  test("hub token outranks peripheral tokens") {
    // 'core' co-occurs with everything; satellites only with 'core'
    val texts = (0 until 40).map(i => s"core sat$i")
    val got = TextRank.keywords(texts.toDF("text"), "text",
      window = 1, iterations = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got("core") should be > got("sat0")
    // all satellites are symmetric: identical ranks
    got.filter(_._1.startsWith("sat")).values.toSet.size shouldBe 1
  }

  test("keywords are layout-independent") {
    val texts = (0 until 60).map(i =>
      s"alpha beta${i % 5} gamma delta${i % 3} alpha")
    val df = texts.toDF("text")
    val a = TextRank.keywords(df, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = TextRank.keywords(df.repartition(7), "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    a shouldBe b
  }
}
