package graft.text

import graft.SparkSpec

/** T5-style span corruption: deterministic masking, sentinel
  * numbering, input/target consistency.
  */
class SpanCorruptSpec extends SparkSpec {
  import sqlImplicits._

  private val docs = Seq(
    (1L, "a b c d e f g h"),
    (2L, "one two three")).toDF("doc_id", "text")

  test("input and target reassemble the original document exactly") {
    val out = SpanCorrupt.spanCorrupt(docs, "doc_id", "text",
      maskRate = 0.5, spanLen = 2, salt = "s1")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { case (id, input, target) =>
      // splice every sentinel's target content back into the input
      val targets = "<extra_id_(\\d+)> ((?:(?!<extra_id_)\\S+ ?)+)".r
        .findAllMatchIn(target)
        .map(m => s"<extra_id_${m.group(1)}>" -> m.group(2).trim).toMap
      val restored = input.split(" ").map { piece =>
        if (piece.startsWith("<extra_id_")) targets(piece) else piece
      }.mkString(" ")
      restored shouldBe orig(id)
    }
  }

  test("sentinels number masked spans 0..k-1 in document order") {
    val out = SpanCorrupt.spanCorrupt(docs, "doc_id", "text",
      maskRate = 1.0, spanLen = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4)))
    out.foreach { case (_, input, nMasked) =>
      val ids = "<extra_id_(\\d+)>".r.findAllMatchIn(input)
        .map(_.group(1).toInt).toSeq
      ids shouldBe (0 until nMasked.toInt)
    }
  }

  test("maskRate 0 masks nothing; maskRate 1 masks everything") {
    val none = SpanCorrupt.spanCorrupt(docs, "doc_id", "text", 0.0, 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(4))).toMap
    none(1L)._1 shouldBe "a b c d e f g h"
    none(1L)._2 shouldBe ""
    none(1L)._3 shouldBe 0L
    val all = SpanCorrupt.spanCorrupt(docs, "doc_id", "text", 1.0, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    all(1L) shouldBe 4L // every span masked
  }

  test("deterministic per salt, independent across salts") {
    val many = (0L until 50L)
      .map(i => (i, Seq.fill(12)("w").mkString(" "))).toDF("doc_id", "text")
    def masked(salt: String) =
      SpanCorrupt.spanCorrupt(many, "doc_id", "text", 0.4, 2, salt)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    masked("e1") shouldBe masked("e1")
    masked("e1") should not be masked("e2")
  }

  test("trailing short span is masked and restored like any other") {
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text") // spans [a b][c d][e]
    val out = SpanCorrupt.spanCorrupt(df, "doc_id", "text", 1.0, 2)
      .collect().head
    out.getString(1) shouldBe "<extra_id_0> <extra_id_1> <extra_id_2>"
    out.getString(2) shouldBe
      "<extra_id_0> a b <extra_id_1> c d <extra_id_2> e"
  }
}
