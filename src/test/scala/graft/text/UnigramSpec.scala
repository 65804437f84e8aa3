package graft.text

import graft.SparkSpec
import graft.functions.UnigramSegment
import org.apache.spark.sql.functions._

class UnigramSpec extends SparkSpec {
  import sqlImplicits._

  private def segOf(text: String, vocab: Seq[(String, Long)],
      unk: Long): Seq[String] =
    Unigram.segment(Seq((1L, text)).toDF("id", "text"), "id", "text",
      vocab, unk)
      .orderBy("tok_id").collect().map(_.getString(4)).toSeq

  test("global optimum beats greedy longest-match") {
    // greedy munch takes "ab" then is stuck with c|d as unks;
    // the global optimum is a + bcd
    val vocab = Seq("ab" -> -1L, "a" -> -2L, "bcd" -> -2L)
    segOf("abcd", vocab, unk = -100L) shouldBe Seq("a", "bcd")
    // flip the economics: make bcd expensive and ab wins again
    segOf("abcd", Seq("ab" -> -1L, "a" -> -2L, "bcd" -> -300L),
      unk = -100L) shouldBe Seq("ab", "c", "d")
  }

  test("unk fallback covers every character") {
    segOf("xyz", Seq("q" -> -1L), unk = -5L) shouldBe Seq("x", "y", "z")
    segOf("", Seq("q" -> -1L), unk = -5L) shouldBe Seq.empty
  }

  test("ties resolve to the longest last token (smallest start)") {
    // "aa" via token aa (score -4) or a+a (-2-2=-4): tie → aa
    segOf("aa", Seq("aa" -> -4L, "a" -> -2L), unk = -100L) shouldBe Seq("aa")
  }

  test("spans are contiguous and reconstruct the text") {
    val text = "the key agg table value scan"
    val vocab = Seq("the " -> -3L, "key " -> -4L, "agg " -> -4L,
      "table " -> -5L, "value " -> -5L, "scan" -> -4L, "e " -> -6L)
    val rows = Unigram.segment(Seq((1L, text)).toDF("id", "text"),
      "id", "text", vocab, unkScore = -50L)
      .orderBy("tok_id")
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getString(4)))
    rows.map(_._3).mkString shouldBe text
    rows.foldLeft(0L) { case (expectStart, (s, l, _)) =>
      s shouldBe expectStart; s + l
    } shouldBe text.length.toLong
  }

  test("fitScores counts overlap-inclusive occurrences with exact Q20 scores") {
    val corpus = Seq("aba abab", "abab").toDF("text")
    val got = Unigram.fitScores(corpus, "text", Seq("ab", "aba", "zz"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    got("ab")._1 shouldBe 5L   // "aba abab" has 3 (pos 0,4,6), "abab" has 2
    got("aba")._1 shouldBe 3L  // overlap-inclusive: 2 in "aba abab", 1 in "abab"
    got("zz")._1 shouldBe 0L
    // score = ilog2q20(count+1) - ilog2q20(total + 3), total = 8
    val l11 = graft.text.Dsir.ilog2Q20(11L << 20)
    val l6 = graft.text.Dsir.ilog2Q20(6L << 20)
    val l1 = graft.text.Dsir.ilog2Q20(1L << 20)
    got("ab")._2 shouldBe (l6 - l11)
    got("zz")._2 shouldBe (l1 - l11)
  }

  test("ilog2Q20 power-of-two scale identity backs the overflow-free score") {
    // fitScores drops the ·2^20 pre-scale relying on
    // ilog2Q20(x·2^20) = ilog2Q20(x) + 20·2^20 being bit-exact.
    for (x <- Seq(1L, 2L, 3L, 7L, 255L, 1000L, 1L << 30, (1L << 43) - 11L))
      graft.text.Dsir.ilog2Q20(x << 20) shouldBe
        (graft.text.Dsir.ilog2Q20(x) + (20L << 20))
    // counts past the old (count+1)·2^20 overflow point still score
    graft.text.Dsir.ilog2Q20(Long.MaxValue >> 2) should be > 0L
  }

  test("segmentation is layout-independent and codegen-stable") {
    val docs = (0L until 200L)
      .map(i => (i, s"key agg row$i value key agg")).toDF("id", "text")
    val vocab = Seq("key agg " -> -10L, "key " -> -8L, "agg " -> -8L,
      "value " -> -8L, "row" -> -9L)
    val a = Unigram.segment(docs, "id", "text", vocab, -40L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(4))).toSet
    val b = Unigram.segment(docs.repartition(7), "id", "text", vocab, -40L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(4))).toSet
    a shouldBe b
    // direct static-core agreement on one doc
    val arr = UnigramSegment.segment("key agg row0 value key agg",
      {
        val m = new java.util.HashMap[String, java.lang.Long]()
        vocab.foreach { case (t, s) => m.put(t, java.lang.Long.valueOf(s)) }
        m
      }, 8, -40L)
    arr.numElements() should be > 0
  }
}
