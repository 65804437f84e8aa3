package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import sqlImplicits._

  test("learnMerges reproduces hand-run BPE on the classic toy corpus") {
    // Sennrich's example shape: {low:5, lower:2, newest:6, widest:3}
    val words = Seq(
      ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
      .toDF("word", "freq")
    val merges = Bpe.learnMerges(words, 4)
    // hand-run: pair counts round 1 — es:9, st:9, lo:7, we:5(2+3)... tie
    // es/st broken lexicographically: (e,s) < (s,t)
    merges.map(m => (m.step, m.left, m.right, m.pairCount)) shouldBe Seq(
      (1, "e", "s", 9L),   // newest+widest
      (2, "es", "t", 9L),  // est
      (3, "l", "o", 7L),   // low+lower
      (4, "lo", "w", 7L))
  }

  test("back-to-back merges behave like sequential greedy BPE") {
    val words = Seq(("aaaa", 10L), ("ab", 1L)).toDF("word", "freq")
    val merges = Bpe.learnMerges(words, 2)
    merges.head.merged shouldBe "aa"
    // "a a a a " must become "aa aa " (two merges), NOT "aa a a "
    val seg = Bpe.applyMerges(words, "word", merges.take(1))
      .filter($"word" === "aaaa")
      .select("segments").as[String].head()
    seg shouldBe "aa aa"
    // second merge then pairs (aa,aa)
    merges(1) match {
      case Bpe.Merge(2, "aa", "aa", "aaaa", c) => c shouldBe 10L
      case other => fail(s"unexpected second merge: $other")
    }
  }

  test("applyMerges applies the merge list in order") {
    val words = Seq(("lowest", 1L)).toDF("word", "freq")
    val merges = Seq(
      Bpe.Merge(1, "e", "s", "es", 0L),
      Bpe.Merge(2, "es", "t", "est", 0L),
      Bpe.Merge(3, "l", "o", "lo", 0L))
    Bpe.applyMerges(words, "word", merges)
      .select("segments").as[String].head() shouldBe "lo w est"
  }

  test("learnMerges stops when no pairs remain") {
    val words = Seq(("ab", 1L)).toDF("word", "freq")
    val merges = Bpe.learnMerges(words, 5)
    merges.map(_.merged) shouldBe Seq("ab") // then every word is 1 symbol
  }

  test("wordFrequencies counts token occurrences over normalized text") {
    val docs = Seq((1L, "the cat  The cat"), (2L, "cat")).toDF("doc_id", "text")
    val wf = Bpe.wordFrequencies(docs, "doc_id", "text")
      .as[(String, Long)].collect().toMap
    wf shouldBe Map("the" -> 2L, "cat" -> 3L)
  }
}
