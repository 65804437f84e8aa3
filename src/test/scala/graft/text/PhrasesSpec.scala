package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PhrasesSpec extends SparkSpec {
  import sqlImplicits._

  private def mergeOne(toks: Seq[String], u: String, v: String): Seq[String] =
    Seq(Tuple1(toks)).toDF("ts")
      .select(Phrases.applyMerge(col("ts"), u, v).as("r"))
      .head().getSeq[String](0)

  test("merge replaces every adjacent occurrence") {
    mergeOne(Seq("a", "b", "c", "a", "b"), "a", "b") shouldBe
      Seq("a b", "c", "a b")
  }

  test("merge handles flanking repeats without chaining") {
    // [u,v,v]: only position 1 merges; the trailing v stays
    mergeOne(Seq("u", "v", "v"), "u", "v") shouldBe Seq("u v", "v")
    // [u,u,v]: only position 2 merges; the leading u stays
    mergeOne(Seq("u", "u", "v"), "u", "v") shouldBe Seq("u", "u v")
    // no occurrence: unchanged
    mergeOne(Seq("x", "y"), "u", "v") shouldBe Seq("x", "y")
  }

  test("training learns the most frequent pair first, ties lexicographic") {
    val docs = Seq(
      (0L, "new york is big"),
      (1L, "new york and old york"),
      (2L, "big apple new york")).toDF("id", "text")
    val (merges, out) = Phrases.minePhrases(docs, "id", "text", rounds = 1)
    merges.head shouldBe (("new", "york", 3L))
    val toks = out.orderBy("id").collect().map(_.getSeq[String](1))
    toks(0) shouldBe Seq("new york", "is", "big")
    toks(1) shouldBe Seq("new york", "and", "old", "york")
  }

  test("round two operates on round one's merged units") {
    // after merging (a,b), the pair ("a b", c) becomes adjacent and
    // dominant — the learned unit grows to a trigram phrase
    val docs = Seq(
      (0L, "a b c x"), (1L, "a b c y"), (2L, "a b c z"))
      .toDF("id", "text")
    val (merges, out) = Phrases.minePhrases(docs, "id", "text", rounds = 2)
    merges.map(m => (m._1, m._2)) shouldBe
      Seq(("a", "b"), ("a b", "c"))
    out.orderBy("id").head().getSeq[String](1).head shouldBe "a b c"
  }

  test("self-pairs are never candidates") {
    val docs = Seq((0L, "x x x x y z")).toDF("id", "text")
    val (merges, _) = Phrases.minePhrases(docs, "id", "text", rounds = 1)
    // (x,x) appears 3 times but is excluded; (x,y) / (y,z) count 1
    merges.head._1 should not be merges.head._2
  }

  test("training stops early when no distinct pair remains") {
    val docs = Seq((0L, "a a a")).toDF("id", "text")
    val (merges, out) = Phrases.minePhrases(docs, "id", "text", rounds = 5)
    merges shouldBe empty
    out.head().getSeq[String](1) shouldBe Seq("a", "a", "a")
  }

  test("deterministic under repartitioning") {
    val docs = (0L until 100L)
      .map(i => (i, s"w${i % 7} w${(i + 1) % 7} w${(i + 2) % 7} w${i % 3}"))
      .toDF("id", "text")
    val (m1, o1) = Phrases.minePhrases(docs, "id", "text", 3)
    val (m2, o2) = Phrases.minePhrases(docs.repartition(13), "id", "text", 3)
    m1 shouldBe m2
    o1.orderBy("id").collect().map(_.toSeq) shouldBe
      o2.orderBy("id").collect().map(_.toSeq)
  }
}
