package graft.text

import graft.SparkSpec

class CollocationsSpec extends SparkSpec {
  import sqlImplicits._

  private def docs(texts: String*) = texts.toDF("text")

  test("counts and exact Q20 PMI on a hand-checked corpus") {
    // tokens: doc1 = [new, york, new, york], doc2 = [the, cat],
    // doc3 = [the, dog], doc4 = [new, york]  ->  N = 10
    // bigram (new, york) occurs 3x; c_new = 3, c_york = 3
    val out = Collocations.pmi(
      docs("new york new york", "the cat", "the dog", "new york"),
      "text", minCount = 2L).collect()
    out.length shouldBe 1
    val r = out.head
    (r.getString(0), r.getString(1)) shouldBe ("new", "york")
    r.getLong(2) shouldBe 3L // c_xy
    r.getLong(3) shouldBe 3L // c_x
    r.getLong(4) shouldBe 3L // c_y
    val q20 = 1L << 20
    def l(n: Long) = Dsir.ilog2Q20(n * q20)
    r.getLong(5) shouldBe l(3) + l(10) - l(3) - l(3)
  }

  test("pairs below minCount are dropped before the unigram joins") {
    val out = Collocations.pmi(
      docs("a b", "a b", "c d"), "text", minCount = 2L).collect()
    out.map(r => (r.getString(0), r.getString(1))).toSet shouldBe
      Set(("a", "b"))
  }

  test("association outranks raw frequency") {
    // "tight pair" always co-occurs; "the" is frequent but pairs with
    // many different successors -> PMI(tight, pair) > PMI(the, *)
    val corpus = docs(
      (1 to 8).map(_ => "tight pair").mkString(" "),
      "the cat the dog the fox the cow the pig the hen the ant the owl")
    val rows = Collocations.pmi(corpus, "text", minCount = 2L)
      .orderBy($"pmi_q20".desc).collect()
    (rows.head.getString(0), rows.head.getString(1)) shouldBe
      ("tight", "pair")
  }

  test("empty corpus raises instead of emitting an undefined statistic") {
    an[IllegalArgumentException] should be thrownBy
      Collocations.pmi(docs("   ", ""), "text")
  }

  test("materialize = false computes identically") {
    val d = docs("new york new york", "new york")
    val a = Collocations.pmi(d, "text", 2L, materialize = true).collect()
    val b = Collocations.pmi(d, "text", 2L, materialize = false).collect()
    a.toSeq shouldBe b.toSeq
  }
}
