package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class InvertedIndexSpec extends SparkSpec {
  import sqlImplicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog  SAT on the log"), // double space + case: normalize folds
    (3L, "cat cat cat"),
    (4L, "a mat on a mat")).toDF("doc_id", "text")

  test("tokenRows: 1-based positions over normalized whitespace tokens") {
    val rows = InvertedIndex.tokenRows(docs, "doc_id", "text")
      .filter($"doc_id" === 2L)
      .orderBy($"pos")
      .as[(Long, Int, String)]
      .collect()
    rows.map(_._3).toSeq shouldBe
      Seq("the", "dog", "sat", "on", "the", "log")
    rows.map(_._2).toSeq shouldBe (1 to 6)
  }

  test("postings: df exact, tf and sorted CSV positions per doc") {
    val p = InvertedIndex.postings(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    p(("the", 1L)) shouldBe ((2L, 2L, "1,5"))
    p(("the", 2L)) shouldBe ((2L, 2L, "1,5"))
    p(("cat", 3L)) shouldBe ((2L, 3L, "1,2,3"))
    p(("mat", 4L)) shouldBe ((2L, 2L, "2,5"))
    p(("dog", 2L))._1 shouldBe 1L
  }

  test("postings: maxDocs caps the list at the lowest doc ids, df stays exact") {
    val p = InvertedIndex.postings(docs, "doc_id", "text", maxDocs = 1)
      .filter($"token" === "cat")
      .collect()
    p.length shouldBe 1
    p.head.getLong(1) shouldBe 1L // lowest doc id kept
    p.head.getLong(2) shouldBe 2L // df still counts doc 3
  }

  test("postings: minDf drops rare tokens entirely") {
    val toks = InvertedIndex.postings(docs, "doc_id", "text", minDf = 2)
      .select("token").distinct().as[String].collect().toSet
    toks shouldBe Set("the", "cat", "sat", "on", "mat")
  }

  test("phraseSearch matches brute-force substring-of-token-list search") {
    val hits = InvertedIndex.phraseSearch(
      docs, "doc_id", "text", Seq("on", "the"))
      .orderBy($"doc_id")
      .as[(Long, Long, Int)]
      .collect()
    hits.toSeq shouldBe Seq((1L, 1L, 4), (2L, 1L, 4))
  }

  test("phraseSearch counts overlapping repeats and single-term phrases") {
    InvertedIndex.phraseSearch(docs, "doc_id", "text", Seq("cat", "cat"))
      .as[(Long, Long, Int)]
      .collect()
      .toSeq shouldBe Seq((3L, 2L, 1)) // positions 1-2 and 2-3
    InvertedIndex.phraseSearch(docs, "doc_id", "text", Seq("mat"))
      .orderBy($"doc_id")
      .as[(Long, Long, Int)]
      .collect()
      .toSeq shouldBe Seq((1L, 1L, 6), (4L, 2L, 2))
  }

  test("phraseSearch over a phrase that appears nowhere is empty") {
    InvertedIndex.phraseSearch(docs, "doc_id", "text", Seq("log", "cat"))
      .count() shouldBe 0L
  }

  test("phraseSearchFromPostings is row-identical to the direct path") {
    val posts = InvertedIndex.postings(docs, "doc_id", "text")
    for (phrase <- Seq(Seq("on", "the"), Seq("cat", "cat"), Seq("mat"),
        Seq("log", "cat"))) {
      val direct = InvertedIndex.phraseSearch(docs, "doc_id", "text", phrase)
      val served = InvertedIndex.phraseSearchFromPostings(
        posts, "doc_id", phrase)
      served.exceptAll(direct).count() shouldBe 0L
      direct.exceptAll(served).count() shouldBe 0L
    }
  }

  test("postings plans exactly one exchange") {
    val plan = InvertedIndex.postings(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    "Exchange".r.findAllIn(plan).length shouldBe 1
  }
}
