package graft.dedup

import graft.SparkSpec

/** C4-style corpus line dedup: first occurrence survives, order
  * preserved, gutted docs kept empty.
  */
class LineDedupSpec extends SparkSpec {
  import sqlImplicits._

  test("keeps exactly the first corpus-wide occurrence of each line") {
    val df = Seq(
      (1L, "alpha\nboiler\nbeta"),
      (2L, "boiler\ngamma"),
      (3L, "delta\nboiler\nalpha")).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out(1L) shouldBe "alpha\nboiler\nbeta"  // first occurrences all
    out(2L) shouldBe "gamma"                 // boiler already seen in doc 1
    out(3L) shouldBe "delta"                 // boiler AND alpha already seen
  }

  test("intra-document repeats collapse to the first index") {
    val df = Seq((1L, "x\ny\nx\nx\nz")).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(df, "doc_id", "text").collect().head
    out.getString(1) shouldBe "x\ny\nz"
    out.getLong(2) shouldBe 5L // before
    out.getLong(3) shouldBe 3L // after
  }

  test("a fully-gutted document stays in the result with empty text") {
    val df = Seq((1L, "a\nb"), (2L, "a\nb")).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSet
    out should contain((2L, "", 0L))
    out should contain((1L, "a\nb", 2L))
  }

  test("normalizeLines compares normalized content but emits the original") {
    val df = Seq((1L, "Hello  World\nunique1"), (2L, "hello world\nunique2"))
      .toDF("doc_id", "text")
    val out = LineDedup.dedupLines(df, "doc_id", "text", normalizeLines = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out(1L) shouldBe "Hello  World\nunique1" // original text, not normalized
    out(2L) shouldBe "unique2"
  }

  test("custom delimiter with regex metacharacters is treated literally") {
    val df = Seq((1L, "a||b||a"), (2L, "b||c")).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(df, "doc_id", "text", delimiter = "||")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out(1L) shouldBe "a||b"
    out(2L) shouldBe "c"
  }

  test("keep-first contract matches a brute-force reference on random corpora") {
    val rng = new scala.util.Random(77)
    val words = Seq("w1", "w2", "w3", "w4", "w5")
    val docs = (0L until 30L).map { i =>
      (i, Seq.fill(2 + rng.nextInt(6))(words(rng.nextInt(words.size)))
        .mkString("\n"))
    }
    // driver-side reference
    val seen = scala.collection.mutable.Set[String]()
    val expect = docs.map { case (id, text) =>
      val kept = text.split("\n").filter(l => seen.add(l))
      id -> kept.mkString("\n")
    }.toMap
    val out = LineDedup.dedupLines(docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out shouldBe expect
  }

  test("no-text-shuffle path equals the join-back witness on random corpora") {
    val rng = new scala.util.Random(23)
    val pool = Vector("alpha", "beta", "gamma", "delta", "", "  spaced  ")
    val docs = (0L until 40L).map { id =>
      val n = 1 + rng.nextInt(6)
      id -> Seq.fill(n)(pool(rng.nextInt(pool.size))).mkString("\n")
    }
    val df = docs.toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    rows(LineDedup.dedupLines(df, "doc_id", "text")) shouldBe
      rows(LineDedup.dedupLinesJoined(df, "doc_id", "text"))
    // and with normalization on
    rows(LineDedup.dedupLines(df, "doc_id", "text",
      normalizeLines = true)) shouldBe
      rows(LineDedup.dedupLinesJoined(df, "doc_id", "text",
        normalizeLines = true))
  }

  test("the default path never aggregates or re-joins line text") {
    val df = Seq((1L, "a\nb"), (2L, "b\nc")).toDF("doc_id", "text")
    val plan = LineDedup.dedupLines(df, "doc_id", "text")
      .queryExecution.optimizedPlan.toString
    // reassembly is a map-side filter of each doc's own split — the
    // witness's string-buffering collect_list(struct(idx, line)) and
    // its fingerprint join-back must be gone
    plan should not include "collect_list(struct(__idx"
    // exactly one Join node (keep-arrays ⋈ df on id), not two
    // (case-sensitive: `array_join` is not a Join)
    "Join ".r.findAllMatchIn(plan).size shouldBe 1
  }
}
