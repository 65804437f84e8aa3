package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultiPatternSpec extends SparkSpec {
  import sqlImplicits._

  /** Naive overlapping-count reference: occurrences at every start. */
  private def naiveCount(text: String, pat: String): Int =
    (0 to text.length - pat.length)
      .count(i => text.regionMatches(i, pat, 0, pat.length))

  test("automaton counts overlapping matches of overlapping patterns") {
    val pats = IndexedSeq("aba", "ba", "a")
    val ac = new AhoCorasick(pats)
    val got = ac.countAll("ababa").toIntArray()
    got.toSeq shouldBe Seq(2, 2, 3)
  }

  test("counts match the naive scan on random text") {
    val rng = new Random(42)
    val alphabet = "abcd"
    val pats = IndexedSeq("ab", "bc", "abc", "cab", "aa", "d", "abcd", "bcab")
    val ac = new AhoCorasick(pats)
    (1 to 50).foreach { _ =>
      val text = Seq.fill(rng.nextInt(200))(
        alphabet(rng.nextInt(alphabet.length))).mkString
      val got = ac.countAll(text).toIntArray().toSeq
      val want = pats.map(p => naiveCount(text, p))
      assert(got == want, s"text=$text got=$got want=$want")
    }
  }

  test("dataframe column (codegen path) matches direct automaton eval") {
    val pats = Seq("table", "able", "an", "scan", "value table")
    val docs = Seq(
      (1L, "value table scan scan table"),
      (2L, "an anteater able to scan a table"),
      (3L, ""),
      (4L, "no hits here!"))
    val df = docs.toDF("id", "text")
      .withColumn("hits",
        MultiPatternCount.multiPatternCount(col("text"), pats))
    val got = df.orderBy(col("id")).collect()
      .map(r => r.getSeq[Int](2).toSeq)
    val ac = new AhoCorasick(pats.toIndexedSeq)
    val want = docs.map { case (_, t) => ac.countAll(t).toIntArray().toSeq }
    got.toSeq shouldBe want
    // and the automaton itself against the naive scan
    docs.foreach { case (_, t) =>
      ac.countAll(t).toIntArray().toSeq shouldBe
        pats.map(p => naiveCount(t, p))
    }
  }

  test("null text yields null; bad pattern lists are rejected") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("ab")))
      .toDF("id", "text")
      .withColumn("hits",
        MultiPatternCount.multiPatternCount(col("text"), Seq("ab")))
    val rows = df.orderBy(col("id")).collect()
    rows(0).isNullAt(2) shouldBe true
    rows(1).getSeq[Int](2).toSeq shouldBe Seq(1)

    an[IllegalArgumentException] should be thrownBy
      new AhoCorasick(IndexedSeq.empty).countAll("x")
    intercept[Exception] {
      Seq((1L, "x")).toDF("id", "text")
        .withColumn("h",
          MultiPatternCount.multiPatternCount(col("text"), Seq("a", "a")))
        .collect()
    }
  }

  test("SQL registration: multi_pattern_count with literal patterns") {
    GraftFunctions.register(spark)
    Seq((1L, "scan the table")).toDF("id", "text")
      .createOrReplaceTempView("mp_docs")
    val got = spark.sql(
      "SELECT multi_pattern_count(text, 'scan', 'an', 'able') AS h FROM mp_docs")
      .collect().head.getSeq[Int](0).toSeq
    got shouldBe Seq(1, 1, 1)
  }

  test("blocklist operator shapes: hit table and clean filter") {
    val pats = Seq("spark", "table")
    val df = Seq(
      (1L, "spark table spark"),
      (2L, "nothing to see"),
      (3L, "table")).toDF("doc_id", "text")
    val hits = graft.text.Blocklist.patternHits(df, "doc_id", "text", pats)
      .orderBy(col("doc_id"), col("pattern"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    hits.toSeq shouldBe Seq(
      (1L, "spark", 2), (1L, "table", 1), (3L, "table", 1))
    val clean = graft.text.Blocklist.clean(df, "text", pats)
      .select("doc_id").collect().map(_.getLong(0))
    clean.toSeq shouldBe Seq(2L)
  }
}
