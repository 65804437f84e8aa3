package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The substring family's measured audit
  * ([[SubstringDedup.winnowingMeasuredConfigTable]]) on planted
  * shared-span fixtures: the winnowing guarantee CONFIRMED (not
  * assumed) for configs whose guarantee length covers the match
  * length, measurable degradation beyond it, the fail-loud
  * no-eligible contract, and actuator ≡ hand-tuned equivalence.
  * The DuckDB oracle (q277) pins the arithmetic against an
  * independent engine.
  */
class WinnowingMeasuredSpec extends SparkSpec {
  import sqlImplicits._

  private val rng = new scala.util.Random(41)

  /** Random lowercase filler that cannot collide with the planted
    * span (distinct alphabet prefix per call site keeps contexts
    * unique). */
  private def filler(n: Int): String =
    (0 until n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString

  test("configs with guarantee_len <= matchLen measure exactly " +
    "1000000 ppm; sparser configs degrade; chosen is the cheapest " +
    "eligible") {
    val span = "the quick brown fox jumps over lazy dogs" // 40 chars shared
    val docs = (0L until 10L).map { i =>
      // five pairs, each sharing the span inside unique context
      (i, filler(60) + " " + span + " " + filler(60))
    } ++ (10L until 20L).map(i => (i, filler(160))) // ten unrelated docs
    val df = docs.toDF("doc_id", "text")
    val matchLen = 30
    val configs = Seq((8, 4), (12, 13), (16, 26), (30, 30))
    val tbl = SubstringDedup.winnowingMeasuredConfigTable(
      df, "doc_id", "text", matchLen, configs, targetRecallPpm = 1000000L)
      .orderBy(col("k"), col("window"))
      .collect()
    val byCfg = tbl.map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getBoolean(8), r.getBoolean(9))).toMap
    // every doc holding the span pairs with every other holder: C(10,2)
    tbl.foreach(r => r.getLong(4) shouldBe 45L)
    // the guarantee: g = k + w - 1 <= 40 (the actual shared span)
    // catches everything — 8+4-1=11, 12+13-1=24, 16+26-1=41? no:
    // 41 > 40, so only the first two are guaranteed
    byCfg((8L, 4L))._5 shouldBe 1000000L
    byCfg((12L, 13L))._5 shouldBe 1000000L
    // k = 30 <= span 40 keeps SOME recovery possible but g = 59 is
    // far beyond the span: measured recall must not exceed the
    // guaranteed configs and the audit must rank it ineligible at
    // a 1.0 target unless it got lucky on every pair
    val sparse = byCfg((30L, 30L))._5
    sparse should be <= 1000000L
    // chosen = min fp_rows among eligible; (12,13) is sparser than
    // (8,4) by construction (larger window selects fewer grams)
    val eligible = tbl.filter(_.getBoolean(8))
    eligible.map(r => (r.getLong(0), r.getLong(1))) should contain ((8L, 4L))
    val chosen = tbl.filter(_.getBoolean(9))
    chosen.length shouldBe 1
    chosen.head.getLong(3) shouldBe eligible.map(_.getLong(3)).min
  }

  test("fail-loud when k exceeds the span every true pair shares") {
    // two docs sharing EXACTLY a 20-char span inside unique contexts:
    // no 24-gram of either doc is common, so a k = 24 config can
    // never recover the pair
    val span = "zqxjkvbwpmfgzqxjkvbw" // 20 chars
    span.length shouldBe 20
    val df = Seq(
      (1L, filler(50) + " " + span + " " + filler(50)),
      (2L, filler(50) + " " + span + " " + filler(50))).toDF("doc_id", "text")
    val tbl = SubstringDedup.winnowingMeasuredConfigTable(
      df, "doc_id", "text", matchLen = 20, configs = Seq((24, 4)),
      targetRecallPpm = 950000L).collect()
    tbl.length shouldBe 1
    tbl.head.getAs[Long]("pairs_true") shouldBe 1L
    tbl.head.getAs[Long]("pairs_recovered") shouldBe 0L
    tbl.head.getAs[Boolean]("eligible") shouldBe false
    val ex = intercept[IllegalArgumentException] {
      SubstringDedup.planWinnowingMeasured(
        df, "doc_id", "text", 20, Seq((24, 4)), 950000L)
    }
    ex.getMessage should include("no winnowing config")
  }

  test("substringMatchesMeasured equals substringMatches at the " +
    "measured pick") {
    val span = "shared boilerplate header line for all docs here"
    val docs = (0L until 8L).map(i =>
      (i, filler(40) + " " + span + " " + filler(40)))
    val df = docs.toDF("doc_id", "text")
    val configs = Seq((8, 4), (16, 16))
    val (k, w) = SubstringDedup.planWinnowingMeasured(
      df, "doc_id", "text", matchLen = 30, configs, 950000L)
    configs should contain ((k, w))
    val measured = SubstringDedup.substringMatchesMeasured(
      df, "doc_id", "text", sample = df, matchLen = 30, configs,
      targetRecallPpm = 950000L)
      .select("id_a", "id_b", "pos_a", "pos_b", "snippet")
      .collect().map(_.toString).sorted
    val tuned = SubstringDedup.substringMatches(
      df, "doc_id", "text", k, w)
      .select("id_a", "id_b", "pos_a", "pos_b", "snippet")
      .collect().map(_.toString).sorted
    measured shouldBe tuned
    measured.length should be > 0
  }
}
