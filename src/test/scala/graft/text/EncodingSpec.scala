package graft.text

import graft.SparkSpec

class EncodingSpec extends SparkSpec {
  import sqlImplicits._

  private def signals(s: String) = {
    val r = Encoding.withEncodingQuality(Seq((1L, s)).toDF("id", "text"), "text")
      .collect().head
    (r.getAs[Long]("n_chars"), r.getAs[Long]("n_replacement"),
      r.getAs[Long]("n_control"), r.getAs[Long]("n_mojibake"),
      r.getAs[Boolean]("enc_clean"))
  }

  test("clean ASCII text scores zero everywhere") {
    signals("a perfectly normal sentence.") shouldBe (28L, 0L, 0L, 0L, true)
  }

  test("replacement characters are counted exactly") {
    val (_, nRepl, _, _, clean) = signals("caf� and tr��s")
    nRepl shouldBe 3L
    clean shouldBe false
  }

  test("tab, newline and CR are NOT control spill; other C0 and DEL are") {
    val (_, _, nCtl, _, clean) = signals("a\tb\nc\rd")
    nCtl shouldBe 0L
    clean shouldBe true
    val (_, _, nCtl2, _, clean2) = signals("a\u0000b\u0001c\u007fd")
    nCtl2 shouldBe 3L
    clean2 shouldBe false
  }

  test("mojibake lead sequences count once per artifact") {
    // "café" and "don’t" after a UTF-8→CP1252 double-decode
    val s = "cafÃ© donâ€™t niÃ±o"
    val (_, _, _, nMoji, clean) = signals(s)
    nMoji shouldBe 3L // Ã©, â€, Ã±
    clean shouldBe false
  }

  test("bad_char_frac is exact and 0.0 on empty text") {
    val (n, nRepl, nCtl, _, _) = signals("ab�\u0001")
    n shouldBe 4L; nRepl shouldBe 1L; nCtl shouldBe 1L
    val r = Encoding.withEncodingQuality(
      Seq((1L, "ab�\u0001"), (2L, "")).toDF("id", "text"), "text")
      .orderBy("id").collect()
    r(0).getAs[Double]("bad_char_frac") shouldBe 0.5
    r(1).getAs[Double]("bad_char_frac") shouldBe 0.0
  }

  test("the plan is map-only: no exchange, no UDF") {
    val df = Encoding.withEncodingQuality(
      (0L until 10L).map(i => (i, s"doc $i")).toDF("id", "text"), "text")
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan.toLowerCase should not include "batchevalpython"
  }
}
