package graft.text

import graft.SparkSpec

class ScriptsSpec extends SparkSpec {
  import sqlImplicits._

  private def profile(text: String) =
    Scripts.withScriptProfile(Seq(Option(text)).toDF("t"), "t").head()

  test("counts per script block on a mixed string") {
    // 3 latin, 3 cyrillic, 3 digits, 1 greek, 1 cjk + 4 spaces = 15
    val r = profile("Abc где 123 α 机")
    r.getAs[Long]("n_latin") shouldBe 3L
    r.getAs[Long]("n_cyrillic") shouldBe 3L
    r.getAs[Long]("n_digit") shouldBe 3L
    r.getAs[Long]("n_greek") shouldBe 1L
    r.getAs[Long]("n_cjk") shouldBe 1L
    r.getAs[Long]("n_arabic") shouldBe 0L
    r.getAs[Long]("n_total") shouldBe 15L
    r.getAs[String]("dominant_script") shouldBe "latin" // tie-break order
  }

  test("accented Latin and kana/ideographs/hangul are classified") {
    profile("café résumé").getAs[Long]("n_latin") shouldBe 10L
    val cjk = profile("ひらがな 漢字 한글")
    cjk.getAs[Long]("n_cjk") shouldBe 8L
    cjk.getAs[String]("dominant_script") shouldBe "cjk"
  }

  test("multiplication and division signs are not Latin letters") {
    profile("×÷").getAs[Long]("n_latin") shouldBe 0L
  }

  test("no matching block yields dominant 'none'") {
    profile("!!! ... ???").getAs[String]("dominant_script") shouldBe "none"
  }

  test("NULL text stays visibly NULL") {
    val r = profile(null)
    r.isNullAt(r.fieldIndex("n_latin")) shouldBe true
    r.isNullAt(r.fieldIndex("dominant_script")) shouldBe true
  }

  test("dominant follows the documented priority order on ties") {
    // 2 cyrillic vs 2 greek: cyrillic precedes greek in blocks order
    profile("жш αβ").getAs[String]("dominant_script") shouldBe "cyrillic"
  }
}
