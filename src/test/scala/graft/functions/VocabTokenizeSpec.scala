package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VocabTokenizeSpec extends SparkSpec {
  import sqlImplicits._

  private val vocab = Seq("a", "ab", "abc", "b", "cd", "ab cd", " ")

  private def tok(s: String, v: Seq[String] = vocab): Seq[String] =
    Seq(s).toDF("t")
      .select(VocabTokenize.vocabTokenize(col("t"), v).as("toks"))
      .head().getSeq[String](0)

  test("maximal munch picks the longest match, not the first") {
    tok("abc") shouldBe Seq("abc")
    // greedy, not globally optimal: "abc" wins at 0, leaving "d" as unk
    // (an optimal split "ab"+"cd" exists — greedy is the contract)
    tok("abcd") shouldBe Seq("abc", "<unk>")
  }

  test("multi-word vocabulary entries win over word-by-word") {
    tok("ab cd b") shouldBe Seq("ab cd", " ", "b")
  }

  test("unmatched characters emit one unk each and advance") {
    tok("axb") shouldBe Seq("a", "<unk>", "b")
    tok("xyz", Seq("q")) shouldBe Seq("<unk>", "<unk>", "<unk>")
  }

  test("empty string tokenizes to an empty array") {
    tok("") shouldBe Seq.empty
  }

  test("an unmatched supplementary character is ONE unk, not two") {
    // U+1F600 is a surrogate pair in UTF-16; the unk fallback must
    // advance a full code point
    tok("a😀b") shouldBe Seq("a", "<unk>", "b")
  }

  test("null input stays null") {
    val got = Seq[(Integer, String)]((1, null)).toDF("id", "t")
      .select(VocabTokenize.vocabTokenize(col("t"), vocab))
      .head()
    got.isNullAt(0) shouldBe true
  }

  test("tokens concatenate back to the input when nothing is unk") {
    val s = "ab cd a abc b"
    tok(s).mkString shouldBe s
  }

  test("runs as a column under forced codegen and matches interpreted") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val rows = Seq("abc ab cd", "", "zzab", "ab cd ab cd")
      val got = rows.toDF("t")
        .select(VocabTokenize.vocabTokenize(col("t"), vocab).as("toks"))
        .collect().map(_.getSeq[String](0))
      val expect = rows.map { s =>
        // independent reference: greedy longest-match reimplementation
        val v = vocab.toSet
        val maxLen = vocab.map(_.length).max
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var p = 0
        while (p < s.length) {
          val m = (math.min(maxLen, s.length - p) to 1 by -1)
            .find(l => v.contains(s.substring(p, p + l)))
          m match {
            case Some(l) => out += s.substring(p, p + l); p += l
            case None => out += "<unk>"; p += 1
          }
        }
        out.toSeq
      }
      got.toSeq.map(_.toList) shouldBe expect.map(_.toList)
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("invalid vocabularies are rejected") {
    an[IllegalArgumentException] should be thrownBy tok("a", Seq.empty)
    an[IllegalArgumentException] should be thrownBy tok("a", Seq("a", "a"))
    an[IllegalArgumentException] should be thrownBy tok("a", Seq(""))
  }
}
