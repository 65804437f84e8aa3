package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import sqlImplicits._

  private def strip(html: String): String =
    Seq((1L, html)).toDF("id", "t")
      .select(Boilerplate.stripHtml(col("t")).as("c"))
      .collect().head.getString(0)

  private def clean(doc: String, minWords: Int = 3): String =
    Seq((1L, doc)).toDF("id", "t")
      .select(Boilerplate.cleanLines(col("t"), minWords).as("c"))
      .collect().head.getString(0)

  test("strips tags and collapses whitespace") {
    strip("<html><body><h1>Title</h1><p>hello   world</p></body></html>") shouldBe
      "Title hello world"
  }

  test("script bodies with bare < are removed whole, not tag-mangled") {
    strip("<script> if (1 < 2) { x(); } </script><p>kept</p>") shouldBe "kept"
  }

  test("style blocks and comments are removed with their contents") {
    strip("<style>p { color: red; }</style><!-- nav\nbar -->text.") shouldBe
      "text."
  }

  test("case-insensitive, multiline script blocks") {
    strip("<SCRIPT type=\"a\">\nvar x;\n</SCRIPT >after") shouldBe "after"
  }

  test("entities decode one level, ampersand last") {
    strip("a &lt;b&gt; &quot;c&quot; &#39;d&#39; e&nbsp;f &amp; g") shouldBe
      "a <b> \"c\" 'd' e f & g"
    // double-encoded: &amp;lt; is the TEXT "&lt;", not a tag
    strip("x &amp;lt;script&amp;gt; y") shouldBe "x &lt;script&gt; y"
  }

  test("adjacent block elements do not fuse words") {
    strip("<p>one</p><p>two</p>") shouldBe "one two"
  }

  test("plain text passes through trimmed") {
    strip("  already clean  ") shouldBe "already clean"
  }

  test("cleanLines keeps only substantial punctuated non-boilerplate lines") {
    val doc = Seq(
      "This line has plenty of words and ends well.",
      "Please enable JavaScript to continue.",
      "Home | About | Contact",
      "© 2026 corp All Rights Reserved.",
      "Tiny line.",
      "Another good closing sentence appears here!").mkString("\n")
    clean(doc) shouldBe
      "This line has plenty of words and ends well.\n" +
        "Another good closing sentence appears here!"
  }

  test("cleanLines trims for the predicate but keeps original lines") {
    clean("  padded line kept here.  \nno punct line") shouldBe
      "  padded line kept here.  "
  }

  test("cleanLines returns empty string when nothing survives") {
    clean("Home | About\nmenu") shouldBe ""
  }

  test("minWords bound is inclusive") {
    clean("one two three.", minWords = 3) shouldBe "one two three."
    clean("one two.", minWords = 3) shouldBe ""
  }

  test("withStrippedHtml appends clean text and its length") {
    val r = Boilerplate.withStrippedHtml(
      Seq((7L, "<p>ab</p>")).toDF("id", "t"), "t")
      .select("id", "t_clean", "n_chars_clean").collect().head
    (r.getLong(0), r.getString(1), r.getLong(2)) shouldBe ((7L, "ab", 2L))
  }
}
