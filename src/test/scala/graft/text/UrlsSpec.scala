package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlsSpec extends SparkSpec {
  import sqlImplicits._

  private def norm(u: String): (String, String) = {
    val r = Seq((1L, u)).toDF("id", "u")
      .select(Urls.normalizeUrl(col("u")).as("n"),
        Urls.domain(col("u")).as("d"))
      .collect().head
    (r.getString(0), r.getString(1))
  }

  test("scheme and host lowercase; www and default port stripped") {
    norm("HTTP://WWW.Example.COM:80/Path")._1 shouldBe
      "http://example.com/Path"
    norm("HtTpS://www.Example.com:443/a")._1 shouldBe "https://example.com/a"
  }

  test("non-default ports are kept; path case preserved") {
    val (n, d) = norm("https://Example.com:8443/API/v1")
    n shouldBe "https://example.com:8443/API/v1"
    d shouldBe "example.com"
  }

  test("empty path becomes /; trailing slash runs stripped") {
    norm("http://a.com")._1 shouldBe "http://a.com/"
    norm("http://a.com/x///")._1 shouldBe "http://a.com/x"
    norm("http://a.com/")._1 shouldBe "http://a.com/"
  }

  test("tracking params removed wherever they sit; separators repaired") {
    norm("http://a.com/p?utm_source=x&id=7")._1 shouldBe "http://a.com/p?id=7"
    norm("http://a.com/p?id=7&utm_source=x")._1 shouldBe "http://a.com/p?id=7"
    norm("http://a.com/p?a=1&gclid=z&b=2")._1 shouldBe "http://a.com/p?a=1&b=2"
    norm("http://a.com/p?UTM_Campaign=x&fbclid=1")._1 shouldBe "http://a.com/p"
  }

  test("fragment dropped; query kept intact when clean") {
    norm("http://a.com/p?x=1#sec2")._1 shouldBe "http://a.com/p?x=1"
    norm("http://a.com/p#only")._1 shouldBe "http://a.com/p"
  }

  test("domain strips any port but keeps subdomains") {
    norm("http://sub.news.example.org:8080/x")._2 shouldBe
      "sub.news.example.org"
  }

  test("filterByDomainPolicy blocks exact domains and their subdomains") {
    val df = Seq(
      (1L, "http://spam.com/a"),
      (2L, "http://www.spam.com/b"),
      (3L, "http://deep.sub.spam.com/c"),
      (4L, "http://notspam.com/d"),
      (5L, "http://ok.org/e")).toDF("id", "u")
    // www. is stripped before the domain key, so row 2 is exact-blocked
    val kept = Urls.filterByDomainPolicy(df, "u", Seq("spam.com"))
      .select("id").collect().map(_.getLong(0)).sorted
    kept shouldBe Array(4L, 5L)
  }

  test("filterByDomainPolicy refuses an empty blocklist") {
    val df = Seq((1L, "http://a.com/")).toDF("id", "u")
    an[IllegalArgumentException] should be thrownBy
      Urls.filterByDomainPolicy(df, "u", Nil)
  }

  test("withNormalizedUrls appends norm and domain columns") {
    val r = Urls.withNormalizedUrls(
      Seq((9L, "HTTPS://WWW.A.IO:443/x/?utm_x=1")).toDF("id", "u"), "u")
      .select("id", "u_norm", "domain").collect().head
    (r.getLong(0), r.getString(1), r.getString(2)) shouldBe
      ((9L, "https://a.io/x", "a.io"))
  }
}
