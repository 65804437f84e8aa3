package graft.text

import graft.SparkSpec

class RedactSpec extends SparkSpec {
  import sqlImplicits._

  private def run(text: String): (String, Int, Int, Int, Int) = {
    val r = Redact.withRedactions(Seq((1L, text)).toDF("id", "t"), "t")
      .select("t_redacted", "n_email", "n_ip", "n_phone", "n_id")
      .collect().head
    (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
  }

  test("masks emails, IPs, phones and long digit runs") {
    val (red, e, i, p, d) = run(
      "mail bob.smith+x@corp.example.org from 192.168.0.1 " +
        "call +1 (555) 010-9999 acct 123456789012")
    red shouldBe "mail <EMAIL> from <IP> call <PHONE> acct <ID>"
    (e, i, p, d) shouldBe ((1, 1, 1, 1))
  }

  test("text without PII passes through unchanged") {
    val (red, e, i, p, d) = run("the quick brown fox jumps over 42 dogs")
    red shouldBe "the quick brown fox jumps over 42 dogs"
    (e, i, p, d) shouldBe ((0, 0, 0, 0))
  }

  test("counts see the text as rewritten by earlier rules") {
    // the email's digits are consumed by the email mask, so the ID rule
    // must not count them; the bare run is still caught
    val (red, e, _, _, d) = run("a123456789@x.io and 987654321 end")
    red shouldBe "<EMAIL> and <ID> end"
    e shouldBe 1
    d shouldBe 1
  }

  test("IP octets are not re-matched as phone or id digits") {
    val (red, _, i, p, d) = run("host 10.0.0.255 up")
    red shouldBe "host <IP> up"
    (i, p, d) shouldBe ((1, 0, 0))
  }

  test("multiple matches of one rule all mask") {
    val (red, e, _, _, _) = run("a@b.co x c@d.org")
    red shouldBe "<EMAIL> x <EMAIL>"
    e shouldBe 2
  }
}
