package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII-style pattern redaction — the C4/RefinedWeb-style cleaning step
  * that masks emails, IP addresses, phone numbers and long ID-like
  * digit runs before a corpus is used for training.
  *
  * Scale shape: pure Column algebra over `regexp_replace`/`regexp_count`
  * — codegen'd, map-only, no UDF, no shuffle. At 100 TB this is a single
  * pipelined pass over the scan; the only cost is the regex automata,
  * which run per-row on the executors.
  *
  * Cross-engine contract: every pattern stays inside the common subset
  * of Java regex (Spark) and RE2 (DuckDB) — character classes, bounded
  * repetition and `\b` word boundaries only; NO lookahead/lookbehind
  * (RE2 has none). Replacements apply in a fixed order (email → ip →
  * phone → id) because the rewritten text feeds the next pattern;
  * replaying the same chain in SQL reproduces the output byte-for-byte.
  * North-star extension per SURVEY §2.11 (not in the reference).
  */
object Redact {

  /** `local@domain.tld` — permissive local/domain charsets, 2+ letter TLD. */
  val EmailPattern = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""

  /** Dotted-quad IPv4 (syntactic: 1-3 digits per octet, word-bounded). */
  val Ipv4Pattern = """\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"""

  /** International-format phone: `+` then 7+ digits with space/()/-
    * separators, ending in a digit. Requiring the leading `+` keeps the
    * pattern from eating arbitrary numeric text.
    */
  val PhonePattern = """\+[0-9][0-9 ()-]{5,}[0-9]"""

  /** Bare digit runs of 9+ (account numbers, SSN-ish IDs). Applied LAST
    * so digits already consumed by ip/phone masks are not re-matched.
    */
  val IdPattern = """\b[0-9]{9,}\b"""

  /** (pattern, mask) in application order — email first (its local part
    * may contain digits an ID pattern would otherwise split), bare digit
    * runs last.
    */
  val Rules: Seq[(String, String)] = Seq(
    EmailPattern -> "<EMAIL>",
    Ipv4Pattern -> "<IP>",
    PhonePattern -> "<PHONE>",
    IdPattern -> "<ID>")

  /** `text` with every rule's matches masked, applied in [[Rules]] order. */
  def redact(text: Column): Column =
    Rules.foldLeft(text) { case (acc, (pat, mask)) =>
      regexp_replace(acc, pat, mask)
    }

  /** Match count of one pattern at its position in the chain: patterns
    * count against the text as already rewritten by the EARLIER rules,
    * exactly as [[redact]] consumes it.
    */
  private def stagedCounts(text: Column): Seq[Column] = {
    val staged = Rules.scanLeft(text) { case (acc, (pat, mask)) =>
      regexp_replace(acc, pat, mask)
    }
    Rules.zip(staged).map { case ((pat, _), input) =>
      regexp_count(input, lit(pat))
    }
  }

  /** Input plus `<textCol>_redacted` and per-category match counts
    * (`n_email`, `n_ip`, `n_phone`, `n_id`). One projection, no shuffle.
    */
  def withRedactions(df: DataFrame, textCol: String): DataFrame = {
    val counts = stagedCounts(col(textCol))
    df.withColumn(s"${textCol}_redacted", redact(col(textCol)))
      .withColumn("n_email", counts(0))
      .withColumn("n_ip", counts(1))
      .withColumn("n_phone", counts(2))
      .withColumn("n_id", counts(3))
  }
}
