package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL normalization and domain-policy filtering — the corpus-prep
  * steps that make web-crawl provenance usable: canonicalize URLs so
  * exact-dedup and per-domain statistics key correctly, and drop
  * documents from blocked domains (spam/SEO lists, opt-outs).
  *
  * Normalization policy (the common subset of RFC 3986 §6 that is
  * byte-deterministic without touching percent-encoding):
  *   - scheme and host lowercased (case-insensitive per RFC);
  *   - leading `www.` stripped from the host;
  *   - default ports dropped (`:80` for http, `:443` for https) —
  *     non-default ports are significant and kept;
  *   - trailing `/` runs stripped from the path; empty path → `/`;
  *   - tracking parameters removed from the query (`utm_*`, `gclid`,
  *     `fbclid`, `msclkid`), separators repaired, empty query dropped;
  *   - fragment dropped (never sent to the server).
  *
  * Scale shape: pure Column algebra over `regexp_extract` /
  * `regexp_replace` — codegen'd, map-only, no shuffle. The policy
  * filter is a per-row predicate over a small literal blocklist
  * (compiled into the plan); at a realistic blocklist scale (millions
  * of domains) the same `domain` column feeds a broadcast semi/anti
  * join instead — both shapes shuffle nothing on the corpus side.
  *
  * Cross-engine contract: one anchored URL regex with numbered groups,
  * applied via `regexp_extract(u, pat, i)` — identical group semantics
  * in Java regex (Spark) and RE2 (DuckDB); no lookaround.
  *
  * North-star extension per SURVEY §2.11 (not in the reference).
  */
object Urls {

  /** Anchored URL splitter: (1) scheme, (2) host[:port], (3) path,
    * (4) `?query`, (5) `#fragment`. Groups 4/5 may be empty.
    */
  val UrlPattern =
    """^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"""

  /** Tracking-parameter names removed from query strings. */
  val TrackingParams = """utm_[a-z0-9_]+|gclid|fbclid|msclkid"""

  /** Lowercased scheme. */
  def scheme(u: Column): Column = lower(regexp_extract(u, UrlPattern, 1))

  /** Lowercased host[:port] with any leading `www.` stripped and the
    * scheme's DEFAULT port dropped; other ports kept.
    */
  def hostPort(u: Column): Column = {
    val h = regexp_replace(
      lower(regexp_extract(u, UrlPattern, 2)), """^www\.""", "")
    when(scheme(u) === "http", regexp_replace(h, ":80$", ""))
      .when(scheme(u) === "https", regexp_replace(h, ":443$", ""))
      .otherwise(h)
  }

  /** Host without any port — the domain-policy key. */
  def domain(u: Column): Column =
    regexp_replace(hostPort(u), ":[0-9]+$", "")

  /** Path with trailing `/` runs stripped; empty → `/`. */
  def normalizedPath(u: Column): Column = {
    val p = regexp_replace(regexp_extract(u, UrlPattern, 3), "/+$", "")
    when(p === "", lit("/")).otherwise(p)
  }

  /** `?query` with [[TrackingParams]] removed (case-insensitive names),
    * the separator repaired when the first parameter was dropped
    * (`&a=1` → `?a=1`), and a now-empty query reduced to the empty
    * string.
    */
  def cleanQuery(u: Column): Column = {
    val q = regexp_extract(u, UrlPattern, 4)
    val removed = regexp_replace(
      q, "(?i)[?&](" + TrackingParams + ")=[^&#]*", "")
    val repaired = regexp_replace(removed, "^&", "?")
    when(repaired === "?", lit("")).otherwise(repaired)
  }

  /** The full canonical form under the policy above. */
  def normalizeUrl(u: Column): Column =
    concat(scheme(u), lit("://"), hostPort(u), normalizedPath(u),
      cleanQuery(u))

  /** Input plus `<urlCol>_norm` and `domain` — one projection. */
  def withNormalizedUrls(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn(s"${urlCol}_norm", normalizeUrl(col(urlCol)))
      .withColumn("domain", domain(col(urlCol)))

  /** Keep only rows whose domain is NOT covered by `blocked`: a domain
    * is blocked when it equals a blocklist entry or is a subdomain of
    * one (`a.b.example.com` under `example.com`). Literal predicate —
    * for row-scale blocklists use a broadcast anti-join on the same
    * [[domain]] key instead.
    */
  def filterByDomainPolicy(
      df: DataFrame, urlCol: String, blocked: Seq[String]): DataFrame = {
    require(blocked.nonEmpty, "empty blocklist: nothing to filter")
    val d = domain(col(urlCol))
    val isBlocked = blocked
      .map(b => d === lit(b) || d.endsWith(lit("." + b)))
      .reduce(_ || _)
    df.filter(!isBlocked)
  }
}
