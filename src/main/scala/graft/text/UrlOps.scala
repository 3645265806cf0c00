package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the signal most
  * crawl-derived training sets dedup on FIRST, before any content hash:
  * the same page is typically fetched under many spellings (scheme/host
  * case, `www.`, default ports, tracking parameters, fragments).
  *
  * Everything is a chain of codegen'd `regexp_extract`/`regexp_replace`
  * over one row — a narrow map, no shuffle, linear at any scale — and
  * every regex avoids lookarounds/backrefs-in-pattern so Java regex (Spark)
  * and RE2 (the DuckDB oracle) agree byte-for-byte. Reference analog: the
  * reference has no URL layer (its inputs are pre-keyed feeds); this is
  * part of the LLM-pipeline extension surface (SURVEY §2.9).
  */
object UrlOps {

  /** Query parameters that identify a *click*, not a *page* — stripped by
    * [[normalizeUrl]]. Alternation kept in sync with [[trackingParamRegex]].
    */
  val trackingParams: Seq[String] =
    Seq("utm_[A-Za-z0-9_]*", "gclid", "fbclid", "msclkid", "mc_eid", "igshid", "ref")

  private def trackingParamRegex: String =
    s"([?&])(${trackingParams.mkString("|")})=[^&#]*&?"

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Canonical form of a URL:
    *   1. trim; drop the fragment (`#...` never reaches the server);
    *   2. lowercase the scheme and authority (case-insensitive per RFC 3986)
    *      — the path/query keep their case (servers may distinguish);
    *   3. drop a leading `www.` and the scheme's default port
    *      (`:80` for http, `:443` for https);
    *   4. strip tracking query parameters ([[trackingParams]]); the
    *      delimiter-capturing replace is applied three times because a
    *      global regex pass cannot rescan its own output — three passes
    *      collapse any run of up to 8 adjacent tracked params (synthetic
    *      and real URLs rarely chain more; idempotent beyond that);
    *   5. drop a now-dangling `?`/`&` and a bare root `/`.
    *
    * Rows that do not parse as `scheme://authority...` pass through
    * trimmed-and-defragmented only — never null, so the column stays safe
    * to group/join on.
    */
  def normalizeUrl(url: Column): Column = {
    val u = trim(regexp_replace(trim(url), "#.*$", ""))
    val scheme = lower(regexp_extract(u, schemeRe, 1))
    val auth0 = lower(regexp_extract(u, schemeRe + "([^/?#]*)", 2))
    val auth1 = regexp_replace(auth0, "^www\\.", "")
    val auth = when(scheme === "http", regexp_replace(auth1, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth1, ":443$", ""))
      .otherwise(auth1)
    val rest0 = regexp_extract(u, schemeRe + "[^/?#]*(.*)$", 2)
    val rest1 = (1 to 3).foldLeft(rest0)(
      (c, _) => regexp_replace(c, trackingParamRegex, "$1"))
    val rest2 = regexp_replace(rest1, "[?&]$", "")
    val rest = when(rest2 === "/", lit("")).otherwise(rest2)
    when(auth === "", u).otherwise(concat(scheme, lit("://"), auth, rest))
  }

  /** Structural parts of an (ideally already-normalized) URL: `host`
    * (authority minus port), `domain` (registered-domain heuristic: the
    * last two dot-labels — the partition key for per-site quotas and
    * politeness), and `path` (before `?`/`#`). Empty strings, never null,
    * when absent.
    */
  def withUrlParts(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val host = regexp_extract(col(urlCol), schemeRe + "([^/?#:]+)", 2)
    df.withColumn("host", host)
      .withColumn("domain", regexp_extract(host, "([A-Za-z0-9-]+\\.[A-Za-z0-9-]+)$", 1))
      .withColumn("path", regexp_extract(col(urlCol), schemeRe + "[^/?#]*([^?#]*)", 2))
  }

  /** URL-canonical dedup: one survivor per [[normalizeUrl]] key, smallest
    * `idCol` wins — the first, cheapest dedup stage of a crawl pipeline
    * (no content ever read). One partial-aggregating shuffle on the
    * canonical key; ties broken deterministically by `min(id)`, same
    * survivor rule as `Dedup.exactDedup`.
    */
  def dedupByUrl(df: DataFrame, urlCol: String, idCol: String): DataFrame = {
    val keyed = df.withColumn("url_norm", normalizeUrl(col(urlCol)))
    val winners = keyed.groupBy(col("url_norm"))
      .agg(min(col(idCol)).as(idCol))
    winners.join(keyed.drop("url_norm"), Seq(idCol))
  }
}
