package graft

import org.apache.spark.sql.functions._

import graft.text.UrlOps

/** URL canonicalization: the normalize table, part extraction, and
  * canonical dedup. Every case here is also exercised end-to-end against
  * the DuckDB oracle by q144/q145.
  */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(urls: String*): Seq[String] =
    urls.toDF("url").select(UrlOps.normalizeUrl(col("url")).as("n"))
      .collect().map(_.getString(0)).toSeq

  test("normalizeUrl canonicalizes case, www, default ports, tracking, fragments") {
    val cases = Seq(
      // scheme+host case-fold; path case kept
      "HTTPS://Example.COM/Path/File" -> "https://example.com/Path/File",
      // www strip
      "https://www.example.com/x" -> "https://example.com/x",
      // default ports strip per scheme; non-default kept
      "http://example.com:80/x" -> "http://example.com/x",
      "https://example.com:443/x" -> "https://example.com/x",
      "https://example.com:8080/x" -> "https://example.com:8080/x",
      "http://example.com:443/x" -> "http://example.com:443/x",
      // tracking params in every position, non-tracked kept in order
      "https://e.com/p?utm_source=a&q=1" -> "https://e.com/p?q=1",
      "https://e.com/p?q=1&gclid=zz" -> "https://e.com/p?q=1",
      "https://e.com/p?a=1&fbclid=x&b=2" -> "https://e.com/p?a=1&b=2",
      // an adjacent run of three tracked params (the 3-pass case)
      "https://e.com/p?utm_a=1&utm_b=2&utm_c=3&keep=1" -> "https://e.com/p?keep=1",
      "https://e.com/p?utm_a=1&utm_b=2&utm_c=3" -> "https://e.com/p",
      // fragment always dropped; root slash dropped; deeper path kept
      "https://e.com/p#sec-2" -> "https://e.com/p",
      "https://e.com/" -> "https://e.com",
      "https://e.com/a/" -> "https://e.com/a/",
      // whitespace trim
      "  https://e.com/x " -> "https://e.com/x")
    assert(norm(cases.map(_._1): _*) == cases.map(_._2))
  }

  test("normalizeUrl passes unparseable rows through trimmed and defragmented") {
    assert(norm("not a url #frag", "relative/path") ==
      Seq("not a url", "relative/path"))
  }

  test("withUrlParts extracts host, registered domain, and path") {
    val df = Seq("https://sub.news.example.co/a/b?q=1").toDF("url")
    val r = UrlOps.withUrlParts(df, "url").collect().head
    assert(r.getAs[String]("host") == "sub.news.example.co")
    assert(r.getAs[String]("domain") == "example.co")
    assert(r.getAs[String]("path") == "/a/b")
  }

  test("dedupByUrl keeps one min-id survivor per canonical URL") {
    val df = Seq(
      (3L, "HTTPS://WWW.E.com/p?id=1&utm_x=a"),
      (1L, "https://e.com:443/p?id=1"),
      (2L, "https://e.com/p?id=1#frag"),
      (9L, "https://e.com/p?id=2")).toDF("doc_id", "url")
    val out = UrlOps.dedupByUrl(df, "url", "doc_id")
      .select("doc_id", "url_norm").as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      1L -> "https://e.com/p?id=1", 9L -> "https://e.com/p?id=2"))
  }
}
