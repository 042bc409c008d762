package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UrlFunctions
import graft.testkit.SparkTestKit._

class UrlFunctionsSpec extends AnyFunSuite {

  private def norm(urls: (String, String)*): Unit = {
    val df = table("u string",
      urls.map(p => row(p._1: Any)))
    val got = df.select(col("u"),
      UrlFunctions.urlNormalize(col("u")).as("n")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    urls.foreach { case (in, want) =>
      assert(got(in) == want, s"urlNormalize('$in')")
    }
  }

  test("urlNormalize: scheme/host case, fragment, trailing slash") {
    norm(
      "HTTP://Example.COM/Path#Frag" -> "http://example.com/Path",
      "http://example.com" -> "http://example.com/",
      "http://example.com/" -> "http://example.com/",
      "http://example.com//" -> "http://example.com/",
      "https://example.com/a/b///" -> "https://example.com/a/b",
      // path CASE is preserved — only scheme and host fold
      "https://Example.com/CaseSensitive" ->
        "https://example.com/CaseSensitive")
  }

  test("urlNormalize: userinfo dropped up to the LAST @") {
    norm(
      "http://user:Pw@example.com/a" -> "http://example.com/a",
      // the open-redirect trick: host is what follows the LAST @
      "http://good.com@evil.com/a" -> "http://evil.com/a",
      "http://a@b@evil.com/a" -> "http://evil.com/a")
  }

  test("urlNormalize: default-port drop, numeric port canonicalization") {
    norm(
      "http://example.com:80/a" -> "http://example.com/a",
      "https://example.com:443/a" -> "https://example.com/a",
      // 443 is NOT http's default, 80 is not https's
      "http://example.com:443/a" -> "http://example.com:443/a",
      "https://example.com:80/a" -> "https://example.com:80/a",
      "http://example.com:8080/a" -> "http://example.com:8080/a",
      "http://example.com:0080/a" -> "http://example.com/a",
      "http://example.com:008080/a" -> "http://example.com:8080/a",
      // zero-PADDED but numerically valid: the 9-digit bound applies
      // to significant digits, not raw length
      "http://example.com:0000000080/a" -> "http://example.com/a",
      "http://example.com:000000008080/a" -> "http://example.com:8080/a")
  }

  test("urlNormalize: adversarial over-long port digit run never crashes") {
    // a >9-digit "port" is not a port: dropped, job survives (ANSI
    // cast overflow would otherwise kill the whole stage on one URL)
    norm(
      "http://a.com:99999999999999999999999/x" -> "http://a.com/x",
      "http://a.com:1234567890/x" -> "http://a.com/x",
      // 9 digits is still within the bound and kept
      "http://a.com:123456789/x" -> "http://a.com:123456789/x")
  }

  test("urlNormalize: IPv6 bracket host keeps its colons, port still parsed") {
    norm(
      "http://[2001:DB8::1]/a" -> "http://[2001:db8::1]/a",
      "http://[2001:DB8::1]:8080/a" -> "http://[2001:db8::1]:8080/a",
      "http://[2001:DB8::1]:80/a" -> "http://[2001:db8::1]/a")
  }

  test("urlNormalize: tracking params stripped by lowercase name, rest sorted") {
    norm(
      "http://a.com/p?utm_source=x&b=2&a=1" -> "http://a.com/p?a=1&b=2",
      // case-insensitive name match — UTM_SOURCE is no bypass
      "http://a.com/p?UTM_SOURCE=x&a=1" -> "http://a.com/p?a=1",
      // full name=value byte sort; '&&' empties dropped
      "http://a.com/p?b=2&&a=1&B=0" -> "http://a.com/p?B=0&a=1&b=2",
      // all params stripped -> no '?'
      "http://a.com/p?utm_source=x&fbclid=y" -> "http://a.com/p",
      "http://a.com/p?" -> "http://a.com/p",
      // values are untouched (utm_ inside a VALUE survives)
      "http://a.com/p?q=utm_source" -> "http://a.com/p?q=utm_source")
  }

  test("urlNormalize: custom strip list, empty strip list") {
    val df = table("u string", Seq(row("http://a.com/p?sid=1&a=2")))
    val got = df.select(
      UrlFunctions.urlNormalize(col("u"), Seq("SID")).as("n1"),
      UrlFunctions.urlNormalize(col("u"), Seq.empty).as("n2")).head()
    assert(got.getString(0) == "http://a.com/p?a=2")
    assert(got.getString(1) == "http://a.com/p?a=2&sid=1")
  }

  test("urlNormalize: IDN punycode passes through, never folded") {
    norm(
      "http://XN--PPLE-43D.com/a" -> "http://xn--pple-43d.com/a",
      "http://apple.com/a" -> "http://apple.com/a")
    // and the two stay distinct keys
    assert("http://xn--pple-43d.com/a" != "http://apple.com/a")
  }

  test("urlNormalize: non-URLs and NULL read NULL") {
    val df = table("u string", Seq(
      row("not a url"), row("example.com/a"), row("://x"),
      row("1http://x.com/"), row(null)))
    val got = df.select(UrlFunctions.urlNormalize(col("u"))).collect()
    assert(got.forall(_.isNullAt(0)))
  }

  test("urlNormalize is idempotent on its own output") {
    val raw = Seq(
      "HTTP://U@Ex.COM:80/a/?b=2&a=1&utm_source=x#f",
      "https://a.co.uk:8443//x//?z=1",
      "http://[2001:DB8::1]:8080/p?a=1")
    val df = table("u string", raw.map(u => row(u: Any)))
    val once = df.select(UrlFunctions.urlNormalize(col("u")).as("n"))
    val twice = once.select(UrlFunctions.urlNormalize(col("n")).as("n"))
    assertDfEquality(twice, once)
  }

  private val Suffixes =
    Seq("com", "org", "uk", "co.uk", "org.uk", "github.io", "io")

  test("registeredDomain: longest suffix wins, PSL fallback, no-reg NULL") {
    val cases = Seq(
      "shop.example.co.uk" -> "example.co.uk", // co.uk beats uk
      "example.co.uk" -> "example.co.uk",
      "example.uk" -> "example.uk", // plain uk rule
      "deep.a.b.example.com" -> "example.com",
      "docs.src1.github.io" -> "src1.github.io", // multi-label suffix
      "github.io" -> null, // host IS a suffix
      "co.uk" -> null,
      "example.nosuchtld" -> "example.nosuchtld", // PSL '*' fallback
      "localhost" -> null, // single label, no registrable part
      "Example.COM" -> "example.com", // host folds
      "" -> null)
    val df = table("h string", cases.map(c => row(c._1: Any)))
    val got = df.select(col("h"),
      UrlFunctions.registeredDomain(col("h"), Suffixes).as("d"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) null else r.getString(1))).toMap
    cases.foreach { case (h, want) =>
      assert(got(h) == want, s"registeredDomain('$h')")
    }
  }

  test("registeredDomain: suffix match is label-aligned, not substring") {
    // notco.uk must NOT match the co.uk rule mid-label
    val df = table("h string", Seq(row("a.notco.uk"), row("notco.uk")))
    val got = df.select(
      UrlFunctions.registeredDomain(col("h"), Suffixes)).collect()
    assert(got(0).getString(0) == "notco.uk") // uk rule applies
    assert(got(1).getString(0) == "notco.uk")
  }

  test("registeredDomain: NULL host reads NULL; bad suffix lists are loud") {
    val df = table("h string", Seq(row(null)))
    assert(df.select(UrlFunctions.registeredDomain(col("h"), Suffixes))
      .head().isNullAt(0))
    intercept[IllegalArgumentException] {
      UrlFunctions.registeredDomain(col("h"), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      UrlFunctions.registeredDomain(col("h"), Seq("Co.UK"))
    }
    intercept[IllegalArgumentException] {
      UrlFunctions.registeredDomain(col("h"), Seq(".com"))
    }
  }

  test("url pipeline composes with exactDedupIds: winner is min id") {
    val df = table("id bigint, u string", Seq(
      row(5L, "HTTP://A.com:80/x?utm_source=1"),
      row(2L, "http://a.com/x"),
      row(9L, "http://a.com/x/"),
      row(3L, "http://b.com/y")))
    val nd = df.select(col("id"),
      UrlFunctions.urlNormalize(col("u")).as("url"))
    val got = graft.operators.Dedup.exactDedupIds(nd, Seq("url"), "id")
      .orderBy("url").collect()
    assert(got.length == 2)
    assert(got(0).getString(0) == "http://a.com/x" && got(0).getLong(1) == 2L)
    assert(got(1).getString(0) == "http://b.com/y" && got(1).getLong(1) == 3L)
  }
}
