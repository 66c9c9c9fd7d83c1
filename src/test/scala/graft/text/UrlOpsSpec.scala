package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlOpsSpec extends AnyFunSuite {
  private val spark = graft.TestFixtures.spark
  import spark.implicits._

  private def canon(urls: (String, String)*): Unit = {
    val out = urls.map(_._1).toDF("u")
      .select(UrlOps.canonicalizeUrl(col("u")).as("c")).collect().map(_.getString(0))
    urls.map(_._2).zip(out).zip(urls.map(_._1)).foreach { case ((want, got), in) =>
      assert(got == want, s"canonicalizeUrl($in): got $got, want $want")
    }
  }

  test("canonicalizeUrl: documented rules, case by case") {
    canon(
      // scheme+host lowercase; path case preserved; fragment drops
      "HTTP://WWW.Example.COM/Path/File#Frag" -> "http://www.example.com/Path/File",
      // default ports drop, scheme-specific
      "http://example.com:80/a" -> "http://example.com/a",
      "https://example.com:443/a" -> "https://example.com/a",
      "https://example.com:80/a" -> "https://example.com:80/a",
      "ftp://example.com:80/a" -> "ftp://example.com:80/a",
      // empty path becomes /
      "http://example.com" -> "http://example.com/",
      "http://example.com?id=1" -> "http://example.com/?id=1",
      // tracking params drop, survivor order preserved
      "http://e.com/p?utm_source=x&id=2&utm_campaign=y&b=1" -> "http://e.com/p?id=2&b=1",
      "http://e.com/p?fbclid=z" -> "http://e.com/p",
      "http://e.com/p?gclid" -> "http://e.com/p",
      "http://e.com/p?ref=nav&msclkid=7" -> "http://e.com/p",
      "http://e.com/p?refx=keep" -> "http://e.com/p?refx=keep",
      // no scheme: trimmed passthrough
      "  relative/path?utm_source=x  " -> "relative/path?utm_source=x",
      "not a url" -> "not a url")
    // null in, null out
    val n = Seq[Option[String]](None).toDF("u")
      .select(UrlOps.canonicalizeUrl(col("u"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("urlHost and registrableDomain") {
    val rows = Seq(
      "HTTP://User:pw@WWW.Example.COM:8080/x" -> ("www.example.com", "example.com"),
      "https://cdn.a.b.site.NET/x" -> ("cdn.a.b.site.net", "site.net"),
      "http://localhost/x" -> ("localhost", "localhost"),
      "no scheme here" -> ("", ""))
    val out = rows.map(_._1).toDF("u").select(
      UrlOps.urlHost(col("u")).as("h"),
      UrlOps.registrableDomain(col("u")).as("d")).collect()
    rows.map(_._2).zip(out).zip(rows.map(_._1)).foreach { case (((h, d), r), in) =>
      assert(r.getString(0) == h && r.getString(1) == d,
        s"$in: got (${r.getString(0)}, ${r.getString(1)}), want ($h, $d)")
    }
  }

  test("canonical form collapses tracking/case/port variants for URL-keyed dedup") {
    val variants = Seq(
      "http://example.com/a?id=1",
      "HTTP://EXAMPLE.com:80/a?id=1&utm_source=feed",
      "http://example.com/a?id=1#section2")
    val c = variants.toDF("u")
      .select(UrlOps.canonicalizeUrl(col("u"))).distinct().collect()
    assert(c.length == 1 && c(0).getString(0) == "http://example.com/a?id=1")
  }
}
