package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden behavior of the URL site pipeline against the reference's
  * URLandSearchwordExtractor semantics (root regex, IPv4 filter,
  * guava public-suffix reduction, "" on every failure mode).
  */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def site(url: String): String =
    Seq(url).toDF("u").select(Urls.site(col("u")).as("s"))
      .as[String].head()

  test("subdomains reduce to the top private domain") {
    assert(site("https://news.bbc.com/a/1") == "https://bbc.com")
    assert(site("https://sub.blog.xyz.org/x?q=1") == "https://xyz.org")
    // SLD is not always the "brand" label
    assert(site("https://cdn.assets.example.net/y") == "https://example.net")
  }

  test("multi-part public suffixes are preserved (co.uk stays)") {
    assert(site("http://guardian.co.uk/path") == "http://guardian.co.uk")
    assert(site("https://a.b.guardian.co.uk/p") == "https://guardian.co.uk")
  }

  test("IPv4 hosts, with or without port, map to empty") {
    assert(site("http://192.168.0.1:8080/admin") == "")
    assert(site("https://10.0.0.7/x") == "")
  }

  test("non-URLs, bare hosts, and public-suffix-only hosts map to empty") {
    assert(site("not a url") == "")
    assert(site("") == "")
    assert(site("https://localhost/x") == "")
    assert(site("https://co.uk/") == "") // a public suffix has no SLD
  }

  test("port and path never leak into the site") {
    assert(site("https://shop.store.com:8443/cart?id=2#f") ==
      "https://store.com")
  }
}
