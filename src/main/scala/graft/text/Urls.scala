package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL site extraction (SURVEY.md F13; reference
  * `URLandSearchwordExtractor.scala:69-126`: regex root extraction,
  * IPv4-host filtering, and reduction of the host to its top private
  * domain via guava's public-suffix list, returned as
  * `protocol://sld`, with every failure mode mapped to "").
  *
  * The root/IP stages are codegen'd regexps; the public-suffix
  * reduction is a compiled guava kernel (`InternetDomainName` — the
  * same library and semantics the reference uses; a suffix list is
  * data, not an expression, so this is a documented kernel, not a
  * UDF-where-builtin-exists). All three compose map-side — at 100 TB
  * this runs at scan speed with no shuffle.
  */
object Urls {

  /** `https?://host[:port]` prefix of a URL, "" when absent
    * (reference `extractRoot`).
    */
  def extractRoot(url: Column): Column =
    regexp_extract(url, "^https?://[^/?#]+", 0)

  /** "" for IPv4(:port) hosts, pass-through otherwise (reference
    * `filterIP` — dotted-quad sites carry no label signal).
    */
  def dropIpHosts(root: Column): Column =
    when(root.rlike(
      "^https?://([0-9]{1,3}\\.){3}[0-9]{1,3}(:[0-9]{1,4})?$"), lit(""))
      .otherwise(root)

  /** `protocol://topPrivateDomain` under the public-suffix list
    * ("news.src18.com" → "https://src18.com",
    * "src18.co.uk" stays "http://src18.co.uk" because co.uk is a
    * public suffix); "" for hosts not under a public suffix
    * (localhost, bare TLDs), unparseable input, or "".
    */
  def siteSld(rootUrl: Column): Column = sldKernel(rootUrl)

  private val sldKernel = udf { (url: String) =>
    if (url == null || url.isEmpty) ""
    else try {
      val uri = new java.net.URI(url)
      val host = uri.getHost
      if (host == null) ""
      else uri.getScheme + "://" +
        com.google.common.net.InternetDomainName.from(host)
          .topPrivateDomain().toString
    } catch { case _: Exception => "" }
  }

  /** The reference's composed pipeline:
    * `filterSLD(filterIP(extractRoot(url)))`.
    */
  def site(url: Column): Column = siteSld(dropIpHosts(extractRoot(url)))
}
