package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Golden tests pinning Html.* to the reference's jsoup-observable
  * behavior on pathological inputs (VERDICT r5 item 7; reference
  * ArticleInfoProcess.scala:61 `.text()`, NewsMarkProcess.scala:157-191
  * DOM entity tagger). Each case states the jsoup result it mirrors;
  * deliberate divergences are asserted AS divergences so a future
  * change can't silently drift.
  */
class HtmlFidelitySpec extends SparkSpec {
  import spark.implicits._

  private def clean(html: String): String =
    Seq(html).toDF("h").select(Html.htmlToText(col("h")).as("t"))
      .as[String].head()

  private def tag(text: String, kws: Seq[String],
      letters: Boolean = false): String =
    Seq(text).toDF("t")
      .select(Html.tagEntities(col("t"), kws, letters).as("g"))
      .as[String].head()

  test("script blocks with attributes and angle brackets are dropped") {
    // jsoup: script content is a DataNode, never visible text
    val html = """<p>before</p><script type="text/javascript">
      |var x = 1 < 2 && "</p>fake";
      |</script><p>after</p>""".stripMargin
    assert(clean(html) == "before after")
  }

  test("style blocks are dropped, including multiline selectors") {
    val html =
      "<style media=\"all\">\nbody > p { color: red; }\n</style><b>kept</b>"
    assert(clean(html) == "kept")
  }

  test("pre-escaped entities unescape exactly one level (jsoup .text())") {
    // jsoup: "&amp;lt;b&amp;gt;" → text "&lt;b&gt;" — one level, not two.
    assert(clean("<p>&amp;lt;b&amp;gt;</p>") == "&lt;b&gt;")
    assert(clean("<p>&amp;amp;</p>") == "&amp;")
    // single-escaped forms fully unescape
    assert(clean("<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>")
      == "a & b <tag> \"q\" 's'")
  }

  private def cleanFull(html: String): String =
    Seq(html).toDF("h").select(Html.htmlToTextFull(col("h")).as("t"))
      .as[String].head()

  test("htmlToTextFull agrees with htmlToText on the common entities") {
    for (html <- Seq(
      "<p>a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39;</p>",
      "<script>drop()</script><b>x &nbsp; y</b>",
      "<p>&amp;lt;one level&amp;gt;</p>"))
      assert(cleanFull(html) == clean(html), html)
  }

  test("htmlToTextFull resolves named and numeric entities (jsoup-grade)") {
    // the regexp chain knows 6 entities; the kernel knows the HTML4
    // table and numeric references — caf&eacute;, em&mdash;dash,
    // decimal &#8217; and hex &#x2019; right single quotes
    assert(cleanFull("<p>caf&eacute; &mdash; it&#8217;s &#x2019;ok&#x2019;</p>")
      == "café — it’s ’ok’")
    // &nbsp; renders as a plain space like jsoup .text()
    assert(cleanFull("<p>a&nbsp;b</p>") == "a b")
    // the 6-entity chain leaves exotic entities escaped — documented
    // boundary between the scan-path default and the fidelity kernel
    assert(clean("<p>caf&eacute;</p>") == "caf&eacute;")
  }

  test("entity tagging never reaches markup (tagger runs on text)") {
    // The reference walks DOM text nodes so <i>/class attributes are
    // never keyword-matched; our pipeline order (htmlToText BEFORE
    // tagEntities — Pipelines.clean) gives the same guarantee.
    val text = clean("<p class=\"merge\">merge here</p><script>merge()</script>")
    assert(text == "merge here")
    assert(tag(text, Seq("merge"))
      == s"${Html.entityOpen}merge${Html.entityClose} here")
  }

  test("possessive 's boundary: keyword before apostrophe variants tags") {
    // reference lookahead: ([^\p{L}])|‘s|`s|'s — all three apostrophes
    // are non-letters, so both modes tag the possessive base word.
    for (apos <- Seq("'", "‘", "`"); letters <- Seq(false, true)) {
      val out = tag(s"merge${apos}s plan", Seq("merge"), letters)
      assert(out == s"${Html.entityOpen}merge${Html.entityClose}${apos}s plan",
        s"apos=$apos letters=$letters: $out")
    }
  }

  test("digit boundary: reference-faithful mode tags, \\b mode does not") {
    // NewsMarkProcess.scala:181 bounds on non-LETTERS, so "covid19"
    // tags "covid"; \b (the RE2-replayable oracle mode) treats digits
    // as word chars and does not. Asserted as a documented divergence.
    assert(tag("covid19 wave", Seq("covid"), letters = true)
      == s"${Html.entityOpen}covid${Html.entityClose}19 wave")
    assert(tag("covid19 wave", Seq("covid"), letters = false)
      == "covid19 wave")
  }

  test("adjacent keywords both tag (zero-width boundaries)") {
    for (letters <- Seq(false, true)) {
      val out = tag("merge batch now", Seq("merge", "batch"), letters)
      assert(out == s"${Html.entityOpen}merge${Html.entityClose} " +
        s"${Html.entityOpen}batch${Html.entityClose} now", out)
    }
  }

  test("keywords with regex metacharacters are quoted, not interpreted") {
    // reference escapes f***ing-style keywords char-by-char
    // (NewsMarkProcess.scala:170-178); Pattern.quote is our form.
    val out = tag("a f***ing bad word", Seq("f***ing"), letters = true)
    assert(out == s"a ${Html.entityOpen}f***ing${Html.entityClose} bad word")
  }

  test("multi-word entities win over their single-word prefixes") {
    val out = tag("the hash join ran", Seq("hash", "hash join"))
    assert(out == s"the ${Html.entityOpen}hash join${Html.entityClose} ran")
  }

  test("string edges count as boundaries in both modes") {
    for (letters <- Seq(false, true))
      assert(tag("merge", Seq("merge"), letters)
        == s"${Html.entityOpen}merge${Html.entityClose}")
  }
}
