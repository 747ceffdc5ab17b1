package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML cleaning and entity tagging (SURVEY.md F13; reference
  * ArticleInfoProcess.scala:61 `Jsoup.parse(html).text()` and
  * NewsMarkProcess.scala:153-203 DOM-walking entity tagger).
  *
  * The reference shells out to jsoup per row. Here the default
  * kernels are regexp chains over built-in functions — fully
  * codegen'd, no UDF, no per-row parser allocation — which is what
  * lets them run as a map-side-only pass over 100 TB of html. The
  * contract is the reference's observable behavior (tags stripped,
  * entities unescaped, whitespace squashed; keywords wrapped
  * word-boundary safely), not jsoup's DOM model. Where full entity
  * fidelity matters, [[htmlToTextFull]] swaps the 6-entity regexp
  * unescape for a compiled commons-text HTML4 kernel.
  */
object Html {

  /** html → visible text: drop script/style subtrees, strip tags,
    * unescape the common entities, squash whitespace.
    *
    * Entity order matters for jsoup fidelity: `&amp;` is unescaped
    * LAST, so pre-escaped text survives one level of unescaping the
    * way a real parser does — `&amp;lt;` → `&lt;` (what jsoup's
    * `.text()` returns), not `<` (what an `&amp;`-first chain
    * produced; caught by HtmlFidelitySpec).
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    val unescaped = Seq(
      "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ",
      "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        regexp_replace(c, from, to)
      }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** Full-fidelity variant of [[htmlToText]]: same tag stripping,
    * but entities are unescaped by a compiled kernel over
    * commons-text's HTML4 table — ALL named entities (&eacute;,
    * &mdash;, …) and decimal/hex numeric references (&#8217;,
    * &#x2019;), one level, exactly like a real parser. &nbsp;
    * (U+00A0) is normalized to a plain space the way jsoup's
    * `.text()` renders it. Use this when document fidelity beats
    * plan purity: the kernel is a per-row library call (documented
    * compiled-kernel exception, cf. §2.10 UDF policy), so the
    * regexp-chain [[htmlToText]] stays the default for the
    * oracle-replayable scan path.
    */
  def htmlToTextFull(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "<[^>]+>", " ")
    trim(regexp_replace(unescapeHtml4Kernel(noTags), "\\s+", " "))
  }

  private val unescapeHtml4Kernel = udf { (s: String) =>
    if (s == null) null
    else org.apache.commons.text.StringEscapeUtils.unescapeHtml4(s)
      .replace('\u00A0', ' ')
  }

  val entityOpen = "<i class=\"graft-entity-words\">"
  val entityClose = "</i>"

  /** Wrap every word-boundary occurrence of a dictionary keyword in
    * the entity marker (the reference's `apus-entity-words` idiom).
    * The dictionary travels inside the compiled regex — effectively
    * broadcast once per executor, zero per-row cost beyond the match.
    * Keywords are alternated longest-first so multi-word entities win
    * over their prefixes.
    *
    * Boundary semantics, two modes:
    *  - default (`letterBoundaries = false`): `\b` word boundaries.
    *    Replayable by RE2-class engines (the q51 DuckDB oracle), but
    *    digits/underscores count as word characters, so "covid" is
    *    NOT tagged inside "covid19".
    *  - `letterBoundaries = true`: the reference's rule
    *    (NewsMarkProcess.scala:181 — lookbehind/lookahead on
    *    non-LETTERS, with the `'s`/`` `s ``/`‘s` possessive
    *    alternatives, which are subsumed by "next char is a
    *    non-letter"). Digits and underscores are boundaries, so
    *    "covid19" tags "covid" — jsoup-tagger-faithful, but not
    *    expressible in RE2 (lookbehind), hence not the oracle mode.
    *    Zero-width lookarounds also never consume the boundary
    *    character, so adjacent keywords both tag.
    * Deliberate divergence in both modes: the reference emits
    * `<i ...> w </i>` with spaces padding the keyword (an artifact of
    * its string-splicing); we emit the keyword unpadded.
    */
  def tagEntities(text: Column, keywords: Seq[String],
      letterBoundaries: Boolean = false): Column = {
    require(keywords.nonEmpty, "empty entity dictionary")
    val alternation = keywords.distinct
      .sortBy(k => (-k.length, k))
      .map(java.util.regex.Pattern.quote)
      .mkString("|")
    val pattern =
      if (letterBoundaries) s"(?<!\\p{L})($alternation)(?!\\p{L})"
      else s"\\b($alternation)\\b"
    regexp_replace(text, pattern, s"$entityOpen$$1$entityClose")
  }

  /** Count of tagged entities in already-tagged text. */
  def entityCount(tagged: Column): Column =
    size(regexp_extract_all(tagged,
      lit(java.util.regex.Pattern.quote(entityOpen)), lit(0)))
}
