package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables.table
import graft.ops.{Labels, Relational}
import graft.text.{Html, TextFunctions}

/** Label/category ETL + HTML surface (SURVEY.md M2/M7/M16/M17, F3,
  * F13): html cleaning, entity tagging, longest-match filtering,
  * label-set combination, literal-map category lookup, confidence-
  * based corpus cleaning/relabeling, class balancing, sensitive-word
  * histograms, canonicalization chains.
  */
object NlpQueries extends QueryPack {

  /** Deterministic html wrapper so the cleaning query has real
    * markup to strip (the test tables carry plain text).
    */
  private def asHtml(text: org.apache.spark.sql.Column) =
    concat(lit("<html><body><h1>Title &amp; &quot;intro&quot;</h1><p>"),
      text, lit("</p><script>var x = 1 < 2;</script></body></html>"))

  private val entityDict = Seq("hash join", "row scan", "merge", "batch")
  private val sensitiveDict = Seq("hash", "scan", "merge", "batch", "value")

  private val regionGroups = Map(0 -> "alpha", 1 -> "beta", 2 -> "gamma")

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F13 html→text over built-in regexps (no UDF, stays in codegen).
    "q50_html_clean" -> ((s, dir) => {
      table(s, dir, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          Html.htmlToText(asHtml(col("text"))).as("clean"))
        .orderBy(col("doc_id"))
    }),

    // Entity tagger (NewsMarkProcess idiom) + tag count.
    "q51_entity_tag" -> ((s, dir) => {
      val tagged = Html.tagEntities(col("text"), entityDict)
      table(s, dir, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), tagged.as("tagged"),
          Html.entityCount(tagged).as("n_entities"))
        .orderBy(col("doc_id"))
    }),

    // F13 URL site extraction: root → IP filter → public-suffix
    // reduction (text.Urls, the reference's filterSLD(filterIP(
    // extractRoot())) pipeline). URLs are synthesized
    // deterministically from (doc_id, source) — .com subdomains,
    // multi-part .co.uk suffixes, deep subdomains, an IP host, a
    // non-URL, and an SLD differing from its subdomain — and the
    // oracle replays the fixture's suffix set with regexps.
    "q118_url_sites" -> ((s, dir) => {
      val m = pmod(col("doc_id"), lit(6))
      val url = when(m === 0, concat(lit("https://news."), col("source"),
          lit(".com/a/"), col("doc_id")))
        .when(m === 1, concat(lit("http://"), col("source"), lit(".co.uk/path")))
        .when(m === 2, concat(lit("https://sub.blog."), col("source"),
          lit(".org/x?q=1")))
        .when(m === 3, lit("http://192.168.0.1:8080/admin"))
        .when(m === 4, lit("not a url"))
        .otherwise(concat(lit("https://"), col("source"), lit(".example.net/y")))
      table(s, dir, "documents")
        .select(graft.text.Urls.site(url).as("site"))
        .groupBy(col("site")).agg(count(lit(1)).as("n"))
        .orderBy(col("site"))
    }),

    // M2 longest-match: unigrams∪bigrams, drop contained keywords.
    "q52_longest_match" -> ((s, dir) => {
      val toks = TextFunctions.tokens(col("text"))
      val kws = array_distinct(concat(toks, TextFunctions.ngramsFast(toks, 2)))
      table(s, dir, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          array_join(array_sort(Labels.longestMatch(kws)), ",").as("kept"),
          size(Labels.longestMatch(kws)).as("n_kept"))
        .orderBy(col("doc_id"))
    }),

    // M7 label combine: tf scores × position scores, full outer join
    // on (doc, term), missing side contributes 1, top-3 per doc.
    "q53_label_combine" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val a = docs.filter(col("doc_id") < 60)
        .select(col("doc_id"), explode(TextFunctions.tokens(col("text")))
          .as("term"))
        .groupBy("doc_id", "term")
        .agg(count(lit(1)).cast("double").as("score"))
      val b = docs.filter(col("doc_id") >= 40 && col("doc_id") < 100)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("toks"),
          explode(array_distinct(col("toks"))).as("term"))
        .select(col("doc_id"), col("term"),
          round(lit(1.0) / array_position(col("toks"), col("term")), 4)
            .as("score"))
      Labels.combine(a, b, "doc_id", "term", "score", k = 3)
        .orderBy(col("doc_id"), col("score").desc, col("term"))
    }),

    // M16 literal-map category lookup with default.
    "q54_category_map" -> ((s, dir) => {
      table(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"),
          Labels.mapLookup(col("n_regionkey"), regionGroups).as("region_group"))
        .orderBy(col("n_nationkey"))
    }),

    // M17 confidence cleaning over deterministic predict/proba.
    "q55_confidence_clean" -> ((s, dir) => {
      val scored = table(s, dir, "embeddings")
        .withColumn("predict", ((col("vec_id") * 7 + 3) % 10).cast("int"))
        .withColumn("proba",
          ((col("vec_id") * 2654435761L) % 1000L).cast("double") / 1000.0)
      Labels.confidenceClean(scored, "label", "predict", "proba",
        lowT = 0.3, highT = 0.7)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("label"))
    }),

    // M17 relabel variant: adopt confident disagreements.
    "q56_confidence_relabel" -> ((s, dir) => {
      val scored = table(s, dir, "embeddings")
        .withColumn("predict", ((col("vec_id") * 7 + 3) % 10).cast("int"))
        .withColumn("proba",
          ((col("vec_id") * 2654435761L) % 1000L).cast("double") / 1000.0)
      Labels.confidenceRelabel(scored, "label", "predict", "proba", highT = 0.7)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("label"))
    }),

    // M18 class balancing: ≤30 docs per lang, deterministic keep set.
    "q57_class_balance" -> ((s, dir) => {
      Relational.classBalance(table(s, dir, "documents"), "lang",
        cap = 30, tiebreak = Seq(col("doc_id")))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), max(col("doc_id")).as("max_kept_id"))
        .orderBy(col("lang"))
    }),

    // M10 sensitive-word corpus histogram: docs containing + total hits.
    "q58_sensitive_words" -> ((s, dir) => {
      val toks = TextFunctions.tokens(col("text"))
      table(s, dir, "documents")
        .select(col("doc_id"), explode(toks).as("term"))
        .filter(col("term").isin(sensitiveDict: _*))
        .groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_hits"))
        .orderBy(col("term"))
    }),

    // F3 canonicalization chain over the source column.
    "q59_canonicalize" -> ((s, dir) => {
      table(s, dir, "documents")
        .select(Labels.canonicalize(col("source"),
          Seq("src1" -> "alpha1", "src" -> "feed_")).as("canonical"))
        .groupBy(col("canonical"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("canonical"))
    })
  )

  private val predictProba =
    """scored AS (
      |  SELECT label, (vec_id * 7 + 3) % 10 AS predict,
      |         ((vec_id * 2654435761) % 1000) / 1000.0 AS proba
      |  FROM embeddings)""".stripMargin

  def oracles: Map[String, String] = Map(
    "q50_html_clean" ->
      """SELECT doc_id,
        |  trim(regexp_replace(
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(
        |            regexp_replace(
        |              regexp_replace(
        |                regexp_replace(
        |                  '<html><body><h1>Title &amp; &quot;intro&quot;</h1><p>'
        |                    || text ||
        |                    '</p><script>var x = 1 < 2;</script></body></html>',
        |                  '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
        |                '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
        |              '<[^>]+>', ' ', 'g'),
        |            '&lt;', '<', 'g'),
        |          '&gt;', '>', 'g'),
        |        '&quot;', '"', 'g'),
        |      '&amp;', '&', 'g'),
        |    '\s+', ' ', 'g'))
        |  AS clean
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin,
        // &#39;/&nbsp; unescape steps are omitted from the oracle:
        // the fixture html contains neither entity.
    "q118_url_sites" ->
      """WITH u AS (
        |  SELECT CASE doc_id % 6
        |    WHEN 0 THEN 'https://news.' || source || '.com/a/'
        |                || CAST(doc_id AS VARCHAR)
        |    WHEN 1 THEN 'http://' || source || '.co.uk/path'
        |    WHEN 2 THEN 'https://sub.blog.' || source || '.org/x?q=1'
        |    WHEN 3 THEN 'http://192.168.0.1:8080/admin'
        |    WHEN 4 THEN 'not a url'
        |    ELSE 'https://' || source || '.example.net/y' END AS url
        |  FROM documents),
        |r AS (SELECT regexp_extract(url, '^https?://[^/?#]+') AS root FROM u),
        |f AS (SELECT CASE WHEN regexp_matches(root,
        |        '^https?://([0-9]{1,3}\.){3}[0-9]{1,3}(:[0-9]{1,4})?$')
        |        THEN '' ELSE root END AS root
        |      FROM r),
        |h AS (SELECT root, string_split(
        |        regexp_replace(root, '^https?://', ''), '.') AS p
        |      FROM f),
        |s AS (SELECT CASE WHEN root = '' THEN ''
        |        WHEN root LIKE '%.co.uk' THEN
        |          regexp_extract(root, '^(https?:)', 1) || '//'
        |            || array_to_string(p[-3:], '.')
        |        ELSE regexp_extract(root, '^(https?:)', 1) || '//'
        |            || array_to_string(p[-2:], '.') END AS site
        |      FROM h)
        |SELECT site, cast(count(*) as bigint) AS n
        |FROM s GROUP BY site ORDER BY site""".stripMargin,
    "q51_entity_tag" ->
      """SELECT doc_id,
        |  regexp_replace(text, '\b(hash join|row scan|merge|batch)\b',
        |    '<i class="graft-entity-words">\1</i>', 'g') AS tagged,
        |  cast(len(regexp_extract_all(
        |    regexp_replace(text, '\b(hash join|row scan|merge|batch)\b',
        |      '<i class="graft-entity-words">\1</i>', 'g'),
        |    '<i class="graft-entity-words">')) as int) AS n_entities
        |FROM documents WHERE doc_id < 50 ORDER BY doc_id""".stripMargin,
    "q52_longest_match" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk
        |  FROM documents WHERE doc_id < 100),
        |arr AS (
        |  SELECT doc_id, list_distinct(
        |    tk || list_transform(range(1, len(tk)),
        |                         i -> tk[i] || ' ' || tk[i+1])) AS kw
        |  FROM t),
        |kept AS (
        |  SELECT doc_id, list_sort(list_filter(kw,
        |    x -> len(list_filter(kw, y -> y <> x AND contains(y, x))) = 0))
        |    AS kept
        |  FROM arr)
        |SELECT doc_id, array_to_string(kept, ',') AS kept,
        |       cast(len(kept) as int) AS n_kept
        |FROM kept ORDER BY doc_id""".stripMargin,
    "q53_label_combine" ->
      """WITH ta AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents WHERE doc_id < 60),
        |a AS (
        |  SELECT doc_id, term, cast(count(*) as double) AS sa
        |  FROM ta GROUP BY doc_id, term),
        |tb AS (
        |  SELECT doc_id, string_split(text, ' ') AS tk
        |  FROM documents WHERE doc_id >= 40 AND doc_id < 100),
        |b AS (
        |  SELECT tb.doc_id, u.term,
        |         round(1.0 / list_position(tb.tk, u.term), 4) AS sb
        |  FROM tb, UNNEST(list_distinct(tb.tk)) AS u(term)),
        |joined AS (
        |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
        |         coalesce(a.term, b.term) AS term,
        |         round(coalesce(a.sa, 1.0) * coalesce(b.sb, 1.0), 4) AS score
        |  FROM a FULL OUTER JOIN b
        |    ON a.doc_id = b.doc_id AND a.term = b.term),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, term) AS rn
        |  FROM joined)
        |SELECT doc_id, term, score FROM ranked WHERE rn <= 3
        |ORDER BY doc_id, score DESC, term""".stripMargin,
    "q54_category_map" ->
      """SELECT n_nationkey, n_name,
        |  CASE n_regionkey WHEN 0 THEN 'alpha' WHEN 1 THEN 'beta'
        |       WHEN 2 THEN 'gamma' ELSE 'unknown' END AS region_group
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q55_confidence_clean" ->
      s"""WITH $predictProba
         |SELECT label, cast(count(*) as bigint) AS n
         |FROM scored
         |WHERE NOT ((predict = label AND proba < 0.3)
         |        OR (predict <> label AND proba > 0.7))
         |GROUP BY label ORDER BY label""".stripMargin,
    "q56_confidence_relabel" ->
      s"""WITH $predictProba
         |SELECT CASE WHEN predict <> label AND proba > 0.7
         |            THEN predict ELSE label END AS label,
         |       cast(count(*) as bigint) AS n
         |FROM scored GROUP BY 1 ORDER BY label""".stripMargin,
    "q57_class_balance" ->
      """WITH ranked AS (
        |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
        |    ORDER BY doc_id) AS rn
        |  FROM documents)
        |SELECT lang, cast(count(*) as bigint) AS n,
        |       max(doc_id) AS max_kept_id
        |FROM ranked WHERE rn <= 30
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q58_sensitive_words" ->
      """SELECT term, cast(count(DISTINCT doc_id) as bigint) AS n_docs,
        |       cast(count(*) as bigint) AS n_hits
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |      FROM documents)
        |WHERE term IN ('hash', 'scan', 'merge', 'batch', 'value')
        |GROUP BY term ORDER BY term""".stripMargin,
    "q59_canonicalize" ->
      """SELECT replace(replace(lower(trim(source)), 'src1', 'alpha1'),
        |               'src', 'feed_') AS canonical,
        |       cast(count(*) as bigint) AS n
        |FROM documents GROUP BY 1 ORDER BY canonical""".stripMargin
  )
}
