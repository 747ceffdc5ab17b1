package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables.table
import graft.ops.{Scored, TopKAggregator}
import graft.text.{Pos, TextFunctions}

/** Nested-struct, POS-extraction and custom-aggregate surface
  * (SURVEY.md P2/P3, M8, §2.10 UDAF).
  */
object StructQueries extends QueryPack {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P2 dotted-path projection + P3 nested-field drop (reference
    // DataFrameUtils.scala:22-74 rebuilds structs by hand;
    // dropFields is the first-class form).
    "q73_nested_struct" -> ((s, dir) => {
      table(s, dir, "customer")
        .filter(col("c_custkey") <= 200)
        .withColumn("profile", struct(
          struct(col("c_nationkey").as("nation")).as("geo"),
          col("c_mktsegment").as("seg"),
          round(col("c_acctbal"), 2).as("acct")))
        .select(
          col("c_custkey"),
          col("profile.geo.nation").as("nation"),
          to_json(col("profile").dropFields("acct")).as("slim_json"))
        .orderBy(col("c_custkey"))
    }),

    // M8: POS-filtered unigrams (suffix-heuristic tagger).
    "q74_pos_tokens" -> ((s, dir) => {
      val toks = TextFunctions.tokens(col("text"))
      table(s, dir, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          array_join(Pos.filteredTokens(toks), ",").as("kept"),
          size(Pos.filteredTokens(toks)).as("n_kept"))
        .orderBy(col("doc_id"))
    }),

    // M8: pattern-filtered bigram histogram over the corpus.
    "q75_pos_bigrams" -> ((s, dir) => {
      val toks = TextFunctions.tokens(col("text"))
      table(s, dir, "documents")
        .select(explode(Pos.patternBigramsFast(toks)).as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 30)
        .orderBy(col("bigram"))
    }),

    // §2.10 UDAF: distributed top-3 sources per lang by doc count
    // via the bounded-buffer Aggregator (map-side partial top-k).
    "q76_topk_aggregator" -> ((s, dir) => {
      // udaf() flattens the case-class input: one arg per field
      val topk = udaf(new TopKAggregator(3))
      table(s, dir, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).cast("double").as("cnt"))
        .groupBy(col("lang"))
        .agg(topk(col("source"), col("cnt")).as("top"))
        .select(col("lang"), explode(col("top")).as("e"))
        .select(col("lang"), col("e.label").as("source"),
          col("e.score").cast("long").as("n_docs"))
        .orderBy(col("lang"), col("n_docs").desc, col("source"))
    })
  )

  private val posCase =
    """CASE
      |  WHEN t IN ('the','a','an','of','and','to','in','is','it','for',
      |             'on','with','as','at','by','this','that') THEN 'OT'
      |  WHEN t LIKE '%ly' THEN 'RB'
      |  WHEN t LIKE '%ing' OR t LIKE '%ed' THEN 'VB'
      |  WHEN t LIKE '%ous' OR t LIKE '%ful' OR t LIKE '%ive'
      |    OR t LIKE '%al' THEN 'JJ'
      |  ELSE 'NN' END""".stripMargin

  def oracles: Map[String, String] = Map(
    "q73_nested_struct" ->
      """SELECT c_custkey,
        |  c_nationkey AS nation,
        |  to_json({'geo': {'nation': c_nationkey},
        |           'seg': c_mktsegment}) AS slim_json
        |FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""".stripMargin,
    "q74_pos_tokens" -> {
      val tagOf = posCase
      s"""WITH t AS (
         |  SELECT doc_id, string_split(text, ' ') AS tk
         |  FROM documents WHERE doc_id < 100),
         |kept AS (
         |  SELECT doc_id, list_filter(tk,
         |    t -> ($tagOf) IN ('NN', 'JJ', 'VB')) AS kept
         |  FROM t)
         |SELECT doc_id, array_to_string(kept, ',') AS kept,
         |       cast(len(kept) as int) AS n_kept
         |FROM kept ORDER BY doc_id""".stripMargin
    },
    "q75_pos_bigrams" -> {
      // every reference to the token in posCase is space-delimited
      val tagA = posCase.replace(" t ", " a ")
      val tagB = posCase.replace(" t ", " b ")
      s"""WITH t AS (SELECT string_split(text, ' ') AS tk FROM documents),
         |pairs AS (
         |  SELECT unnest(tk[1:len(tk)-1]) AS a, unnest(tk[2:len(tk)]) AS b
         |  FROM t),
         |pat AS (
         |  SELECT a || ' ' || b AS bigram,
         |         ($tagA) || '-' || ($tagB) AS pp
         |  FROM pairs)
         |SELECT bigram, cast(count(*) as bigint) AS n
         |FROM pat WHERE pp IN ('NN-NN', 'VB-NN', 'NN-VB', 'JJ-NN')
         |GROUP BY bigram HAVING count(*) >= 30
         |ORDER BY bigram""".stripMargin
    },
    "q76_topk_aggregator" ->
      """WITH c AS (
        |  SELECT lang, source, count(*) AS n_docs
        |  FROM documents GROUP BY lang, source),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY lang
        |    ORDER BY n_docs DESC, source) AS rn
        |  FROM c)
        |SELECT lang, source, cast(n_docs as bigint) AS n_docs
        |FROM r WHERE rn <= 3
        |ORDER BY lang, n_docs DESC, source""".stripMargin
  )
}
