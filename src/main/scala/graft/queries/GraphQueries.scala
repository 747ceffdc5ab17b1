package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.TextRank
import graft.io.Tables.table
import graft.text.TextFunctions

/** TextRank surface (SURVEY.md M5). The fixed-iteration PageRank is
  * plain join+aggregate algebra, so the oracle replays it exactly as
  * unrolled SQL CTEs — one CTE per iteration.
  */
object GraphQueries extends QueryPack {

  private val Iters = 10

  private def toks = TextFunctions.tokens(col("text"))

  /** q66/q67 both need the corpus-level PageRank over the same
    * co-occurrence graph — memoized per sfDir (same pattern as
    * MlQueries.fittedLda) so the 10-iteration power loop runs once
    * per Verify/Bench run instead of twice. The cached DataFrame is
    * already persisted by [[TextRank.pagerank]].
    */
  private val scoresCache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def corpusScores(s: SparkSession, dir: String): DataFrame =
    scoresCache.computeIfAbsent(Memo.key(s, dir), _ =>
      TextRank.wordScores(
        table(s, dir, "documents").select(toks.as("toks")), "toks", Iters))

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Corpus-level PageRank word scores over the co-occurrence graph.
    "q66_textrank_scores" -> ((s, dir) => {
      corpusScores(s, dir).orderBy(col("word"))
    }),

    // Top-3 phrases per doc by summed node scores.
    "q67_textrank_phrases" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      val scores = corpusScores(s, dir)
      TextRank.topPhrases(
        docs.filter(col("doc_id") < 100)
          .select(col("doc_id"), toks.as("toks")),
        "doc_id", "toks", scores, k = 3)
        .orderBy(col("doc_id"), col("score").desc, col("phrase"))
    })
  )

  /** Shared graph CTEs + `Iters` unrolled power-iteration CTEs. */
  private def pagerankCtes: String = {
    val base =
      """t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        |pairs AS (
        |  SELECT unnest(tk[1:len(tk)-1]) AS a, unnest(tk[2:len(tk)]) AS b
        |  FROM t),
        |edges AS (
        |  SELECT DISTINCT a, b FROM (
        |    SELECT a, b FROM pairs WHERE a <> b
        |    UNION ALL
        |    SELECT b AS a, a AS b FROM pairs WHERE a <> b)),
        |outdeg AS (SELECT a, count(*) AS deg FROM edges GROUP BY a),
        |nn AS (SELECT count(*) AS n FROM outdeg),
        |p0 AS (SELECT a AS word, 1.0 / (SELECT n FROM nn) AS score
        |       FROM outdeg)""".stripMargin
    val iters = (1 to Iters).map { k =>
      s"""p$k AS (
         |  SELECT e.b AS word,
         |         0.15 / (SELECT n FROM nn)
         |           + 0.85 * sum(p${k - 1}.score / d.deg) AS score
         |  FROM edges e
         |  JOIN p${k - 1} ON p${k - 1}.word = e.a
         |  JOIN outdeg d ON d.a = e.a
         |  GROUP BY e.b)""".stripMargin
    }
    (base +: iters).mkString(",\n")
  }

  def oracles: Map[String, String] = Map(
    "q66_textrank_scores" ->
      s"""WITH $pagerankCtes
         |SELECT word, round(score, 4) AS score
         |FROM p$Iters ORDER BY word""".stripMargin,
    "q67_textrank_phrases" ->
      s"""WITH $pagerankCtes,
         |scores AS (SELECT word, round(score, 4) AS score FROM p$Iters),
         |ph AS (
         |  SELECT DISTINCT doc_id, a || ' ' || b AS phrase, a, b
         |  FROM (SELECT doc_id, unnest(tk[1:len(tk)-1]) AS a,
         |               unnest(tk[2:len(tk)]) AS b
         |        FROM t WHERE doc_id < 100)
         |  WHERE a <> b),
         |scored AS (
         |  SELECT ph.doc_id, ph.phrase,
         |         round(sa.score + sb.score, 4) AS score
         |  FROM ph JOIN scores sa ON ph.a = sa.word
         |          JOIN scores sb ON ph.b = sb.word),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY score DESC, phrase) AS rn
         |  FROM scored)
         |SELECT doc_id, phrase, score FROM ranked WHERE rn <= 3
         |ORDER BY doc_id, score DESC, phrase""".stripMargin
  )
}
