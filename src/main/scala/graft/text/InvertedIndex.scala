package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional inverted index + exact phrase search — the retrieval
  * primitive under the ranking surface (TF-IDF q34, BM25 q140, RRF
  * q172 rank; THIS answers "which documents contain the phrase,
  * verbatim, and how often"). The index is built once
  * (token-keyed postings, the artifact a 100 TB corpus stores
  * bucketed by token); a phrase query is |phrase|−1 equi-joins of
  * posting lists on (doc, adjacent position) — work proportional to
  * the matched terms' posting lists, never to the corpus.
  */
object InvertedIndex {

  /** Positional postings: one row per token occurrence,
    * (idCol, token, pos) with 1-based positions. The build is a
    * single scan + posexplode; at scale this is the table you
    * bucket by token ([[graft.io.Bucketing]]) so phrase joins
    * co-locate.
    */
  def postings(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol),
        posexplode(TextFunctions.tokens(col(textCol)))
          .as(Seq("__p0", "token")))
      .select(col(idCol), col("token"),
        (col("__p0") + 1).cast("long").as("pos"))

  /** Exact phrase hits per document: joins the i-th term's postings
    * at position `p + i` — each join is an equi-join on
    * (doc, position), so only documents containing every term in
    * adjacent order survive. Returns (idCol, n_hits ≥ 1).
    */
  def phraseHits(post: DataFrame, idCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val first = post.filter(col("token") === phrase.head)
      .select(col(idCol), col("pos"))
    val matched = phrase.zipWithIndex.tail.foldLeft(first) {
      case (acc, (term, i)) =>
        acc.join(post.filter(col("token") === term)
            .select(col(idCol), (col("pos") - i).as("pos")),
          Seq(idCol, "pos"))
    }
    matched.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
      .orderBy(col(idCol))
  }
}
