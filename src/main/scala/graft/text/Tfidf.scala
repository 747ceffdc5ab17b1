package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DataFrame-native TF-IDF (SURVEY.md M3; reference TFIDF.scala:21-162
  * hand-rolls this over RDD reduceByKey with an 80M-bucket HashingTF).
  *
  * We keep exact terms (no hash buckets → no collisions, verifiable
  * against an oracle) and express the whole computation as two
  * aggregations + a broadcast-size join:
  *
  *   tf(d,t)  = count of t in d             (shuffle on (doc,term))
  *   df(t)    = docs containing t           (re-aggregate of tf)
  *   idf(t)   = ln((N+1)/(df+1))            (reference's smoothing)
  *   score    = tf * idf
  *
  * At 100 TB the (doc,term) aggregation is the dominant shuffle and
  * is unavoidable for exact TF; partial (map-side) aggregation keeps
  * it near-minimal because term frequency within a partition is
  * already combined. df(t) aggregates the *already reduced* tf rows,
  * not raw tokens.
  */
object Tfidf {

  /** Per-(doc,term) TF-IDF scores.
    * @param docs   (idCol, tokensCol) — tokens as array<string>
    */
  def scores(docs: DataFrame, idCol: String, tokensCol: String,
      roundTo: Int = 4): DataFrame = {
    val n = docs.select(countDistinct(col(idCol))).first().getLong(0)
    val tf = docs
      .select(col(idCol), explode(col(tokensCol)).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    tf.join(df, "term")
      .withColumn("idf",
        log((lit(n) + 1.0) / (col("df") + 1.0)))
      .withColumn("tfidf", round(col("tf") * col("idf"), roundTo))
      .select(col(idCol), col("term"), col("tf"), col("df"),
        round(col("idf"), roundTo).as("idf"), col("tfidf"))
  }

  /** Top-k terms per document by TF-IDF (reference's sorted tag
    * output, TFIDF.scala:139-162) — deterministic tiebreak on term.
    */
  def topTerms(docs: DataFrame, idCol: String, tokensCol: String,
      k: Int, roundTo: Int = 4): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    scores(docs, idCol, tokensCol, roundTo)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IDF-percentile threshold filter (TFIDF.scala:177-190): drop
    * terms whose idf is below the p-th percentile (too common).
    */
  def idfThreshold(scored: DataFrame, p: Double): Column =
    lit(scored.select(expr(s"percentile_approx(idf, $p)")).first().getDouble(0))
}
