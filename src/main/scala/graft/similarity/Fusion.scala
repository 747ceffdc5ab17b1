package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for hybrid retrieval — combining a sparse (BM25) and
  * a dense (embedding-cosine) candidate list is the standard shape
  * of a modern retrieval stage, and reciprocal-rank fusion
  * (Cormack/Clarke/Buettcher's RRF) is the robust parameter-free way
  * to do it: score(d) = Σ_lists 1/(k + rank_list(d)), k=60.
  *
  * Determinism: the RRF term is computed in INTEGER space —
  * `1e9 div (k + rank)` — so fused scores are exact longs; ranks
  * come from `row_number` over a TOTAL order (score desc, id), so
  * any engine replays the whole fusion bit-for-bit.
  *
  * Scale contract: ranking is a global `row_number` — correct ONLY
  * because retrieval lists are bounded by construction (a per-query
  * candidate set from the ANN/BM25 stages, thousands of rows, not a
  * corpus). Feeding an unbounded corpus through `rankByScore` would
  * single-partition the sort; the operators upstream (bm25TopK,
  * cosineTopK, ivfTopK) exist to bound it first.
  */
object Fusion {

  /** Attach a dense 1-based `rank` by (score desc, id asc). */
  def rankByScore(scored: DataFrame, idCol: String,
      scoreCol: String): DataFrame =
    scored.withColumn("rank",
      row_number().over(
        Window.orderBy(col(scoreCol).desc, col(idCol))))

  /** Reciprocal-rank-fuse two ranked lists (each: idCol + "rank").
    * Docs present in only one list contribute that list's term alone
    * (the standard convention). Output: id, rank in each list
    * (null where absent), integer fused score; top `topN`.
    */
  def rrf(a: DataFrame, b: DataFrame, idCol: String,
      k: Int = 60, topN: Int = 20): DataFrame = {
    def side(df: DataFrame, as: String): DataFrame =
      df.select(col(idCol), col("rank").cast("int").as(as))
    side(a, "rank_a")
      .join(side(b, "rank_b"), Seq(idCol), "full_outer")
      .withColumn("rrf_e9",
        coalesce(expr(s"1000000000 div ($k + rank_a)"), lit(0L)) +
          coalesce(expr(s"1000000000 div ($k + rank_b)"), lit(0L)))
      .orderBy(col("rrf_e9").desc, col(idCol))
      .limit(topN)
  }
}
