package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus-wide rank normalization without a corpus-wide window —
  * the third instance of the banded-prefix pattern (q126 sums,
  * q130 offsets, here COUNTS): for integer (fixed-point) scores,
  * the value histogram is bounded by the score DOMAIN (e4 scores →
  * ≤ 10⁴ rows), so the strict-below prefix sum runs a window over
  * HISTOGRAM rows only and each corpus row re-attaches its bucket's
  * rank by broadcast join. The corpus pays one map-side-combined
  * histogram shuffle and a map-side attach; the single-task corpus
  * sort a naive `percent_rank()` window would plan never appears.
  */
object Ranks {

  /** Appends `outCol` = ⌊10⁶ · (rows strictly below) / N⌋ for
    * `valueCol` (an integer fixed-point score). Ties share a rank
    * (the fraction-strictly-below convention); the column is an
    * exact integer, so downstream ensembles are partition-order
    * independent and SQL-replayable. The histogram persists (it is
    * read by both the prefix window and the N total) — bounded by
    * the score domain, small by construction.
    */
  def pctRankBanded(df: DataFrame, valueCol: String,
      outCol: String): DataFrame = {
    val hist = df.groupBy(col(valueCol)).agg(count(lit(1)).as("__c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    hist.count()
    val w = Window.orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pct = hist
      .withColumn("__below", coalesce(sum(col("__c")).over(w), lit(0L)))
      .crossJoin(broadcast(hist.agg(sum(col("__c")).as("__n"))))
      .select(col(valueCol),
        floor(lit(1e6) * col("__below") / col("__n")).cast("long")
          .as(outCol))
    CacheRelease.afterFirstUse(df.join(broadcast(pct), valueCol), hist)
  }
}
