package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage — entity resolution over STRUCTURED records
  * (Fellegi & Sunter 1969): where the dedup family compares
  * document text, this compares field tuples (name / account /
  * category) with per-field agreement weights and classifies pairs
  * match / possible / non-match. The classic use: the same customer
  * re-registered under a new key, or two feeds of the same entity
  * catalog.
  *
  * Weights are INTEGERS by contract (log-likelihood ratios scaled
  * and rounded offline, the way production linkage tables ship), so
  * scoring is exact integer arithmetic and replays in any engine.
  *
  * Scale shape: [[blockPairs]] is an equi-self-join on the blocking
  * key — pairs never exceed Σ_block |block|², the knob the caller
  * owns (compose with sorted-neighborhood or LSH blocking when
  * equality blocks skew); [[fsClassify]] is a per-row projection.
  * Record fields shuffle once, keyed by block.
  */
object Linkage {

  /** Within-block candidate pairs: every record column `c` appears
    * twice as `c_a` / `c_b`, ids ordered `id_a < id_b`. Blocking
    * columns must agree exactly — the recall contract is the
    * caller's blocking choice.
    */
  def blockPairs(recs: DataFrame, idCol: String,
      blockCols: Seq[String]): DataFrame = {
    val others = recs.columns.filterNot(blockCols.contains).toSeq
    def side(sfx: String) = recs.select(
      blockCols.map(col) ++ others.map(c => col(c).as(s"$c$sfx")): _*)
    side("_a").join(side("_b"), blockCols)
      .filter(col(s"${idCol}_a") < col(s"${idCol}_b"))
      .withColumnRenamed(s"${idCol}_a", "id_a")
      .withColumnRenamed(s"${idCol}_b", "id_b")
  }

  /** Fellegi–Sunter scoring: each term is (agreement predicate,
    * weight if it holds, weight if it doesn't); `score` is the
    * exact integer sum, `cls` reads the two thresholds, and pairs
    * below `possibleMin` drop (the non-match mass — at corpus scale
    * the overwhelming majority — never leaves the projection).
    */
  def fsClassify(pairs: DataFrame,
      terms: Seq[(Column, Int, Int)],
      matchMin: Int, possibleMin: Int): DataFrame = {
    val score = terms.map { case (p, wa, wd) =>
      when(p, lit(wa.toLong)).otherwise(lit(wd.toLong))
    }.reduce(_ + _)
    pairs.withColumn("score", score)
      .filter(col("score") >= possibleMin)
      .withColumn("cls",
        when(col("score") >= matchMin, "match").otherwise("possible"))
  }
}
