package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Label/category ETL operators (SURVEY.md M2/M7/M16/M17 and the
  * canonicalization chains of §2.7 F3).
  *
  * These replace the reference's per-row `.replace(...)` chains and
  * hand-cloned per-category jobs with single declarative expressions:
  * a literal-map lookup plans as a broadcast-free local expression,
  * and the corpus-cleaning filters are pure Catalyst predicates that
  * push down to the scan.
  */
object Labels {

  /** Code → name mapping via a literal map (M16; reference keeps
    * 33-entry `categoryMap` in NewsSubCategoryPredict.scala:20-55).
    * A literal map is evaluated per-row without any join or
    * broadcast — right for O(100)-entry dimension maps.
    */
  def mapLookup(code: Column, mapping: Map[Int, String],
      default: String = "unknown"): Column = {
    val m = typedlit(mapping)
    coalesce(element_at(m, code.cast("int")), lit(default))
  }

  /** Canonicalization chain (F3: lowercase, trim, then ordered
    * find→replace pairs — the reference's `.replace` chains,
    * NewsFebruarySubCategoryTrainProcess.scala:211-222).
    */
  def canonicalize(raw: Column, replacements: Seq[(String, String)]): Column =
    replacements.foldLeft(lower(trim(raw))) { case (c, (from, to)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(from), to)
    }

  /** Longest-match keyword filter (M2, NewsNgrams.scala:34-41):
    * drop any keyword strictly contained in another keyword of the
    * same array. Pure higher-order function — no shuffle.
    */
  def longestMatch(keywords: Column): Column = {
    val distinctKw = array_distinct(keywords)
    filter(distinctKw, x =>
      !exists(distinctKw, y => y =!= x && y.contains(x)))
  }

  /** Label-set combination (M7, LabelCombine.scala:18-106): full
    * outer join of two (id, label, score) tables, coalesced keys,
    * combined score = product of present scores (missing side
    * contributes 1), top-k per id.
    */
  def combine(a: DataFrame, b: DataFrame, idCol: String, labelCol: String,
      scoreCol: String, k: Int): DataFrame = {
    val l = a.select(col(idCol).as("ida"), col(labelCol).as("la"),
      col(scoreCol).as("sa"))
    val r = b.select(col(idCol).as("idb"), col(labelCol).as("lb"),
      col(scoreCol).as("sb"))
    val joined = l.join(r,
      col("ida") === col("idb") && col("la") === col("lb"), "full")
      .select(
        coalesce(col("ida"), col("idb")).as(idCol),
        coalesce(col("la"), col("lb")).as(labelCol),
        round(coalesce(col("sa"), lit(1.0)) *
          coalesce(col("sb"), lit(1.0)), 4).as("score"))
    Relational.topKPerGroup(joined, Seq(col(idCol)),
      Seq(col("score").desc, col(labelCol)), k)
  }

  /** Model-confidence corpus cleaning (M17,
    * NewsSubCategoryTrainCheck.scala:102-331): drop rows the model
    * agrees with only weakly (predict==label, proba<lowT — probably
    * mislabeled easy cases) or disagrees with confidently
    * (predict!=label, proba>highT — probably wrong gold label).
    */
  def confidenceClean(df: DataFrame, labelCol: String, predictCol: String,
      probaCol: String, lowT: Double, highT: Double): DataFrame =
    df.filter(!(
      (col(predictCol) === col(labelCol) && col(probaCol) < lowT) ||
        (col(predictCol) =!= col(labelCol) && col(probaCol) > highT)))

  /** High-confidence relabel variant of M17: where the model
    * disagrees above `highT`, adopt the prediction.
    */
  def confidenceRelabel(df: DataFrame, labelCol: String, predictCol: String,
      probaCol: String, highT: Double): DataFrame =
    df.withColumn(labelCol,
      when(col(predictCol) =!= col(labelCol) && col(probaCol) > highT,
        col(predictCol)).otherwise(col(labelCol)))
}
