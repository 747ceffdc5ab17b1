package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation extraction — which word PAIRS co-occur far beyond
  * chance (the "New York" / "machine learning" detector, the classic
  * first step of phrase mining). Each adjacent bigram (w1, w2) gets
  * the 2×2 contingency table against the corpus bigram stream
  *
  *   a = #(w1 w2)   b = #(w1 ·) − a
  *   c = #(· w2) − a   d = N − a − b − c
  *
  * and is scored by Pearson's χ² = N(ad−bc)² / ((a+b)(c+d)(a+c)(b+d))
  * — chosen over PMI/log-likelihood because it needs NO logarithm:
  * the whole score is one exact integer division of two products
  * (decimal-widened; (ad−bc)² alone reaches ~1e26 on a 3M-bigram
  * corpus, far past a long), so the ranking replays bit-for-bit in
  * SQL where a float-log score could drift in the last ulp.
  *
  * Scale shape: one Generate over the token arrays, three bounded
  * aggregates (bigram counts, first-position and second-position
  * marginals — vocabulary-sized, attached by equi-joins that AQE
  * broadcasts), a 1-row N broadcast, and an ordered limit. The
  * min-count floor prunes the hapax tail before scoring.
  */
object Collocations {

  def topByChi2(docs: DataFrame, textCol: String,
      minCount: Int, k: Int): DataFrame = {
    val bg = docs
      .select(TextFunctions.tokens(col(textCol)).as("__t"))
      // guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) — a 1-token
      // doc would emit two bogus bigrams instead of none
      .filter(size(col("__t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(__t) - 1)," +
          " i -> struct(__t[i-1] AS w1, __t[i] AS w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val ab = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("a"))
      .filter(col("a") >= minCount)
    val n1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("n1"))
    val n2 = bg.groupBy(col("w2")).agg(count(lit(1)).as("n2"))
    val total = bg.agg(count(lit(1)).as("__N"))
    ab.join(n1, "w1").join(n2, "w2")
      .crossJoin(broadcast(total))
      .withColumn("b", col("n1") - col("a"))
      .withColumn("c", col("n2") - col("a"))
      .withColumn("d", col("__N") - col("n1") - col("n2") + col("a"))
      // a degenerate marginal (every bigram sharing w1's slot or
      // w2's) zeroes the denominator: emit NULL deliberately on
      // both engines (the aucE6 discipline), never a silent null
      // here and a division error in the replay
      .withColumn("chi2", expr(
        "CASE WHEN (a+b) = 0 OR (c+d) = 0 OR (a+c) = 0 OR (b+d) = 0" +
          " THEN NULL ELSE" +
          " cast(__N as decimal(38,0)) * cast(a*d - b*c as decimal(38,0))" +
          " * (a*d - b*c)" +
          " div (cast(a+b as decimal(38,0)) * (c+d) * (a+c) * (b+d)) END"))
      .select(col("w1"), col("w2"), col("a").as("n_ab"), col("chi2"))
      .orderBy(col("chi2").desc, col("w1"), col("w2"))
      .limit(k)
  }
}
