package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise association-rule mining (the A-Priori k=2 workhorse):
  * support, confidence and lift for item pairs over baskets — the
  * "customers who bought X also bought Y" analytics q181's triangle
  * structure sits on top of. All metrics are EXACT e6 fixed-point
  * integers (`n_ab·1e6 div n_a`; `n_ab·N·1e6 div (n_a·n_b)`), so
  * the rule table hash-compares against a SQL replay.
  *
  * Scale shape: baskets reduce to DISTINCT (basket, item) pairs
  * first (multiplicity inside one basket is not co-occurrence), the
  * pair generation is a basket-keyed self-join (each basket only
  * meets itself — never a global cross product; basket size bounds
  * the fan-out), and supports attach by two broadcast-able item
  * joins. The support floor prunes the rule stream before the
  * top-k, which is an ordered limit (`TakeOrderedAndProject`),
  * never a global sort.
  */
object Associations {

  /** Top-k two-item rules a→b (both directions of each pair) with
    * support ≥ minSupport baskets, ranked by lift. Output:
    * (ante, cons, n_ab, n_a, n_b, conf_e6, lift_e6).
    */
  def pairRules(baskets: DataFrame, basketCol: String, itemCol: String,
      minSupport: Int, k: Int): DataFrame = {
    val bi = baskets
      .select(col(basketCol).as("__bk"), col(itemCol).cast("long").as("__it"))
      .distinct()
    val n = bi.select(col("__bk")).distinct()
      .agg(count(lit(1)).as("__n"))
    val itemCounts = bi.groupBy(col("__it"))
      .agg(count(lit(1)).as("__supp"))
    val pairs = bi.join(bi.select(col("__bk"), col("__it").as("__it2")),
        "__bk")
      .filter(col("__it") < col("__it2"))
      .select(col("__it").as("a"), col("__it2").as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minSupport)
    // both rule directions of each surviving pair
    val directed = pairs.select(col("a").as("ante"), col("b").as("cons"),
        col("n_ab"))
      .unionByName(pairs.select(col("b").as("ante"), col("a").as("cons"),
        col("n_ab")))
    directed
      .join(itemCounts.select(col("__it").as("ante"),
        col("__supp").as("n_a")), "ante")
      .join(itemCounts.select(col("__it").as("cons"),
        col("__supp").as("n_b")), "cons")
      .crossJoin(broadcast(n))
      .withColumn("conf_e6", expr("n_ab * 1000000 div n_a"))
      // the lift numerator n_ab·N·1e6 overflows a long once basket
      // and pair counts reach real-corpus scale (n_ab=2M, N=5M →
      // 1e19 > Long.MaxValue: Spark wraps silently, the oracle
      // engine errors) — widen to decimal for the product, `div`
      // still returns an exact long
      .withColumn("lift_e6", expr(
        "cast(n_ab as decimal(38,0)) * __n * 1000000" +
          " div (cast(n_a as decimal(38,0)) * n_b)"))
      .select(col("ante"), col("cons"), col("n_ab"), col("n_a"),
        col("n_b"), col("conf_e6"), col("lift_e6"))
      .orderBy(col("lift_e6").desc, col("conf_e6").desc,
        col("ante"), col("cons"))
      .limit(k)
  }
}
