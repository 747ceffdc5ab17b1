package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables.table

/** Analytic/relational widening: lag/lead offset windows, GROUPING
  * SETS (the non-hierarchical form rollup/cube can't express), and
  * unpivot (wide→long reshaping). All three are single-shuffle plans
  * Spark provides natively — the value here is the verified surface.
  */
object AnalyticQueries extends QueryPack {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Offset windows: previous/next order price per customer, delta
    // to previous. Ordered by the unique order key so offsets are
    // deterministic.
    "q81_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      table(s, dir, "orders")
        .filter(col("o_custkey") < 300)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
        .withColumn("delta",
          round(col("o_totalprice") - coalesce(col("prev_price"), lit(0.0)), 2))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // GROUPING SETS ((status, priority), (priority), ()) — the
    // middle set is not a rollup prefix, so q13's rollup can't
    // express it.
    "q82_grouping_sets" -> ((s, dir) => {
      table(s, dir, "orders")
        .groupingSets(
          Seq(Seq(col("o_orderstatus"), col("o_orderpriority")),
            Seq(col("o_orderpriority")),
            Seq()),
          col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,4)")).cast("double")
            .as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // Ranking-function family over a deterministic (unique-key)
    // order: ntile buckets, percent_rank, cume_dist.
    "q84_rank_funcs" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
      table(s, dir, "orders")
        .filter(col("o_custkey") < 100)
        .select(col("o_orderpriority"), col("o_orderkey"))
        .withColumn("tile", ntile(4).over(w))
        .withColumn("pct_rank", round(percent_rank().over(w), 6))
        .withColumn("cume", round(cume_dist().over(w), 6))
        .orderBy(col("o_orderpriority"), col("o_orderkey"))
    }),

    // percentile_approx — the reference's actual sketch (SURVEY A5,
    // TFIDF.scala:177 idf thresholds). With accuracy ≥ n the GK
    // sketch's rank error drops below one row, so the result is the
    // exact discrete quantile and the oracle can check it with
    // quantile_disc — the sketch is verified, not just smoke-run. At
    // 100 TB the same call with the default accuracy (10k) is the
    // scale path: fixed-size state per group, single aggregation
    // pass, bounded rank error.
    "q85_approx_quantile" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile_approx(l_quantity, 0.5, 1000000)")
            .as("median_qty"),
          expr("percentile_approx(l_quantity, 0.9, 1000000)")
            .as("p90_qty"),
          expr("percentile_approx(l_extendedprice, 0.25, 1000000)")
            .as("p25_price"))
        .orderBy(col("l_returnflag"))
    }),

    // Unpivot wide metric columns to (key, metric, val) long form.
    "q83_unpivot" -> ((s, dir) => {
      table(s, dir, "part")
        .filter(col("p_partkey") < 500)
        .select(col("p_partkey"), col("p_retailprice"),
          col("p_size").cast("double").as("p_size"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_retailprice"), col("p_size")), "metric", "val")
        .orderBy(col("p_partkey"), col("metric"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q81_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  round(o_totalprice - coalesce(
        |    lag(o_totalprice, 1) OVER w, 0.0), 2) AS delta
        |FROM orders WHERE o_custkey < 300
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q82_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  cast(count(*) as bigint) AS n,
        |  cast(sum(cast(o_totalprice as decimal(18,4))) as double) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
        |                        (o_orderpriority), ())
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q84_rank_funcs" ->
      """SELECT o_orderpriority, o_orderkey,
        |  cast(ntile(4) OVER w as int) AS tile,
        |  round(percent_rank() OVER w, 6) AS pct_rank,
        |  round(cume_dist() OVER w, 6) AS cume
        |FROM orders WHERE o_custkey < 100
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "q85_approx_quantile" ->
      """SELECT l_returnflag,
        |  quantile_disc(l_quantity, 0.5) AS median_qty,
        |  quantile_disc(l_quantity, 0.9) AS p90_qty,
        |  quantile_disc(l_extendedprice, 0.25) AS p25_price
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q83_unpivot" ->
      """SELECT p_partkey, metric, val FROM (
        |  SELECT p_partkey, 'p_retailprice' AS metric,
        |         p_retailprice AS val
        |  FROM part WHERE p_partkey < 500
        |  UNION ALL
        |  SELECT p_partkey, 'p_size', cast(p_size as double)
        |  FROM part WHERE p_partkey < 500)
        |ORDER BY p_partkey, metric""".stripMargin
  )
}
