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
    // One-pass column profiler (ops.Profiler): every metric for all
    // four columns in ONE agg over ONE scan, unpivoted from the
    // 1-row result — the ingest quality gate. The exact-distinct
    // form is the oracle surface; ProfilerSpec bounds the HLL twin
    // (approxProfile — fixed-size sketches, the 100 TB form)
    // against it.
    "q169_profile" -> ((s, dir) => {
      graft.ops.Profiler.profile(table(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    }),

    // Equi-width histogram in fx space: stats-then-sweep two-pass,
    // exact integer binning, one ≤20-row shuffle.
    "q170_histogram" -> ((s, dir) => {
      graft.ops.Profiler.histogramFx(table(s, dir, "lineitem"),
        "l_extendedprice", buckets = 20)
    }),

    // Pairwise Pearson correlation screen (ops.Profiler
    // .pearsonScreenFx): every numeric-column pair's r from ONE
    // corpus aggregate of decimal-widened integer moments — the
    // feature-selection readout ANALYZE-style profilers ship. The
    // only floats are the final fixed-form expression (IEEE casts +
    // correctly-rounded sqrt), floored e6; zero variance → NULL.
    "q235_correlation_screen" -> ((s, dir) =>
      graft.ops.Profiler.pearsonScreenFx(table(s, dir, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),

    // EQUI-DEPTH histogram (ops.Profiler.equiDepthHistogramFx): the
    // optimizer-stats companion to q170's equi-width bins — each
    // bucket holds ≈N/10 rows so skewed columns get narrow buckets
    // where the mass is. Bucket membership is the exact integer
    // rule (cum_before·B) div N over domain-bounded value-count
    // prefix sums (the q187 window contract).
    "q233_equidepth_hist" -> ((s, dir) =>
      graft.ops.Profiler.equiDepthHistogramFx(
        table(s, dir, "lineitem"), "l_extendedprice", buckets = 10)),

    // Pairwise association rules over order baskets
    // (ops.Associations): support/confidence/lift in exact e6
    // integers, support floor before the ordered top-20.
    "q182_assoc_rules" -> ((s, dir) => {
      graft.ops.Associations.pairRules(
        table(s, dir, "lineitem"),
        "l_orderkey", "l_partkey", minSupport = 2, k = 20)
    }),

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

    // Full cube over (status, year): every aggregation combination in
    // one pass — the q13 rollup's non-hierarchical sibling.
    "q98_cube" -> ((s, dir) => {
      table(s, dir, "orders")
        .cube(col("o_orderstatus"), year(col("o_orderdate")).as("yr"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,4)")).cast("double")
            .as("total"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("yr").asc_nulls_first)
    }),

    // Exact-integer OLS trend per event type (ops.Trend.olsByGroup):
    // value (fx e2) regressed on epoch seconds, x centered on the
    // per-group minimum so the decimal-widened moment sums never
    // overflow; slope/intercept land as truncated fixed-point longs
    // and replay bit-for-bit (abs/sign-guarded div — see the op's
    // scaladoc on truncate-vs-floor divergence).
    // Deterministic HyperLogLog distinct-count (ops.Hll): md5-derived
    // 48-bit hashes -> 64 max-rank registers per event_type -> the
    // exact-integer raw estimate, with the true distinct count
    // beside it. Unlike approx_count_distinct (opaque HLL++
    // internals), every register and the estimate replay
    // bit-for-bit in any engine with md5 + bin — the verifiable
    // sketch contract, with mergeability spec-pinned (HllSpec).
    "q239_hll_distinct" -> ((s, dir) => {
      import graft.ops.Hll
      val ev = table(s, dir, "events")
      val est = Hll.estimate(
        Hll.registers(ev, "user_id", Seq("event_type")),
        Seq("event_type"))
      val truth = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_true"))
      truth.join(est, "event_type")
        .select(col("event_type"), col("n_true"), col("est"),
          col("zero_regs"))
        .orderBy(col("event_type"))
    }),

    "q186_trend_ols" -> ((s, dir) => {
      graft.ops.Trend.olsByGroup(
        table(s, dir, "events")
          .select(col("event_type"),
            expr("unix_millis(ts) div 1000").as("x"),
            floor(col("value") * 100).cast("long").as("y")),
        "event_type", "x", "y")
    }),

    // Higher-moment grouped statistics: corr/covar/stddev built-ins
    // (rounded past both engines' accumulation-order jitter) plus
    // skewness/kurtosis derived from EXACT decimal power sums — the
    // same double formula evaluated on identical inputs both sides,
    // so the sketch-free moments are verified to the last rounded
    // digit. One aggregation pass; at 100 TB this is a map-side
    // partial like any sum.
    "q99_grouped_stats" -> ((s, dir) => {
      val q = col("l_quantity")
      table(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6)
            .as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
            .as("covar_qp"),
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          sum(q.cast("decimal(38,6)")).cast("double").as("s1"),
          sum((q * q).cast("decimal(38,6)")).cast("double").as("s2"),
          sum((q * q * q).cast("decimal(38,6)")).cast("double").as("s3"),
          sum((q * q * q * q).cast("decimal(38,6)")).cast("double").as("s4"))
        .withColumn("m1", col("s1") / col("n"))
        .withColumn("m2", col("s2") / col("n") - col("m1") * col("m1"))
        .withColumn("m3",
          col("s3") / col("n") - lit(3.0) * col("m1") * (col("s2") / col("n"))
            + lit(2.0) * col("m1") * col("m1") * col("m1"))
        .withColumn("m4",
          col("s4") / col("n") - lit(4.0) * col("m1") * (col("s3") / col("n"))
            + lit(6.0) * col("m1") * col("m1") * (col("s2") / col("n"))
            - lit(3.0) * col("m1") * col("m1") * col("m1") * col("m1"))
        .select(col("l_returnflag"), col("n"), col("corr_qp"),
          col("covar_qp"), col("sd_qty"),
          round(col("m3") / pow(col("m2"), 1.5), 6).as("skew_qty"),
          round(col("m4") / (col("m2") * col("m2")) - lit(3.0), 6)
            .as("kurt_qty"))
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

  /** Generated moment-sum oracle for the correlation screen — the
    * identical fixed-form r expression over HUGEINT sums.
    */
  private def pearsonOracle(cols: Seq[String]): String = {
    def nm(c: String) = c.replaceAll("[^A-Za-z0-9]", "_")
    def f(c: String) = s"CAST(floor($c * 100) AS HUGEINT)"
    val sums = (Seq("count(*)::HUGEINT AS n") ++
      cols.map(c => s"sum(${f(c)}) AS s_${nm(c)}") ++
      cols.map(c => s"sum(${f(c)} * ${f(c)}) AS ss_${nm(c)}") ++
      (for (i <- cols.indices; j <- i + 1 until cols.size) yield
        s"sum(${f(cols(i))} * ${f(cols(j))})" +
          s" AS sp_${nm(cols(i))}_${nm(cols(j))}"))
      .mkString(",\n    ")
    val selects = (for (i <- cols.indices; j <- i + 1 until cols.size)
      yield {
        val (a, b) = (nm(cols(i)), nm(cols(j)))
        s"""SELECT '${cols(i)}' AS x_col, '${cols(j)}' AS y_col,
           |  CASE WHEN n*ss_$a - s_$a*s_$a = 0
           |        OR n*ss_$b - s_$b*s_$b = 0 THEN NULL
           |  ELSE cast(floor(
           |    cast(n*sp_${a}_$b - s_$a*s_$b as double)
           |    / sqrt(cast(n*ss_$a - s_$a*s_$a as double)
           |         * cast(n*ss_$b - s_$b*s_$b as double))
           |    * 1000000.0) as bigint) END AS r_e6
           |FROM m""".stripMargin
      }).mkString("\nUNION ALL\n")
    s"WITH m AS (\n  SELECT $sums\n  FROM lineitem)\n" +
      s"SELECT * FROM (\n$selects)\nORDER BY x_col, y_col"
  }

  def oracles: Map[String, String] = Map(
    "q235_correlation_screen" -> pearsonOracle(
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")),
    "q233_equidepth_hist" ->
      """WITH v AS (
        |  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS fx
        |  FROM lineitem),
        |g AS (SELECT fx, CAST(count(*) AS BIGINT) AS cnt
        |  FROM v GROUP BY fx),
        |p AS (SELECT fx, cnt,
        |    sum(cnt) OVER (ORDER BY fx ROWS UNBOUNDED PRECEDING)
        |      AS cum,
        |    sum(cnt) OVER () AS tot
        |  FROM g)
        |SELECT CAST(((cum - cnt) * 10) // tot AS BIGINT) AS bucket,
        |  CAST(sum(cnt) AS BIGINT) AS n,
        |  min(fx) AS lo_fx, max(fx) AS hi_fx
        |FROM p GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q182_assoc_rules" ->
      """WITH bi AS (
        |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it
        |  FROM lineitem),
        |n AS (SELECT CAST(count(DISTINCT bk) AS BIGINT) AS nb FROM bi),
        |ic AS (SELECT it, CAST(count(*) AS BIGINT) AS supp
        |  FROM bi GROUP BY it),
        |p AS (SELECT a.it AS a, b.it AS b,
        |    CAST(count(*) AS BIGINT) AS n_ab
        |  FROM bi a JOIN bi b ON a.bk = b.bk AND a.it < b.it
        |  GROUP BY a.it, b.it HAVING count(*) >= 2),
        |d AS (SELECT a AS ante, b AS cons, n_ab FROM p
        |  UNION ALL SELECT b AS ante, a AS cons, n_ab FROM p),
        |r AS (SELECT d.ante, d.cons, d.n_ab,
        |    ia.supp AS n_a, ib.supp AS n_b,
        |    d.n_ab * 1000000 // ia.supp AS conf_e6,
        |    (d.n_ab::HUGEINT * nb * 1000000)
        |      // (ia.supp::HUGEINT * ib.supp) AS lift_e6
        |  FROM d JOIN ic ia ON d.ante = ia.it
        |         JOIN ic ib ON d.cons = ib.it
        |         CROSS JOIN n)
        |SELECT ante, cons, n_ab, n_a, n_b,
        |  CAST(conf_e6 AS BIGINT) AS conf_e6,
        |  CAST(lift_e6 AS BIGINT) AS lift_e6
        |FROM r
        |ORDER BY lift_e6 DESC, conf_e6 DESC, ante, cons
        |LIMIT 20""".stripMargin,
    "q169_profile" -> {
      def one(c: String) =
        s"""SELECT '$c' AS col_name,
           |  CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count($c) AS BIGINT) AS n_present,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(min(floor($c * 100)) AS BIGINT) AS min_fx,
           |  CAST(max(floor($c * 100)) AS BIGINT) AS max_fx
           |FROM lineitem""".stripMargin
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .map(one).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "q170_histogram" ->
      """WITH f AS (
        |  SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS fx
        |  FROM lineitem),
        |st AS (SELECT min(fx) AS mn, max(fx) AS mx FROM f)
        |SELECT ((fx - mn) * 20) // (mx - mn + 1) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  min(fx) AS lo_fx, max(fx) AS hi_fx
        |FROM f, st GROUP BY bucket ORDER BY bucket""".stripMargin,
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
    "q98_cube" ->
      """SELECT o_orderstatus, cast(year(o_orderdate) as int) AS yr,
        |  cast(count(*) as bigint) AS n,
        |  cast(sum(cast(o_totalprice as decimal(18,4))) as double) AS total
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, yr)
        |ORDER BY o_orderstatus NULLS FIRST, yr NULLS FIRST""".stripMargin,
    // full register + estimate replay: same md5/bin/shift pipeline
    "q239_hll_distinct" ->
      """WITH h AS (
        |  SELECT event_type,
        |    CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)
        |      AS UBIGINT) AS BIGINT) AS hv
        |  FROM events),
        |rw AS (SELECT event_type,
        |         hv // 4398046511104 AS bucket,
        |         hv % 4398046511104 AS w
        |       FROM h),
        |regs AS (SELECT event_type, bucket,
        |           max(CASE WHEN w = 0 THEN 43
        |                    ELSE 43 - length(bin(w)) END) AS r
        |         FROM rw GROUP BY event_type, bucket),
        |f AS (SELECT event_type,
        |        sum(CAST(1 AS BIGINT) << (43 - r)) AS s_occ,
        |        count(*) AS n_occ
        |      FROM regs GROUP BY event_type),
        |e AS (SELECT event_type,
        |        CAST(64 - n_occ AS BIGINT) AS zero_regs,
        |        CAST(CAST(709 AS HUGEINT) * 4096 * 8796093022208
        |          // (CAST(1000 AS HUGEINT) *
        |              (s_occ + (64 - n_occ) * 8796093022208))
        |          AS BIGINT) AS est
        |      FROM f),
        |t AS (SELECT event_type,
        |        CAST(count(DISTINCT user_id) AS BIGINT) AS n_true
        |      FROM events GROUP BY event_type)
        |SELECT t.event_type, t.n_true, e.est, e.zero_regs
        |FROM t JOIN e USING (event_type)
        |ORDER BY t.event_type""".stripMargin,
    "q186_trend_ols" ->
      """WITH d AS (
        |  SELECT event_type, epoch_ms(ts) // 1000 AS x,
        |    CAST(floor(value * 100) AS BIGINT) AS y
        |  FROM events),
        |m AS (SELECT event_type, min(x) AS x0 FROM d GROUP BY event_type),
        |c AS (SELECT d.event_type, (d.x - m.x0)::HUGEINT AS x, y::HUGEINT AS y
        |      FROM d JOIN m ON d.event_type = m.event_type),
        |a AS (SELECT event_type, count(*)::HUGEINT AS n,
        |        sum(x) AS sx, sum(y) AS sy,
        |        sum(x * y) AS sxy, sum(x * x) AS sxx
        |      FROM c GROUP BY event_type),
        |t AS (SELECT event_type, n,
        |        n * sxy - sx * sy AS num,
        |        n * sxx - sx * sx AS denx,
        |        sy * sxx - sx * sxy AS inum
        |      FROM a)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CAST(CASE WHEN denx = 0 THEN NULL ELSE
        |    (CASE WHEN num < 0 THEN -1 ELSE 1 END)
        |    * (abs(num) * 1000000000 // denx) END AS BIGINT) AS slope_e9,
        |  CAST(CASE WHEN denx = 0 THEN NULL ELSE
        |    (CASE WHEN inum < 0 THEN -1 ELSE 1 END)
        |    * (abs(inum) * 100 // denx) END AS BIGINT) AS intercept_fx_e2
        |FROM t ORDER BY event_type""".stripMargin,
    "q99_grouped_stats" ->
      """WITH a AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |    round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qp,
        |    round(stddev_samp(l_quantity), 6) AS sd_qty,
        |    cast(sum(cast(l_quantity as decimal(38,6))) as double) AS s1,
        |    cast(sum(cast(l_quantity*l_quantity as decimal(38,6))) as double) AS s2,
        |    cast(sum(cast(l_quantity*l_quantity*l_quantity as decimal(38,6))) as double) AS s3,
        |    cast(sum(cast(l_quantity*l_quantity*l_quantity*l_quantity as decimal(38,6))) as double) AS s4
        |  FROM lineitem GROUP BY l_returnflag),
        |m AS (SELECT *, s1/n AS m1 FROM a),
        |mm AS (SELECT *,
        |  s2/n - m1*m1 AS m2,
        |  s3/n - 3.0*m1*(s2/n) + 2.0*m1*m1*m1 AS m3,
        |  s4/n - 4.0*m1*(s3/n) + 6.0*m1*m1*(s2/n) - 3.0*m1*m1*m1*m1 AS m4
        |  FROM m)
        |SELECT l_returnflag, cast(n as bigint) AS n, corr_qp, covar_qp,
        |  sd_qty,
        |  round(m3/pow(m2, 1.5), 6) AS skew_qty,
        |  round(m4/(m2*m2) - 3.0, 6) AS kurt_qty
        |FROM mm ORDER BY l_returnflag""".stripMargin,
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
