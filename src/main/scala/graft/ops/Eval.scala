package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation aggregates — the checks a classifier- or
  * score-gated pipeline runs BEFORE trusting the gate. Everything is
  * exact integer arithmetic so the metrics themselves hash-compare
  * against a SQL replay (q165/q166); no float threshold or
  * engine-private estimator is involved.
  */
object Eval {

  /** Exact tie-aware AUC (Mann–Whitney form) of an integer score
    * against a {0,1} label, as parts-per-million.
    *
    * Average ranks are carried DOUBLED (2·cum + cnt + 1), so ties
    * never produce a fractional rank; the only division is one
    * truncating integer div at the end. The rank prefix runs over
    * the score-VALUE histogram (one row per distinct score — for an
    * e4 fixed-point score that is ≤ 10001 rows), never over corpus
    * rows; the unpartitioned window is bounded by the score domain,
    * the same discipline as the DSIR bucket windows.
    *
    * Output: one row (n_pos, n_neg, auc_e6).
    */
  def aucE6(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val hist = df.select(col(scoreCol).as("s"),
        col(labelCol).cast("long").as("pos"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("cnt"), sum(col("pos")).as("pcnt"))
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    hist.withColumn("cum", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .agg(
        sum(col("pcnt") * (lit(2) * col("cum") + col("cnt") + 1)).as("r2"),
        sum(col("pcnt")).as("p"),
        sum(col("cnt")).as("t"))
      .select(col("p").as("n_pos"), (col("t") - col("p")).as("n_neg"),
        // a single-class batch (all-positive or all-negative — a
        // drifted feed, a filtered slice) has no defined AUC: emit
        // NULL deliberately on BOTH engines rather than nulling
        // silently here and erroring in the SQL replay
        expr("CASE WHEN p = 0 OR t = p THEN NULL ELSE " +
          "(r2 - p * (p + 1)) * 1000000 div (2 * p * (t - p)) END")
          .as("auc_e6"))
  }

  /** Calibration (reliability-diagram) bins of an integer score
    * against a {0,1} label — the companion readout to [[aucE6]]:
    * AUC says the score RANKS well, calibration says whether its
    * VALUE means what a threshold-picker assumes. Scores bin
    * equal-width over their observed range (stats-then-sweep: 1-row
    * broadcast min/max, exact integer binning — the histogramFx
    * shape), and each bin reports size, positives, the mean score
    * and the empirical positive rate, both as truncating integer
    * divisions (decimal-widened sums, so the arithmetic never wraps
    * at corpus scale). A calibrated score shows mean_s tracking
    * pos_rate; a ranked-but-miscalibrated one shows monotone
    * pos_rate with a detached mean_s. One corpus aggregate bounded
    * by `bins` rows on the wire.
    *
    * Output: (bin, n, n_pos, mean_s, pos_rate_e6) ordered by bin.
    */
  def calibrationBins(df: DataFrame, scoreCol: String,
      labelCol: String, bins: Int): DataFrame = {
    val s = df.select(col(scoreCol).cast("long").as("__s"),
      col(labelCol).cast("long").as("__pos"))
    val stats = s.agg(min(col("__s")).as("__mn"), max(col("__s")).as("__mx"))
    s.crossJoin(broadcast(stats))
      // try_subtract: wrap-safe range check — when min and max have
      // opposite signs and the true range exceeds Long.MaxValue the
      // plain subtraction wraps (or throws under ANSI); try_subtract
      // yields NULL instead, the predicate is NULL, and the CASE
      // falls through to the intended raise_error (ADVICE r12)
      .withColumn("bin", expr(
        s"CASE WHEN try_subtract(__mx, __mn) <= ${Long.MaxValue / bins - 1} " +
          s"THEN ((__s - __mn) * $bins) div (__mx - __mn + 1) " +
          "ELSE raise_error('bin overflow: range*bins exceeds long " +
          "— rescale the score first') END"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__pos")).as("n_pos"),
        expr("sum(cast(__s as decimal(38,0))) div count(1)").as("mean_s"),
        expr("cast(sum(__pos) as decimal(38,0)) * 1000000 div count(1)")
          .as("pos_rate_e6"))
      .orderBy(col("bin"))
  }

  /** Wilson-lower-bound rate ranking (Wilson 1927) — the league
    * table a curation pipeline ranks SOURCES by: the raw pass rate
    * flatters small sources (2/2 beats 980/1000), the Wilson lower
    * bound at z=1.96 penalizes exactly the sample-size uncertainty.
    * One group aggregate; the bound is IEEE double arithmetic in a
    * FIXED textual form (sqrt is correctly rounded by IEEE 754, and
    * the oracle evaluates the identical expression tree — same
    * parenthesization, z² written as 1.96*1.96 in both engines so
    * both parse-then-multiply the same doubles), floored e6.
    *
    * Output: (group, n, n_pass, wilson_lb_e6) ranked by bound.
    */
  def wilsonRates(df: DataFrame, groupCol: String,
      passCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col(passCol).cast("long")).as("n_pass"))
      .withColumn("wilson_lb_e6", expr(
        """cast(floor((
          |  (n_pass / cast(n as double))
          |  + (1.96*1.96)/(2*cast(n as double))
          |  - 1.96 * sqrt(((n_pass / cast(n as double))
          |      * (1 - n_pass / cast(n as double))
          |      + (1.96*1.96)/(4*cast(n as double)))
          |    / cast(n as double))
          |) / (1 + (1.96*1.96)/cast(n as double))
          |* 1000000.0) as bigint)""".stripMargin))
      .orderBy(col("wilson_lb_e6").desc, col(groupCol))

  /** Two-proportion z-test — the experimentation gate: did cohort
    * A's conversion rate differ from cohort B's beyond sampling
    * noise. The pooled-variance z statistic in the q228 determinism
    * discipline: inputs are exact integers (per-cohort n, k), the
    * statistic is IEEE doubles in a FIXED textual form (sqrt
    * correctly rounded; both engines parse-then-evaluate the same
    * tree), floored e6 — z is signed, and floor (not truncate)
    * agrees across engines on negatives. `significant` reads
    * |z_e6| ≥ 1.96e6 off the already-floored value, so it is a pure
    * function of the replayed integer.
    *
    * `cohortCol` must take exactly two values; A = the
    * lexicographically smaller one. One |cohorts|-row aggregate +
    * a 1-row projection.
    */
  def twoProportionZ(df: DataFrame, cohortCol: String,
      convCol: String): DataFrame = {
    val g = df.groupBy(col(cohortCol).as("__c"))
      .agg(count(lit(1)).as("__n"),
        sum(col(convCol).cast("long")).as("__k"))
    val ab = g.crossJoin(broadcast(
        g.agg(min(col("__c")).as("__ca"), max(col("__c")).as("__cb"))))
      .agg(
        max(when(col("__c") === col("__ca"), col("__n"))).as("n_a"),
        max(when(col("__c") === col("__ca"), col("__k"))).as("conv_a"),
        max(when(col("__c") === col("__cb"), col("__n"))).as("n_b"),
        max(when(col("__c") === col("__cb"), col("__k"))).as("conv_b"))
    // degenerate pooled rate (0 or 1 — zero variance) → z is
    // undefined: NULL, not a division error (ANSI mode) — and the
    // oracle carries the identical guard
    ab.withColumn("z_e6", expr(
        """case when conv_a + conv_b = 0
          |       or conv_a + conv_b = n_a + n_b then null
          |  else cast(floor(
          |  ((conv_a / cast(n_a as double))
          |   - (conv_b / cast(n_b as double)))
          |  / sqrt(
          |      ((conv_a + conv_b) / cast(n_a + n_b as double))
          |      * (1 - (conv_a + conv_b) / cast(n_a + n_b as double))
          |      * (1.0/cast(n_a as double) + 1.0/cast(n_b as double)))
          |  * 1000000.0) as bigint) end""".stripMargin))
      .withColumn("significant",
        abs(col("z_e6")) >= lit(1960000L))
  }

  /** Brier score + skill — the calibration SUMMARY beside
    * [[calibrationBins]]'s per-bin diagnostic: mean squared error of
    * the probability forecast against the binary label, and the
    * skill relative to the climatology baseline (always predict the
    * base rate). PURE integer in ONE corpus pass: scores clamp to
    * e4 probabilities, `brier·n = Σ(p−y)²` in decimal-widened
    * integers, and the baseline needs no second pass because y is
    * binary — `Σ(c−y)² = n·c² − 2c·Σy + 10000·Σy` with
    * `c = Σy div n` (y² = 10000·y exactly). Skill is the
    * sign-guarded e6 division; NULL when the labels are constant
    * (baseline 0 — skill undefined).
    *
    * Output: one row (n, n_pos, brier_e8, brier_base_e8, skill_e6).
    */
  def brierSkill(df: DataFrame, scoreE4Col: String,
      labelCol: String): DataFrame =
    df.select(
        least(greatest(col(scoreE4Col).cast("long"), lit(0L)),
          lit(10000L)).cast("decimal(38,0)").as("__p"),
        (col(labelCol).cast("long") * 10000L)
          .cast("decimal(38,0)").as("__y"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(col("__y")).as("__sy"),
        sum((col("__p") - col("__y")) * (col("__p") - col("__y")))
          .as("__sq"))
      .withColumn("__c", expr("__sy div __n"))
      .withColumn("__brier", expr("__sq div __n"))
      .withColumn("__base",
        expr("(__c * __c * __n - 2 * __c * __sy + 10000 * __sy)" +
          " div __n"))
      // skill can be NEGATIVE (worse than climatology) — the
      // abs/sign guard keeps Spark's truncating div and SQL's
      // flooring // identical (the kappa/OLS convention)
      .select(
        col("__n").cast("long").as("n"),
        expr("cast(__sy div 10000 as bigint)").as("n_pos"),
        expr("cast(__brier as bigint)").as("brier_e8"),
        expr("cast(__base as bigint)").as("brier_base_e8"),
        expr("""CASE WHEN __base = 0 THEN NULL
          WHEN __base >= __brier THEN
            cast((__base - __brier) * 1000000 div __base as bigint)
          ELSE
            -cast((__brier - __base) * 1000000 div __base as bigint)
          END""").as("skill_e6"))

  /** Cohen's κ between two categorical columns — chance-corrected
    * agreement, the multi-class companion to [[aucE6]]: raw accuracy
    * flatters any pair whose marginals overlap (two classifiers that
    * both say "en" 60% of the time agree 52% by luck alone); κ
    * subtracts exactly that chance term. PURE integer:
    *
    *   κ = (n·agree − Σ_l na_l·nb_l) / (n² − Σ_l na_l·nb_l)
    *
    * emitted as a sign-guarded truncating e6 division (κ can be
    * negative — worse than chance — and `div` truncates toward zero
    * while SQL `//` floors, so abs/sign like the OLS op). NULL when
    * the chance term equals n² (a constant label pair — κ
    * undefined). Scale shape: one (n, agree) corpus aggregate and
    * one tagged-union marginal aggregate bounded by the label
    * domain; the ≤|labels| marginal rows reduce to a 1-row broadcast.
    *
    * Output: one row (n, n_agree, kappa_e6).
    */
  def cohenKappaE6(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val base = df.select(col(aCol).cast("string").as("__a"),
      col(bCol).cast("string").as("__b"))
    val tot = base.agg(count(lit(1)).as("n"),
      sum(when(col("__a") === col("__b"), 1L).otherwise(0L)).as("n_agree"))
    val pe = base.select(col("__a").as("__l"), lit(0).as("__side"))
      .unionByName(base.select(col("__b").as("__l"), lit(1).as("__side")))
      .groupBy(col("__l"))
      .agg(
        sum(when(col("__side") === 0, 1L).otherwise(0L)).as("__na"),
        sum(when(col("__side") === 1, 1L).otherwise(0L)).as("__nb"))
      .agg(sum(col("__na").cast("decimal(38,0)") * col("__nb")).as("__pe"))
    tot.crossJoin(broadcast(pe))
      .withColumn("__num",
        col("n").cast("decimal(38,0)") * col("n_agree") - col("__pe"))
      .withColumn("__den",
        col("n").cast("decimal(38,0)") * col("n") - col("__pe"))
      .select(col("n"), col("n_agree"),
        expr("CASE WHEN __den = 0 THEN NULL ELSE" +
          " (CASE WHEN __num < 0 THEN -1L ELSE 1L END)" +
          " * (abs(__num) * 1000000 div __den) END").as("kappa_e6"))
  }

  /** The NDCG@k position discounts as e6-floored integer constants:
    * `floor(1e6 / log2(i+1))` for i = 1..k. Computed ONCE here in
    * Scala and injected as literals into both the Column expression
    * and the oracle SQL — the float log never runs inside either
    * engine, so there is nothing to diverge.
    */
  def ndcgDiscountsE6(k: Int): Seq[Long] =
    (1 to k).map(i => (1e6 * math.log(2) / math.log(i + 1)).toLong)

  /** Prefix sums of [[ndcgDiscountsE6]]: `idealE6(n)` = the IDCG of
    * an exact list of length n ≤ k. Shared with oracle builders.
    */
  def ndcgIdealPrefixE6(k: Int): Seq[Long] =
    ndcgDiscountsE6(k).scanLeft(0L)(_ + _).tail

  /** Per-query NDCG@k of an approximate ranking against the exact
    * top-k set (binary relevance): position-discounted credit for
    * each hit, normalized by the ideal prefix OF THE QUERY'S OWN
    * EXACT-LIST LENGTH — normalizing by the full-k ideal would
    * report degradation that does not exist whenever a query has
    * fewer than k true neighbors (small candidate pool), the
    * inverse failure of dropping starved queries. Complements
    * [[recallAtK]] — recall says HOW MANY of the true neighbors
    * survived, NDCG says WHERE the ranking put them. Exact integer
    * arithmetic end to end (see [[ndcgDiscountsE6]]); starved
    * queries surface as 0 via the exact-side left join.
    */
  def ndcgAtK(approx: DataFrame, exact: DataFrame, queryCol: String,
      neighborCol: String, rankCol: String, k: Int): DataFrame = {
    val disc = ndcgDiscountsE6(k)
    val prefix = ndcgIdealPrefixE6(k)
    val credit = disc.zipWithIndex.foldLeft(lit(0L)) {
      case (acc, (d, i)) => when(col(rankCol) === (i + 1), d).otherwise(acc)
    }
    val idcg = (1 until k).foldLeft(lit(prefix.last)) {
      case (acc, n) => when(col("n_exact") === n, prefix(n - 1)).otherwise(acc)
    }
    val dcg = approx.select(col(queryCol), col(neighborCol), col(rankCol))
      .join(exact.select(col(queryCol), col(neighborCol)),
        Seq(queryCol, neighborCol))
      .groupBy(col(queryCol))
      .agg(sum(credit).as("dcg_e6"))
    exact.select(col(queryCol), col(neighborCol))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_exact"))
      .join(dcg, Seq(queryCol), "left_outer")
      .na.fill(0L, Seq("dcg_e6"))
      .withColumn("__idcg", idcg)
      .withColumn("ndcg_e6", expr("dcg_e6 * 1000000 div __idcg"))
      .select(col(queryCol), col("dcg_e6"), col("ndcg_e6"))
      .orderBy(col(queryCol))
  }

  /** Per-query recall@k of an APPROXIMATE neighbor list against the
    * exact one — the quality meter every recall-trading operator
    * (LSH/IVF/PQ ANN) must ship with, as an operator rather than a
    * spec-time assertion, so production can monitor recall on live
    * data. Exact rational arithmetic: hits are an equi-join on
    * (query, neighbor), recall is `hits * 1e6 div |exact list|` —
    * the query's OWN exact-list size, so a perfect match scores 1
    * even when fewer than k true neighbors exist. Queries the
    * approximate pass starved entirely (no shared bucket) surface as
    * recall 0 via the left join from the exact side's query set —
    * silently dropping them would overstate recall, the one mistake
    * a recall meter cannot make.
    */
  /** MRR/hit meter — the third leg of the retrieval-eval triad:
    * recall@k says how many true neighbors survived, NDCG@k says
    * where the ranking put them, reciprocal rank says how soon the
    * FIRST one appears (the metric single-answer retrieval — RAG
    * lookup, QA — actually optimizes). Per query: the approx rank
    * of the first true neighbor, `rr_e6 = 1e6 div rank` (exact
    * rational), `hit` as the boolean. Starved queries surface as
    * rr 0 via the left join from the exact side — the recallAtK
    * discipline.
    */
  def mrrAtK(approx: DataFrame, exact: DataFrame, queryCol: String,
      neighborCol: String, rankCol: String): DataFrame = {
    val firstHit = approx
      .select(col(queryCol), col(neighborCol),
        col(rankCol).cast("long").as("__r"))
      .join(exact.select(col(queryCol), col(neighborCol)),
        Seq(queryCol, neighborCol))
      .groupBy(col(queryCol))
      .agg(min(col("__r")).as("first_hit_rank"))
    exact.select(col(queryCol)).distinct()
      .join(firstHit, Seq(queryCol), "left_outer")
      .withColumn("rr_e6", when(col("first_hit_rank").isNull, 0L)
        .otherwise(expr("1000000 div first_hit_rank")))
      .withColumn("hit", col("first_hit_rank").isNotNull)
      .orderBy(col(queryCol))
  }

  def recallAtK(approx: DataFrame, exact: DataFrame, queryCol: String,
      neighborCol: String, k: Int): DataFrame = {
    val hits = approx.select(col(queryCol), col(neighborCol))
      .join(exact.select(col(queryCol), col(neighborCol)),
        Seq(queryCol, neighborCol))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_hits"))
    exact.select(col(queryCol), col(neighborCol))
      .groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_exact"))
      .join(hits, Seq(queryCol), "left_outer")
      .na.fill(0L, Seq("n_hits"))
      .withColumn("recall_e6", expr("n_hits * 1000000 div n_exact"))
      .select(col(queryCol), col("n_hits"), col("recall_e6"))
      .orderBy(col(queryCol))
  }
}
