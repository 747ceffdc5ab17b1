package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/** DSIR-style importance weighting for training-data selection
  * (beyond-reference; published method: Xie et al., "Data Selection
  * for Language Models via Importance Resampling", 2023 — hashed
  * n-gram features, log-likelihood-ratio importance weights between
  * a target and a raw distribution, Gumbel-top-k resampling).
  *
  * Everything is fixed-point integer once the per-bucket log-ratios
  * are floored, so scores and selections replay exactly in any
  * engine (the q116/q117 DuckDB oracles):
  *
  *  - features: unigrams + bigrams hashed into `buckets` buckets via
  *    the project's md5-prefix idiom (cross-engine, cf. q97);
  *  - weights: `L_b = floor(1e6 · ln(p̂_b / q̂_b))` with Laplace
  *    smoothing, where p̂ is the target-corpus bucket distribution
  *    and q̂ the raw-corpus one;
  *  - doc score: `Σ_gram L_bucket(gram)` — an exact integer sum;
  *  - selection: Gumbel-top-k with HASHED noise (md5-derived uniform,
  *    the RNG-free q97 idiom), so "sample ∝ exp(score)" is a
  *    deterministic, engine-replayable ranking.
  *
  * Scale shape (100 TB): the corpus is scanned twice — once to build
  * the B-bounded bucket histogram (one B-sized shuffle, map-side
  * combined) and once to score docs (broadcast join of the B-row
  * weight table into the gram stream + one groupBy(doc) shuffle).
  * Nothing doc×bucket-sized is ever cached or shuffled, and B is a
  * constant (default 4096) regardless of corpus size. The floor/ln
  * discretization risk is the documented one-ulp-per-bucket case
  * (PERF.md q108 lesson) — ~2e-10 per bucket value, immaterial.
  */
object Dsir {

  val DefaultBuckets: Int = 4096

  /** md5-prefix bucket id in [0, buckets) — q97's cross-engine hash. */
  def gramBucket(gram: Column, buckets: Int): Column =
    conv(substring(md5(gram), 1, 8), 16, 10).cast("long") % buckets

  /** Exploded (id, is_target, bucket) gram stream: unigrams + bigrams
    * in one compiled sliding pass (taggedNgramsFast).
    */
  private def gramStream(docs: DataFrame, idCol: String, toks: Column,
      targetPred: Column, buckets: Int): DataFrame =
    docs.select(col(idCol), targetPred.as("__t"),
      explode(TextFunctions.taggedNgramsFast(toks, 1, 2)).as("__g"))
      .select(col(idCol), col("__t"),
        gramBucket(col("__g._2"), buckets).as("__b"))

  /** Per-bucket fixed-point log-ratio weights
    * `floor(1e6·ln(p̂_b/q̂_b))` from ONE pass over the gram stream
    * (raw count + target count per bucket, then the tiny B-row
    * weight projection). Buckets never seen in the raw corpus carry
    * no weight row — a gram hashing there contributes the smoothed
    * prior on both sides and the oracle drops it identically.
    */
  def logRatioWeights(docs: DataFrame, idCol: String, toks: Column,
      targetPred: Column, buckets: Int = DefaultBuckets): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dist = gramStream(docs, idCol, toks, targetPred, buckets)
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("n_r"),
        sum(when(col("__t"), 1L).otherwise(0L)).as("n_t"))
    // Corpus totals as a window over the B-row histogram, not a
    // separate aggregate: a crossJoin(broadcast(agg)) formulation
    // re-inlined the whole dist subtree — a third corpus scan (plan
    // audit, PLANS.md). The unpartitioned window moves exactly B
    // rows (≤ 4096) to one task, a constant regardless of corpus
    // size, and keeps the query at two scans total.
    val tot = Window.partitionBy()
    val b = lit(buckets.toDouble)
    dist.select(col("__b").as("bucket"),
      floor(lit(1000000.0) * log(
        ((col("n_t") + lit(1.0)) / (sum(col("n_t")).over(tot) + b)) /
          ((col("n_r") + lit(1.0)) / (sum(col("n_r")).over(tot) + b))))
        .cast("long").as("l_e6"))
  }

  /** Per-document importance score `Σ L_bucket(gram)` (fixed-point
    * millionths of the log-likelihood ratio). Docs with no grams
    * (empty text) emit no row, matching the SQL replay.
    */
  def importanceScores(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = DefaultBuckets): DataFrame = {
    // widened (r16): both corpus passes run the tokenize + tagged-
    // ngram + md5-bucket kernel; off an unsplittable single-row-group
    // scan that work serialized onto 1-2 cores (pass-through for
    // well-partitioned input — see Parallelism.widen)
    val wide = graft.ops.Parallelism.widen(docs, idCol)
    val toks = TextFunctions.tokens(col(textCol))
    val w = logRatioWeights(wide, idCol, toks, targetPred, buckets)
    gramStream(wide, idCol, toks, targetPred, buckets)
      .join(broadcast(w), col("__b") === col("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("l_e6")).as("score_e6"))
  }

  /** Deterministic Gumbel-top-k resampling: rank on
    * `score_e6 + floor(1e6 · g(id))` where `g = -ln(-ln u)` and `u`
    * is the md5-derived uniform in (0,1) — sampling ∝ exp(score)
    * without replacement, RNG-free, exactly replayable. Ties broken
    * by id.
    */
  def gumbelTopK(scores: DataFrame, idCol: String, k: Int): DataFrame = {
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val key = col("score_e6") +
      floor(lit(1000000.0) * -log(-log(u))).cast("long")
    // sort+limit plans as TakeOrderedAndProject: per-partition top-k,
    // k rows to the driver-side merge — never a global exchange (the
    // row_number-over-empty-Window form single-partitions the corpus)
    scores.withColumn("key_e6", key)
      .orderBy(col("key_e6").desc, col(idCol))
      .limit(k)
  }
}
