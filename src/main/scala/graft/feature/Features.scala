package graft.feature

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Relational
import graft.text.TextFunctions

/** Feature-engineering operators (SURVEY.md M4/M14; reference
  * UserTextLabelCalc.scala:20-159, PrepData.scala:99-251,
  * LightldaPreProcess.scala:111-280).
  *
  * The reference hashes terms through `HashingTF` (80M buckets) so
  * scores depend on murmur bucketing; we keep exact terms — no
  * collisions, every number independently recomputable — and express
  * the pipelines as aggregations + window functions that Catalyst
  * plans with map-side partial aggregation. The (entity,term)
  * aggregate is the dominant shuffle at 100 TB and is unavoidable
  * for exact TF; everything downstream reuses that reduced
  * intermediate instead of rescanning raw tokens.
  */
object Features {

  /** Term frequencies per entity: (entity, term, tf). */
  def termFreq(df: DataFrame, entityCol: String, tokensCol: String): DataFrame =
    df.select(col(entityCol), explode(col(tokensCol)).as("term"))
      .groupBy(col(entityCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Smoothed IDF over entities: ln((N+1)/(df+1)) — the reference's
    * formula (TFIDF.scala:110, and what `ml.feature.IDF` computes).
    */
  def idf(tf: DataFrame, entityCol: String, nEntities: Long): DataFrame =
    tf.groupBy(col("term"))
      .agg(countDistinct(col(entityCol)).as("df"))
      .withColumn("idf", log((lit(nEntities) + 1.0) / (col("df") + 1.0)))

  /** Normalized TF-IDF tagging (M4): min-max normalize TF within
    * each entity and IDF across the corpus, multiply, keep top-k
    * labels per entity. Degenerate ranges (max == min) normalize
    * to 1 so single-term entities still score.
    *
    * Both normalizations are window/aggregate expressions over the
    * already-reduced tf table — no second pass over raw tokens.
    */
  def normalizedTfidfTags(df: DataFrame, entityCol: String,
      tokensCol: String, k: Int, roundTo: Int = 4): DataFrame = {
    val n = df.select(countDistinct(col(entityCol))).first().getLong(0)
    val tf = termFreq(df, entityCol, tokensCol)
    val idfDf = idf(tf, entityCol, n)

    val perEntity = Window.partitionBy(col(entityCol))
    val ntf = {
      val mn = min(col("tf")).over(perEntity)
      val mx = max(col("tf")).over(perEntity)
      when(mx === mn, lit(1.0))
        .otherwise((col("tf") - mn).cast("double") / (mx - mn).cast("double"))
    }
    val scoredTf = tf.withColumn("ntf", ntf)

    val idfStats = idfDf.agg(min("idf").as("mn"), max("idf").as("mx")).first()
    val (mnIdf, mxIdf) = (idfStats.getDouble(0), idfStats.getDouble(1))
    val nidf =
      if (mxIdf == mnIdf) lit(1.0)
      else (col("idf") - mnIdf) / (mxIdf - mnIdf)

    val scored = scoredTf
      .join(idfDf.select(col("term"), nidf.as("nidf")), "term")
      .withColumn("score", round(col("ntf") * col("nidf"), roundTo))
      .select(col(entityCol), col("term"), col("score"))
    Relational.topKPerGroup(scored, Seq(col(entityCol)),
      Seq(col("score").desc, col("term")), k)
  }

  /** Stable vocabulary: distinct terms sorted, 1-based contiguous
    * ids (M14's `wid` dictionary; reference builds it with RDD
    * zipWithIndex over an unspecified order — we fix the order so
    * ids are reproducible). Ids come from the gapless distributed
    * zipWithIndex (ops.Relational): a `row_number` over an empty
    * window funnels the whole vocabulary through ONE partition —
    * fine at fixture scale, a bottleneck at a web-corpus vocab.
    */
  def vocabulary(tf: DataFrame): DataFrame =
    graft.ops.Relational.zipWithIndex(
      tf.select(col("term")).distinct(), "wid", Seq(col("term")))
      .select(col("term"), col("wid"))

  /** UCI docword triples (M14): (did, wid, tf) sorted. */
  def uciDocword(df: DataFrame, entityCol: String,
      tokensCol: String): DataFrame = {
    val tf = termFreq(df, entityCol, tokensCol)
    tf.join(vocabulary(tf), "term")
      .select(col(entityCol).as("did"), col("wid"), col("tf"))
  }

  /** libsvm-style lines (M14): `did wid:tf wid:tf ...` with features
    * ordered by wid — built with an array sort inside the group, not
    * a driver-side collect.
    */
  def libsvmLines(df: DataFrame, entityCol: String,
      tokensCol: String): DataFrame =
    uciDocword(df, entityCol, tokensCol)
      .groupBy(col("did"))
      .agg(collect_list(struct(col("wid"), col("tf"))).as("feats"))
      .select(col("did"),
        concat(col("did").cast("string"), lit(" "),
          array_join(
            transform(array_sort(col("feats")),
              s => concat(s.getField("wid"), lit(":"), s.getField("tf"))),
            " ")).as("line"))

  /** Fixed-weight linear quality classifier — the shape of a
    * fastText-style document scorer, with the model baked in as
    * constants so every score is independently recomputable (and
    * hash-verifiable by another engine). Features, each clamped to
    * [0,1]:
    *   f_len   = min(n_tokens, 500)/500        (length credit)
    *   f_wlen  = min(mean token length, 10)/10 (vocabulary richness)
    *   f_stop  = stopword token ratio          (natural-prose floor)
    *   f_digit = digit-character ratio         (boilerplate penalty)
    * score = 0.2 + 0.5·f_len + 0.3·f_wlen + 0.4·f_stop − 0.6·f_digit.
    *
    * Pure column arithmetic (mult/div/add on IEEE doubles — exactly
    * rounded ops, so deterministic across engines), no UDF: the
    * score fuses into the scan and costs a projection. Swapping in
    * learned weights keeps the same plan. Returned raw; discretize
    * with floor (e.g. `floor(score * 10000)`), not round — decimal
    * rounding of a double is engine-convention-dependent at exact
    * .5 ties, floor of an identical double never is.
    */
  def linearQualityScore(text: Column, toks: Column): Column = {
    val nToks = size(toks).cast("double")
    val fLen = least(nToks, lit(500.0)) / 500.0
    val meanWlen = length(regexp_replace(text, " ", "")) / nToks
    val fWlen = least(meanWlen, lit(10.0)) / 10.0
    val fStop = TextFunctions.stopwordRatioRaw(toks)
    val fDigit = length(regexp_replace(text, "[^0-9]", "")) /
      length(text).cast("double")
    lit(0.2) + lit(0.5) * fLen + lit(0.3) * fWlen +
      lit(0.4) * fStop - lit(0.6) * fDigit
  }

  /** The q140 ensemble's two fixed-point signals in one place
    * (shared by the query and the qualityrank CLI mode): the e4
    * linear quality score and the e4 trigram-repetition ratio
    * (duplicate-trigram share; 0 for docs under 3 tokens).
    */
  def qualitySignalsE4(text: Column, toks: Column): (Column, Column) = {
    val q = floor(linearQualityScore(text, toks) * 10000.0).cast("long")
    // Distinct count via the compiled window-digest kernel
    // (TextFunctions.distinctNgramCountFast): no trigram text is
    // ever built and the distinct set holds longs. NOTE an
    // expression-form digest chain (transform + element_at +
    // xxhash64) was tried first and benched 2× SLOWER one-shot —
    // higher-order functions run interpreted; only the JIT-compiled
    // kernel wins (PERF r7 A/B).
    val n = size(toks)
    val rep = when(n >= 3,
      floor(lit(1e4) * (lit(1.0) -
        TextFunctions.distinctNgramCountFast(toks, 3) /
          (n - 2).cast("double"))))
      .otherwise(lit(0L)).cast("long")
    (q, rep)
  }
}
