package graft.topic

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact shifted-PPMI word embeddings — the ORACLE-COMPLETE twin of
  * the seeded Word2Vec fit (q65), via the published equivalence:
  * skip-gram with negative sampling implicitly factorizes the
  * word-context PMI matrix shifted by ln(negatives) (Levy &
  * Goldberg 2014, "Neural Word Embedding as Implicit Matrix
  * Factorization"). SGD on that factorization is seeded-stochastic
  * and unreplayable; the matrix it factorizes is a closed-form
  * corpus statistic — so the twin embeds each word as its sparse
  * shifted-PPMI context row and makes the whole chain
  * hash-verifiable:
  *
  *   SPPMI(w,c) = max(0, ln(#(w,c)·N / (#w·#c) / s))
  *
  * floored to integer millionths on an IDENTICAL left-to-right IEEE
  * expression in both engines (the bm25-oracle precedent: ln + floor
  * fixed-point replays bit-for-bit; floor has no tie rule).
  *
  * Scale shape: pair generation is a per-doc offset walk inside ONE
  * Project (transform over sequence, both directions, offsets 1..w)
  * — no position self-join, corpus read once; then one (w,c)
  * aggregate (vocab²-bounded out), vocabulary-sized marginals, and a
  * 1-row total broadcast. Similarity is a context-keyed equi-join of
  * the sparse rows — the vectors meet only where both are nonzero,
  * never a dense dot.
  */
object Ppmi {

  /** Compiled skip-gram pair walk: kept tokens (non-null, non-empty
    * — the expression form's `filter(length(t) > 0)`) paired with
    * each neighbor at offsets 1..window, both directions, exactly
    * the multiset the old transform/concat/split expression built.
    */
  private def pairsUdf(window: Int) = udf { (toks: Seq[String]) =>
    if (toks == null) Array.empty[(String, String)]
    else {
      val ts = toks.iterator
        .filter(t => t != null && t.nonEmpty).toArray
      val n = ts.length
      val out = new scala.collection.mutable.ArrayBuffer[(String, String)](
        if (n > 0) math.min(2 * window * n, 2 * window * 1024) else 0)
      var off = 1
      while (off <= window) {
        var i = 0
        while (i + off < n) {
          out += ((ts(i), ts(i + off)))
          out += ((ts(i + off), ts(i)))
          i += 1
        }
        off += 1
      }
      out.toArray
    }
  }

  /** Sparse embedding rows (w, c, v): v = SPPMI(w,c) in integer
    * millionths, zero entries dropped (they add nothing to any dot
    * product). `window` context positions each side, `shift` = the
    * SGNS negative-sample count s.
    */
  def embed(docs: DataFrame, tokensCol: String, window: Int,
      shift: Int): DataFrame = {
    // Pair generation is a COMPILED kernel (r16): the original
    // expression form — filter + per-direction transform/sequence/
    // element_at + concat + re-split after the explode — runs
    // interpreted (higher-order functions have no codegen; the
    // ngramsFast precedent) and serialized the corpus pass through
    // per-pair string building. The kernel is one JIT pass per doc
    // emitting the identical (w, c) multiset: empty tokens dropped
    // first (the old filter), then both directions at offsets
    // 1..window — docs shorter than off+1 kept tokens emit nothing
    // at that offset (the sequence(1,0)-descends hazard the old CASE
    // guarded).
    val pairs = docs
      .select(explode(pairsUdf(window)(col(tokensCol))).as("__pair"))
      .select(col("__pair._1").as("w"), col("__pair._2").as("c"))
      .groupBy(col("w"), col("c")).agg(count(lit(1)).as("n"))
    val mw = pairs.groupBy(col("w")).agg(sum(col("n")).as("nw"))
    val mc = pairs.groupBy(col("c")).agg(sum(col("n")).as("nc"))
    val tot = pairs.agg(sum(col("n")).as("nn"))
    pairs
      .join(mw, "w").join(mc, "c")
      .crossJoin(broadcast(tot))
      .withColumn("v",
        floor(lit(1000000.0) * log(
          col("n").cast("double") * col("nn") / col("nw") / col("nc")
            / lit(shift.toDouble))).cast("long"))
      .filter(col("v") > 0)
      .select(col("w"), col("c"), col("v"))
  }

  /** Top-`k` most-similar word pairs by cosine over the sparse
    * embedding rows: exact-integer dot and norms, one floored IEEE
    * sqrt expression at the end. (w1 < w2 — each pair once.)
    * PERSIST `emb` first: it is referenced four times below (two dot
    * sides, two norm attaches) and an unmaterialized plan would
    * re-run the corpus scan for each — the artifact is
    * vocab²-bounded, the corpus is not.
    */
  def similarPairs(emb: DataFrame, k: Int): DataFrame = {
    val dot = emb.select(col("c"), col("w").as("w1"), col("v").as("v1"))
      .join(emb.select(col("c"), col("w").as("w2"), col("v").as("v2")), "c")
      .filter(col("w1") < col("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(sum(col("v1") * col("v2")).as("dot"))
    val nrm = emb.groupBy(col("w")).agg(sum(col("v") * col("v")).as("ss"))
    dot
      .join(nrm.select(col("w").as("w1"), col("ss").as("ss1")), "w1")
      .join(nrm.select(col("w").as("w2"), col("ss").as("ss2")), "w2")
      .select(col("w1"), col("w2"),
        floor(lit(1000000.0) * col("dot").cast("double")
          / sqrt(col("ss1").cast("double"))
          / sqrt(col("ss2").cast("double"))).cast("long").as("cos_e6"))
      .orderBy(col("cos_e6").desc, col("w1"), col("w2"))
      .limit(k)
  }
}
