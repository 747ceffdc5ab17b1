package graft.topic

import org.apache.spark.ml.clustering.LDA
import org.apache.spark.ml.feature.{CountVectorizer, CountVectorizerModel, Word2Vec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Topic-model and embedding operators (SURVEY.md M12/M13/M15;
  * reference NewsLDA.scala:74-127, NewsLDAModel.scala:25-116,
  * Word2vecProcess.scala:24-32).
  *
  * The reference hand-builds vocabularies and sparse count vectors
  * over RDDs before calling mllib; here `CountVectorizer` does the
  * vocabulary + vectorization in one fitted transformer and the
  * `ml` (DataFrame) API runs LDA/Word2Vec directly — distributed
  * EM/online variational inference under the hood, nothing
  * driver-side. Model outputs are seeded-deterministic on a fixed
  * cluster but not bit-identical across engines, so their queries
  * are rows-only checks (no DuckDB oracle can run LDA).
  */
object Topics {

  /** Fit a count-vector model: vocabulary ordered by corpus
    * frequency (CountVectorizer's order).
    */
  def countVectorize(df: DataFrame, tokensCol: String,
      vocabSize: Int): (CountVectorizerModel, DataFrame) = {
    val cv = new CountVectorizer()
      .setInputCol(tokensCol).setOutputCol("features")
      .setVocabSize(vocabSize)
    val model = cv.fit(df)
    (model, model.transform(df))
  }

  /** LDA topics (M12/M13): k topics over token counts, fixed seed.
    * Returns (topic, top term strings, rounded weights).
    */
  def ldaTopics(df: DataFrame, tokensCol: String, k: Int,
      maxIter: Int = 10, vocabSize: Int = 1000, seed: Long = 42L,
      termsPerTopic: Int = 5): DataFrame = {
    val (cvModel, vectorized) = countVectorize(df, tokensCol, vocabSize)
    val lda = new LDA().setK(k).setMaxIter(maxIter).setSeed(seed)
      .setFeaturesCol("features")
    val model = lda.fit(vectorized.select("features"))
    val vocab = cvModel.vocabulary
    val toWords = udf((idx: Seq[Int]) => idx.map(vocab(_)))
    model.describeTopics(termsPerTopic)
      .select(col("topic"),
        array_join(toWords(col("termIndices")), ",").as("top_terms"),
        round(element_at(col("termWeights"), 1), 4).as("w1"))
      .orderBy(col("topic"))
  }

  /** Per-document dominant topic from the fitted LDA model. */
  def ldaDominantTopic(df: DataFrame, idCol: String, tokensCol: String,
      k: Int, maxIter: Int = 10, vocabSize: Int = 1000,
      seed: Long = 42L): DataFrame = {
    val (_, vectorized) = countVectorize(df, tokensCol, vocabSize)
    val model = new LDA().setK(k).setMaxIter(maxIter).setSeed(seed)
      .setFeaturesCol("features").fit(vectorized.select("features"))
    val dominant = udf((v: org.apache.spark.ml.linalg.Vector) => v.argmax)
    model.transform(vectorized)
      .select(col(idCol), dominant(col("topicDistribution")).as("topic"))
  }

  /** Word2Vec embeddings (M15): token sequences → word vectors,
    * fixed seed, returned as (word, vector) rows.
    */
  def word2vec(df: DataFrame, tokensCol: String, dim: Int = 8,
      minCount: Int = 5, seed: Long = 42L): DataFrame = {
    val w2v = new Word2Vec()
      .setInputCol(tokensCol).setOutputCol("vec")
      .setVectorSize(dim).setMinCount(minCount).setSeed(seed)
      .setNumPartitions(1) // >1 trades determinism for speed; callers raise it at scale
    w2v.fit(df).getVectors
  }
}
