package graft.tools


import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.io.Tables.table

/** Ad-hoc timing harness for decomposing a slow query into stages. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "graft-scratch")
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f")
      r
    }
    // warm-up
    spark.range(1000000).selectExpr("id % 7 AS k").groupBy("k").count().count()

    // ---- q49/q80 decomposition ----
    import graft.similarity.Ann
    val emb = table(spark, sfDir, "embeddings")
    t("emb count")(emb.count())
    val sig0 = emb.select(col("vec_id"), col("embedding"),
      Ann.rhpSignature(col("embedding"), 8).as("sig"),
      sqrt(Ann.dot(col("embedding"), col("embedding"))).as("nrm"))
    t("sig forced")(sig0.agg(sum(col("sig")), sum(col("nrm"))).first())
    t("sig forced x2")(sig0.agg(sum(col("sig")), sum(col("nrm"))).first())
    val sigP = sig0.persist()
    sigP.count()
    val a49 = sigP.select(col("sig"), col("vec_id").as("query_id"),
      col("embedding").as("qv"), col("nrm").as("qn"))
    val b49 = sigP.select(col("sig"), col("vec_id").as("neighbor_id"),
      col("embedding").as("cv"), col("nrm").as("cn"))
    val scored49 = a49.join(b49, "sig")
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", round(
        Ann.dot(col("qv"), col("cv")) / (col("qn") * col("cn")), 6))
    t("bucket join+dot")(scored49.count())
    t("bucket join+dot x2")(scored49.count())
    val w49 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    t("window+filter")(
      scored49.withColumn("rank", row_number().over(w49))
        .filter(col("rank") <= 5).count())
    val scoredP = scored49.persist()
    t("scored persist")(scoredP.count())
    t("window on persisted")(
      scoredP.withColumn("rank", row_number().over(w49))
        .filter(col("rank") <= 5).count())
    t("window no-filter")(
      scoredP.withColumn("rank", row_number().over(w49))
        .agg(sum(col("rank"))).first())
    scoredP.unpersist()
    t("q49 full")(Ann.lshTopK(emb, "vec_id", "embedding", 8, 5).count())
    t("q80-style allpairs")(
      Ann.cosineDupPairs(emb, "vec_id", "embedding", 0.99).count())
    sigP.unpersist()

    val docs = table(spark, sfDir, "documents").filter(col("doc_id") < 200)
    t("read+count")(docs.count())
    val tk = docs.select(graft.text.TextFunctions.tokens(col("text")).as("t"))
    t("tokens forced")(tk.agg(sum(size(col("t")))).first())
    t("tokens forced x2")(tk.agg(sum(size(col("t")))).first())
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
    t("shingles forced")(sh.agg(sum(size(col("sh")))).first())
    t("shingles forced x2")(sh.agg(sum(size(col("sh")))).first())
    val mh = docs.select(
      Dedup.minhashSignatureFast(Dedup.shingles(col("text"), 3), 8).as("s"))
    t("minhash forced")(mh.agg(sum(size(col("s")))).first())
    t("minhash forced x2")(mh.agg(sum(size(col("s")))).first())
    val keys = docs.select(col("doc_id"),
      Dedup.bandKeysFast(Dedup.shingles(col("text"), 3), 8, 4).as("bands"))
    t("bandKeysFast forced")(keys.agg(sum(size(col("bands")))).first())
    t("bandKeysFast forced x2")(keys.agg(sum(size(col("bands")))).first())
    val keyed = keys.select(col("doc_id"), explode(col("bands")).as("band"))
    t("explode")(keyed.count())
    t("explode x2")(keyed.count())
    keyed.explain("formatted")
    val persisted = keys.persist()
    t("persist keys")(persisted.agg(sum(size(col("bands")))).first())
    t("explode after persist")(
      persisted.select(col("doc_id"), explode(col("bands")).as("band")).count())
    val exprKeys = docs.select(col("doc_id"),
      Dedup.bandKeys(
        Dedup.minhashSignatureFast(Dedup.shingles(col("text"), 3), 8), 4, 2)
        .as("bands"))
    t("explode exprBands")(
      exprKeys.select(explode(col("bands")).as("band")).count())
    t("full lshCandidates")(
      Dedup.lshCandidates(docs, "doc_id", "text").count())
    spark.stop()
  }
}
