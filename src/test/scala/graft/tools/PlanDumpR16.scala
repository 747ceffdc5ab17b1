package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r16 plan-evidence writer for OPERATOR frames whose internals are
  * eager (memoized fits, registry ingests) or wrapped by query-level
  * memos — dumps `explain("formatted")` of the LAZY operator surfaces
  * the r16 diff touched: the SPPMI embed, the DSIR score frame, the
  * NB classify frame, and the PQ frozen-codebook encode (the argmin
  * shape shared by trainEncode/lloydAssign/semDedup).
  * Usage: Test/runMain graft.tools.PlanDumpR16 <sfDir> <outDir> <suffix>
  */
object PlanDumpR16 {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: PlanDumpR16 <sfDir> <outDir> <suffix>")
      sys.exit(2)
    }
    val Array(sfDir, outDir, suffix) = args.take(3)
    val spark = graft.GraftSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt,
      appName = "graft-plan-dump-r16")
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    def dump(name: String, df: DataFrame): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      println(s"[plan-dump-r16] wrote $outDir/${name}_$suffix.txt")
    }
    import graft.io.Tables.table
    val toks = graft.text.TextFunctions.tokens(col("text"))
    val docs = table(spark, sfDir, "documents")

    dump("op_ppmi_embed", graft.topic.Ppmi.embed(
      docs.select(toks.as("toks")), "toks", window = 2, shift = 1))

    dump("op_dsir_scores", graft.pipeline.Dsir.importanceScores(
      docs.select(col("doc_id"), col("text"), col("lang")),
      "doc_id", "text", col("lang") === "en"))

    val d = docs.select(col("doc_id"), col("lang"), toks.as("toks"))
    dump("op_nb_classify", graft.feature.NaiveBayes.classify(
      d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1),
      "doc_id", "toks", "lang"))

    val emb = table(spark, sfDir, "embeddings")
    val (cents, codes) = graft.similarity.Pq.trainEncode(
      emb, "vec_id", "embedding", dim = 64, m = 4, k = 4, iters = 1)
    dump("op_pq_encode", graft.similarity.Pq.encodeWith(
      cents, emb.filter(col("vec_id") < 50), "vec_id", "embedding",
      dim = 64, m = 4))
    codes.unpersist(blocking = false)

    spark.stop()
  }
}
