package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: BPE trainer scaling in k on a real corpus —
  * `Test/runMain graft.tools.BpeTiming [sfDir] [k...]`. Verifies the
  * PERF.md claim that per-round cost stays flat once the lineage
  * checkpoint (Bpe.learnMerges checkpointEvery) truncates the
  * re-segmentation fold, and A/Bs against the un-checkpointed run.
  */
object BpeTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(16, 32, 64)
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[8]"), 8, "bpe-timing")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.io.Tables.table(spark, sfDir, "documents")
    def run(label: String, k: Int, every: Int): Unit = {
      val t0 = System.nanoTime()
      val n = graft.text.Bpe.learnMerges(docs, "text", k, every).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"BPEBENCH $label k=$k merges=$n $sec%.1f s (${sec * 1000 / k}%.0f ms/round)")
    }
    run("warm", 4, 64)
    ks.foreach(k => run("cp16", k, 16))
    run("nocp", ks.max, Int.MaxValue)
    spark.stop()
  }
}
