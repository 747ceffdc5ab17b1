package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: BPE trainer scaling in k on a real corpus —
  * `Test/runMain graft.tools.BpeTiming [sfDir] [k...]`. Verifies the
  * PERF.md claim that per-round cost stays flat once the lineage
  * checkpoint (Bpe.learnMerges checkpointEvery) truncates the
  * re-segmentation fold, and A/Bs against the un-checkpointed run.
  *
  * The documents corpus has only 30 distinct words, so its merge
  * space saturates at 88 (= Σ len(w)−1) — useless for proving real
  * k. `rich:<sfDir>` derives a large-merge-space corpus from the
  * same testdata instead: 4k distinct md5(orderkey|linenumber) hex
  * strings as words (16-symbol alphabet, 32 chars each → ~124k merge
  * candidates), which sustains thousands of GENUINE merge rounds.
  */
object BpeTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(16, 32, 64)
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[8]"), 8, "bpe-timing")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs =
      if (sfDir.startsWith("rich:")) {
        import org.apache.spark.sql.functions.{md5, concat_ws, col}
        graft.io.Tables.table(spark, sfDir.stripPrefix("rich:"), "lineitem")
          .select(md5(concat_ws("|",
            col("l_orderkey"), col("l_linenumber"))).as("text"))
          .distinct().limit(4000)
      }
      else graft.io.Tables.table(spark, sfDir, "documents")
    def run(label: String, k: Int, every: Int): Unit = {
      val t0 = System.nanoTime()
      val n = graft.text.Bpe.learnMerges(docs, "text", k, every).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"BPEBENCH $label k=$k merges=$n $sec%.1f s (${sec * 1000 / k}%.0f ms/round)")
    }
    run("warm", 4, 64)
    ks.foreach(k => run("cp16", k, 16))
    // the un-checkpointed A/B is the quadratic-plan baseline — only
    // meaningful (and only survivable) at small k
    if (ks.max <= 128) run("nocp", ks.max, Int.MaxValue)
    spark.stop()
  }
}
