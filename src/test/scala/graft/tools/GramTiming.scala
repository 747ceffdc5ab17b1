package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: q142 Gramian A/B — declarative aggregate vs BLAS
  * mapPartitions twin. `Test/runMain graft.tools.GramTiming [sfDir]`.
  */
object GramTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[8]"), 8, "gram-timing")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.io.Tables.table(spark, sfDir, "embeddings")
    emb.persist(); emb.count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"GRAMBENCH $label rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (r <- 1 to 3) {
      time(s"aggregate r$r") {
        graft.similarity.Gramian.gramAggregate(emb, "embedding").count()
      }
      time(s"blas r$r") {
        graft.similarity.Gramian.gramBlas(emb, "embedding").count()
      }
    }
    spark.stop()
  }
}
