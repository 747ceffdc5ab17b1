package graft.tools

/** Scratch verifier: dumps a named query's result to parquet for a
  * local DuckDB oracle cross-check (what the driver's Verify does,
  * but for one query at dev time).
  */
object CheckQ144 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q144_image_phash", "q145_image_phash_pairs")
    val spark = graft.GraftSession.local(8, "graft-check")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, dir)
      df.write.mode("overwrite").parquet(s"/tmp/check_$n")
      println(s"$n rows=" + spark.read.parquet(s"/tmp/check_$n").count())
    }
    spark.stop()
  }
}
