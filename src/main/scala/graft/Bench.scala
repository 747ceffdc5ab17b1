package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: JVM/codegen init, parquet footer reads, and the
    // first shuffle's machinery otherwise land entirely on whichever
    // query the Map iteration happens to run first (~4-5 s of noise on
    // a sub-second query in earlier rounds). Table counts are metadata-
    // cheap; the small aggregate exercises codegen + exchange once.
    graft.io.Tables.names.foreach { n =>
      try graft.io.Tables.table(spark, sfDir, n).count()
      catch { case _: Throwable => () }
    }
    try {
      spark.range(1000000).selectExpr("id % 7 AS k", "id AS v")
        .groupBy("k").count().count()
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // 3-decimal values keep the whole line ~2 KB: the driver captures only
    // the tail of stdout, and a longer line gets truncated mid-JSON.
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
