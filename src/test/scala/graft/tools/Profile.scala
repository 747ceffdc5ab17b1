package graft.tools



import graft.SparkEntry

/** Scratch per-query profiler: runs each named query N times against
  * a scale dir and prints wall times, so anomalies in BENCH_r*.json
  * can be separated into cold-start vs steady-state cost.
  * Usage: runMain graft.tools.Profile <sfDir> <n> <q1> [q2 ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args.drop(2)
    val spark = graft.GraftSession.local(32, "graft-profile")
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-24s ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
