package graft.tools

import org.apache.spark.sql.SparkSession

/** Micro-timing for q231's two halves: sessionization vs the banded
  * sweep, on a pre-materialized interval table.
  * Test/runMain graft.tools.ConcTiming <sfDir>
  */
object ConcTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[8]"), 8, "conc-timing")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[conc] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val ev = graft.io.Tables.table(spark, sfDir, "events")
    val sess = graft.streaming.Streams.sessionizeBatch(
      ev, "user_id", "ts", "value", gapMs = 30 * 60 * 1000L)
      .persist()
    time("sessionize+persist")(sess.count())
    for (i <- 1 to 3)
      time(s"peakConcurrency run$i")(
        graft.ops.Concurrency.peakConcurrency(
          sess, "session_start", "session_end").collect())
    for (i <- 1 to 2)
      time(s"full q231 run$i")(
        graft.SparkEntry.queries("q231_peak_concurrency")(spark, sfDir)
          .collect())
    spark.stop()
  }
}
