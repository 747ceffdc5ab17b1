package graft.tools

import org.apache.spark.sql.SparkSession

/** r16 A/B harness: run a query list under extra session confs, fresh
  * session per variant, N repeats per query (first = cold, rest =
  * warm). Conf pairs come from SPARK_GRAFT_AB_CONF ("k=v;k=v").
  * Usage: Test/runMain graft.tools.AbR16 <sfDir> <n> <q1> [q2 ...]
  */
object AbR16 {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: AbR16 <sfDir> <n> <q1> [q2 ...]  (confs via SPARK_GRAFT_AB_CONF)")
      sys.exit(2)
    }
    val sfDir = args(0)
    val n = args(1).toInt
    val names = args.drop(2)
    val extra = sys.env.getOrElse("SPARK_GRAFT_AB_CONF", "")
      .split(";").iterator.map(_.trim).filter(_.nonEmpty)
      .map(_.split("=", 2)).collect { case Array(k, v) => (k, v) }.toSeq
    var b = graft.GraftSession.configure(
      SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-ab-r16")
    extra.foreach { case (k, v) => b = b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[ab] conf: ${extra.map { case (k, v) => s"$k=$v" }.mkString(" ")}")
    // same warm-up shape as Bench
    graft.io.Tables.names.foreach { t =>
      try graft.io.Tables.table(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    try spark.range(1000000).selectExpr("id % 7 AS k", "id AS v")
      .groupBy("k").count().count()
    catch { case _: Throwable => () }
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(2000000L).selectExpr("id % 97 AS k", "id AS v")
        .groupBy("k").sum("v").count()
      (System.nanoTime() - t0) / 1e9
    }
    sentinel()
    println(f"[ab] sentinel ${sentinel()}%.3f ${sentinel()}%.3f")
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[ab] $name%-24s ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    println(f"[ab] sentinel ${sentinel()}%.3f")
    spark.stop()
  }
}
