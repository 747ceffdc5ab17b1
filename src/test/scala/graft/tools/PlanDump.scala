package graft.tools

import java.nio.file.{Files, Paths}

/** Dump `explain("formatted")` of named queries to
  * `<outDir>/<q>_<suffix>.txt` — the per-round plan-evidence writer.
  * Usage: Test/runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> <q...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println(
        "usage: PlanDump <sfDir> <outDir> <suffix> [queryName...]")
      sys.exit(2)
    }
    val Array(sfDir, outDir, suffix, names @ _*) = args: @unchecked
    val spark = graft.GraftSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt,
      appName = "graft-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      println(s"[plan-dump] wrote $outDir/${name}_$suffix.txt " +
        s"(${txt.linesIterator.size} lines)")
    }
    spark.stop()
  }
}
