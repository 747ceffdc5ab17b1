package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints `explain("formatted")` for selected
  * queries so scan pushdown (PushedFilters/ReadSchema), join
  * strategies (BroadcastHashJoin vs SortMergeJoin) and codegen
  * spans can be inspected. Findings recorded in PLANS.md.
  *
  * Usage: runMain graft.Plans <sfDir> [queryName ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
    else Seq("q01_pricing_summary", "q02_select_cast", "q05_star_join",
      "q48_ann_cosine", "q68_tumbling_window", "q34_doc_tfidf")
    // GraftSession.configure, same as Verify/Bench: the audit must
    // show the product optimizer (AQE, InferFiltersFromGenerate
    // exclusion), not stock defaults.
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[4]"), 4, "graft-plans")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
