package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off A/B for the PPJoin filters in dedup.SetJoin: counts the
  * candidate pairs that reach exact Jaccard verification with
  * prefix-share pruning only vs with the length + positional filters
  * added, on the q183 input (documents + planted near-variants,
  * 3-shingles, t = 3/5). The verification join is the dominant cost
  * of q183, so the candidate count IS the cost model.
  * Usage: Test/runMain graft.tools.SetJoinAb <sfDir>
  */
object SetJoinAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32, "setjoin-ab")
    spark.sparkContext.setLogLevel("WARN")
    val (tNum, tDen) = (3, 5)
    val d = graft.io.Tables.table(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val docs = d.unionByName(
      d.filter(col("doc_id") % 7 === 0)
        .withColumn("text", concat(col("text"), lit(" nd"),
          (col("doc_id") % 4).cast("string")))
        .withColumn("doc_id", col("doc_id") + 200000L))

    // the same sorted/prefix build as SetJoin.jaccardJoin
    val toks = docs.select(col("doc_id").as("__id"),
      graft.dedup.Dedup.shingles(col("text"), 3).as("__ts"))
    val dfq = toks.select(explode(col("__ts")).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    val sorted = toks.select(col("__id"), explode(col("__ts")).as("__t"))
      .join(dfq, "__t")
      .groupBy(col("__id"))
      .agg(expr("transform(array_sort(collect_list(struct(__df, __t)))," +
        " x -> x.__t)").as("__sts"))
      .withColumn("__l", size(col("__sts")))
      .persist()
    val pre = sorted.select(col("__id"), col("__l"),
      posexplode(expr(
        s"slice(__sts, 1, __l - ((__l * $tNum + $tDen - 1) div $tDen) + 1)"))
        .as(Seq("__p", "__pt")))

    val shared = pre.select(col("__pt"), col("__id").as("id_a"),
        col("__l").as("__la"), col("__p").as("__pa"))
      .join(pre.select(col("__pt"), col("__id").as("id_b"),
        col("__l").as("__lb"), col("__p").as("__pb")), "__pt")
      .filter(col("id_a") < col("id_b"))

    def count2(df: DataFrame, label: String): Long = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[setjoin-ab] $label%-28s $n%10d pairs  ${(System.nanoTime() - t0) / 1e9}%.2f s")
      n
    }
    val prefixOnly = count2(
      shared.select(col("id_a"), col("id_b")).distinct(), "prefix-share only")
    val withLen = count2(
      shared.filter(greatest(col("__la"), col("__lb")) * tNum <=
          least(col("__la"), col("__lb")) * tDen)
        .select(col("id_a"), col("id_b")).distinct(), "+ length filter")
    val withPos = count2(
      shared.filter(greatest(col("__la"), col("__lb")) * tNum <=
          least(col("__la"), col("__lb")) * tDen)
        .groupBy(col("id_a"), col("id_b"))
        .agg(min(col("__pa")).as("__pa"), min(col("__pb")).as("__pb"),
          first(col("__la")).as("__fla"), first(col("__lb")).as("__flb"))
        .filter(least(col("__fla") - col("__pa"), col("__flb") - col("__pb"))
          * (tNum + tDen) >= (col("__fla") + col("__flb")) * tNum),
      "+ positional filter")
    println(f"[setjoin-ab] survivors: ${withPos * 100.0 / prefixOnly}%.1f%% of prefix-only" +
      f" (length cut ${(prefixOnly - withLen) * 100.0 / prefixOnly}%.1f%%," +
      f" positional cut ${(withLen - withPos) * 100.0 / prefixOnly}%.1f%%)")
    spark.stop()
  }
}
