package graft.tools

import org.apache.spark.sql.functions._

/** Disposable scratch main for interactive debugging. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4, "graft-scratch")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val tmp = System.getProperty("java.io.tmpdir")
    val base = s"$tmp/graft_scratch_${System.nanoTime()}"
    spark.sql("DROP TABLE IF EXISTS scr_src")
    spark.sql(
      s"""CREATE TABLE scr_src (h STRING, keep_id BIGINT, batch_no INT)
         |USING parquet
         |CLUSTERED BY (h) SORTED BY (h) INTO 4 BUCKETS
         |LOCATION '$base/src'""".stripMargin)
    (1 to 40).map(i => (s"h$i", i.toLong, 0))
      .toDF("h", "keep_id", "batch_no")
      .write.mode("append").insertInto("scr_src")
    spark.sql("DROP TABLE IF EXISTS scr_tmp")
    spark.sql(s"CREATE TABLE scr_tmp LIKE scr_src LOCATION '$base/tmpdir'")
    println("=== SHOW CREATE TABLE scr_tmp ===")
    spark.sql("SHOW CREATE TABLE scr_tmp").collect().foreach(r => println(r.getString(0)))
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$base/tmpdir"))
    val df = spark.table("scr_src").localCheckpoint()
      .repartition(4, col("h"))
    df.write.mode("append").insertInto("scr_tmp")
    println("=== files in tmpdir ===")
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/tmpdir"))
      .map(_.getPath.getName).sorted.foreach(println)
    // r13 shape: localCheckpoint then overwrite in place
    val pinned = spark.table("scr_src").localCheckpoint()
    pinned.repartition(4, col("h"))
      .write.mode("overwrite").insertInto("scr_src")
    println("=== files in src after r13-shape overwrite-compact ===")
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/src"))
      .map(_.getPath.getName).sorted.foreach(println)
    spark.stop()
  }
}
