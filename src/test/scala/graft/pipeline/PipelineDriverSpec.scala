package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec

/** The CLI ingest loop's exactly-once contract (r13 verdict #7):
  * the committed-batches ledger makes a scheduler retry of a
  * COMPLETED batch a no-op end-to-end — registry AND output file
  * trees byte-identical — while new batch numbers continue the
  * cross-run loop against the attached registries. (The cross-JVM
  * shape is additionally smoke-proven by running the actual
  * `PipelineDriver ingest` main in separate forked JVMs — r13/r14
  * session logs; this spec pins the ledger semantics in-suite.)
  */
class PipelineDriverSpec extends SparkSpec {
  import spark.implicits._

  private def long(salt: String): String =
    (1 to 30).map(i => s"cli${salt}x$i").mkString(" ")

  private def tree(base: String): Set[(String, Long)] = {
    val root = new java.io.File(base)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      else Seq(f)
    walk(root).map(f => (f.getAbsolutePath.stripPrefix(base),
      f.length())).toSet
  }

  test("a completed batch retry is a no-op (ledger-gated); new batch " +
      "numbers continue against the attached registries") {
    val base = Files.createTempDirectory("graft-cli-ledger").toString
    val docs = Seq((1L, long("aa")), (2L, long("bb")))
      .toDF("doc_id", "text")
    assert(PipelineDriver.runIngest(spark, docs, s"$base/out0",
      s"$base/reg", buckets = 4, batchNo = 0, bench = None),
      "first run of batch 0 must execute")
    val out0 = spark.read.parquet(s"$base/out0")
      .select($"doc_id").as[Long].collect().toSet
    assert(out0 == Set(1L, 2L))
    val snapshot = tree(base)
    // the retry: same batch number, ledger stamped → no-op
    assert(!PipelineDriver.runIngest(spark, docs, s"$base/out0",
      s"$base/reg", buckets = 4, batchNo = 0, bench = None),
      "retry of a committed batch must be skipped")
    assert(tree(base) == snapshot,
      "retry must leave the whole file tree untouched")
    // the next day's batch: re-sent copy drops, novel doc survives
    val docs1 = Seq((10L, long("aa")), (11L, long("cc")))
      .toDF("doc_id", "text")
    assert(PipelineDriver.runIngest(spark, docs1, s"$base/out1",
      s"$base/reg", buckets = 4, batchNo = 1, bench = None))
    assert(spark.read.parquet(s"$base/out1")
      .select($"doc_id").as[Long].collect().toSet == Set(11L))
  }
}
