package graft.ops

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packSpans assigns contiguous offsets and window spans per shard") {
    val df = Seq(
      ("a", 1L, 300), ("a", 2L, 300), ("a", 3L, 100),
      ("b", 1L, 600)).toDF("shard", "doc_id", "n_toks")
    val out = Packing.packSpans(df, "shard", "doc_id", "n_toks", 512)
      .select("shard", "doc_id", "start_off", "pack_first", "pack_last")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      ("a", 1L, 0L, 0L, 0L),     // [0, 300)   in window 0
      ("a", 2L, 300L, 0L, 1L),   // [300, 600) straddles 0→1
      ("a", 3L, 600L, 1L, 1L),   // [600, 700) in window 1
      ("b", 1L, 0L, 0L, 1L)))    // shard b packs independently
  }

  test("exact boundary: a doc ending at capacity stays in its window") {
    val df = Seq(("a", 1L, 512), ("a", 2L, 1)).toDF("shard", "doc_id", "n_toks")
    val out = Packing.packSpans(df, "shard", "doc_id", "n_toks", 512)
      .select("doc_id", "start_off", "pack_first", "pack_last")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out === Set((1L, 0L, 0L, 0L), (2L, 512L, 1L, 1L)))
  }
}
