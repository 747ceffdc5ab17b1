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

  test("packSpansGlobal equals the naive global window and constant-shard packSpans") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // ids deliberately sparse and straddling several bands (width 3)
    val df = Seq((1L, 300), (2L, 300), (5L, 100), (7L, 512), (11L, 1),
      (12L, 700), (20L, 64)).toDF("doc_id", "n_toks")
    val banded = Packing.packSpansGlobal(df, "doc_id", "n_toks", 512,
      bandWidth = 3L)
      .select("doc_id", "start_off", "pack_first", "pack_last")
      .as[(Long, Long, Long, Long)].collect().toSet
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = df
      .withColumn("start_off",
        (sum(col("n_toks")).over(w) - col("n_toks")).cast("long"))
      .withColumn("pack_first", floor(col("start_off") / 512))
      .withColumn("pack_last",
        floor((col("start_off") + col("n_toks") - 1) / 512))
      .select("doc_id", "start_off", "pack_first", "pack_last")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(banded === naive)
    val constShard = Packing.packSpans(df.withColumn("s", lit("x")),
      "s", "doc_id", "n_toks", 512)
      .select("doc_id", "start_off", "pack_first", "pack_last")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(banded === constShard)
  }

  test("property: packSpansGlobal equals a scala-side prefix-sum oracle") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      k <- Gen.choose(1, 50)
      ids <- Gen.listOfN(k, Gen.choose(0L, 5000L)).map(_.distinct)
      ns <- Gen.listOfN(k, Gen.choose(1, 700))
      cap <- Gen.choose(64, 1024)
      bw <- Gen.choose(1L, 500L)
    } yield (ids.zip(ns), cap, bw)
    val cases = (0 until 5).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(23L + i)))
    assert(cases.nonEmpty)
    cases.foreach { case (rows, cap, bw) =>
      val df = rows.toDF("doc_id", "n_toks")
      val got = Packing.packSpansGlobal(df, "doc_id", "n_toks", cap, bw)
        .select("doc_id", "start_off", "pack_first", "pack_last")
        .as[(Long, Long, Long, Long)].collect()
        .map { case (id, a, b, c) => id -> ((a, b, c)) }.toMap
      var off = 0L
      rows.sortBy(_._1).foreach { case (id, n) =>
        val want = (off, off / cap, (off + n - 1) / cap)
        assert(got(id) == want, s"id=$id n=$n cap=$cap bw=$bw")
        off += n
      }
    }
  }

  test("packSpansGlobal plans no unpartitioned corpus window") {
    val df = Seq((1L, 10), (2L, 20), (1001L, 30), (2002L, 40))
      .toDF("doc_id", "n_toks")
    val plan = Packing.packSpansGlobal(df, "doc_id", "n_toks", 512)
      .queryExecution.executedPlan.toString.toLowerCase
    val windowSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(windowSpecs.nonEmpty)
    // the corpus-row window must be partitioned by the band: every
    // spec mentioning doc_id (the in-band cumulative) also carries
    // __b as a partition column; the only band-less spec is the
    // carry scan, which orders by __b over one-row-per-band input —
    // a spec ordered by doc_id alone (the naive single-task global
    // cumulative) must not appear
    windowSpecs.foreach { spec =>
      if (spec.contains("doc_id")) assert(spec.contains("__b"),
        s"unbanded corpus window: $spec")
      else assert(spec.contains("__b"), s"unexpected window: $spec")
    }
  }
}
