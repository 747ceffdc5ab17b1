package graft.ops

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ids: Range) =
    ids.map(i => (s"g${i % 3}", i * 0.37)).toDF("g", "v")

  private def collect(df: DataFrame) =
    df.orderBy("g").as[(String, Long, Long, Long, Long, Long)]
      .collect().toList

  test("maintained rollup equals the from-scratch aggregate") {
    val all = rows(0 until 1000)
    val base = rows(0 until 800)
    val delta = rows(800 until 1000)
    val maintained = Incremental.finish(Incremental.merge(
      Incremental.aggState(base, "g", "v"),
      Incremental.aggState(delta, "g", "v")))
    val scratch = Incremental.finish(Incremental.aggState(all, "g", "v"))
    assert(collect(maintained) == collect(scratch))
  }

  test("merge is associative and commutative over batch order") {
    val a = Incremental.aggState(rows(0 until 300), "g", "v")
    val b = Incremental.aggState(rows(300 until 500), "g", "v")
    val c = Incremental.aggState(rows(500 until 900), "g", "v")
    val left = Incremental.merge(Incremental.merge(a, b), c)
    val right = Incremental.merge(a, Incremental.merge(c, b))
    val flat = Incremental.merge(c, a, b)
    assert(collect(Incremental.finish(left))
      == collect(Incremental.finish(right)))
    assert(collect(Incremental.finish(left))
      == collect(Incremental.finish(flat)))
  }

  test("a group present only in the delta appears after merge") {
    val base = Seq(("g0", 1.0)).toDF("g", "v")
    val delta = Seq(("gNEW", 2.5), ("gNEW", 3.5)).toDF("g", "v")
    val merged = collect(Incremental.finish(Incremental.merge(
      Incremental.aggState(base, "g", "v"),
      Incremental.aggState(delta, "g", "v"))))
    assert(merged == List(
      ("g0", 1L, 100L, 100L, 100L, 100L),
      ("gNEW", 2L, 600L, 250L, 350L, 300L)))
  }
}
