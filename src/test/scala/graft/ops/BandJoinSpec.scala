package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BandJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bandPairs equals brute force, including negative keys and bucket edges") {
    // values straddling bucket boundaries and zero: the pairs that
    // break a truncating (non-floor) bucket function
    val xs = Seq(-25L, -21L, -20L, -11L, -10L, -1L, 0L, 1L, 9L, 10L,
      11L, 19L, 20L, 33L, 100L)
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("id", "x")
    val eps = 10L
    val got = BandJoin.bandPairs(df, "id", "x", df, "id", "x", eps)
      .select($"id_l", $"id_r").as[(Long, Long)].collect().toSet
    val rows = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
    val expected = (for {
      (il, xl) <- rows; (ir, xr) <- rows
      if math.abs(xl - xr) <= eps
    } yield (il, ir)).toSet
    assert(got == expected)
    // sanity: a cross-bucket pair exists (e.g. 9 and 11 sit in
    // different buckets but are in band)
    val id9 = rows.find(_._2 == 9L).get._1
    val id11 = rows.find(_._2 == 11L).get._1
    assert(got.contains((id9, id11)))
    // and a same-distance-but-out-of-band pair does not
    assert(!got.exists { case (a, b) =>
      math.abs(rows(a.toInt)._2 - rows(b.toInt)._2) > eps })
  }

  test("each qualifying pair is emitted exactly once") {
    val df = Seq((1L, 5L), (2L, 7L)).toDF("id", "x")
    val got = BandJoin.bandPairs(df, "id", "x", df, "id", "x", 10L)
      .collect()
    // 2 self pairs + 2 cross pairs, no duplicates from the explode
    assert(got.length == 4)
  }
}
