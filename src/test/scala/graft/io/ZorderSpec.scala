package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZorderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference interleave: bit i of a → bit 2i, bit i of b → 2i+1. */
  private def refZ(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 16) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zvalue matches the bit-by-bit reference interleave") {
    val samples =
      (for (a <- 0L to 64L; b <- 0L to 64L) yield (a, b)) ++
        Seq((65535L, 65535L), (65536L, 1L), (1L, 65536L),
          (123456L, 654321L), (20000L, 1000L), (0L, 0L))
    val got = samples.toDF("a", "b")
      .select($"a", $"b", Zorder.zvalue($"a", $"b").as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) =>
      assert(z == refZ(a & 0xFFFF, b & 0xFFFF), s"($a, $b)")
    }
  }

  test("z-prefix files are aligned rectangles: spans bounded by cell size") {
    // For file = z >> 24, the 24 free low z bits are 12 scaled bits
    // per dimension: scaled spans < 4096. The 0..127 grid scales in
    // steps of 65535 div 127 = 516, so a 4096-wide scaled window
    // covers at most floor(4095/516)+1 = 8 raw values → raw span ≤ 7.
    val grid = (for (a <- 0L until 128L; b <- 0L until 128L)
      yield (a, b)).toDF("a", "b")
    val stats = Zorder.fileStats(grid, "a", "b", shift = 24)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect()
    // 128/8 = 16 cells per side → a full 16×16 grid of files
    assert(stats.length == 256, s"files: ${stats.length}")
    stats.foreach { case (f, _, _, _, _, _, spanA, spanB) =>
      assert(spanA <= 7, s"file $f span_a=$spanA")
      assert(spanB <= 7, s"file $f span_b=$spanB")
    }
  }

  test("written z-layout prunes point queries on BOTH dims; 1-D layouts don't") {
    val base = Files.createTempDirectory("graft-zorder").toString
    val li = spark.read
      .parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select($"l_partkey", $"l_suppkey", $"l_orderkey")
    val n = li.count()
    val files = 16

    Zorder.writeZordered(li, "l_partkey", "l_suppkey", s"$base/z", files)
    // 1-D comparison layouts: ingest order proxy (orderkey) and a
    // single-key sort on partkey
    li.repartitionByRange(files, $"l_orderkey")
      .sortWithinPartitions($"l_orderkey")
      .write.parquet(s"$base/byorder")
    li.repartitionByRange(files, $"l_partkey")
      .sortWithinPartitions($"l_partkey")
      .write.parquet(s"$base/bypart")

    // per-file footer-style min/max for a layout dir
    def bounds(dir: String): Seq[(Long, Long, Long, Long)] =
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-")
          && f.getName.endsWith(".parquet"))
        .toSeq.map { f =>
          spark.read.parquet(f.toString)
            .agg(min($"l_partkey"), max($"l_partkey"),
              min($"l_suppkey"), max($"l_suppkey"))
            .as[(Long, Long, Long, Long)].head()
        }

    def candidates(bs: Seq[(Long, Long, Long, Long)], dim: String,
        v: Long): Int =
      bs.count { case (pMin, pMax, sMin, sMax) =>
        if (dim == "part") pMin <= v && v <= pMax
        else sMin <= v && v <= sMax
      }

    val (zB, oB, pB) =
      (bounds(s"$base/z"), bounds(s"$base/byorder"), bounds(s"$base/bypart"))
    assert(zB.size == files && oB.size == files && pB.size == files)
    // no rows lost by the re-layout
    assert(spark.read.parquet(s"$base/z").count() == n)

    val (pMinV, pMaxV, sMinV, sMaxV) = li
      .agg(min($"l_partkey"), max($"l_partkey"),
        min($"l_suppkey"), max($"l_suppkey"))
      .as[(Long, Long, Long, Long)].head()
    val (pv, sv) = ((pMinV + pMaxV) / 2, (sMinV + sMaxV) / 2)

    val zPart = candidates(zB, "part", pv)
    val zSupp = candidates(zB, "supp", sv)
    // z-order: BOTH dims prune to a strict subset of the files
    assert(zPart * 2 <= files, s"z-layout partkey candidates $zPart/$files")
    assert(zSupp * 2 <= files, s"z-layout suppkey candidates $zSupp/$files")
    // the single-key layouts do not prune their off dimension: the
    // ingest-order layout prunes neither, the partkey sort leaves
    // suppkey point queries touching (almost) every file
    assert(candidates(oB, "part", pv) > zPart)
    assert(candidates(pB, "supp", sv) > zSupp)
    assert(candidates(pB, "supp", sv) >= files - 1)
  }
}
