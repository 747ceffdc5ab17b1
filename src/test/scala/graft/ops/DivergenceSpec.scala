package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DivergenceSpec extends SparkSpec {
  import spark.implicits._

  private def toks = graft.text.TextFunctions.tokens(col("text"))

  private def df(rows: Seq[String]) =
    rows.toDF("text").select(toks.as("toks"))

  test("identical slices diverge by exactly zero, term by term") {
    val a = df(Seq("x y z x", "y y w"))
    val out = Divergence.jsTerms(a, a, "toks")
      .as[(String, Long, Long, Long)].collect()
    assert(out.length == 4)
    out.foreach { case (t, na, nb, e) =>
      assert(na == nb, t); assert(e == 0L, t)
    }
  }

  test("disjoint vocabularies read the ln2 bound; brute-force replay matches") {
    val a = df(Seq("aa bb aa", "cc"))
    val b = df(Seq("dd dd", "ee ff"))
    val out = Divergence.jsTerms(a, b, "toks")
      .as[(String, Long, Long, Long)].collect()
    val (ta, tb) = (out.map(_._2).sum, out.map(_._3).sum)
    val brute = out.map { case (t, na, nb, e) =>
      val pa = na.toDouble / ta
      val pb = nb.toDouble / tb
      val m = (pa + pb) / 2.0
      val term = (if (na > 0) pa * math.log(pa / m) else 0.0) +
        (if (nb > 0) pb * math.log(pb / m) else 0.0)
      val expect = math.floor(term * 500000.0).toLong
      assert(e == expect, t)
      e
    }.sum
    // fully disjoint slices: JSD = ln 2 (up to the per-term floors)
    assert(brute <= 693147L && brute > 693147L - out.length)
  }

  test("zero counts contribute zero to their own side, not NaN") {
    // 'y' appears only in b: its a-side term must be exactly 0, the
    // b-side term positive; nothing NaN/null anywhere
    val rows = Divergence.jsTerms(df(Seq("x x")), df(Seq("x y")), "toks")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.keySet == Set("x", "y"))
    assert(rows("y")._2 == 0L && rows("y")._4 > 0L)
    assert(rows.values.forall(_._4 >= 0L))
  }
}
