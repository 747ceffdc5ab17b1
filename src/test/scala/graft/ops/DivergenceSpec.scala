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

  test("tokenLabelMi: brute-force replay; discriminating beats independent; presence-based") {
    // 4 pos docs, 4 neg docs: 'sig' only in pos (perfect signal),
    // 'noise' in half of each (independent), 'all' everywhere
    // (zero-information), 'spam' repeated 5x in ONE pos doc
    // (presence-based: counts once)
    val docs = Seq(
      (1L, "sig noise all spam spam spam spam spam"),
      (1L, "sig all"), (1L, "sig noise all"), (1L, "sig all"),
      (0L, "noise all"), (0L, "all"), (0L, "noise all"), (0L, "all"))
      .toDF("pos", "text")
      .select(col("pos"), toks.as("toks"))
    val out = Divergence.tokenLabelMi(docs, "toks", "pos")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // presence-based: spam appears once though repeated 5x
    assert(out("spam")._2 == 1L && out("spam")._3 == 0L)
    // perfect discriminator: MI(t) = ln 2 up to 4 cell floors
    // (cells: (4/8)ln2 + 0 + 0 + (4/8)ln2)
    assert(out("sig")._4 > 693147L - 4 && out("sig")._4 <= 693147L)
    // independent token: every cell term is exactly 0 (ratio 1)
    assert(out("noise")._4 == 0L)
    // ubiquitous token: present row is the whole corpus → 0
    assert(out("all")._4 == 0L)
    // full brute-force replay of every term
    val (nn, n1t) = (8L, 4L)
    out.values.foreach { case (t, np, nq, mi) =>
      def cell(c: Long, r: Long, q: Long): Long =
        if (c <= 0) 0L
        else math.floor((c.toDouble / nn) *
          math.log((c.toDouble * nn) / (r.toDouble * q)) * 1e6).toLong
      val rp = np + nq
      val expect = cell(np, rp, n1t) + cell(nq, rp, nn - n1t) +
        cell(n1t - np, nn - rp, n1t) + cell((nn - n1t) - nq, nn - rp, nn - n1t)
      assert(mi == expect, t)
    }
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
