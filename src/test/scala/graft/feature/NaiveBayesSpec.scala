package graft.feature

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (0L, "en", "the cat sat"),
    (2L, "en", "the dog sat"),
    (4L, "fr", "le chat assis"),
    (6L, "fr", "le chien assis"),
    // test docs
    (1L, "en", "the cat"),
    (3L, "fr", "le chien chien"),
    (5L, "en", "zzz unseen words only")
  ).toDF("doc_id", "lang", "text")
    .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))

  test("classify matches a hand-computed fixed-point NB model") {
    val d = fixture
    val train = d.filter(col("doc_id") % 2 === 0)
    val test = d.filter(col("doc_id") % 2 === 1)
    val out = NaiveBayes.classify(train, test, "doc_id", "toks", "lang")
      .orderBy(col("doc_id"))
      .as[(Long, String, Long)].collect()

    // hand model: vocab V=8 {the,cat,sat,dog,le,chat,assis,chien},
    // per-label token totals 6/6, priors 2/4 each.
    val V = 8.0
    def contribFx(c: Long, tot: Double): Long =
      math.floor(1e6 * (math.log(c + 1.0) - math.log(tot + V))).toLong
    def priorFx(nl: Long, n: Double): Long =
      math.floor(1e6 * math.log(nl / n)).toLong
    val missEn = contribFx(0, 6.0); val missFr = contribFx(0, 6.0)
    val prior = priorFx(2, 4.0)
    // doc 1 "the cat": en counts the=2, cat=1; fr counts 0,0
    val s1en = prior + contribFx(2, 6.0) + contribFx(1, 6.0)
    val s1fr = prior + 2 * missFr
    assert(s1en > s1fr)
    // doc 3 "le chien chien": fr le=2, chien=1 (x2 occurrences)
    val s3fr = prior + contribFx(2, 6.0) + 2 * contribFx(1, 6.0)
    assert(out.toSeq === Seq((1L, "en", s1en), (3L, "fr", s3fr)))
    // doc 5: all tokens out-of-vocab -> no row
    assert(!out.map(_._1).contains(5L))
    assert(missEn === missFr) // symmetric fixture sanity
  }

  test("scores are partition-layout independent and ties break by label") {
    val d = fixture
    val train = d.filter(col("doc_id") % 2 === 0)
    val test = d.filter(col("doc_id") % 2 === 1)
    val a = NaiveBayes.classify(train, test, "doc_id", "toks", "lang")
      .orderBy(col("doc_id")).as[(Long, String, Long)].collect().toSeq
    val b = NaiveBayes.classify(
      train.repartition(7), test.repartition(5), "doc_id", "toks", "lang")
      .orderBy(col("doc_id")).as[(Long, String, Long)].collect().toSeq
    assert(a === b)

    // a test doc whose in-vocab evidence is symmetric between labels
    // ties on score and must resolve to the smaller label
    val tied = Seq((9L, "x", "the le")).toDF("doc_id", "lang", "text")
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("toks"))
    val t = NaiveBayes.classify(train, tied, "doc_id", "toks", "lang")
      .as[(Long, String, Long)].collect()
    assert(t.length === 1 && t.head._2 === "en")
  }

  test("fitCompact + score equals classify exactly at full vocab") {
    val d = fixture
    val train = d.filter(col("doc_id") % 2 === 0)
    val test = d.filter(col("doc_id") % 2 === 1)
    val model = NaiveBayes.fitCompact(train, "toks", "lang")
    val batch = NaiveBayes.classify(train, test, "doc_id", "toks", "lang")
      .as[(Long, String, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val compact = test.select(col("doc_id"), col("toks"))
      .as[(Long, Seq[String])].collect()
      .flatMap { case (id, toks) => model.score(toks).map(id -> _) }.toMap
    assert(compact === batch)
    // out-of-vocab-only doc scores None, like classify emits no row
    assert(model.score(Seq("zzz", "yyy")).isEmpty)
    // vocab cap keeps only the top terms: capped model still scores
    // docs containing a kept term, drops those with only rare terms
    val capped = NaiveBayes.fitCompact(train, "toks", "lang", vocabCap = 2)
    assert(capped.delta.size === 2)
  }

  test("fitCompact warns when vocabCap estimates past the driver bound") {
    val train = fixture.filter(col("doc_id") % 2 === 0)
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    // a cap sized for a web corpus on a toy driver budget: the
    // sampled-footprint estimate must fire BEFORE the collect
    val m = NaiveBayes.fitCompact(train, "toks", "lang",
      vocabCap = 500000000, onWarn = warnings += _)
    assert(warnings.nonEmpty && warnings.head.contains("fitCompact"))
    // advisory, not fatal: the model still fits (actual vocab is tiny)
    assert(m.score(Seq("the", "cat")).nonEmpty)
    // the default cap on the same data stays silent
    warnings.clear()
    NaiveBayes.fitCompact(train, "toks", "lang", onWarn = warnings += _)
    assert(warnings.isEmpty)
  }
}
