package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  test("clean: html stripped, short docs dropped, dups removed, entities tagged") {
    val docs = Seq(
      (1L, "<p>" + ("the quick brown fox jumps over a hash join plan " * 3)
        + "</p>"),
      (2L, "<p>" + ("the quick brown fox jumps over a hash join plan " * 3)
        + "</p>"), // exact dup of 1 after cleaning
      (3L, "<b>too short</b>")
    ).toDF("doc_id", "html")
    val out = Pipelines.clean(docs, "doc_id", "html",
      entityDict = Seq("hash join"), minChars = 50)
    val rows = out.select("doc_id", "content", "tagged")
      .as[(Long, String, String)].collect()
    assert(rows.map(_._1).toSeq == Seq(1L))
    assert(!rows(0)._2.contains("<p>"))
    assert(rows(0)._3.contains(
      graft.text.Html.entityOpen + "hash join" + graft.text.Html.entityClose))
  }

  test("assembleCorpus: per-class caps and labels") {
    val docs = (1L to 100L).map(i => (i, if (i <= 60) 10 else 900))
      .toDF("doc_id", "n_chars")
    val corpus = Pipelines.assembleCorpus(docs, Seq(
      Pipelines.ClassSpec("short", col("n_chars") < 500, cap = 20),
      Pipelines.ClassSpec("long", col("n_chars") >= 500, cap = 50)),
      tiebreak = Seq(col("doc_id")))
    val byLabel = corpus.groupBy("label").count()
      .as[(String, Long)].collect().toMap
    assert(byLabel == Map("short" -> 20L, "long" -> 40L)) // long has only 40
    // deterministic keep set: lowest doc_ids
    val kept = corpus.filter($"label" === "short")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == (1L to 20L))
  }

  test("entityProfiles: top-k tags per entity") {
    val docs = Seq(
      ("u1", "spark spark shuffle"),
      ("u2", "pandas pandas dataframe")).toDF("user", "text")
    val out = Pipelines.entityProfiles(docs, "user", "text", k = 2)
    val tags = out.as[(String, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(tags("u1").contains("spark"))
    assert(tags("u2").contains("pandas"))
    assert(tags.values.forall(_.size <= 2))
  }

  test("keywords: per-doc tfidf top terms") {
    val docs = Seq(
      (1L, "alpha alpha beta"),
      (2L, "beta gamma gamma")).toDF("doc_id", "text")
    val out = Pipelines.keywords(docs, "doc_id", "text", k = 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "alpha", 2L -> "gamma"))
  }

  test("nearDedup drops near-duplicates, keeps the min id and uniques") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base),
      (2L, base),                       // exact dup of 1
      (9L, "completely different content about query engines and joins")
    ).toDF("doc_id", "text")
    val kept = Pipelines.nearDedup(docs, "doc_id", "text", jaccardMin = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 9L))
  }

  test("curate chains quality, dedup, clustering, decontam, and caps") {
    val long = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " +
      "one two three four five six seven eight nine ten eleven twelve").trim
    // same tokens, different order: distinct md5 (passes exact dedup)
    // but an IDENTICAL simhash (token votes are order-independent),
    // so the near-dup stage must catch it at any maxHamming
    val nearVariant = long.split(" ").reverse.mkString(" ")
    val docs = Seq(
      (1L, long, "a"),                       // survives, cluster min
      (2L, long, "a"),                       // exact dup of 1 → dropped
      (3L, nearVariant, "a"),                // near dup of 1 → dropped
      (4L, "too short", "a"),                // quality gate → dropped
      (5L, "the benchmark question asks about spark catalyst rules " +
        "and adaptive execution behavior during shuffles today", "b"),
      (6L, "unrelated clean document discussing storage formats and " +
        "columnar layouts with plenty of distinct tokens here", "b")
    ).toDF("doc_id", "text", "cls")
    val benchmark = Seq(
      Tuple1("the benchmark question asks about spark catalyst rules " +
        "and answers it")).toDF("text")
    val kept = Pipelines.curate(docs, "doc_id", "text", "cls",
      benchmark, cap = 10, minChars = 50)
      .select("doc_id").as[Long].collect().toSet
    // 5 shares the "benchmark question asks" trigrams → decontaminated
    assert(kept == Set(1L, 6L))

    // cap = 1 keeps exactly one doc per class, deterministically
    val capped = Pipelines.curate(docs, "doc_id", "text", "cls",
      benchmark, cap = 1, minChars = 50)
      .select("doc_id").as[Long].collect().toSet
    assert(capped.size == 2)
    assert(capped.subsetOf(Set(1L, 6L)))
  }

  test("decontaminateBloom: no false negatives, bounded false positives") {
    val bench = Seq(
      Tuple1("the held out benchmark asks about catalyst optimizer rules"))
      .toDF("text")
    // 200 distinct clean docs + 1 contaminated (shares bench trigrams)
    val clean = (1L to 200L).map(i =>
      (i, s"clean document number $i discussing storage item$i layout " +
        s"and partition strategy variant$i today"))
    val docs = (clean :+
      (999L, "something about catalyst optimizer rules appears here"))
      .toDF("doc_id", "text")
    val out = Pipelines.decontaminateBloom(docs, "doc_id", "text",
      bench, "text", expectedItems = 1000L, fpp = 0.01)
      .select("doc_id", "n_flagged").as[(Long, Int)].collect().toMap
    // Bloom guarantee: the truly contaminated doc is ALWAYS flagged
    assert(out(999L) > 0)
    // false positives over-drop at a bounded rate: with fpp=1% and
    // ~15 trigrams per doc, expected flagged-clean share is a few
    // percent — assert a generous ceiling, not exactness
    val falsePos = clean.count { case (id, _) => out(id) > 0 }
    assert(falsePos <= 40, s"false positives: $falsePos of 200")
  }

  test("embeddingDedup drops cosine-identical vectors keeping min id") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (5L, Seq(2.0f, 0.0f, 0.0f)),   // parallel to 1 → dup
      (9L, Seq(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val kept = Pipelines.embeddingDedup(vecs, "vec_id", "embedding",
      cosMin = 0.999)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 9L))
  }

  test("budgetSelect equals the naive global-window prefix sum exactly") {
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11)
    // scores spanning several buckets at width 100, incl. negatives
    // and within-bucket ties broken by id
    val rows = (1L to 200L).map(id =>
      (id, (rnd.nextInt(1200) - 200).toLong, (1 + rnd.nextInt(50)).toLong))
    val docs = rows.toDF("id", "score", "cost")
    val budget = 2500L

    val fast = Pipelines.budgetSelect(docs, "id", "score", "cost",
      budget, bucketWidth = 100L)
      .select($"id", $"cum_cost").as[(Long, Long)].collect().toMap

    val w = Window.orderBy($"score".desc, $"id")
      .rowsBetween(Window.unboundedPreceding, 0)
    val naive = docs.withColumn("cum", sum($"cost").over(w))
      .filter($"cum" <= budget)
      .select($"id", $"cum").as[(Long, Long)].collect().toMap

    assert(fast == naive)
    assert(fast.nonEmpty && fast.size < rows.size) // budget actually binds
  }

  test("budgetSelect keeps a row only while the running cost fits") {
    val docs = Seq(
      (1L, 30L, 4L), (2L, 20L, 4L), (3L, 10L, 4L)
    ).toDF("id", "score", "cost")
    // budget 8: rows 1 and 2 fit (cum 4, 8); row 3 would hit 12
    val out = Pipelines.budgetSelect(docs, "id", "score", "cost",
      budget = 8L, bucketWidth = 5L)
      .select($"id", $"cum_cost").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 4L, 2L -> 8L))
  }
}
