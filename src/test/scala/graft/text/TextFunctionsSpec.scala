package graft.text

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def ngramsOf(text: String, n: Int): Seq[String] =
    Seq(text).toDF("t")
      .select(TextFunctions.ngrams(TextFunctions.tokens(col("t")), n).as("g"))
      .as[Seq[String]].head()

  test("ngrams slides a window of n tokens") {
    assert(ngramsOf("a b c d", 2) == Seq("a b", "b c", "c d"))
    assert(ngramsOf("a b c d", 4) == Seq("a b c d"))
    assert(ngramsOf("a b", 3) == Seq.empty)
  }

  test("property: ngram count = max(0, tokens - n + 1)") {
    val gen = for {
      k <- Gen.choose(1, 10)
      ws <- Gen.listOfN(k, Gen.resize(6, Gen.alphaLowerStr).suchThat(_.nonEmpty))
      n <- Gen.choose(1, 5)
    } yield (ws, n)
    // seeded scalacheck generation — deterministic 30-case sweep
    val cases = (0 until 30).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)))
    assert(cases.nonEmpty)
    cases.foreach { case (ws, n) =>
      val got = ngramsOf(ws.mkString(" "), n).size
      assert(got == math.max(0, ws.size - n + 1),
        s"tokens=${ws.size} n=$n got=$got")
    }
  }

  test("ngramsFast kernel matches the expression form") {
    val gen = for {
      k <- Gen.choose(0, 12)
      ws <- Gen.listOfN(k, Gen.resize(6, Gen.alphaLowerStr))
      n <- Gen.choose(1, 5)
    } yield (ws, n)
    val cases = (0 until 40).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(7L + i)))
    assert(cases.nonEmpty)
    cases.foreach { case (ws, n) =>
      val both = Seq(ws).toDF("toks")
        .select(TextFunctions.ngrams(col("toks"), n).as("expr"),
          TextFunctions.ngramsFast(col("toks"), n).as("fast"))
        .as[(Seq[String], Seq[String])].head()
      assert(both._1 == both._2, s"tokens=$ws n=$n")
    }
    // null elements: array_join skips them — the kernel must too
    val withNull = Seq(Seq("a", null, "c")).toDF("toks")
      .select(TextFunctions.ngrams(col("toks"), 2).as("expr"),
        TextFunctions.ngramsFast(col("toks"), 2).as("fast"))
      .as[(Seq[String], Seq[String])].head()
    assert(withNull._1 == withNull._2)
  }

  test("distinctNgramCountFast equals string-distinct, incl. repeats") {
    val gen = for {
      k <- Gen.choose(0, 15)
      // tiny alphabet forces repeated windows
      ws <- Gen.listOfN(k, Gen.oneOf("a", "b", "ab", "ba"))
      n <- Gen.choose(1, 4)
    } yield (ws, n)
    val cases = (0 until 50).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(11L + i)))
    assert(cases.nonEmpty)
    cases.foreach { case (ws, n) =>
      val both = Seq(ws).toDF("toks")
        .select(
          size(array_distinct(TextFunctions.ngramsFast(col("toks"), n)))
            .cast("long").as("ref"),
          TextFunctions.distinctNgramCountFast(col("toks"), n)
            .as("fast"))
        .as[(Long, Long)].head()
      assert(both._1 == both._2, s"tokens=$ws n=$n")
    }
    // and on real corpus text at n=3 (the q140 kernel's shape)
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TextFunctions.tokens(col("text")).as("toks"))
    val diff = docs.select(
      size(array_distinct(TextFunctions.ngramsFast(col("toks"), 3)))
        .cast("long").as("ref"),
      TextFunctions.distinctNgramCountFast(col("toks"), 3).as("fast"))
      .filter(col("ref") =!= col("fast")).count()
    assert(diff == 0)
  }

  test("ngramsRange concatenates each n's grams") {
    val out = Seq("a b c").toDF("t")
      .select(TextFunctions.ngramsRange(
        TextFunctions.tokens(col("t")), 1, 3).as("g"))
      .as[Seq[String]].head()
    assert(out == Seq("a", "b", "c", "a b", "b c", "a b c"))
  }

  test("boundedNgrams filters by character length") {
    val out = Seq("ab cde f").toDF("t")
      .select(TextFunctions.boundedNgrams(
        TextFunctions.tokens(col("t")), 1, 2, minLen = 2, maxLen = 5).as("g"))
      .as[Seq[String]].head()
    // "ab cde" (6 chars) exceeds maxLen; "f" (1 char) is under minLen
    assert(out == Seq("ab", "cde", "cde f"))
  }

  test("tokensRegex lowercases and strips punctuation") {
    val out = Seq("Hello, World!  42x").toDF("t")
      .select(TextFunctions.tokensRegex(col("t")).as("g"))
      .as[Seq[String]].head()
    assert(out == Seq("hello", "world", "42x"))
  }

  test("tokenCountBpe counts words, digit runs, punctuation") {
    val out = Seq("hello world 42, done.").toDF("t")
      .select(TextFunctions.tokenCountBpe(col("t")).as("n"))
      .as[Int].head()
    // hello|world|42|,|done|.  = 6
    assert(out == 6)
  }

  test("dictMatch returns sorted dictionary hits") {
    val out = Seq("the quick brown fox").toDF("t")
      .select(TextFunctions.dictMatch(
        TextFunctions.tokens(col("t")), Seq("fox", "quick", "cat")).as("g"))
      .as[Seq[String]].head()
    assert(out == Seq("fox", "quick"))
  }

  test("foldAccents strips diacritics, folds compatibility forms, lowers") {
    val out = Seq("Café ﬁne ＦＵＬＬ Ñaïve").toDF("t")
      .select(TextFunctions.foldAccents(col("t")).as("n"))
      .as[String].head()
    // NFKD folds the fi ligature and full-width letters too —
    // superset of plain accent stripping (documented)
    assert(out == "cafe fine full naive")
    val nul = Seq(Tuple1(null: String)).toDF("t")
      .select(TextFunctions.foldAccents(col("t")).as("n"))
      .as[String].head()
    assert(nul == null)
  }

  test("fingerprint is order- and duplicate-independent") {
    val fps = Seq("b a c a", "a b c", "c b a").toDF("t")
      .select(TextFunctions.fingerprint(TextFunctions.tokens(col("t"))).as("f"))
      .as[String].collect()
    assert(fps.distinct.length == 1)
  }

  test("langId picks the language with most marker hits") {
    val out = Seq(
      "the cat is in the house",
      "el gato que en la casa",
      "le chat est dans les arbres",
      "der hund ist ein tier und nicht",
      "zzz qqq www").toDF("t")
      .select(TextFunctions.langId(TextFunctions.tokens(col("t"))).as("l"))
      .as[String].collect().toSeq
    assert(out == Seq("en", "es", "fr", "de", "und"))
  }

  test("quality ratios behave on clean vs noisy text") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and runs on",
      "@@@ ### !!! %%% ^^^").toDF("t")
      .select(col("t"),
        TextFunctions.punctRatio(col("t")).as("punct"),
        TextFunctions.stopwordRatio(TextFunctions.tokens(col("t"))).as("stop"))
    val rows = df.as[(String, Double, Double)].collect()
    assert(rows(0)._2 == 0.0 && rows(0)._3 > 0.2)
    assert(rows(1)._2 > 0.7 && rows(1)._3 == 0.0)
  }
}
