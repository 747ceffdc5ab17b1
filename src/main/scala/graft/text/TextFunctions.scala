package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text kernels (SURVEY.md §2.9 M1/M9/M10 + the
  * training-data-pipeline extensions: language ID, quality scoring,
  * token counting, fingerprinting).
  *
  * Everything here is built from codegen'd built-in functions and
  * higher-order array functions — no Scala UDFs — so the kernels
  * stay inside whole-stage codegen and distribute trivially: each is
  * a narrow per-row transform, no shuffle, no driver state. That is
  * the property that lets the same expression run unchanged over
  * 100 TB of documents.
  */
object TextFunctions {

  /** Whitespace tokenization (the documents table is pre-normalized
    * space-separated text). For raw corpora use [[tokensRegex]].
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Regex tokenization: alphanumeric runs, lowercased. */
  def tokensRegex(text: Column): Column =
    split(lower(trim(regexp_replace(text, "[^A-Za-z0-9]+", " "))), " ")

  /** BPE-ish token counting (reference counts tokens for corpus
    * stats; an LLM pipeline needs a cheap token estimate): words,
    * digit runs, and individual punctuation each count as one token.
    */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))

  /** n-grams over a token array as space-joined strings
    * (M1, NewsNgrams.scala:17-32 sliding windows — rebuilt as a
    * higher-order function instead of an RDD map).
    */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Compiled kernel form of [[ngrams]] — identical output
    * (TextFunctionsSpec pins the equality, including array_join's
    * null-skipping). The expression form's per-element slice +
    * array_join runs interpreted (higher-order functions have no
    * codegen) and dominated every explode-ngrams query profile;
    * the kernel is one JIT-compiled sliding pass.
    */
  def ngramsFast(toks: Column, n: Int): Column = ngramsUdf(n)(toks)

  /** Compiled kernel: the number of DISTINCT n-token windows,
    * counted over 64-bit window digests of per-token FNV-1a hashes —
    * no n-gram string is ever built and nothing but a long-set
    * allocates. Digest distinct equals string distinct up to 64-bit
    * collisions (tokens are space-free, so windows biject to their
    * joined strings; a collision would surface against the
    * string-distinct oracles at test SFs). An expression-form
    * twin (transform/zip_with) ran interpreted and benched 2×
    * SLOWER one-shot than the string path it replaced — the win
    * only exists as a JIT-compiled pass (PERF r7).
    */
  def distinctNgramCountFast(toks: Column, n: Int): Column =
    distinctNgramCountUdf(n)(toks)

  private def distinctNgramCountUdf(n: Int) = udf { (t: Seq[String]) =>
    if (t == null || t.length < n) 0L
    else {
      val len = t.length
      val th = new Array[Long](len)
      var i = 0
      while (i < len) {
        val s = t(i)
        var h = 0xcbf29ce484222325L // FNV-1a offset basis
        if (s != null) {
          var j = 0
          while (j < s.length) {
            h ^= s.charAt(j); h *= 0x100000001b3L; j += 1
          }
        }
        th(i) = h
        i += 1
      }
      val seen = new java.util.HashSet[java.lang.Long]()
      i = 0
      while (i <= len - n) {
        var h = 0x9E3779B97F4A7C15L
        var j = 0
        while (j < n) {
          h = java.lang.Long.rotateLeft(h ^ th(i + j), 27) *
            0x100000001b3L
          j += 1
        }
        seen.add(h)
        i += 1
      }
      seen.size.toLong
    }
  }

  private def ngramsUdf(n: Int) = udf { (t: Seq[String]) =>
    if (t == null || t.length < n) Seq.empty[String]
    else {
      val out = new Array[String](t.length - n + 1)
      var i = 0
      while (i <= t.length - n) {
        val sb = new java.lang.StringBuilder
        var j = 0
        var first = true
        while (j < n) {
          val e = t(i + j)
          if (e != null) {          // array_join skips null elements
            if (!first) sb.append(' ')
            sb.append(e)
            first = false
          }
          j += 1
        }
        out(i) = sb.toString
        i += 1
      }
      out.toSeq
    }
  }

  /** All n-grams for n in [minN, maxN] (reference extracts 1..4). */
  def ngramsRange(toks: Column, minN: Int, maxN: Int): Column =
    flatten(array((minN to maxN).map(n => ngrams(toks, n)): _*))

  /** Compiled kernel: every n-gram for n in [minN, maxN], each
    * tagged with its size — `array<struct<_1:int,_2:string>>`. One
    * JIT sliding pass replaces the interpreted
    * flatten-of-transforms that a per-size struct tagging costs
    * per row (the q107 profile); gram text matches [[ngramsFast]]
    * byte-for-byte (array_join null-skip included).
    */
  def taggedNgramsFast(toks: Column, minN: Int, maxN: Int): Column =
    taggedNgramsUdf(minN, maxN)(toks)

  private def taggedNgramsUdf(minN: Int, maxN: Int) = udf {
    (t: Seq[String]) =>
      if (t == null) Seq.empty[(Int, String)]
      else {
        val out = Seq.newBuilder[(Int, String)]
        var n = minN
        while (n <= maxN) {
          var i = 0
          while (i <= t.length - n) {
            val sb = new java.lang.StringBuilder
            var j = 0
            var first = true
            while (j < n) {
              val e = t(i + j)
              if (e != null) {
                if (!first) sb.append(' ')
                sb.append(e)
                first = false
              }
              j += 1
            }
            out += ((n, sb.toString))
            i += 1
          }
          n += 1
        }
        out.result()
      }
  }

  /** Keep only n-grams whose token lengths fit the reference's
    * bounds (NewsNgrams.scala:145-146: 3..40 chars per gram).
    */
  def boundedNgrams(toks: Column, minN: Int, maxN: Int,
      minLen: Int, maxLen: Int): Column =
    filter(ngramsRange(toks, minN, maxN),
      g => length(g) >= minLen && length(g) <= maxLen)

  /** Overlapping token-window chunks (LLM-pipeline chunking): a
    * window of `chunkSize` tokens starts every `stride` tokens until
    * the doc is exhausted (the final windows are shorter). Returns an
    * array of (chunk_idx, chunk) structs — pure higher-order
    * expressions, so chunking is a narrow per-row transform that
    * never shuffles; explode downstream to get one row per chunk.
    */
  def tokenChunks(toks: Column, chunkSize: Int, stride: Int): Column =
    transform(
      sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(stride)),
      off => struct((off / stride).cast("int").as("chunk_idx"),
        slice(toks, off + 1, lit(chunkSize)).as("chunk")))

  /** Dictionary match (M9 wiki/entity membership,
    * PrepProcess.scala:84-105): tokens present in a small dict —
    * the dict travels as a literal array (broadcast-equivalent).
    */
  def dictMatch(toks: Column, dict: Seq[String]): Column =
    array_sort(array_intersect(toks, array(dict.map(lit): _*)))

  /** Sensitive-word hits (M10, SensitiveWordsStatic.scala:26-39). */
  def sensitiveHits(toks: Column, words: Seq[String]): Column =
    dictMatch(toks, words)

  /** Unicode accent folding + lowercasing — the standard pretraining
    * text normalizer (NFKD decomposition, combining marks stripped,
    * ROOT-locale lowercase). A compiled kernel: Spark has no NFKD
    * builtin, and java.text.Normalizer is the reference
    * implementation of the published algorithm (UAX #15). Verified
    * cross-engine: agrees with DuckDB's `lower(strip_accents(x))` on
    * Latin diacritics (the q121 oracle); NFKD additionally folds
    * compatibility forms (ligatures, full-width) that strip_accents
    * leaves — documented superset behavior.
    */
  def foldAccents(text: Column): Column = foldAccentsUdf(text)

  private val foldAccentsUdf = udf { (s: String) =>
    if (s == null) null
    else java.text.Normalizer
      .normalize(s, java.text.Normalizer.Form.NFKD)
      .replaceAll("\\p{M}+", "")
      .toLowerCase(java.util.Locale.ROOT)
  }

  /** Per-document most-frequent n-gram for each size in
    * [minN, maxN], computed entirely map-side — the Gopher
    * repetition signal is a PER-DOCUMENT statistic, so shuffling the
    * exploded gram stream only to group it back by document (the
    * q107 shape before r10) moves ~tokens×sizes rows per doc for no
    * cross-document information. This kernel counts each size's
    * grams in one hash map per (row, size) and emits the (count
    * desc, gram asc) winner, so the whole operator fuses into the
    * scan: zero exchanges beyond presentation.
    *
    * Returns array<struct<_1:n, _2:gram, _3:count>> ordered by n;
    * sizes with no gram (too few tokens) are absent. Tie-break is
    * String.compareTo (UTF-16 code units) == UTF-8 binary order on
    * ASCII/BMP text — the same order the grouped-aggregate form and
    * the DuckDB oracle use on this corpus.
    */
  def topNgramPerSize(toks: Column, minN: Int, maxN: Int): Column =
    topNgramUdf(minN, maxN)(toks)

  private def topNgramUdf(minN: Int, maxN: Int) = udf {
    (t: Seq[String]) =>
      if (t == null) Seq.empty[(Int, String, Long)]
      else {
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Int, String, Long)]
        var n = minN
        while (n <= maxN) {
          if (t.length >= n) {
            val m = new java.util.HashMap[String, java.lang.Long]()
            var i = 0
            while (i <= t.length - n) {
              val sb = new java.lang.StringBuilder()
              var j = 0
              while (j < n) {
                if (j > 0) sb.append(' ')
                sb.append(t(i + j))
                j += 1
              }
              m.merge(sb.toString, java.lang.Long.valueOf(1L),
                (a, b) => java.lang.Long.valueOf(a.longValue + b.longValue))
              i += 1
            }
            var bestG: String = null
            var bestC = 0L
            val it = m.entrySet().iterator()
            while (it.hasNext) {
              val e = it.next()
              val c = e.getValue.longValue
              if (bestG == null || c > bestC ||
                  (c == bestC && e.getKey.compareTo(bestG) < 0)) {
                bestG = e.getKey; bestC = c
              }
            }
            out += ((n, bestG, bestC))
          }
          n += 1
        }
        out.toSeq
      }
  }

  /** Unicode NFC canonical composition (UAX #15) — the lossless
    * sibling of [[foldAccents]]: decomposed accents and singleton
    * compatibility points (Å vs A+ring, Ω vs ohm sign) collapse to
    * one canonical spelling WITHOUT dropping content, so dedup,
    * shingling and tokenization see one byte sequence per grapheme.
    * A native codegen expression
    * ([[graft.expressions.NfcNormalize]]) with a zero-allocation
    * fast path for already-NFC rows (nearly all of a real corpus).
    * Cross-engine: agrees with DuckDB's `nfc_normalize` (q159).
    */
  def nfc(text: Column): Column = {
    import org.apache.spark.sql.GraftShim
    GraftShim.column(graft.expressions.NfcNormalize(
      GraftShim.expression(text)))
  }

  /** Order-independent document fingerprint: md5 of the sorted
    * distinct token set. Stable under token reordering — the cheap
    * "same bag of words" dedup key.
    */
  def fingerprint(toks: Column): Column =
    md5(array_join(array_sort(array_distinct(toks)), " "))

  /** Content hash for exact dedup (M11 exact stage). */
  def contentHash(text: Column): Column = md5(text)

  // ---- language ID (n-gram/stopword heuristic) ----

  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un"),
    "fr" -> Seq("le", "les", "de", "et", "une", "est", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"))

  private def markerHits(toks: Column, lang: String): Column =
    size(filter(toks,
      t => array_contains(array(langMarkers(lang).map(lit): _*), t)))

  /** Heuristic language label: argmax of marker-word hits with a
    * deterministic tie order (en > es > fr > de), 'und' when no
    * marker appears. At 100 TB this is a pure map-side expression.
    */
  def langId(toks: Column): Column = {
    val en = markerHits(toks, "en")
    val es = markerHits(toks, "es")
    val fr = markerHits(toks, "fr")
    val de = markerHits(toks, "de")
    when(en === 0 && es === 0 && fr === 0 && de === 0, lit("und"))
      .when(en >= es && en >= fr && en >= de, lit("en"))
      .when(es >= fr && es >= de, lit("es"))
      .when(fr >= de, lit("fr"))
      .otherwise(lit("de"))
  }

  // ---- quality scoring ----

  val stopwordsEn: Seq[String] = Seq(
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "for",
    "on", "with", "as", "at", "by", "this", "that")

  /** Ratio of characters outside [a-z0-9 ] — punctuation/noise. */
  def punctRatio(text: Column): Column =
    round(length(regexp_replace(text, "[a-z0-9 ]", "")) /
      length(text).cast("double"), 4)

  /** Unrounded stopword-token ratio — shared by the rounded public
    * form below and score formulas that fold it into their own
    * discretization (Features.linearQualityScore).
    */
  def stopwordRatioRaw(toks: Column): Column =
    size(filter(toks,
      t => array_contains(array(stopwordsEn.map(lit): _*), t))) /
      size(toks).cast("double")

  /** Ratio of stopword tokens — a floor on "natural" text. */
  def stopwordRatio(toks: Column): Column =
    round(stopwordRatioRaw(toks), 4)

  /** Mean token length. */
  def avgTokenLen(toks: Column): Column =
    round(aggregate(toks, lit(0),
      (acc, t) => acc + length(t)).cast("double") /
      size(toks).cast("double"), 4)

  /** Composite quality gate in the spirit of the reference's
    * length-floor filters (ArticleInfoProcess.scala:70: content>100
    * chars) extended with ratio checks for pre-training data.
    */
  def qualityOk(text: Column, toks: Column,
      minChars: Int = 100, maxPunct: Double = 0.1,
      minStop: Double = 0.01): Column =
    (length(text) >= minChars) &&
      (punctRatio(text) <= maxPunct) &&
      (stopwordRatio(toks) >= minStop)
}
