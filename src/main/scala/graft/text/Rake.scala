package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** RAKE keyword extraction (SURVEY.md M6; reference
  * SearchwordLabelRake.scala:18-124 and clones).
  *
  * Pure per-document Scala kernel: sentences split on punctuation,
  * candidate phrases are maximal stopword-free token runs (bounded
  * length), word score = degree/frequency, phrase score = sum of
  * word scores. No cluster state — the kernel runs map-side inside
  * `Dataset.map`/UDF, so it scales linearly with documents and
  * never shuffles.
  */
object Rake {

  val defaultStopwords: Set[String] = TextFunctions.stopwordsEn.toSet

  case class Scored(phrase: String, score: Double)

  /** Candidate phrases: maximal runs of non-stopword tokens, at most
    * `maxWords` long (reference caps at 2; we default 3).
    */
  def candidatePhrases(text: String, stopwords: Set[String],
      maxWords: Int = 3): Seq[Seq[String]] = {
    val sentences = text.toLowerCase.split("[.!?;:]+").toSeq
    sentences.flatMap { s =>
      val toks = s.split("[^a-z0-9']+").filter(_.nonEmpty).toSeq
      // split runs at stopwords
      val runs = collection.mutable.ArrayBuffer[Vector[String]]()
      var cur = Vector.empty[String]
      toks.foreach { t =>
        if (stopwords.contains(t)) {
          if (cur.nonEmpty) { runs += cur; cur = Vector.empty }
        } else cur :+= t
      }
      if (cur.nonEmpty) runs += cur
      runs.flatMap { run =>
        if (run.size <= maxWords) Seq(run)
        else run.sliding(maxWords).toSeq // long runs: windowed candidates
      }
    }
  }

  /** Full RAKE: top-k phrases by score desc, phrase asc (stable).
    * Scores are rounded to 4 decimals BEFORE ranking — sub-ulp
    * engine differences in the double sum must never decide a rank
    * (the project-wide convention for every ranked score), and the
    * rounded rational can't sit on a rounding boundary (it would
    * need a factor 5^4 in a word-frequency denominator).
    */
  def extract(text: String, stopwords: Set[String] = defaultStopwords,
      maxWords: Int = 3, topK: Int = 10): Seq[Scored] = {
    val phrases = candidatePhrases(text, stopwords, maxWords)
    if (phrases.isEmpty) return Seq.empty
    val freq = collection.mutable.HashMap[String, Int]().withDefaultValue(0)
    val deg = collection.mutable.HashMap[String, Int]().withDefaultValue(0)
    phrases.foreach { p =>
      p.foreach { w =>
        freq(w) += 1
        deg(w) += p.size - 1
      }
    }
    def wordScore(w: String): Double =
      (deg(w) + freq(w)).toDouble / freq(w).toDouble
    phrases.distinct
      .map(p => Scored(p.mkString(" "),
        math.rint(p.map(wordScore).sum * 10000) / 10000))
      .sortBy(s => (-s.score, s.phrase))
      .take(topK)
  }

  /** Column form: array<struct<phrase,score>> of top-k keywords. */
  def rakeUdf(topK: Int = 10,
      stopwords: Set[String] = defaultStopwords): Column => Column = {
    val f = udf { (text: String) =>
      if (text == null) Seq.empty[Scored]
      else extract(text, stopwords, topK = topK)
    }
    c => f(c)
  }
}
