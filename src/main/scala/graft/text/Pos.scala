package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** POS-filtered token/ngram extraction (SURVEY.md M8; reference
  * URLTextCoreNLPTokens.scala:21-389 and clones run a CoreNLP-family
  * tagger, keep NN/JJ/VB unigrams and NN-NN/VB-NN/NN-VB/JJ-NN
  * bigrams).
  *
  * Per SURVEY §7.4(4) the engine defines the operator contract —
  * tagged tokens in, filtered tokens out — with a pluggable tagger.
  * The default tagger is a deterministic suffix/stopword heuristic
  * expressed as a codegen'd CASE chain: no model jar, and any SQL
  * engine can replay it, which is what makes the operator
  * oracle-verifiable. Swap [[posTag]] for a real tagger UDF and
  * every downstream operator is unchanged.
  */
object Pos {

  val Noun = "NN"; val Verb = "VB"; val Adj = "JJ"; val Adv = "RB"
  val Other = "OT"

  /** Heuristic tag: stopword → OT, -ly → RB, -ing/-ed → VB,
    * -ous/-ful/-ive/-al → JJ, else NN.
    */
  def posTag(tok: Column): Column =
    when(tok.isin(TextFunctions.stopwordsEn: _*), Other)
      .when(tok.endsWith("ly"), Adv)
      .when(tok.endsWith("ing") || tok.endsWith("ed"), Verb)
      .when(tok.endsWith("ous") || tok.endsWith("ful") ||
        tok.endsWith("ive") || tok.endsWith("al"), Adj)
      .otherwise(Noun)

  /** Tags for a token array. */
  def tags(toks: Column): Column = transform(toks, posTag(_))

  /** Unigrams whose tag is in `keep` (reference keeps NN/JJ/VB). */
  def filteredTokens(toks: Column,
      keep: Seq[String] = Seq(Noun, Adj, Verb)): Column =
    filter(toks, t => posTag(t).isin(keep: _*))

  /** Consecutive bigrams whose tag pair is an allowed pattern
    * (reference: NN-NN, VB-NN, NN-VB, JJ-NN). Emitted as
    * "t1 t2" strings.
    */
  def patternBigrams(toks: Column,
      patterns: Seq[(String, String)] = Seq(
        (Noun, Noun), (Verb, Noun), (Noun, Verb), (Adj, Noun))): Column =
    bigramsImpl(toks, patterns.map { case (a, b) => s"$a-$b" })

  private def bigramsImpl(toks: Column, pats: Seq[String]): Column =
    graft.ops.Exprs.bind(toks) { tk =>
      filter(
        when(size(tk) >= 2,
          transform(sequence(lit(1), size(tk) - 1), i =>
            concat(element_at(tk, i), lit(" "), element_at(tk, i + 1))))
          .otherwise(array().cast("array<string>")),
        bg => {
          val a = split(bg, " ").getItem(0)
          val b = split(bg, " ").getItem(1)
          concat(posTag(a), lit("-"), posTag(b)).isin(pats: _*)
        })
    }

  /** Compiled kernel form of [[patternBigrams]] — identical output
    * (PosSpec pins the equality). The expression form re-tags both
    * tokens of every bigram through an interpreted 10-branch CASE
    * chain plus a split() per filter evaluation; the kernel tags each
    * token once and slides.
    */
  def patternBigramsFast(toks: Column,
      patterns: Seq[(String, String)] = Seq(
        (Noun, Noun), (Verb, Noun), (Noun, Verb), (Adj, Noun))): Column = {
    val pats = patterns.map { case (a, b) => s"$a-$b" }.toSet
    patternBigramsUdf(pats)(toks)
  }

  private val stopSet = TextFunctions.stopwordsEn.toSet

  /** JVM twin of [[posTag]] — same branch order, same suffixes. */
  private[text] def posTagJvm(tok: String): String =
    if (tok == null) null
    else if (stopSet.contains(tok)) Other
    else if (tok.endsWith("ly")) Adv
    else if (tok.endsWith("ing") || tok.endsWith("ed")) Verb
    else if (tok.endsWith("ous") || tok.endsWith("ful") ||
      tok.endsWith("ive") || tok.endsWith("al")) Adj
    else Noun

  private def patternBigramsUdf(pats: Set[String]) = udf { (t: Seq[String]) =>
    if (t == null || t.length < 2) Seq.empty[String]
    else {
      val tags = t.map(posTagJvm)
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < t.length - 1) {
        // the expression form builds "a b" then splits on the FIRST
        // space to re-derive a — tokens from split(text," ") never
        // contain spaces, so tagging the original tokens matches
        if (tags(i) != null && tags(i + 1) != null &&
          pats.contains(tags(i) + "-" + tags(i + 1)))
          out += t(i) + " " + t(i + 1)
        i += 1
      }
      out.result()
    }
  }
}
