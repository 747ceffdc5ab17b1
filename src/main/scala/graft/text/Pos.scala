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
}
