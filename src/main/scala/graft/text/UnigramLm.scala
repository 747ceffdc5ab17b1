package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer (Kudo 2018, "Subword Regularization" — the
  * SentencePiece unigram model): the second tokenizer family beside
  * [[Bpe]]. Where BPE greedily merges pairs, the unigram model
  * scores a CANDIDATE-PIECE vocabulary by corpus likelihood and
  * segments each word with Viterbi — the decomposition used by
  * Llama-style sentencepiece tokenizers.
  *
  * Exactness contract: piece scores are floored-e6 fixed-point log
  * probabilities (`floor(1e6·(ln c − ln total))` on identical IEEE
  * doubles — the q140 NgramLm convention), so the Viterbi DP runs
  * over PURE INTEGERS with a deterministic tie rule (score desc,
  * then longer last piece), and an engine replaying the same DP
  * levels reproduces segmentations bit-exactly.
  *
  * Scale shape: the corpus is touched exactly once (word counts,
  * map-side combined); every other step — substring explode, vocab
  * cut, DP — runs over the DISTINCT word table, which is
  * Zipf-bounded (millions of rows at web scale, not trillions of
  * tokens). The trained vocab (≤ topV + alphabet rows of integers)
  * is the bounded collected artifact; application is a per-word
  * kernel over a broadcast score map, embarrassingly parallel at
  * any corpus size.
  */
object UnigramLm {

  /** Longest candidate piece, and the DP lookback bound. */
  val MaxPieceLen = 4

  /** e6-scaled log-prob charged per OOV character (a char absent
    * from the trained vocab, possible only on input the vocab was
    * not trained on): very negative so any in-vocab segmentation
    * wins, far from Long.MinValue so sums never wrap.
    */
  val UnkScoreE6 = -1000000000000L

  /** Words longer than this are excluded from the oracle-replayed
    * segmentation QUERY (the unrolled DP has one CTE level per
    * character); [[segmentWord]] itself handles any length.
    */
  val MaxWordLen = 16

  /** Word-frequency table over whitespace tokens — length ≥ 1
    * (unlike BPE's ≥ 2: a single-char word still carries unigram
    * evidence), same supplementary-plane guard as [[Bpe]] (UTF-16
    * vs codepoint substring semantics can never agree there).
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 1)
      .filter(!col("w").rlike("[\\uD800-\\uDFFF]"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Corpus-weighted candidate piece counts: every substring of
    * length 1..[[MaxPieceLen]] of every distinct word, weighted by
    * the word's corpus frequency. Runs over the distinct-word table
    * (the Zipf bound); the nested-transform explode emits
    * O(len·MaxPieceLen) pieces per word.
    */
  def pieceCounts(words: DataFrame): DataFrame =
    words.select(col("freq"), explode(flatten(transform(
        sequence(lit(1), length(col("w"))),
        i => transform(
          sequence(i, least(i + lit(MaxPieceLen - 1),
            length(col("w")))),
          j => col("w").substr(i, j - i + lit(1))))))
      .as("piece"))
      .groupBy(col("piece")).agg(sum(col("freq")).as("c"))

  /** The scored vocabulary: ALL single-character pieces (coverage —
    * Viterbi is always feasible) plus the top-`topV` multi-character
    * pieces by (count desc, piece asc). `score_e6` is the floored-e6
    * log probability against the selected vocab's total count —
    * negative integers, summed exactly by the DP.
    */
  def vocab(docs: DataFrame, textCol: String,
      topV: Int = 512): DataFrame = {
    val pc = pieceCounts(wordCounts(docs, textCol))
    val singles = pc.filter(length(col("piece")) === 1)
    val multis = pc.filter(length(col("piece")) >= 2)
      .orderBy(col("c").desc, col("piece")).limit(topV)
    val voc = singles.unionByName(multis)
    val tot = voc.agg(sum(col("c")).as("t"))
    voc.crossJoin(broadcast(tot))
      .select(col("piece"), col("c"),
        floor(lit(1000000.0) * (log(col("c")) - log(col("t"))))
          .cast("long").as("score_e6"))
  }

  /** Viterbi-segment one word against an integer score map: at each
    * end position take the candidate maximizing total score, ties to
    * the LONGER last piece — the same hierarchical argmax an engine
    * replays level-by-level with `row_number() OVER (ORDER BY score
    * DESC, l DESC)`. Returns (pipe-joined pieces, piece count,
    * total score). Single-char pieces are always in the vocab, so
    * the DP never dead-ends.
    */
  def segmentWord(w: String,
      scores: collection.Map[String, Long]): (String, Int, Long) = {
    val n = w.length
    val best = new Array[Long](n + 1)
    val bl = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      var bs = Long.MinValue
      var bestL = 0
      var l = 1
      val lMax = math.min(MaxPieceLen, j)
      while (l <= lMax) {
        // a prefix at Long.MinValue is unreachable — extending it
        // would wrap the sum positive and fake a best path
        if (best(j - l) != Long.MinValue) {
          scores.get(w.substring(j - l, j)) match {
            case Some(s) =>
              val sc = best(j - l) + s
              if (sc > bs || (sc == bs && l > bestL)) {
                bs = sc; bestL = l
              }
            case None =>
          }
        }
        l += 1
      }
      if (bestL == 0) {
        // OOV character: no vocab piece ends here — emit the single
        // char as an <unk>-penalized piece so every position stays
        // reachable (backtrack can never see bl == 0 and loop)
        bs = best(j - 1) + UnkScoreE6
        bestL = 1
      }
      best(j) = bs; bl(j) = bestL
      j += 1
    }
    var pos = n
    var cnt = 0
    val stack = new scala.collection.mutable.ArrayDeque[String]()
    while (pos > 0) {
      val l = bl(pos)
      stack.prepend(w.substring(pos - l, pos))
      cnt += 1
      pos -= l
    }
    (stack.mkString("|"), cnt, best(n))
  }

  /** Segment a distinct-word table with a trained vocab (collected
    * as the bounded integer artifact it is, broadcast to the kernel):
    * adds (seg, n_pieces, score_e6). The corpus never moves — at
    * 100 TB this is a scan-speed map over the Zipf-bounded word
    * table, then a broadcast join back to tokens if per-document
    * pieces are needed.
    */
  def segmentWords(words: DataFrame, voc: DataFrame): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val scoreMap = voc.select(col("piece"), col("score_e6"))
      .as[(String, Long)].collect().toMap
    val bc = spark.sparkContext.broadcast(scoreMap)
    val segUdf = udf { (w: String) =>
      val (seg, n, s) = segmentWord(w, bc.value)
      (seg, n, s)
    }
    words.withColumn("__seg", segUdf(col("w")))
      .select(col("w"), col("freq"), col("__seg._1").as("seg"),
        col("__seg._2").cast("long").as("n_pieces"),
        col("__seg._3").as("score_e6"))
  }
}
