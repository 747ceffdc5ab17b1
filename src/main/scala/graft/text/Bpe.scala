package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Tokenizer-training primitives: the corpus-statistics side of BPE
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
  * with Subword Units"). A BPE trainer's inner loop counts adjacent
  * symbol pairs over the corpus and merges the most frequent pair;
  * the corpus-scale step — and the one worth distributing — is the
  * pair count.
  */
object Bpe {

  /** Word-frequency table: one corpus scan, (word, 1) shuffled with
    * map-side partial aggregation. Words shorter than 2 characters
    * carry no adjacent pair and are dropped here so downstream pair
    * work never sees them.
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Adjacent symbol-pair counts for the first BPE merge iteration,
    * computed over the DISTINCT word table weighted by word
    * frequency — the classic trainer optimization: pair-explode work
    * scales with |vocab| (Zipf-bounded, millions at web scale), not
    * with corpus tokens (trillions). The corpus itself is touched
    * exactly once, inside [[wordCounts]]. Later merge iterations
    * re-run this over the re-segmented vocab table, never over the
    * corpus.
    *
    * Output: (pair, cnt) — each two-character window of each word,
    * weighted by the word's corpus frequency.
    */
  def pairCounts(words: DataFrame): DataFrame =
    words
      // defensive on the public surface: a 1-char word would make
      // sequence(1, 0) DESCEND and emit two bogus windows; wordCounts
      // pre-filters length >= 2 but arbitrary word tables may not
      .filter(length(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
        .as("pair"), col("freq"))
      .groupBy(col("pair"))
      .agg(sum(col("freq")).cast("long").as("cnt"))
}
