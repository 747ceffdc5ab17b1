package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Distributed top-k-by-score custom aggregate (SURVEY.md §2.10:
  * the reference has no UDAFs — per-group ranking is done with
  * whole-table sorts or driver-side takes; `Aggregator[IN,BUF,OUT]`
  * is the Spark-native replacement).
  *
  * The buffer holds at most k elements, so partial (map-side)
  * aggregation ships O(k) per group per partition instead of the
  * whole group — for "top 200 tags per user over 100 TB" that is
  * the difference between a bounded shuffle and collecting every
  * tag. Deterministic: score desc, label asc tiebreak.
  */
case class Scored(label: String, score: Double)

class TopKAggregator(k: Int)
  extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def trunc(xs: Seq[Scored]): Seq[Scored] =
    xs.sortBy(s => (-s.score, s.label)).take(k)

  def zero: Seq[Scored] = Seq.empty
  def reduce(b: Seq[Scored], a: Scored): Seq[Scored] = trunc(b :+ a)
  def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = trunc(x ++ y)
  def finish(r: Seq[Scored]): Seq[Scored] = r

  def bufferEncoder: Encoder[Seq[Scored]] = TopKAggregator.seqEncoder
  def outputEncoder: Encoder[Seq[Scored]] = TopKAggregator.seqEncoder
}

object TopKAggregator {
  private[ops] val seqEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
