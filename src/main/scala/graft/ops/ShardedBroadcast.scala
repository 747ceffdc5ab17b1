package graft.ops

import scala.reflect.ClassTag

import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.util.SizeEstimator

/** Sharded broadcast for dictionaries too large for one comfortable
  * broadcast (SURVEY.md X5; reference `LightldaPreProcess.scala:86-108`
  * `multiBroadcast`: shards a Seq at 1M elements per broadcast and
  * prints a size-estimate warning above 5 GB recommending a join).
  *
  * Spark's TorrentBroadcast already chunks one broadcast's payload,
  * so sharding is not about wire transfer — it is about (a) not
  * holding the whole collection as one JVM object on the driver and
  * each executor during serialization, and (b) the operator contract:
  * a size estimate up front, a loud warning when the data has
  * outgrown the broadcast pattern entirely. Above the warn threshold
  * the right plan is a shuffle join against a real table — sharded
  * or not, a broadcast of that size is the wrong tool, which is
  * exactly what the reference's warning says.
  */
object ShardedBroadcast {

  /** Elements per shard — the reference's 100*10000. */
  val DefaultShardSize: Int = 1000000

  /** Warn threshold in GiB, matching the reference's 5 GB. */
  val DefaultWarnGb: Double = 5.0

  /** Driver-side size estimate in GiB (SizeEstimator walks the
    * object graph — the same estimate Spark's storage layer uses).
    */
  def estimateGb(value: AnyRef): Double =
    SizeEstimator.estimate(value) / 1024.0 / 1024.0 / 1024.0

  /** Broadcast `values` in shards of `shardSize` elements. Returns
    * the shard handles; prefer [[dict]] for membership lookups.
    * Logs the reference's recommendation when the estimate exceeds
    * `warnGb` — callers at that scale should join instead.
    */
  def apply[T: ClassTag](sc: SparkContext, values: Seq[T],
      shardSize: Int = DefaultShardSize,
      warnGb: Double = DefaultWarnGb): Seq[Broadcast[Array[T]]] = {
    val gb = estimateGb(values.asInstanceOf[AnyRef])
    if (gb > warnGb)
      System.err.println(f">>> ShardedBroadcast: estimated size $gb%.3f GB" +
        f" exceeds $warnGb%.1f GB — use a shuffle join instead of a" +
        " broadcast at this size.")
    if (values.isEmpty) Seq(sc.broadcast(Array.empty[T]))
    else values.grouped(shardSize).map(g => sc.broadcast(g.toArray)).toSeq
  }

  /** Membership view over sharded string broadcasts: each executor
    * materializes one hash set per shard lazily (first use), so
    * lookup is O(#shards) hash probes and the driver never holds
    * more than one shard while broadcasting.
    */
  final class Dict private[ShardedBroadcast] (
      shards: Seq[Broadcast[Array[String]]]) extends Serializable {
    @transient private lazy val sets: Seq[Set[String]] =
      shards.map(_.value.toSet)
    def contains(w: String): Boolean = sets.exists(_.contains(w))
    def unpersist(): Unit = shards.foreach(_.unpersist())
  }

  /** Shard + broadcast a dictionary for membership tests. */
  def dict(sc: SparkContext, words: Seq[String],
      shardSize: Int = DefaultShardSize,
      warnGb: Double = DefaultWarnGb): Dict =
    new Dict(apply(sc, words, shardSize, warnGb))

  /** Sorted dictionary hits in a token array — the large-dictionary
    * form of `TextFunctions.dictMatch` (which inlines the dict as an
    * array literal: ideal for dozens of words, impossible for a
    * wiki-scale gazetteer). Output order/semantics match dictMatch:
    * sorted, distinct-as-in-array_intersect (first occurrence kept,
    * duplicates in `toks` collapsed).
    */
  def dictMatchSharded(toks: Column, d: Dict): Column = {
    val hits = udf { (t: Seq[String]) =>
      if (t == null) null
      else {
        val seen = new scala.collection.mutable.LinkedHashSet[String]
        t.foreach(w => if (w != null && d.contains(w)) seen += w)
        seen.toArray.sorted
      }
    }
    hits(toks)
  }
}
