package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact ε-band join on a numeric key — `|x_l − x_r| ≤ ε` as a
  * BUCKETED EQUI-JOIN instead of the theta-join Spark would
  * otherwise plan as a broadcast nested loop (quadratic work, and
  * a driver OOM once neither side broadcasts). The tolerance-match
  * primitive under sensor alignment, price matching, and the
  * numeric-field blocking of record linkage ([[Linkage]]).
  *
  * The trick: bucket both sides by `floor(x/ε)`; a qualifying pair's
  * buckets differ by at most 1, so exploding the LEFT side to its
  * three adjacent buckets and equi-joining on the bucket finds
  * every pair EXACTLY ONCE (the right row sits in exactly one
  * bucket), and the final `|diff| ≤ ε` filter discards the
  * false candidates. Floor division is written sign-safely
  * (`(x − pmod(x, ε)) div ε`), so negative keys bucket correctly
  * and the SQL replay (`((x % ε) + ε) % ε`) agrees.
  *
  * Scale shape: one equi-join keyed by the bucket; candidate volume
  * is 3× the true in-band density, never n·m. Skewed value clusters
  * land in few buckets — the standard salting/AQE-skew answer
  * applies to the bucket key like any other join key.
  */
object BandJoin {

  /** Every (id_l, id_r, x_l, x_r) with `|x_l − x_r| ≤ eps`. Both
    * `x` columns must be integral (fx-quantize first — the
    * [[graft.ops.Profiler]] convention).
    */
  def bandPairs(left: DataFrame, lIdCol: String, lxCol: String,
      right: DataFrame, rIdCol: String, rxCol: String,
      eps: Long): DataFrame = {
    require(eps > 0, s"band width must be positive, got $eps")
    def bucket(x: String) =
      expr(s"($x - pmod($x, ${eps}L)) div ${eps}L")
    val lb = left
      .select(col(lIdCol).as("id_l"), col(lxCol).as("x_l"))
      .withColumn("__b", bucket("x_l"))
      .select(col("id_l"), col("x_l"),
        explode(array(col("__b") - 1, col("__b"), col("__b") + 1))
          .as("__bb"))
    val rb = right
      .select(col(rIdCol).as("id_r"), col(rxCol).as("x_r"))
      .withColumn("__bb", bucket("x_r"))
    lb.join(rb, "__bb")
      .filter(abs(col("x_l") - col("x_r")) <= eps)
      .select(col("id_l"), col("id_r"), col("x_l"), col("x_r"))
  }
}
