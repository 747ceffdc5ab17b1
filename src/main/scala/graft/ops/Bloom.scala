package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom filter as a bounded, ENGINE-PORTABLE
  * artifact — the 100 TB "have I seen this key" gate: membership
  * tests run map-side against a broadcast bit array, so a probe
  * corpus is pruned BEFORE any shuffle and the history table is
  * never joined. Two canonical uses: semi-join pruning (cut the
  * probe side to likely-matches, then exact-verify only survivors)
  * and ingestion seen-set screening against a historical digest set
  * (the streaming-dedup companion: the bloom is the compact,
  * mergeable face of the exact seen-set).
  *
  * Unlike library blooms (engine-private hashing, bias-corrected),
  * every bit here is a PURE INTEGER FUNCTION of the data: probe i of
  * key x sets bit `md5_48(i + ":" + str(x)) mod mBits` (the project's
  * cross-engine md5-prefix idiom, [[DistinctSketch.hash48]]'s
  * sibling). The bit set is therefore exactly the distinct-position
  * set of the build keys, and a SQL engine replays membership — and
  * even the FALSE-POSITIVE COUNT — bit-for-bit, so q192 carries a
  * full hash oracle over a probabilistic data structure.
  *
  * Scale shape: the build is one explode-k + distinct aggregate
  * bounded by mBits rows; the packed word array is ≤ mBits/64 longs
  * (the bounded-trained-artifact contract: 2^20 bits = 16 KB — the
  * NB-compact-model pattern, never an unbounded collect); probes are
  * a codegen'd-adjacent deterministic UDF kernel, zero shuffle.
  * False-positive math: fill = 1 − exp(−n·k/m), fp ≈ fill^k — size m
  * for the history you actually have.
  */
object Bloom {

  /** Probe i's bit position for key `c` — pure column expression,
    * replayable in any engine (48-bit md5 prefix, positive, mod m).
    */
  def bitPos(c: Column, i: Int, mBits: Int): Column =
    conv(substring(md5(concat(lit(s"$i:"), c.cast("string"))), 1, 12),
      16, 10).cast("long") % mBits

  /** The DISTINCT bit-position set of the build keys — the bloom's
    * declarative form (≤ mBits rows out of one explode-k aggregate).
    * Column: __p.
    */
  def positions(build: DataFrame, keyCol: String, mBits: Int,
      k: Int): DataFrame =
    build.select(explode(array(
        (0 until k).map(i => bitPos(col(keyCol), i, mBits)): _*)).as("__p"))
      .distinct()

  /** Pack the position set into the broadcastable word array —
    * ≤ mBits/64 longs reach the driver BY CONSTRUCTION (the bounded
    * model-artifact contract).
    */
  def fitWords(positions: DataFrame, mBits: Int): Array[Long] = {
    val words = new Array[Long]((mBits + 63) / 64)
    positions.select(col("__p")).collect().foreach { r =>
      val p = r.getLong(0)
      words((p >> 6).toInt) |= (1L << (p & 63).toInt)
    }
    words
  }

  /** Bloom-pruned EXACT semi-join: probe rows whose key passes the
    * broadcast kernel, then verified by the real semi-join — the
    * bloom only cuts what reaches the shuffle, never the answer
    * (oracle = the plain semi-join). At 100 TB this is the
    * difference between shuffling the whole probe corpus and
    * shuffling the ~seen fraction + fp.
    */
  def prunedSemiJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String, mBits: Int, k: Int): DataFrame = {
    val words = fitWords(positions(build, buildKey, mBits, k), mBits)
    probe.filter(containsCol(words, mBits, k, col(probeKey)))
      .join(build.select(col(buildKey).as(probeKey)).distinct(),
        Seq(probeKey), "left_semi")
  }

  /** Map-side membership kernel over the packed words: true iff all
    * k probe bits are set. EXACTLY the same positions as [[bitPos]]
    * (spec-pinned equality with the declarative join form) — MD5 of
    * "i:<str(key)>", first 12 hex chars, mod m. A compiled kernel,
    * not an expression chain: k md5s per row stay in one tight loop.
    */
  def containsCol(words: Array[Long], mBits: Int, k: Int,
      key: Column): Column = {
    val kernel = udf { (s: String) =>
      if (s == null) false
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        var i = 0
        var all = true
        while (all && i < k) {
          val hex = md.digest(s"$i:$s".getBytes("UTF-8"))
            .take(6).map("%02x".format(_)).mkString
          val p = java.lang.Long.parseLong(hex, 16) % mBits
          all = (words((p >> 6).toInt) & (1L << (p & 63).toInt)) != 0
          md.reset()
          i += 1
        }
        all
      }
    }
    kernel(key.cast("string"))
  }
}
