package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffle joins — the manual form of the
  * skew mitigation AQE applies when runtime stats reveal a hot key
  * (X1/X3 in SURVEY §2.8). AQE's skew-join handles the case where
  * skew shows up in shuffle files; explicit salting is the tool when
  * the hot key is KNOWN (a null-bucket, a mega-customer, a bot
  * user_id) and the right side cannot broadcast: left rows spread
  * across `nSalts` sub-keys via a deterministic hash of a
  * high-cardinality spread column, the right side replicates
  * `nSalts`×, and the join key becomes (key, salt) — the hot key's
  * rows land on `nSalts` reducers instead of one.
  *
  * Semantics-preserving by construction: each (left row, matching
  * right row) pair meets on exactly one salt value, so the salted
  * inner/left join equals the plain join row-for-row (the q161
  * oracle runs the UNSALTED SQL). Right/full-outer are rejected —
  * the replicated right side would surface one unmatched copy per
  * salt.
  *
  * Scale notes: replication multiplies the right side's shuffle
  * bytes by `nSalts` — the trade is nSalts× more right-side rows for
  * a 1/nSalts hot-partition bound, worth it exactly when the right
  * side is modest and the skew is extreme. At 100 TB the refinement
  * is salting ONLY the known-hot keys (split the left by key list,
  * union a salted hot-path with an unsalted cold-path); this
  * operator salts uniformly, which keeps the plan to one join and is
  * the right default when the hot set is not enumerable.
  */
object SaltedJoin {

  /** Inner or left-outer equi-join on `key` with `nSalts`-way
    * salting. `spread` must be a deterministic high-cardinality
    * column of the LEFT side (an event id, a row digest) — it only
    * decides which sub-key a row lands on, never the result.
    */
  def equiJoin(left: DataFrame, right: DataFrame, key: String,
      spread: Column, nSalts: Int, joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left" ||
      joinType == "left_outer",
      s"salting preserves inner/left joins only, got $joinType")
    require(nSalts > 0, s"nSalts must be positive, got $nSalts")
    val l = left.withColumn("__salt", saltOf(spread, nSalts))
    val r = right
      .withColumn("__salt", explode(sequence(lit(0), lit(nSalts - 1))))
      .withColumn("__salt", col("__salt").cast("int"))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** The salt assignment, exposed so tests can verify the spread. */
  def saltOf(spread: Column, nSalts: Int): Column =
    pmod(xxhash64(spread), lit(nSalts)).cast("int")
}
