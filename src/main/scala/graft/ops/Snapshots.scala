package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the incremental-pipeline primitive: given
  * two crawls/exports of the same collection, classify every doc as
  * added / removed / changed / unchanged so downstream stages
  * (dedup, scoring, indexing) re-run only on the delta instead of
  * the full corpus.
  *
  * Scale shape: text reduces to an md5 digest map-side BEFORE the
  * join, so the full-outer shuffle moves (id, 16-byte digest) pairs
  * — never document bodies. One exchange per side on the id; the
  * status is a null/equality Project on the joined row.
  */
object Snapshots {

  /** The (id, digest) reduction of a snapshot — the baseline
    * artifact the streaming diff joins against (and the only thing
    * worth persisting between snapshot cycles: ~50 bytes/doc).
    */
  def digests(snapshot: DataFrame, idCol: String,
      textCol: String): DataFrame =
    snapshot.select(col(idCol), md5(col(textCol)).as("digest"))

  /** Per-doc status between snapshot `v1` (old) and `v2` (new):
    * `added` (only in v2), `removed` (only in v1), `changed` (both,
    * digest differs), `unchanged`. Output: (idCol, status).
    */
  def diff(v1: DataFrame, v2: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val a = digests(v1, idCol, textCol).withColumnRenamed("digest", "__d1")
    val b = digests(v2, idCol, textCol).withColumnRenamed("digest", "__d2")
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__d1").isNull, "added")
          .when(col("__d2").isNull, "removed")
          .when(col("__d1") === col("__d2"), "unchanged")
          .otherwise("changed").as("status"))
  }
}
