package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Deferred cache release for operators that persist an intermediate
  * read by several branches of ONE result plan (bm25 tf, LSH
  * signatures, histogram ranks, NB model tables, …).
  *
  * The intermediate must stay cached until the CALLER runs an action
  * — unpersisting at return time would defeat the cache before its
  * multi-branch read ever happens, and eagerly materializing the
  * result instead costs an extra job and leaves the (often much
  * larger) result pinned in the block manager. So: a one-shot
  * [[QueryExecutionListener]] watches for the first execution whose
  * analyzed plan contains the result's plan as a subtree (the
  * caller's count/write/collect over any further transforms) and
  * releases the intermediates then, success or failure. Across a
  * 143-query bench session this is what keeps per-operator caches
  * from accumulating (ADVICE r6).
  *
  * A result that is never executed keeps its caches — same as
  * today's behavior, and the listener is O(plan-node) per query
  * while registered.
  */
object CacheRelease {

  /** Return `result` unchanged, arranging for `caches` to unpersist
    * after the first action that consumes it.
    */
  def afterFirstUse(result: DataFrame, caches: Dataset[_]*): DataFrame = {
    val spark = result.sparkSession
    val target = result.queryExecution.analyzed
    val listener = new QueryExecutionListener {
      private val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
      private def consumed(qe: QueryExecution): Boolean =
        try qe.analyzed.exists(_.sameResult(target))
        catch { case _: Throwable => false }
      private def release(): Unit =
        if (fired.compareAndSet(false, true)) {
          caches.foreach(_.unpersist(blocking = false))
          spark.listenerManager.unregister(this)
        }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        if (consumed(qe)) release()
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit =
        if (consumed(qe)) release()
    }
    spark.listenerManager.register(listener)
    result
  }
}
