package org.apache.spark

/** Test-scope accessor for the private[spark] listener bus — the
  * deterministic drain the r15 ADVICE asked for (fixed sleeps let
  * late task-end events bleed between labeled measurement blocks).
  */
object GraftListenerDrain {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
