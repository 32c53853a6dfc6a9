package org.apache.spark

/** Test-only bridge into `SparkContext.listenerBus` (private[spark]): the
  * shuffle-metrics regression net must drain queued stage-completion events
  * before reading its accumulated totals, or a fast query's metrics race
  * the assertion.
  */
object GraftListenerBridge {
  def drain(sc: SparkContext, timeoutMillis: Long = 30000): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
