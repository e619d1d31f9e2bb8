package org.apache.spark

/** Bridge into `private[spark]` scheduler internals needed by the
  * benchmark's per-query task-metric accounting.
  */
object GraftSparkBridge {

  /** Block until every queued listener event has been delivered.
    * Listener delivery is asynchronous, so a per-query metric window
    * (reset counters → run → read counters) is only correct if the bus
    * is drained at both edges — otherwise a task-end event from query
    * N lands in query N+1's window.
    */
  def drainListeners(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
