package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only access to `private[spark]` internals: deterministic
  * listener-bus drain so shuffle-byte assertions never race the async
  * metrics events. */
object TestShims {
  def drainListenerBus(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
