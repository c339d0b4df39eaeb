package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Test-only bridge into the private[spark] listener bus: lets specs that
  * assert on SparkListener task metrics drain all pending events before
  * reading their counters (no sleep-and-hope polling).
  */
object TestListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
