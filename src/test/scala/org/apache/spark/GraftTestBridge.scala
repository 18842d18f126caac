package org.apache.spark

/** Test-only bridge into `private[spark]` members: PlanAuditSpec needs to
  * drain the listener bus so job counts observed after a query's plan
  * construction are complete, not racing the async bus.
  */
object GraftTestBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
