package org.apache.spark

/** Test-only bridge to `private[spark]` surfaces.
  *
  * `SparkContext.listenerBus` is package-private; listener-counting
  * specs need its `waitUntilEmpty` to drain asynchronously-posted
  * events deterministically instead of polling a counter with sleeps
  * (a flake source under slow delivery). This object lives in the
  * `org.apache.spark` package purely to re-export that one call to the
  * graft test suite — no production code may depend on it.
  */
object GraftTestHooks {
  def waitListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
