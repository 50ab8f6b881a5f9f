package org.apache.spark

/** Bridge into `private[spark]` SparkContext internals needed by the
  * bench's per-pass stage telemetry ([[graft.BenchTelemetry]]): listener
  * events post on an ASYNC bus, so a timing window that snapshots its
  * listener right after `.collect()` returns would race the last
  * stage-completed events. `waitUntilEmpty` is how Spark's own tests
  * close that race. One of two files outside the `graft` namespace (the
  * other: `org.apache.spark.sql.GraftInternal`, the Column↔Expression
  * bridge).
  */
object GraftSparkInternal {
  /** Block until every queued listener event has been delivered. */
  def waitListenerBusEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
