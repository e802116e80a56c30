package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only access shim: `SparkContext.listenerBus` is `private[spark]`,
  * and specs that meter shuffle bytes ([[graft.ShuffleProbe]]) need a
  * deterministic "all task-end events delivered" barrier instead of
  * polling the counter for quiescence (slow listener-bus delivery can
  * under-count a leg between two identical polls). Lives under
  * `org.apache.spark` for the access grant only — nothing here touches
  * internals beyond the public-in-spirit waitUntilEmpty. */
object ListenerBusGate {
  /** Block until every queued listener event has been delivered, or
    * `timeoutMs` elapses (then fall through — the caller's coarse
    * assertions tolerate a late event far better than a hung suite). */
  def waitUntilEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
