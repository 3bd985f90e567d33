package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bench-only shim over the private[spark] listener bus (same thin-shim
  * pattern as the sql.graft Column wrappers): task-end events are
  * delivered on the ASYNC LiveListenerBus, so a metrics snapshot taken
  * right after an action can miss events still queued from that
  * action's own tasks — they would then bleed into the NEXT query's
  * delta, inflating its task/CPU/GC evidence under exactly the
  * loaded-rig conditions the ledger exists to adjudicate. Draining the
  * bus between queries pins each event to the query that produced it.
  */
object ListenerBusDrain {
  /** Wait until the async listener queues are empty; a saturated bus
    * must not fail the bench, so on timeout the snapshot degrades to
    * the pre-drain best-effort behavior (and the caller's numbers are
    * at worst what they always were).
    */
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
