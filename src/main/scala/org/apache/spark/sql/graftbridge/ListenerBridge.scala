// lives inside org.apache.spark so it can reach the private[spark]
// listener bus; the logic is graft's own
package org.apache.spark.sql.graftbridge

import org.apache.spark.SparkContext

/** Bridge to the private[spark] listener bus — measurement hygiene for
  * [[graft.PlanProbe]] (ADVICE r17): SparkListener events are delivered
  * asynchronously, so job/stage/task counters sampled right after an
  * action can miss late events or bleed into the next query's reset
  * window. Draining the bus before sampling/resetting closes that race.
  * Never part of a query path. */
object ListenerBridge {
  /** Block until every queued listener event has been delivered. */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
