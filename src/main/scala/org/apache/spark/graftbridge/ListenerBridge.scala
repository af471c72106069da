package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Spark posts task-end events to listeners asynchronously; a benchmark
  * that snapshots listener-accumulated task metrics right after an
  * action returns can miss the tail of its own tasks. `waitUntilEmpty`
  * is `private[spark]`, so the flush lives in this bridge package
  * (same pattern as sql.graftbridge.ColumnBridge).
  */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
