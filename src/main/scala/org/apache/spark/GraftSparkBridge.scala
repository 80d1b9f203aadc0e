package org.apache.spark

/** Minimal bridge to `private[spark]` scheduler internals (same pattern
  * as `org.apache.spark.sql.GraftSqlBridge`): [[graft.Bench]] reads
  * per-query shuffle volume through a listener, and listener events are
  * delivered asynchronously — draining the bus between queries is the
  * only way to attribute stage metrics to the query that produced them. */
object GraftSparkBridge {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
