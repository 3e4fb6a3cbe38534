package org.apache.spark.sql.graft

import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.util.SerializableConfiguration

/** Narrow bridge to `private[spark]` utilities the engine legitimately
  * needs — same placement rationale as [[NativeExprs]] (this package
  * lives inside the spark tree exactly so these internals are reachable
  * without reflection).
  */
object SparkBridge {

  /** Broadcast the session's Hadoop configuration for executor-side
    * filesystem access (`Sources.warcStreamed` opens crawl segments
    * through the Hadoop FS from tasks; `Configuration` itself is not
    * serializable).
    */
  def broadcastHadoopConf(sc: SparkContext): Broadcast[SerializableConfiguration] =
    SerializableConfiguration.broadcast(sc)

  /** Unwrap on the executor. */
  def hadoopConf(bc: Broadcast[SerializableConfiguration]): org.apache.hadoop.conf.Configuration =
    bc.value.value
}
