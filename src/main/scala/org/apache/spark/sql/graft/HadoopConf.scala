package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.SparkContext
import org.apache.spark.util.SerializableConfiguration

/** Bridge to Spark's `private[spark]` [[SerializableConfiguration]]:
  * executor-side Hadoop FileSystem access (ArtifactIO.writeBlobs' blob
  * creates) needs the driver's Configuration on the executors —
  * `Configuration` itself is not Serializable, and this wrapper is how
  * Spark's own datasources ship it. The returned thunk captures only
  * the broadcast handle, so each task deserializes the conf once from
  * the broadcast block instead of shipping it per-task in the closure.
  */
object HadoopConf {
  def broadcast(sc: SparkContext): () => Configuration = {
    val bc = SerializableConfiguration.broadcast(sc)
    () => bc.value.value
  }
}
