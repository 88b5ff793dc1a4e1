package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration

/** Bridge to Spark's `private[spark]` [[SerializableConfiguration]]:
  * executor-side Hadoop FileSystem access (ArtifactIO.writeBlobs' blob
  * creates) needs the driver's Configuration on the executors —
  * `Configuration` itself is not Serializable, and this wrapper is how
  * Spark's own datasources ship it. The returned thunk captures only
  * the broadcast handle, so each task deserializes the conf once from
  * the broadcast block instead of shipping it per-task in the closure.
  *
  * The conf that ships is `sessionState.newHadoopConf()`, NOT the bare
  * `sc.hadoopConfiguration`: the session overlay (`spark.conf.set` of
  * `fs.*` / `spark.hadoop.*` keys — e.g. per-session object-store
  * credentials) must reach the executor-side creates exactly the way it
  * reaches Spark's own datasource writers (ADVICE r13).
  */
object HadoopConf {
  def broadcast(spark: SparkSession): () => Configuration = {
    val bc = SerializableConfiguration.broadcast(
      spark.sparkContext, spark.sessionState.newHadoopConf())
    () => bc.value.value
  }
}
