package org.apache.spark.util

import org.apache.hadoop.conf.Configuration
import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast

/** Access shim: `SerializableConfiguration` is `private[spark]` to scalac
  * (public at bytecode). Graft's distributed parquet-footer stats job
  * needs to ship the driver's Hadoop configuration (s3a credentials,
  * endpoint overrides) to executor-side footer readers; this forwarder
  * lives in the spark.util package solely to re-export that capability.
  * Same pattern as org.apache.spark.sql.GraftColumnBridge. */
object GraftHadoopConf {
  def broadcast(sc: SparkContext): Broadcast[SerializableConfiguration] =
    SerializableConfiguration.broadcast(sc)

  def value(b: Broadcast[SerializableConfiguration]): Configuration = b.value.value
}
