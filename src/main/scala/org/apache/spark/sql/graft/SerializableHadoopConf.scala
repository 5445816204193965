// Lives in an org.apache.spark subpackage for the same reason as the
// expression files: org.apache.spark.util.SerializableConfiguration is
// private[spark], and forwarding to it beats hand-rolling the Writable
// serialization dance (writeObject/readFields) it already gets right.
package org.apache.spark.sql.graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.util.SerializableConfiguration

/** Serializable carrier for a Hadoop [[Configuration]] (which is not
  * itself Serializable) — ship filesystem config to executor-side readers
  * like the distributed coltt importer. */
class SerializableHadoopConf(@transient conf: Configuration) extends Serializable {
  private val inner = new SerializableConfiguration(conf)
  def value: Configuration = inner.value
}
