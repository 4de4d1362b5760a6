package graft.sources

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper for a Hadoop `Configuration`, so executor-side
  * FileSystem handles are built from the SESSION's configuration (defaultFS,
  * object-store credentials, HDFS nameservices) instead of a bare
  * `new Configuration()` that silently drops cluster settings. The same role
  * as Spark's internal `org.apache.spark.util.SerializableConfiguration`
  * (private[spark], hence this 20-line public twin). Broadcast it once per
  * job; `value` is rebuilt on deserialization. */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
