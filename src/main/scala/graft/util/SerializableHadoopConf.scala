package graft.util

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper shipping the DRIVER's Hadoop
  * configuration to executor-side readers/writers. Without this the
  * connector's `PartitionReader`s built `new Configuration()` on the
  * executor, which only sees core-site defaults from the classpath —
  * runtime-set filesystem settings (`spark.hadoop.*`, object-store
  * credentials/endpoints) were silently dropped, so the connector only
  * worked where classpath defaults sufficed (local FS). Same role as
  * Spark's internal `SerializableConfiguration` (which is
  * `private[spark]` at the Scala level, hence this twin).
  *
  * `value` is the shared deserialized instance — callers that MUTATE
  * the conf (setting per-read keys) must copy first:
  * `new Configuration(shipped.value)`. */
class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
