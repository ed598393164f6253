package graft.sources

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.hadoop.conf.Configuration

/** Java-serializable wrapper for a Hadoop `Configuration` (which is a
  * `Writable`, not `Serializable`), so a DRIVER-captured conf can ride a
  * broadcast / task closure to executor-side readers and writers.
  *
  * Why it exists: an executor that builds `new Configuration()` sees only
  * the classpath site files — everything set on the session at runtime
  * (`spark.hadoop.*`, programmatic `sparkContext.hadoopConfiguration`
  * keys: object-store credentials, endpoints, timeouts) is silently
  * dropped. Invisible on a local FS; on a real cluster against s3a/abfs
  * the scan fails or uses wrong settings. Every built-in file source
  * ships the driver's `sessionState.newHadoopConf()` to its readers this
  * way; the engine's archive readers/writers do the same through this
  * wrapper (broadcast once per scan, not serialized per task).
  *
  * `loadDefaults=false` on the read side: the serialized payload already
  * contains the fully-resolved driver conf; re-reading executor site
  * files would let them override it.
  */
final class SerializableHadoopConf(@transient var value: Configuration)
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
