package graft.sources

/** Ships a Hadoop `Configuration` inside a task closure. Configuration
  * is a Hadoop `Writable`, not java-serializable, so closures capture
  * this wrapper instead — the standard public pattern for giving
  * executor-side code FileSystem access with the driver's configuration
  * (credentials, scheme→impl bindings) intact. */
class SerializableHadoopConf(
    @transient var conf: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    conf.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    conf = new org.apache.hadoop.conf.Configuration(false)
    conf.readFields(in)
  }
}
