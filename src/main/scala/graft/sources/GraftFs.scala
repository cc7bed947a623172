package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** The filesystem seam for every lakehouse metadata operation —
  * manifest file listings, vacuum deletes, pin-expiry existence
  * checks, compaction file censuses. All of them are
  * metadata-cardinality driver work, but reaching for `java.io.File`
  * couples them to a local disk; routing through Hadoop's
  * [[FileSystem]] keeps the SAME code working against HDFS/S3A/GCS —
  * the deployment surface a 100 TB table actually lives on — because
  * the scheme-appropriate implementation is resolved from the path
  * and the active session's Hadoop configuration (local paths resolve
  * to the local FS in this sandbox; a production job only changes the
  * path prefix). Every method here is one RPC-shaped call per file or
  * directory: nothing lists or stats at data cardinality.
  */
object GraftFs {
  private def hadoopConf: Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def fsFor(p: Path): FileSystem = p.getFileSystem(hadoopConf)

  /** Names of the parquet data files directly under `dir` (empty if
    * the dir does not exist) — the census a compaction or manifest
    * job reports.
    */
  def listDataFiles(dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = fsFor(p)
    if (!fs.exists(p)) Seq.empty
    else
      fs.listStatus(p)
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(_.getPath.getName)
        .toSeq
  }

  def exists(path: String): Boolean = {
    val p = new Path(path)
    fsFor(p).exists(p)
  }

  /** Non-recursive single-file delete — the vacuum verb. Returns
    * whether the file existed.
    */
  def delete(path: String): Boolean = {
    val p = new Path(path)
    fsFor(p).delete(p, false)
  }

  def mkdirs(path: String): Unit = {
    val p = new Path(path)
    fsFor(p).mkdirs(p)
    ()
  }

  /** Last path segment — the scheme-agnostic basename (testdata dirs
    * are keyed by their `sfX` leaf).
    */
  def baseName(path: String): String = new Path(path).getName

  /** Names of ALL plain files directly under `dir` (empty if absent) —
    * the durable manifest log's entry census. One listStatus RPC.
    */
  def listFiles(dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = fsFor(p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isFile).map(_.getPath.getName).toSeq
  }

  /** Names of the directories directly under `dir` (empty if absent)
    * — the manifest catalog's table listing.
    */
  def listDirs(dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = fsFor(p)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).toSeq
  }

  /** Recursive delete — DROP TABLE on a manifest table (its data,
    * staging dirs, and log go together). Returns whether it existed.
    */
  def deleteRecursive(path: String): Boolean = {
    val p = new Path(path)
    fsFor(p).delete(p, true)
  }

  /** Whole-file read — manifest entries are metadata-sized (a handful
    * of file names and longs), never data.
    */
  def readBytes(path: String): Array[Byte] = {
    val p = new Path(path)
    val in = fsFor(p).open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      buf.toByteArray
    } finally in.close()
  }

  // Same-JVM serialization for createExclusive: two log instances in
  // one driver (the test/bench shape) must see an airtight CAS even
  // on a local FS whose create(overwrite=false) is check-then-act.
  private val exclusiveGate = new Object

  /** CREATE-FAILS-IF-EXISTS write — the durable manifest log's
    * compare-and-set. Returns true iff this call published the file.
    *
    * Publication is WRITE-TEMP-THEN-RENAME (the Delta HDFSLogStore
    * protocol): the bytes land under a dot-prefixed temp name first,
    * then one rename makes the final name visible — so a concurrent
    * LISTER can never observe the entry name with partial content (a
    * direct create-and-write exposes the name before the bytes are
    * flushed; a reader racing it would misread a healthy in-flight
    * commit as a torn tail and clobber it). Rename is all-or-nothing
    * on POSIX and a single namenode op on HDFS (failing if the
    * destination exists — the cross-process CAS); object stores
    * substitute a conditional PUT. Same-process racers are
    * additionally serialized through a JVM-wide gate, which also
    * covers the local FS's non-atomic exists-check — cheap, since
    * entries are metadata-sized.
    */
  def createExclusive(path: String, bytes: Array[Byte]): Boolean = exclusiveGate.synchronized {
    val p = new Path(path)
    val fs = fsFor(p)
    if (fs.exists(p)) return false
    val tmp = new Path(p.getParent, s".${p.getName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, false)
    try out.write(bytes)
    finally out.close()
    val ok =
      try fs.rename(tmp, p)
      catch { case _: java.io.IOException => false }
    if (!ok) {
      fs.delete(tmp, false)
      ()
    }
    ok
  }
}
