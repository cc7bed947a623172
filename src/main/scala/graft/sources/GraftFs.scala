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
}
