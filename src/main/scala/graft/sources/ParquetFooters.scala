package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName

/** Footer-only statistics for a just-staged parquet file — the
  * manifest catalog's write-side stats collection: ONE footer read
  * (metadata, never data pages) yields the row count and the cluster
  * key's (min, max) zone map that ride the commit record. This is the
  * Iceberg/Delta convention of writer-computed stats realized through
  * the bytes the writer just produced; no second data scan ever
  * happens. Routed through Hadoop input files, so the same code works
  * against HDFS/S3A/GCS (the [[GraftFs]] posture).
  */
object ParquetFooters {

  /** (rows, Some((min, max)) of `clusterKey`) — None when the key is
    * absent, non-INT64, or any block lacks stats (conservative: a
    * file without a zone map is never pruned, only never skipped).
    */
  def stats(path: String, clusterKey: Option[String]): (Long, Option[(Long, Long)]) = {
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val rdr = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(path), conf))
    try {
      val blocks = {
        val b = rdr.getFooter.getBlocks
        val out = Vector.newBuilder[org.apache.parquet.hadoop.metadata.BlockMetaData]
        b.forEach(x => out += x)
        out.result()
      }
      val rows = blocks.map(_.getRowCount).sum
      val zone = clusterKey.flatMap { key =>
        val perBlock = blocks.map { blk =>
          var found: Option[(Long, Long)] = None
          blk.getColumns.forEach { c =>
            if (c.getPath.toDotString == key &&
              c.getPrimitiveType.getPrimitiveTypeName == PrimitiveTypeName.INT64) {
              val st = c.getStatistics
              if (st != null && !st.isEmpty && st.hasNonNullValue)
                found = Some(
                  (
                    st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
                    st.genericGetMax.asInstanceOf[java.lang.Long].longValue()
                  )
                )
            }
          }
          found
        }
        if (perBlock.isEmpty || perBlock.exists(_.isEmpty)) None
        else Some((perBlock.flatten.map(_._1).min, perBlock.flatten.map(_._2).max))
      }
      (rows, zone)
    } finally rdr.close()
  }
}
