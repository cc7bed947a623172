package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Mirrors the operational posture of the reference pipeline (UTC
  * timestamps, deterministic partition sizing — reference `app.py:165,183`
  * picks chunk sizes by hand) but lets Spark AQE own runtime re-planning.
  *
  * At cluster scale the same settings apply; only `master` and memory
  * change. Shuffle partitions default to the local core count here —
  * on a real cluster this would be `max(2 * totalCores, inputBytes /
  * targetPartitionBytes)` or left to AQE coalescing.
  */
object EngineSession {

  /** Apply engine defaults to any builder (used by Verify/Bench/tests). */
  def configure(b: SparkSession.Builder, shufflePartitions: Int = 32): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")

  /** Local session for tests and ad-hoc runs. */
  def local(cores: Int = 4, appName: String = "graft"): SparkSession = {
    val spark = configure(
      SparkSession.builder()
        .master(s"local[$cores]")
        .appName(appName)
        // keep managed-table data (bucketed tables in tests) out of the repo
        .config("spark.sql.warehouse.dir", s"${System.getProperty("java.io.tmpdir")}/graft-warehouse"),
      shufflePartitions = cores
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
