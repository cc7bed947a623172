package graft

import org.apache.spark.sql.SparkSession

/** One-off probe (round-5 advice, Oracles q223): does a transformWithState
  * event-time timer whose expiry lands EXACTLY on the eviction watermark
  * fire, or is the comparison strict?
  *
  * Setup: gap = 12 h, watermark delay = 1 h. user 1 has one event at T1;
  * user 2 has one event at T1 + 13 h (defining max event time). Final
  * watermark = T1 + 12 h = user 1's timer expiry, exactly. If the session
  * for user 1 is emitted, expiry fires at `expiry <= watermark`
  * (inclusive); if absent, the comparison is strict.
  *
  * Run: sbt "Test/runMain graft.TimerBoundaryProbe"
  */
object TimerBoundaryProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft_timer_probe").toString
    val t1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-01 13:00:00") // t1 + 13h exactly
    Seq(
      (1L, t1, 1L, "click", 1.0, "{}"),
      (2L, t2, 2L, "click", 1.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/events.parquet")

    val out = graft.streaming.StateV2.timerSessions(spark, dir).collect()
    println("=== emitted sessions ===")
    out.foreach(println)
    val user1Emitted = out.exists(_.getLong(0) == 1L)
    println(s"user1 (expiry == watermark) emitted: $user1Emitted")
    println(if (user1Emitted) "VERDICT: INCLUSIVE (expiry <= watermark fires)" else "VERDICT: STRICT (expiry < watermark fires)")
    spark.stop()
  }
}
