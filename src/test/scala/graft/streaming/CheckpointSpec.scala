package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** Durable-checkpoint semantics: a restarted available-now query
  * resumes from committed source offsets instead of reprocessing —
  * the exactly-once half of the incremental-ingest story (the other
  * half, idempotent truncate-and-load sinks, is RetryingSinkSpec).
  */
class CheckpointSpec extends SparkSpec {

  test("available-now restart with the same checkpoint reprocesses nothing") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val cp = Files.createTempDirectory("graft-cp").toString
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema

    def runOnce(): Long = {
      val processed = spark.sparkContext.longAccumulator("processed")
      val q = spark.readStream
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir)
        .writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          processed.add(batch.count()): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally q.stop()
      processed.value
    }

    val first = runOnce()
    assert(first > 0, "first run must process the events file")
    val second = runOnce()
    assert(second === 0, s"restart must resume from committed offsets, reprocessed $second rows")
  }

  test("restart with NEW files processes exactly the delta — the incremental-ingest contract") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val cp = Files.createTempDirectory("graft-cp-delta").toString
    val dataDir = Files.createTempDirectory("graft-data-delta").toString
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val schema = events.schema

    // batch 1: the full events table as the initial arrival
    events.write.parquet(s"$dataDir/arrival=1")

    def runOnce(): Long = {
      val processed = spark.sparkContext.longAccumulator("processed-delta")
      val q = spark.readStream
        .schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(dataDir)
        .writeStream
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          processed.add(batch.count()): Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally q.stop()
      processed.value
    }

    val total = events.count()
    assert(runOnce() === total, "first run must process the initial arrival")

    // batch 2: a late delta lands between runs — the reference's "next
    // day's pull", which its cron answers by re-reading ALL history
    val deltaRows = 137L
    events.limit(deltaRows.toInt).write.parquet(s"$dataDir/arrival=2")
    assert(runOnce() === deltaRows, "restart must process ONLY the newly arrived files")

    // and a third run with nothing new is a no-op
    assert(runOnce() === 0L)
  }

  test("session_window state survives a restart: late events merge, closed sessions don't re-emit") {
    import spark.implicits._
    val cp = Files.createTempDirectory("graft-cp-session").toString
    val dataDir = Files.createTempDirectory("graft-data-session").toString
    val t0 = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    def at(minutes: Long) = new java.sql.Timestamp(t0.getTime + minutes * 60000L)

    // arrival 1: one closable session (0m, 10m) and the opener of a
    // second (180m) whose arrival pushes the watermark past session 1
    Seq(("u1", at(0)), ("u1", at(10)), ("u1", at(180)))
      .toDF("user_id", "ts")
      .write
      .parquet(s"$dataDir/arrival=1")

    def runOnce(): Seq[(Long, Long, Long)] = {
      // memory sink can't recover from a checkpoint; foreachBatch can
      val emitted = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val q = spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL("user_id STRING, ts TIMESTAMP"))
        .option("recursiveFileLookup", "true")
        .parquet(dataDir)
        .withWatermark("ts", "1 hour")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(
          unix_millis(col("session_window.start")).as("start_ms"),
          unix_millis(col("session_window.end")).as("end_ms"),
          col("n")
        )
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          emitted.synchronized {
            emitted ++= batch.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          }: Unit
        }
        .trigger(Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      finally q.stop()
      emitted.synchronized(emitted.toSeq.sorted)
    }

    def ms(minutes: Long) = t0.getTime + minutes * 60000L
    // run 1 emits ONLY the closed first session [0m, 10m+gap)
    assert(runOnce() === Seq((ms(0), ms(40), 2L)))

    // arrival 2: a late event MERGING into the open 180m session (state
    // must have survived the restart), plus a far-future event that
    // closes it
    Seq(("u1", at(190)), ("u1", at(540))).toDF("user_id", "ts").write.parquet(s"$dataDir/arrival=2")
    // run 2 emits only the now-closed merged session [180m, 190m+gap) with BOTH events
    assert(runOnce() === Seq((ms(180), ms(220), 2L)), "restart must merge the late event into restored session state")
  }
}
