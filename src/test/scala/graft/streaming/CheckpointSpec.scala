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
}
