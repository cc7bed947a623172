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
}
