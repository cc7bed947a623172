package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

/** The production state-store configuration: at 100 TB the default
  * in-memory HDFS-backed store keeps every key on-heap per executor —
  * RocksDB spills state off-heap to local disk with incremental
  * checkpointing, which is the only viable shape for wide dedup /
  * join state. The engine's streaming operators are provider-agnostic
  * (the conf is a start-time switch, like StateConf's width); this
  * spec proves the switch actually takes effect and answers stay
  * identical.
  */
class RocksDbStateSpec extends SparkSpec {

  private val Key = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Pin the provider for one streaming run, restoring after (the
    * StateConf.withStatePartitions pattern for the provider conf).
    */
  private def withRocksDb[A](body: => A): A = {
    val prev = spark.conf.getOption(Key)
    spark.conf.set(Key, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(Key, v)
      case None => spark.conf.unset(Key)
    }
  }

  test("streaming aggregation state runs on RocksDB and matches the batch answer") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    withRocksDb {
      StateConf.withStatePartitions(spark, 8) {
        val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
        val agg = spark.readStream
          .schema(schema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(sfDir)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"))
        val q = agg.writeStream
          .outputMode("complete")
          .format("memory")
          .queryName("graft_rocksdb_agg")
          .trigger(Trigger.AvailableNow())
          .start()
        try q.awaitTermination()
        finally q.stop()
        // the provider took effect: the state operator reports RocksDB
        // custom metrics (the HDFS-backed default has none of these)
        val ops = q.lastProgress.stateOperators
        assert(ops.nonEmpty, "expected a stateful operator in the progress report")
        val metricKeys = ops(0).customMetrics.keySet().asScala
        assert(metricKeys.exists(_.toLowerCase.contains("rocksdb")), s"state metrics show no RocksDB: $metricKeys")
        // and the state backend is invisible to results
        val viaStream = spark.table("graft_rocksdb_agg").orderBy("event_type").collect().map(r => (r.getString(0), r.getLong(1)))
        val viaBatch = graft.sources.Tables
          .events(spark, sfDir)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"))
          .orderBy("event_type")
          .collect()
          .map(r => (r.getString(0), r.getLong(1)))
        assert(viaStream.toSeq === viaBatch.toSeq)
      }
    }
  }

  test("watermarked dedup (q78) runs on RocksDB too — the bounded-state pair") {
    withRocksDb {
      val got = StreamAgg.dedupKeysWithinWatermark(spark, sfDir)
      val exact = graft.sources.Tables.events(spark, sfDir).select("user_id", "event_type").distinct()
      assert(got.count() === exact.count())
    }
  }
}
