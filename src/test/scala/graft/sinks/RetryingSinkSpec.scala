package graft.sinks

import java.nio.file.Files

import graft.SparkSpec

class RetryingSinkSpec extends SparkSpec {

  test("withRetry: succeeds first try, no sleep") {
    var slept = 0L
    val (v, attempts) = RetryingSink.withRetry(sleep = slept += _)(() => 42)
    assert(v === 42 && attempts === 1 && slept === 0L)
  }

  test("withRetry: recovers after failures with backoff (app.py:710-720 contract)") {
    var n = 0
    var slept = 0L
    val policy = RetryingSink.RetryPolicy(maxAttempts = 6, backoffMillis = 60000L)
    val (v, attempts) = RetryingSink.withRetry(policy, sleep = slept += _) { () =>
      n += 1; if (n < 3) sys.error("flaky") else "ok"
    }
    assert(v === "ok" && attempts === 3 && slept === 120000L)
  }

  test("withRetry: exhausts budget then rethrows") {
    val policy = RetryingSink.RetryPolicy(maxAttempts = 2, backoffMillis = 1L)
    val e = intercept[RuntimeException] {
      RetryingSink.withRetry(policy, sleep = _ => ())(() => sys.error("down"))
    }
    assert(e.getMessage === "down")
  }

  test("overwriteParquet truncates and reloads idempotently") {
    val dir = Files.createTempDirectory("graft-sink").resolve("out").toString
    val df = graft.sources.Tables.parquet(spark, sfDir, "region")
    RetryingSink.overwriteParquet(df, dir)
    RetryingSink.overwriteParquet(df.limit(3), dir) // truncate-and-load again
    assert(spark.read.parquet(dir).count() === 3)
  }

  test("foreachPartitionSink streams record-oriented rows") {
    val df = graft.sources.Tables.parquet(spark, sfDir, "region")
    val acc = spark.sparkContext.collectionAccumulator[String]("names")
    RetryingSink.foreachPartitionSink(df)(rows => rows.foreach(m => acc.add(m("r_name").toString)))
    assert(acc.value.size() === 5)
  }

  test("snapshotParquet: read-back frame equals the source bit-exactly") {
    val dir = Files.createTempDirectory("graft-snap").resolve("snap").toString
    val df = graft.sources.Tables.parquet(spark, sfDir, "nation")
    val back = RetryingSink.snapshotParquet(df, dir)
    assert(back.schema === df.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq === df.orderBy("n_nationkey").collect().toSeq)
  }
}
