package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** CSV/JSON source surface (SURVEY §2.1 S3/S6): explicit schema, no
  * inference pass, malformed values coerced to null (pandas parity).
  */
class SourcesSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft-sources")

  test("CSV round-trip with explicit schema") {
    val orders = Tables.parquet(spark, sfDir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    val path = tmp.resolve("orders_csv").toString
    orders.write.option("header", "true").mode("overwrite").csv(path)
    val schema = StructType(
      Seq(
        StructField("o_orderkey", LongType),
        StructField("o_orderstatus", StringType),
        StructField("o_totalprice", DoubleType)
      )
    )
    val back = Tables.csv(spark, path, schema)
    assert(back.count() === orders.count())
    assert(back.agg(sum("o_totalprice")).head.getDouble(0) === orders.agg(sum("o_totalprice")).head.getDouble(0))
  }

  test("CSV malformed numeric → null (coerce, not fail)") {
    val path = tmp.resolve("bad.csv").toString
    Files.createDirectories(java.nio.file.Paths.get(path))
    Files.writeString(java.nio.file.Paths.get(path, "part.csv"), "k,v\n1,10.5\n2,oops\n3,\n")
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", DoubleType)))
    val got = Tables.csv(spark, path, schema).orderBy("k").collect().map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    assert(got.toSeq === Seq(Some(10.5), None, None))
  }

  test("JSON lines round-trip with explicit schema (no inference scan)") {
    val events = Tables.parquet(spark, sfDir, "events").select("event_id", "event_type", "value")
    val path = tmp.resolve("events_json").toString
    events.write.mode("overwrite").json(path)
    val schema = StructType(
      Seq(
        StructField("event_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType)
      )
    )
    val back = Tables.json(spark, path, schema)
    assert(back.count() === events.count())
    assert(back.filter(col("event_type").isNull).count() === 0)
  }
}
