package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, StructType, TimestampNTZType, TimestampType}

/** Parquet/CSV/JSON table access (reference `app.py:53-87` CSV path,
  * `app.py:171-183` JSON path — both declare/accept an explicit schema;
  * here the schema travels as a [[StructType]] so malformed values null
  * out instead of failing, matching pandas' coerce behavior).
  *
  * Scans stay fully declarative so Catalyst pushes filters and prunes
  * columns down to the parquet reader — the scan, not the engine, is
  * where 100 TB is won or lost.
  */
object Tables {

  /** Load one testdata table: `dir/name.parquet`. */
  def parquet(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else spark.read.parquet(s"$dir/$name.parquet")

  /** The `events` table carries a TIMESTAMP(NANOS) parquet column, which
    * Spark's vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]).
    * Read nanos as raw longs (`legacy.parquet.nanosAsLong`) and convert
    * to a microsecond timestamp — the same truncation DuckDB applies, so
    * oracle comparisons agree.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    tsAsTimestamp(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** Normalize the `ts` column to a session-timezone TIMESTAMP whatever
    * the physical encoding of the generated data:
    *   - INT64 nanos (read as long via `nanosAsLong`) → `timestamp_micros`
    *     on integer `div`, NOT `/`: long/1000 routes through double, whose
    *     53-bit mantissa can't hold epoch nanos (~1.7e18) — off-by-1-µs.
    *   - TIMESTAMP(MICROS) without UTC adjustment → Spark 4 infers
    *     TIMESTAMP_NTZ; cast to TIMESTAMP re-interprets the wall time in
    *     the session zone (pinned to UTC by every entrypoint), which is
    *     byte-identical to what DuckDB's naive-timestamp read computes.
    * Every downstream consumer (unix_micros, window(), watermarks) then
    * sees one type regardless of which encoding the driver generated.
    */
  def tsAsTimestamp(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case _ => df
  }

  /** The streaming twin of [[events]]: same path, same explicit schema,
    * same `ts` normalization — the single reader every streaming query
    * goes through (9 call sites; each previously hand-rolled the nanos
    * conversion, which broke in lock-step when the generated encoding
    * changed to TIMESTAMP(MICROS)).
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    tsAsTimestamp(
      spark.readStream.schema(schema).option("pathGlobFilter", "events.parquet").parquet(dir)
    )
  }

  /** CSV with explicit schema — mirrors the reference's
    * `dd.read_csv(dtype={...})` (`app.py:53-87`). `blocksize=15e6` maps to
    * `spark.sql.files.maxPartitionBytes` (set at session level, not here).
    */
  def csv(spark: SparkSession, path: String, schema: StructType, header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  /** JSON lines with explicit schema (reference ingests API JSON,
    * `app.py:171-183`; schema inference on 100 TB would double-scan).
    */
  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
