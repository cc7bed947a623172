package graft.sources

import java.security.MessageDigest
import java.time.LocalDate

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** Task-side paged ingestion — the genuinely-paged-source shape.
  *
  * The reference's fetch loop (`app.py:133-171`) issues one REST request
  * per monthly window from the driver process and concatenates the JSON
  * pages. Spark-first restatement: the DRIVER only plans windows (cheap
  * `java.time` arithmetic, [[WindowedIngest.monthlyWindows]]); each
  * window becomes one row of a tiny Dataset; and the fetch itself runs
  * INSIDE a task via `flatMap` — so at 100 TB a thousand windows fan
  * out across the cluster instead of serializing through one driver
  * loop, a failed fetch retries via Spark task retry (the reference
  * hand-rolls retry, `app.py:150-163`), and fetched rows are born
  * distributed: they never pass through driver memory.
  *
  * Contrast with [[WindowedIngest.ingest]] (per-window *filtered scans*
  * of an existing source, unioned) — that path suits predicate-capable
  * stores; this one suits opaque paged APIs where each window IS a
  * separate fetch call.
  */
object PagedFetch {

  /** Serializable window handed to tasks (LocalDate has no encoder). */
  final case class Page(start: String, endInclusive: String)

  /** One synthetic "API record" per day — see [[fetchStub]]. */
  final case class CallRecord(call_day: String, n_calls: Long, window_start: String)

  /** Fan `windows` out one-per-task and run `fetch` inside the tasks.
    * `parallelize(pages, n)` slices the n window rows into exactly one
    * element per partition (deterministic Seq slicing — unlike
    * `repartition(n)`, whose round-robin starts at a random offset per
    * input partition and can collide two windows into one task), so
    * each fetch occupies its own task slot — the unit of retry and of
    * parallelism, exactly one HTTP session per task in the REST case.
    */
  def fetchPaged[T: Encoder](spark: SparkSession, windows: Seq[WindowedIngest.Window])(
      fetch: WindowedIngest.Window => Iterator[T]
  ): Dataset[T] = {
    import spark.implicits._
    require(windows.nonEmpty, "no ingestion windows planned")
    val pages = windows.map(w => Page(w.start.toString, w.endInclusive.toString))
    spark
      .createDataset(spark.sparkContext.parallelize(pages, pages.size))
      .flatMap(p => fetch(WindowedIngest.Window(LocalDate.parse(p.start), LocalDate.parse(p.endInclusive))))
  }

  /** Deterministic stand-in for the REST GET (no egress in this
    * environment): emits one record per day of the window, with a value
    * derived from the md5-prefix hash the engine uses everywhere
    * ([[hash32]], the plain-Scala twin of `TextOps.hash32`) — so the
    * DuckDB oracle reproduces the "API response" arithmetically.
    */
  def fetchStub(w: WindowedIngest.Window): Iterator[CallRecord] =
    Iterator
      .iterate(w.start)(_.plusDays(1))
      .takeWhile(!_.isAfter(w.endInclusive))
      .map(d => CallRecord(d.toString, hash32(d.toString) % 97, w.start.toString))

  /** Unsigned int of the first 8 MD5 hex chars — task-side mirror of
    * `TextOps.hash32` (Column) and DuckDB
    * `CAST('0x'||substr(md5(x),1,8) AS BIGINT)`.
    */
  private[graft] def hash32(s: String): Long = {
    val hex = MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .take(4)
      .map(b => f"$b%02x")
      .mkString
    java.lang.Long.parseLong(hex, 16)
  }
}
