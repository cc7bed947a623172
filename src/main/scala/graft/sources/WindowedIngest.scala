package graft.sources

import java.time.{LocalDate, YearMonth}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Date-windowed ingestion planner.
  *
  * The reference hand-rolls partition pruning: it splits 2019-01-01→today
  * into monthly `[start, end]` pairs (`app.py:95-131`) and issues one
  * predicate-filtered fetch per pair (`app.py:133-134`,
  * `$where=create_time_incident>=t0 and <=t1`), then concatenates the
  * chunks (`app.py:165-186`).
  *
  * Spark-first restatement: window planning happens on the driver
  * (cheap `java.time` arithmetic), each window becomes a *filtered scan
  * of the same source*, and the chunks union back together. Because the
  * per-window predicate is a plain `between` on a timestamp column,
  * Catalyst pushes it into the parquet scan (row-group / partition
  * pruning) — the monthly `$where` clause of the reference becomes
  * `PushedFilters` for free, and at 100 TB only the matching row groups
  * are read. The union is a no-shuffle vertical concat (UNION ALL), so
  * the plan stays one stage until an aggregation asks for a shuffle.
  */
object WindowedIngest {

  /** One ingestion window, inclusive on both ends (matching the
    * reference's `>= t0 and <= t1` SoQL predicate, `app.py:133-134`).
    */
  final case class Window(start: LocalDate, endInclusive: LocalDate)

  /** Plan monthly windows covering [start, end] — the Spark-side
    * equivalent of `pd.date_range(freq='1M')` plus the boundary fixes at
    * `app.py:106-131` (first window starts at `start`, last window ends
    * at `end`, interior windows are whole calendar months).
    */
  def monthlyWindows(start: LocalDate, end: LocalDate): Seq[Window] = {
    require(!end.isBefore(start), s"end $end before start $start")
    Iterator
      .iterate(YearMonth.from(start))(_.plusMonths(1))
      .takeWhile(ym => !ym.atDay(1).isAfter(end))
      .map { ym =>
        val s = if (ym == YearMonth.from(start)) start else ym.atDay(1)
        val e = if (ym == YearMonth.from(end)) end else ym.atEndOfMonth()
        Window(s, e)
      }
      .toSeq
  }

  /** Load `source` one window at a time and union the chunks.
    *
    * `load` receives the window predicate to apply at the scan —
    * callers pass `df.filter(...)` so the predicate lands directly above
    * the scan node and gets pushed down. `unionByName(allowMissing=true)`
    * mirrors the reference's `dd.concat` tolerance for ragged chunks
    * (API months can differ in columns, `app.py:186`).
    */
  def ingest(windows: Seq[Window], tsCol: String)(load: Column => DataFrame): DataFrame = {
    require(windows.nonEmpty, "no ingestion windows planned")
    windows
      .map(w => load(predicate(w, tsCol)))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Single-scan variant for sources where one range predicate reaches
    * the same data as the per-window union (file sources: row-group /
    * partition pruning happens inside the scan, so N window branches
    * just re-decode the same files N times — on a single-row-group
    * parquet that's an N× full-scan pathology). The per-window
    * [[ingest]] stays for genuinely paged sources (REST APIs) where
    * each window IS a separate fetch. Windows tile the range
    * ([[monthlyWindows]] guarantees it), so results are identical.
    */
  def ingestCoalesced(windows: Seq[Window], tsCol: String)(load: Column => DataFrame): DataFrame = {
    require(windows.nonEmpty, "no ingestion windows planned")
    val overall = Window(windows.map(_.start).min(Ordering.by[LocalDate, Long](_.toEpochDay)),
      windows.map(_.endInclusive).max(Ordering.by[LocalDate, Long](_.toEpochDay)))
    load(predicate(overall, tsCol))
  }

  private def predicate(w: Window, tsCol: String): Column =
    col(tsCol) >= lit(w.start.toString).cast("timestamp") &&
      col(tsCol) < lit(w.endInclusive.plusDays(1).toString).cast("timestamp")
}
