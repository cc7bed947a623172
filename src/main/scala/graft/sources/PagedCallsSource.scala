package graft.sources

import java.time.LocalDate
import java.util

import scala.util.Try

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 form of the reference's paged REST source
  * (`app.py:90-203`): the driver-side `get_data` loop that issues one
  * windowed GET per month becomes a connector whose `planInputPartitions`
  * emits ONE `InputPartition` per monthly window — so the fetch runs in
  * executors, retries ride Spark task retry, and adding windows adds
  * parallelism instead of driver wall-clock. This is the idiomatic
  * packaging of [[PagedFetch]] (same task-side fetch, same stub): a
  * format a user addresses declaratively —
  *
  * {{{
  * spark.read.format(PagedCallsSource.Name)
  *   .option("start", "2019-01-15").option("end", "2019-12-31").load()
  * }}}
  *
  * — and that Catalyst treats as a first-class relation. Column pruning
  * reaches the reader via `SupportsPushDownRequiredColumns`, and date
  * predicates on `call_day` reach the WINDOW PLAN via
  * `SupportsPushDownFilters` — the true analogue of the reference's
  * server-side `$where` clause (`app.py:133-134`):
  *
  *  - windows wholly outside the pushed `[low, high]` day range are
  *    never planned (partition pruning — those GETs never happen);
  *  - intersecting windows fetch with the day bounds applied AT THE
  *    SOURCE (a real REST source would append them to the window's
  *    `$where`; the stub filters its generator, which is the same
  *    contract), so no post-scan Filter remains;
  *  - `window_start` is still derived from the ORIGINAL option-planned
  *    window, so pushdown never changes what the query observes — a
  *    pushed plan returns bit-identical rows to a post-scan filter.
  *
  * At 100 TB / years of history, a thousand windows fan out over the
  * cluster, a dashboard's "last 30 days" query plans two partitions
  * instead of a thousand, and no row ever passes through the driver.
  */
class PagedCallsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = PagedCallsSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform], properties: util.Map[String, String]): Table = {
    val start = properties.get("start")
    val end = properties.get("end")
    require(start != null && end != null, "paged source needs start and end options (ISO dates)")
    new PagedCallsTable(start, end)
  }
}

object PagedCallsSource {
  /** Format name for `spark.read.format(...)`. */
  val Name: String = classOf[PagedCallsSource].getName

  val Schema: StructType = StructType(
    Seq(
      StructField("call_day", StringType, nullable = false),
      StructField("n_calls", LongType, nullable = false),
      StructField("window_start", StringType, nullable = false)
    )
  )
}

private[sources] class PagedCallsTable(start: String, end: String) extends Table with SupportsRead {
  override def name(): String = s"paged_calls[$start..$end]"
  override def schema(): StructType = PagedCallsSource.Schema
  override def capabilities(): util.Set[TableCapability] = util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagedScanBuilder(start, end)
}

private[sources] class PagedScanBuilder(start: String, end: String)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = PagedCallsSource.Schema
  private var accepted: Array[Filter] = Array.empty
  // inclusive ISO day bounds accumulated from the pushed conjuncts;
  // ISO-8601 strings compare lexicographically in date order
  private var low: Option[String] = None
  private var high: Option[String] = None

  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  private def isDay(v: Any): Boolean = v match {
    case s: String => Try(LocalDate.parse(s)).isSuccess
    case _ => false
  }
  private def day(v: Any): LocalDate = LocalDate.parse(v.asInstanceOf[String])
  private def tighterLow(d: LocalDate): Unit = low = Some(low.fold(d.toString)(l => if (d.toString > l) d.toString else l))
  private def tighterHigh(d: LocalDate): Unit = high = Some(high.fold(d.toString)(h => if (d.toString < h) d.toString else h))

  /** Conjuncts arrive pre-split; day-range predicates on `call_day`
    * fold into the [low, high] fetch bounds (the `$where` body), all
    * else stays post-scan. Returns the residual Spark must still apply.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = filters.filterNot {
      case IsNotNull(a) if PagedCallsSource.Schema.fieldNames.contains(a) => true // nothing is nullable: vacuously true
      case EqualTo("call_day", v) if isDay(v) => tighterLow(day(v)); tighterHigh(day(v)); true
      case GreaterThan("call_day", v) if isDay(v) => tighterLow(day(v).plusDays(1)); true
      case GreaterThanOrEqual("call_day", v) if isDay(v) => tighterLow(day(v)); true
      case LessThan("call_day", v) if isDay(v) => tighterHigh(day(v).minusDays(1)); true
      case LessThanOrEqual("call_day", v) if isDay(v) => tighterHigh(day(v)); true
      case _ => false
    }
    accepted = filters.diff(residual)
    residual
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = new PagedScan(start, end, required, low, high)
}

private[sources] class PagedScan(start: String, end: String, required: StructType, low: Option[String], high: Option[String])
    extends Scan
    with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String =
    s"paged_calls[$start..$end] pushedDayRange=[${low.getOrElse("-inf")}..${high.getOrElse("+inf")}]"

  /** One partition per monthly window that INTERSECTS the pushed day
    * range — the unit of fetch, retry, and parallelism (the reference's
    * `for pair in date_pairs` loop, distributed, minus the windows the
    * `$where` rules out).
    */
  override def planInputPartitions(): Array[InputPartition] =
    WindowedIngest
      .monthlyWindows(LocalDate.parse(start), LocalDate.parse(end))
      .filter(w => low.forall(l => w.endInclusive.toString >= l) && high.forall(h => w.start.toString <= h))
      .map(w => PagedWindowPartition(w.start.toString, w.endInclusive.toString, low, high): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(required.fieldNames)
}

private[sources] final case class PagedWindowPartition(
    start: String,
    endInclusive: String,
    low: Option[String],
    high: Option[String]
) extends InputPartition

private[sources] class PagedReaderFactory(fields: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagedWindowPartition]
    val window = WindowedIngest.Window(LocalDate.parse(p.start), LocalDate.parse(p.endInclusive))
    // field-name dispatch resolved ONCE per partition, not per row —
    // get() does only the unavoidable per-row value array
    val extractors: Array[PagedFetch.CallRecord => Any] = fields.map {
      case "call_day"     => (r: PagedFetch.CallRecord) => UTF8String.fromString(r.call_day)
      case "n_calls"      => (r: PagedFetch.CallRecord) => r.n_calls
      case "window_start" => (r: PagedFetch.CallRecord) => UTF8String.fromString(r.window_start)
    }
    new PartitionReader[InternalRow] {
      // task-side "GET": the pushed day bounds apply INSIDE the fetch
      // (a REST source appends them to this window's $where; the stub
      // bounds its generator) while window_start still reflects the
      // option-planned window — pushdown is invisible to results
      private val it = PagedFetch
        .fetchStub(window)
        .filter(r => p.low.forall(r.call_day >= _) && p.high.forall(r.call_day <= _))
      private var cur: PagedFetch.CallRecord = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = {
        val values = new Array[Any](extractors.length)
        var i = 0
        while (i < extractors.length) { values(i) = extractors(i)(cur); i += 1 }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
      }
      override def close(): Unit = ()
    }
  }
}
