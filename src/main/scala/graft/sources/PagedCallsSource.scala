package graft.sources

import java.time.LocalDate
import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
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
  * — and that Catalyst treats as a first-class relation: column pruning
  * reaches the reader via `SupportsPushDownRequiredColumns` (a real
  * REST source would translate pruned columns into a `$select` query
  * parameter the same way the reference hand-writes `$where`,
  * `app.py:133-134`). The window plan IS the partitioning: at 100 TB /
  * years of history, a thousand windows fan out over the cluster and
  * no row ever passes through the driver.
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

private[sources] class PagedScanBuilder(start: String, end: String) extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = PagedCallsSource.Schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new PagedScan(start, end, required)
}

private[sources] class PagedScan(start: String, end: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** One partition per monthly window — the unit of fetch, retry, and
    * parallelism (the reference's `for pair in date_pairs` loop,
    * distributed).
    */
  override def planInputPartitions(): Array[InputPartition] =
    WindowedIngest
      .monthlyWindows(LocalDate.parse(start), LocalDate.parse(end))
      .map(w => PagedWindowPartition(w.start.toString, w.endInclusive.toString): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedReaderFactory(required.fieldNames)
}

private[sources] final case class PagedWindowPartition(start: String, endInclusive: String) extends InputPartition

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
      private val it = PagedFetch.fetchStub(window) // task-side "GET"
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
