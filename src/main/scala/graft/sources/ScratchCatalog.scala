package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.NoSuchTableException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** A minimal writable DataSource V2 catalog whose tables support
  * ROW-LEVEL OPERATIONS — the connector surface `MERGE INTO` /
  * `UPDATE` / `DELETE` compile against in Spark 4 (the session
  * catalog's file tables are v1 and reject them). This is the
  * warehouse-user path q269 proves procedurally: the analyzer's
  * RewriteMergeIntoTable turns the MERGE into a group-based
  * ReplaceData over [[ScratchRowLevelOperation]]'s scan + write, and
  * q380 audits that declarative path bit-exactly against the
  * anti-join/replace/union machinery.
  *
  * Scope is deliberate: a scratch, driver-held table (rows ship to
  * executors inside the InputPartition, exactly how a LocalScan
  * does). The thing under test is the CONNECTOR CONTRACT — catalog
  * resolution, batch scan, batch append, and the row-level operation
  * lifecycle (newScanBuilder → rewrite → newWriteBuilder → commit) —
  * not storage; a production connector swaps the row store for files
  * and keeps every interface here. With no metadata attributes
  * declared, the whole table is ONE replacement group, so the
  * ReplaceData write delivers the complete post-merge row set and
  * commit swaps it in atomically (@volatile publication).
  */
class ScratchCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = "scratch"

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name

  override def name(): String = catalogName

  private def key(ident: Identifier): String = (ident.namespace() :+ ident.name()).mkString(".")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val prefix = namespace.mkString(".") + "."
    ScratchCatalog.store
      .keySet()
      .asScala
      .filter(_.startsWith(prefix))
      .map(k => Identifier.of(namespace, k.stripPrefix(prefix)))
      .toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val state = ScratchCatalog.store.get(key(ident))
    if (state == null) throw new NoSuchTableException(ident)
    new ScratchTable(key(ident), state)
  }

  override def createTable(
      ident: Identifier,
      schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]
  ): Table = {
    require(partitions.isEmpty, "scratch tables are unpartitioned")
    val state = new ScratchCatalog.TableState(schema)
    ScratchCatalog.store.put(key(ident), state)
    new ScratchTable(key(ident), state)
  }

  /** ADD COLUMN only — the schema-evolution verb a lakehouse table
    * actually exercises weekly. Legacy rows are padded with NULL at
    * alter time (the in-memory analogue of "old files simply lack the
    * column and read as NULL"), so reads after the alter see the new
    * arity everywhere and a MERGE can backfill.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val state = ScratchCatalog.store.get(key(ident))
    if (state == null) throw new NoSuchTableException(ident)
    changes.foreach {
      case add: TableChange.AddColumn if add.fieldNames().length == 1 =>
        // append-at-end only: an explicit AFTER/FIRST position would
        // silently land at the end, so refuse it instead
        require(add.position() == null, s"column position not supported: ${add.position()}")
        val snap = state.snapshot
        val old = snap.schema
        val rows: Array[InternalRow] = snap.rows.map { r =>
          val values = new Array[Any](old.length + 1)
          var i = 0
          while (i < old.length) { values(i) = r.get(i, old(i).dataType); i += 1 }
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values): InternalRow
        }
        // ONE volatile write: readers never see rows whose arity
        // disagrees with the schema they read
        state.snapshot =
          ScratchCatalog.Snapshot(old.add(add.fieldNames()(0), add.dataType(), add.isNullable), rows)
      case other =>
        throw new UnsupportedOperationException(s"unsupported table change: $other")
    }
    new ScratchTable(key(ident), state)
  }

  override def dropTable(ident: Identifier): Boolean =
    ScratchCatalog.store.remove(key(ident)) != null

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("RENAME on a scratch table")

  // single flat namespace — enough for `catalog.db.table` resolution
  override def listNamespaces(): Array[Array[String]] = Array(Array("db"))
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = Array.empty
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] =
    new util.HashMap[String, String]()
  override def createNamespace(namespace: Array[String], metadata: util.Map[String, String]): Unit = ()
  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("ALTER NAMESPACE on the scratch catalog")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = false
}

object ScratchCatalog {
  /** One immutable (schema, rows) pair — published as a unit so a
    * reader can never observe rows whose arity disagrees with the
    * schema it just read (alterTable swaps both in one write).
    */
  final case class Snapshot(schema: StructType, rows: Array[InternalRow])

  /** Driver-authoritative table state, shared across catalog
    * instantiations in the JVM (Spark constructs the catalog class
    * per session reference). The snapshot is replaced wholesale by
    * commits/alters — @volatile gives readers the atomic swap a table
    * swap needs.
    */
  final class TableState(schema0: StructType) {
    @volatile var snapshot: Snapshot = Snapshot(schema0, Array.empty)
    def schema: StructType = snapshot.schema
  }
  private val store = new java.util.concurrent.ConcurrentHashMap[String, TableState]()
}

private[sources] class ScratchTable(tableName: String, state: ScratchCatalog.TableState)
    extends Table
    with SupportsRead
    with SupportsWrite
    with SupportsRowLevelOperations {
  override def name(): String = tableName
  override def schema(): StructType = state.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE,
      // opt-in for `MERGE WITH SCHEMA EVOLUTION`: the analyzer routes
      // source-only columns through alterTable before the rewrite
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION
    )

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScratchScan(state)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ScratchWrite(state, replace = false)

  override def newRowLevelOperationBuilder(info: RowLevelOperationInfo): RowLevelOperationBuilder =
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation = new ScratchRowLevelOperation(state, info.command())
    }
}

/** Group-based row-level operation: the scan feeds the MERGE rewrite
  * the current rows; the write receives the complete post-operation
  * row set for the (single) affected group and swaps it in.
  */
private[sources] class ScratchRowLevelOperation(
    state: ScratchCatalog.TableState,
    cmd: RowLevelOperation.Command
) extends RowLevelOperation {
  override def command(): RowLevelOperation.Command = cmd
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScratchScan(state)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ScratchWrite(state, replace = true)
}

private[sources] class ScratchScan(state: ScratchCatalog.TableState)
    extends ScanBuilder
    with Scan
    with Batch {
  // ONE snapshot read at builder construction: schema and rows are
  // guaranteed consistent even if a commit/alter lands mid-planning
  private val snap = state.snapshot
  override def build(): Scan = this
  override def readSchema(): StructType = snap.schema
  override def toBatch: Batch = this
  // rows snapshot at planning time, shipped inside the partition
  override def planInputPartitions(): Array[InputPartition] =
    Array(ScratchPartition(snap.rows))
  override def createReaderFactory(): PartitionReaderFactory = new ScratchReaderFactory
}

private[sources] case class ScratchPartition(rows: Array[InternalRow]) extends InputPartition

private[sources] class ScratchReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val it = partition.asInstanceOf[ScratchPartition].rows.iterator
      private var current: InternalRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
}

/** Append (INSERT INTO) or full-group replace (the row-level write).
  * Task writers copy each row (Spark reuses row objects), commit
  * messages carry the copies to the driver, and the driver-side
  * commit publishes the new array — append concatenates, replace
  * swaps.
  */
private[sources] class ScratchWrite(state: ScratchCatalog.TableState, replace: Boolean)
    extends WriteBuilder
    with Write
    with BatchWrite {
  override def build(): Write = this
  override def toBatch: BatchWrite = this
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ScratchWriterFactory(state.schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val incoming = messages.flatMap(_.asInstanceOf[ScratchCommit].rows)
    val snap = state.snapshot
    state.snapshot =
      ScratchCatalog.Snapshot(snap.schema, if (replace) incoming else snap.rows ++ incoming)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private[sources] case class ScratchCommit(rows: Array[InternalRow]) extends WriterCommitMessage

/** Normalizes incoming rows to the TABLE schema. Plain appends arrive
  * with exactly the table's arity. A group-based MERGE's ReplaceData
  * arrives with one EXTRA leading int — MergeRows' `__row_operation`
  * column: for connectors that declare metadata attributes Spark's
  * DataAndMetadataWritingSparkTask consumes it (reads `getInt(0)`,
  * projects the data row before `DataWriter.write`); with no metadata
  * attributes the plain writing task hands the raw row through, so
  * the connector strips the operation slot itself (every emitted row
  * is a keep — deletes were discarded inside MergeRows). Values are
  * deep-copied per field because Spark reuses row buffers across
  * `write` calls.
  */
private[sources] class ScratchWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = ArrayBuffer.empty[InternalRow]
      // Spark reuses row buffers across `write` calls, so every
      // reference-typed value must be deep-copied — not just strings:
      // a BINARY/ARRAY/STRUCT/MAP column buffered by reference would
      // silently corrupt committed rows when the buffer is recycled.
      // Primitives and immutable boxes (Decimal wraps an immutable
      // BigDecimal or a long) pass through.
      private def copyValue(v: Any): Any = v match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.copy()
        case b: Array[Byte] => b.clone()
        case a: org.apache.spark.sql.catalyst.util.ArrayData => a.copy()
        case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
        case r: InternalRow => r.copy()
        case other => other
      }
      override def write(row: InternalRow): Unit = {
        val base = row.numFields - schema.length // 1 iff the op column leads
        require(base == 0 || base == 1, s"row arity ${row.numFields} vs table arity ${schema.length}")
        val values = new Array[Any](schema.length)
        var i = 0
        while (i < schema.length) {
          values(i) = copyValue(row.get(i + base, schema(i).dataType))
          i += 1
        }
        buf += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
      }
      override def commit(): WriterCommitMessage = ScratchCommit(buf.toArray)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
