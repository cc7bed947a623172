package graft.sources

import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Delta-style COLUMN MAPPING for the manifest catalog: a logical→
  * physical name indirection carried in each versioned schema's field
  * metadata (`graft.physical`), which is what makes RENAME and DROP
  * COLUMN pure metadata operations — parquet files are written once
  * under stable PHYSICAL names and never rewritten:
  *
  *   - RENAME changes only the logical name; the field keeps its
  *     physical name, so every existing file still serves it.
  *   - DROP removes the field from the logical schema; the bytes stay
  *     in the files but no scan ever requests that physical column.
  *   - ADD assigns a FRESH physical name (`c<n>`, n strictly above
  *     every id any schema version ever used), so re-adding a dropped
  *     column's logical name can never resurrect the dropped bytes —
  *     the new column reads null-filled from old files, the Delta
  *     semantics.
  *
  * Reads stay per-version correct for free: each version's schema
  * (with its mapping) is already versioned metadata (the q433
  * mechanism), so `VERSION AS OF` serves that version's logical names
  * over the same physical columns. Enabled at CREATE with
  * `'column_mapping'='name'`; the genesis schema gets physical names
  * `c1..cn` in declaration order.
  *
  * Reference analogue: none in `app.py` (Dask frames rename in
  * memory); this is the evolution surface a durable table format
  * needs (Delta's columnMapping.mode=name, Iceberg's field ids).
  */
object ColumnMapping {
  /** StructField metadata key carrying the physical column name. */
  val MetaKey = "graft.physical"

  /** Whether the schema carries a mapping (any field with a physical
    * name). The genesis assignment stamps every field, so this is
    * all-or-nothing per table.
    */
  def enabled(schema: StructType): Boolean = schema.fields.exists(_.metadata.contains(MetaKey))

  def physicalName(f: StructField): String =
    if (f.metadata.contains(MetaKey)) f.metadata.getString(MetaKey) else f.name

  /** logical name → physical name (identity entries omitted so an
    * unmapped table contributes an empty map — the zero-cost path).
    */
  def logicalToPhysical(schema: StructType): Map[String, String] =
    schema.fields.iterator
      .map(f => f.name -> physicalName(f))
      .filter { case (l, p) => l != p }
      .toMap

  /** physical name → logical name, for remapping footer-keyed zone
    * maps back into the query's namespace.
    */
  def physicalToLogical(schema: StructType): Map[String, String] =
    schema.fields.iterator
      .map(f => physicalName(f) -> f.name)
      .filter { case (p, l) => p != l }
      .toMap

  /** The schema as the parquet FILES carry it: fields renamed to
    * their physical names, metadata stripped (files should not embed
    * the mapping — the log owns it).
    */
  def physicalSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f => f.copy(name = physicalName(f), metadata = Metadata.empty)))

  private def withPhysical(f: StructField, physical: String): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata).putString(MetaKey, physical).build())

  /** Genesis assignment at CREATE: `c1..cn` in declaration order. */
  def assignAll(schema: StructType): StructType =
    StructType(schema.fields.zipWithIndex.map { case (f, i) => withPhysical(f, s"c${i + 1}") })

  /** A fresh field for ADD COLUMN: physical id strictly above every
    * id ANY schema version ever used (`historySchemas` must include
    * the genesis and every schema-bearing commit), so a dropped
    * column's physical name is never reissued.
    */
  def freshField(f: StructField, historySchemas: Seq[StructType]): StructField = {
    val used = historySchemas.iterator
      .flatMap(_.fields)
      .map(physicalName)
      .collect { case s if s.matches("c\\d+") => s.drop(1).toInt }
      .foldLeft(0)(math.max)
    withPhysical(f, s"c${used + 1}")
  }
}
