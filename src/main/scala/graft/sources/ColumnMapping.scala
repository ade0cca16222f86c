package graft.sources

import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Delta column mapping (name mode): a column's LOGICAL name — what
  * queries and the declared schema use — is decoupled from its PHYSICAL
  * name — what the parquet files store. The mapping lives as field
  * metadata (`delta.columnMapping.physicalName`) inside the table's
  * schemaString, exactly where upstream Delta keeps it, so it rides every
  * metaData action, checkpoint, and clone untouched. RENAME COLUMN then
  * becomes a metaData-only commit: zero files rewritten, at any table
  * size (reference anchor: the protocol's columnMapping reader feature).
  *
  * A column never renamed has no metadata entry — its physical name IS
  * its logical name — so unmapped tables pay nothing anywhere. */
object ColumnMapping {
  val PhysicalNameKey = "delta.columnMapping.physicalName"

  /** The parquet-side name of a declared field. */
  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysicalNameKey)) f.metadata.getString(PhysicalNameKey)
    else f.name

  /** logical → physical, ONLY for fields whose names differ — empty for
    * never-renamed tables, so call sites can branch on `isEmpty`. */
  def mapping(schema: StructType): Map[String, String] =
    schema.fields.collect {
      case f if physicalName(f) != f.name => f.name -> physicalName(f)
    }.toMap

  /** The schema as the FILES store it: every field under its physical
    * name (metadata preserved). Identity for unmapped schemas. */
  def toPhysical(schema: StructType): StructType =
    StructType(schema.fields.map(f => f.copy(name = physicalName(f))))

  /** `f` renamed to `newName`, pinning its CURRENT physical name into the
    * metadata so the files keep reading (idempotent across re-renames —
    * the physical name never moves again). */
  def renamed(f: StructField, newName: String): StructField =
    f.copy(
      name = newName,
      metadata = new MetadataBuilder()
        .withMetadata(f.metadata)
        .putString(PhysicalNameKey, physicalName(f))
        .build())

  /** `f` with its CURRENT physical name pinned explicitly — identity for
    * the name, but it marks the field (and so the table) as MAPPED.
    * DROP COLUMN pins every surviving field: evolution then assigns
    * fresh `col-<uuid>` physical names to new columns, so a re-added
    * column with the dropped column's name can never read the dropped
    * bytes out of old files. */
  def pinned(f: StructField): StructField = renamed(f, f.name)

  /** `f` stored under an explicit physical name (evolution on mapped
    * tables: fresh uuid names, collision-free by construction). */
  def withPhysical(f: StructField, physical: String): StructField =
    f.copy(metadata = new MetadataBuilder()
      .withMetadata(f.metadata)
      .putString(PhysicalNameKey, physical)
      .build())

  /** Whether any field carries mapping metadata — the table-level
    * "column mapping active" test. */
  def isMapped(schema: StructType): Boolean =
    schema.fields.exists(_.metadata.contains(PhysicalNameKey))

  /** Strip mapping metadata (for surfaces that must not leak it). */
  def withoutMapping(m: Metadata): Metadata =
    if (!m.contains(PhysicalNameKey)) m
    else {
      val b = new MetadataBuilder().withMetadata(m)
      b.remove(PhysicalNameKey)
      b.build()
    }
}
