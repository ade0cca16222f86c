package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit}
import org.apache.spark.sql.types._

import graft.model.BuzzException

/** A file known to a catalog: path + byte length + partition values.
  *
  * Reference: `SizedFile { key, length }` at
  * `/root/reference/code/src/models/mod.rs:13-16`; partition values are
  * always strings (`/root/reference/README.md:113`).
  */
final case class SizedFile(key: String, length: Long, partitionValues: Seq[String])

/** A catalog that can list its files as a queryable table and be split into
  * per-file scan units.
  *
  * Reference: the `SplittableTable` trait at
  * `/root/reference/code/src/datasource/catalog/mod.rs:20-30`. The catalog
  * itself is never scanned directly (scan errors, mod.rs:111-121); it exists
  * to be pruned + split. In Spark, "split" collapses into the file →
  * partition assignment the scheduler already does, so `read` returns one
  * DataFrame over all surviving files and lets Spark parallelize.
  */
trait SplittableCatalog {
  def name: String

  /** Declared data schema (partition columns NOT included). The reference
    * declares schemas up front per catalog (example_catalog.rs:132-161). */
  def schema: StructType

  /** Whether a declared NULLABLE column may legitimately be absent from a
    * data file's footer — true for Delta catalogs, whose schema evolution
    * means files written before a column was added simply lack it (absent
    * ≡ all-null). Static file catalogs keep the reference's strict
    * presence contract. Consumed by the engine's pre-flight
    * [[SchemaVerifier]] pass. */
  def missingNullableOk: Boolean = false

  /** Names of partition columns; values are strings appended after the data
    * columns (static_catalog.rs:111-120). */
  def partitionColumns: Seq[String]

  /** Columns stored as parquet TIMESTAMP(NANOS), which Spark's reader only
    * surfaces as epoch-nanos longs: declared TimestampType in [[schema]],
    * read as long, truncated to microseconds inside [[read]]. Keeping the
    * conversion in the catalog read path means any map SQL can touch these
    * columns — instead of relying on column pruning to hide them. */
  def nanosColumns: Seq[String] = Nil

  /** Columns stored as parquet TIMESTAMP(MICROS/MILLIS, isAdjustedToUTC =
    * false), which Spark reads as TIMESTAMP_NTZ: declared TimestampType in
    * [[schema]], read as NTZ, cast to session timestamps inside [[read]].
    * All entrypoints pin the session time zone to UTC, so the cast is
    * value-preserving. Same rationale as [[nanosColumns]]: the catalog owns
    * the normalization so every map SQL sees one timestamp type. */
  def ntzColumns: Seq[String] = Nil

  /** Data format of the catalog's files: parquet (default) | orc | csv |
    * json. Beyond reference (its engine is parquet-only). Non-parquet
    * catalogs skip the parquet-specific machinery: footer schema
    * verification, TIMESTAMP(NANOS)/NTZ normalization, and zone-map
    * footer pruning (the manifest builder degrades them to unknown-stats
    * rows anyway — the planner simply doesn't try). */
  def format: String = "parquet"

  def files: Seq[SizedFile]

  /** Merge-on-read deletion vectors: file key → resolved descriptor of
    * the file's DELETED row indexes (the protocol's portable RoaringBitmap
    * frame inside a `.bin` vector file — [[DeletionVectors]]). [[read]]
    * anti-joins these out via the scan's own `_metadata.row_index`, so a
    * row-level delete never rewrites a data file — the 100 TB GDPR path is
    * one small vector write + one log commit, and the anti-join's build
    * side is DV-sized, not table-sized. Empty for every catalog except
    * Delta tables with DV commits. */
  def deletionVectors: Map[String, ResolvedDv] = Map.empty

  /** Column mapping (logical → physical parquet name), derived from the
    * declared schema's field metadata — non-empty only after a Delta
    * RENAME COLUMN. [[read]] scans under physical names and surfaces
    * logical ones; unmapped catalogs skip all of it. */
  final def physicalNames: Map[String, String] = ColumnMapping.mapping(schema)

  /** Full table schema including partition columns, as workers see it. */
  final def fullSchema: StructType =
    partitionColumns.foldLeft(schema)((s, p) => s.add(p, StringType, nullable = false))

  /** The catalog's "table of files": one row per file with columns
    * (key string, length long, <partition cols> string...).
    * Reference: catalog/mod.rs:128-137. */
  final def fileTable(spark: SparkSession): DataFrame = {
    val st = StructType(
      StructField("key", StringType, nullable = false) ::
      StructField("length", LongType, nullable = false) ::
      partitionColumns.map(p => StructField(p, StringType, nullable = false)).toList)
    val rows = files.map(f => Row.fromSeq(f.key +: f.length +: f.partitionValues))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), st)
  }

  /** Partition pruning: evaluate the user's SQL WHERE clause against the
    * file table and keep the surviving files.
    * Reference: `filter_catalog` runs `SELECT * FROM catalog WHERE <filter>`
    * over the file table (catalog/mod.rs:52-99). Implemented as a DataFrame
    * filter so Catalyst handles the expression; the file list is driver-side
    * metadata (as in Spark's own `PruneFileSourcePartitions`), so a collect
    * here is O(#files), not O(data).
    */
  final def prune(spark: SparkSession, partitionFilter: Option[String]): Seq[SizedFile] =
    partitionFilter match {
      case None => files
      case Some(f) =>
        val surviving =
          try fileTable(spark).where(expr(f)).select(col("key")).collect().map(_.getString(0)).toSet
          catch {
            case e: Exception =>
              throw new BuzzException.PlanError(s"invalid partition_filter '$f': ${e.getMessage}")
          }
        files.filter(sf => surviving.contains(sf.key))
    }

  /** Read the given files as one DataFrame with partition columns appended.
    *
    * Partitioned catalogs whose files sit in a consistent Hive layout
    * (`.../col=value/file.parquet` under one root — the layout every sink,
    * Delta table, and discovered directory catalog produces) read through
    * Spark's native partitioned datasource: ONE FileScan regardless of
    * partition-tuple count, with partition values parsed from the paths.
    * The alternative — one scan per partition tuple unioned together — is
    * correct but its plan grows linearly with tuple count: at a real
    * 100 TB layout with 10⁴–10⁵ directories, analysis/optimization of a
    * 10⁴-branch union dominates, and per-group scans defeat cross-partition
    * file packing.
    *
    * Files whose paths do NOT encode their declared partition values (an
    * explicit catalog with arbitrary metadata values, empty values, or
    * null-sentinel values whose surfaced form must stay the literal
    * sentinel string) fall back to the per-tuple union; such catalogs are
    * the explicit-file kind with few tuples.
    */
  final def read(spark: SparkSession, selected: Seq[SizedFile]): DataFrame =
    readInternal(spark, selected, withRowIndex = false, keepPath = false)

  /** [[read]] WITHOUT deletion-vector filtering, plus two trailing columns:
    * `__gfp` (scheme-normalized file path) and `__gri` (the parquet scan's
    * `_metadata.row_index`). The DV writer's raw view — it must see every
    * physical row to compute and merge deleted row indexes. */
  private[graft] final def readWithRowIndex(
      spark: SparkSession, selected: Seq[SizedFile]): DataFrame =
    readInternal(spark, selected, withRowIndex = true, keepPath = false)

  /** [[read]] (deletion vectors applied) plus one trailing `__gfp` column
    * — the scheme-normalized source-file path of each row. The change-feed
    * readers join per-file metadata (the commit version that added or
    * removed a file) back onto the rows of a MULTI-COMMIT single-relation
    * scan, which is what keeps a long feed span's plan width bounded by
    * schema-era runs instead of one union leaf per commit. */
  private[graft] final def readKeepingPath(
      spark: SparkSession, selected: Seq[SizedFile]): DataFrame =
    readInternal(spark, selected, withRowIndex = false, keepPath = true)

  private def readInternal(
      spark: SparkSession, selected: Seq[SizedFile], withRowIndex: Boolean,
      keepPath: Boolean): DataFrame = {
    val outSchema =
      if (withRowIndex) StructType(fullSchema.fields.toSeq ++ Seq(
        StructField("__gfp", StringType), StructField("__gri", LongType)))
      else if (keepPath) StructType(
        fullSchema.fields.toSeq :+ StructField("__gfp", StringType))
      else fullSchema
    if (selected.isEmpty) {
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], outSchema)
    }
    // ranged-read tuning for object-store catalogs (no-op for any other
    // scheme); all of a catalog's files share one scheme, so the first
    // decides
    FsUtil.applyS3aTuning(spark, selected.head.key)
    // TIMESTAMP(NANOS) columns: declared TimestampType publicly, read as
    // epoch-nanos long, truncated to µs (integer DIV — double division loses
    // precision above 2^53 ns; DuckDB's ns→µs cast truncates identically).
    // Column mapping: the scan schema uses each field's PHYSICAL parquet
    // name; renamed fields come back under their logical names below.
    val readSchema = StructType(schema.fields.map { f0 =>
      val f = f0.copy(name = ColumnMapping.physicalName(f0))
      if (nanosColumns.contains(f0.name)) f.copy(dataType = LongType)
      else if (ntzColumns.contains(f0.name)) f.copy(dataType = TimestampNTZType)
      else f
    })
    if (nanosColumns.nonEmpty) {
      // DELIBERATE session-conf set, not scoped: the flag is consulted at
      // EXECUTION time by the parquet reader, so restoring it after building
      // this (lazy) DataFrame would break the read. The flag is monotonic in
      // effect — it only changes files that would otherwise FAIL to read
      // (Spark errors on TIMESTAMP(NANOS) without it) into long-typed
      // columns; valid reads are unaffected.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    }
    // row identity (normalized path + row index) is attached RIGHT AFTER
    // each load — `_metadata` is a scan-relation column and must be
    // resolved before unions/projections hide it. Needed when this read
    // either filters deletion vectors out or surfaces the identity itself.
    val needsIdentity = withRowIndex || keepPath ||
      selected.exists(f => deletionVectors.contains(f.key))
    def withIdentity(df: DataFrame): DataFrame =
      if (!needsIdentity) df
      else df
        .withColumn("__gfp", FsUtil.normalizePathCol(col("_metadata.file_path")))
        .withColumn("__gri", col("_metadata.row_index"))
    val scanned = hiveBasePath(selected) match {
      case Some(base) =>
        // partition columns are declared StringType in the user schema, so
        // Spark skips type inference and keeps the reference's strings-only
        // partition model (README.md:113); values are percent-decoded by
        // Spark's own path parsing, matching the check in hiveBasePath
        val withParts = StructType(readSchema.fields.toSeq ++
          partitionColumns.map(p => StructField(p, StringType, nullable = true)))
        withIdentity(spark.read.schema(withParts)
          .option("basePath", base)
          .options(formatOptions)
          .format(format)
          .load(selected.map(_.key): _*))
      case None =>
        val groups = selected.groupBy(_.partitionValues).toSeq.sortBy(_._1.mkString("/"))
        groups.map { case (partVals, fs) =>
          val base = withIdentity(spark.read.schema(readSchema)
            .options(formatOptions).format(format).load(fs.map(_.key): _*))
          partitionColumns.zip(partVals).foldLeft(base) { case (df, (p, v)) =>
            df.withColumn(p, lit(v))
          }
        }.reduce(_.unionAll(_))
    }
    // surface mapped columns under their LOGICAL names from here on —
    // ONE atomic select (sequential renames would collide when a rename
    // chain reuses a live name mid-fold, e.g. w→v alongside v→col-uuid)
    val logicalFor = physicalNames.map(_.swap)
    val logicalNamed =
      if (physicalNames.isEmpty) scanned
      else scanned.select(scanned.columns.toIndexedSeq.map(c =>
        col(c).as(logicalFor.getOrElse(c, c))): _*)
    // merge-on-read: anti-join each DV'd file's deleted row indexes out.
    // The raw (writer's) view skips this — it must see every physical row.
    val undeleted =
      if (withRowIndex) logicalNamed
      else {
        val dvd = selected.flatMap(f => deletionVectors.get(f.key)
          .map(dv => (FsUtil.normalizePath(f.key), dv)))
        if (dvd.isEmpty) logicalNamed
        else {
          // each file's descriptor frames exactly ONE vector; decode is
          // distributed (one task per descriptor slice), so the build
          // side never passes through the driver
          val dvRows = DeletionVectors.deletedRowsDF(spark, dvd)
          // no broadcast hint: AQE broadcasts the (small) vector side on
          // its own; a pathological multi-GB DV still executes as SMJ
          logicalNamed.join(dvRows,
            logicalNamed("__gfp") === dvRows("__path") &&
              logicalNamed("__gri") === dvRows("__ri"),
            "left_anti")
        }
      }
    val nanosConverted = nanosColumns.foldLeft(undeleted) { (df, c) =>
      df.withColumn(c, expr(s"timestamp_micros(`$c` DIV 1000)"))
    }
    val converted = ntzColumns.foldLeft(nanosConverted) { (df, c) =>
      df.withColumn(c, col(c).cast(TimestampType))
    }
    // enforce the catalog's declared column order (data cols, then
    // partition cols) independent of the datasource's placement
    val projected = converted.select(outSchema.fieldNames.map(col).toSeq: _*)
    // the mapping is THIS table's storage detail — it must not ride the
    // output schema into downstream writers (a synced/derived table would
    // otherwise claim physical names its own files don't have)
    if (physicalNames.isEmpty) projected
    else projected.select(projected.schema.fields.map(f =>
      col(f.name).as(f.name, ColumnMapping.withoutMapping(f.metadata))).toSeq: _*)
  }

  /** User-supplied reader options (a Static catalog's JSON `options`
    * object); merged OVER the engine defaults, so `{"header": "false"}`
    * turns off the headered-CSV contract for genuinely headerless files
    * and `{"sep": "\t"}` reads TSV. */
  def readerOptions: Map[String, String] = Map.empty

  /** Reader options the format needs, before user overrides. CSV
    * catalogs are HEADERED by default (what every sink here writes):
    * `header=true` names the columns, and `enforceSchema=false` makes
    * Spark CHECK the file's header names against the declared schema
    * instead of assigning columns positionally — a misordered
    * declaration fails loudly rather than silently mis-assigning every
    * column. Headerless CSV declares `{"header": "false"}` in the
    * catalog's `options`. */
  private def formatOptions: Map[String, String] = (format match {
    case "csv" => Map("header" -> "true", "enforceSchema" -> "false")
    case _     => Map.empty[String, String]
  }) ++ readerOptions

  /** The common root of a consistent Hive layout, if every selected file's
    * path ends in `col=value` segments (one per partition column, in order,
    * directly above the file) whose percent-decoded values equal the file's
    * declared partition values. Returns None — union fallback — otherwise. */
  private def hiveBasePath(selected: Seq[SizedFile]): Option[String] = {
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.unescapePathName
    if (partitionColumns.isEmpty) return None // single multi-file scan already
    val nParts = partitionColumns.length
    val bases = selected.map { f =>
      val segs = f.key.split('/')
      if (segs.length < nParts + 2) None // need root + partition dirs + file
      else {
        val partSegs = segs.slice(segs.length - 1 - nParts, segs.length - 1)
        val consistent = partSegs.lazyZip(partitionColumns).lazyZip(f.partitionValues)
          .forall { (seg, colName, value) =>
            seg.startsWith(colName + "=") &&
              unescapePathName(seg.substring(colName.length + 1)) == value &&
              value.nonEmpty && value != DeltaCatalog.NullPartitionValue
          }
        if (consistent) Some(segs.take(segs.length - 1 - nParts).mkString("/"))
        else None
      }
    }
    bases.headOption.flatten.filter(b => bases.forall(_.contains(b)))
  }

  /** One scan unit per file — parity with the reference's split
    * (one file = one hbee, static_catalog.rs:95-107). Spark does its own
    * file → task assignment; this exists for API parity and tests. */
  final def split(spark: SparkSession, partitionFilter: Option[String]): Seq[SizedFile] =
    prune(spark, partitionFilter)
}

/** Compiled-in static file list, parity with
  * `/root/reference/code/src/datasource/catalog/static_catalog.rs`. */
final class StaticCatalog(
    val name: String,
    val schema: StructType,
    val partitionColumns: Seq[String],
    val files: Seq[SizedFile],
    override val nanosColumns: Seq[String] = Nil,
    override val ntzColumns: Seq[String] = Nil,
    override val format: String = "parquet",
    override val readerOptions: Map[String, String] = Map.empty,
    override val missingNullableOk: Boolean = false,
    override val deletionVectors: Map[String, ResolvedDv] = Map.empty)
  extends SplittableCatalog {
  require(
    files.forall(_.partitionValues.length == partitionColumns.length),
    "every file must carry one value per partition column")

  /** Same catalog viewed under a DIFFERENT deletion-vector state — how a
    * change-feed reader presents one side of a commit at that side's DV
    * truth (the pre-commit state for removes, the commit's own actions
    * for adds). */
  private[graft] def withDeletionVectors(dv: Map[String, ResolvedDv]): StaticCatalog =
    new StaticCatalog(name, schema, partitionColumns, files, nanosColumns,
      ntzColumns, format, readerOptions, missingNullableOk, dv)
}

object StaticCatalog {
  /** Driver-side cache of inferred (schema, nanosColumns) per first-file
    * path. The reference reads one footer per catalog construction; callers
    * that rebuild a catalog per query (the JSON API resolves catalogs at
    * query time) would otherwise pay a footer read + Spark schema inference
    * on every query — the measured bulk of the two-stage engine's overhead
    * vs a direct Spark query. Parquet files are immutable in this model, so
    * path-keyed caching is sound. */
  private val inferenceCache =
    new java.util.concurrent.ConcurrentHashMap[String, (StructType, Seq[String], Seq[String])]()

  /** Parquet columns physically stored as TIMESTAMP(NANOS) in the first
    * file's footer — Spark's reader only surfaces these as longs, so the
    * catalog converts them explicitly (see [[SplittableCatalog.read]]). */
  /** One footer read serving inference: the TIMESTAMP(NANOS) column names
    * and the REQUIRED (non-nullable) column names. Spark's own inference
    * widens every field to nullable, which would make an inferred catalog
    * over a REQUIRED column unverifiable under the strict (reference-
    * parity) nullability check — the footer's repetition is the truth. */
  private def footerMeta(
      spark: SparkSession, path: String): (Seq[String], Seq[String], Set[String]) = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
    import org.apache.parquet.schema.Type
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(path),
        spark.sessionState.newHadoopConf()))
    val footer = try reader.getFooter finally reader.close()
    import scala.jdk.CollectionConverters._
    val fields = footer.getFileMetaData.getSchema.getFields.asScala
    val nanos = fields.collect {
      case f if f.isPrimitive &&
        (f.getLogicalTypeAnnotation match {
          case t: TimestampLogicalTypeAnnotation =>
            t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
          case _ => false
        }) => f.getName
    }.toSeq
    // local (unadjusted) MICROS/MILLIS timestamps — Spark reads TIMESTAMP_NTZ
    val ntz = fields.collect {
      case f if f.isPrimitive &&
        (f.getLogicalTypeAnnotation match {
          case t: TimestampLogicalTypeAnnotation =>
            !t.isAdjustedToUTC && t.getUnit != LogicalTypeAnnotation.TimeUnit.NANOS
          case _ => false
        }) => f.getName
    }.toSeq
    val required = fields.collect {
      case f if f.getRepetition == Type.Repetition.REQUIRED => f.getName
    }.toSet
    (nanos, ntz, required)
  }

  /** Catalog over explicit parquet paths, inferring the schema from the
    * first file; file lengths come from the Hadoop FileSystem so `file://`,
    * `hdfs://` and `s3a://` URIs all work. */
  /** Formats a Static catalog can declare; parquet is the default and the
    * only one the reference's engine reads. */
  val SupportedFormats: Set[String] = Set("parquet", "orc", "csv", "json")

  def overLocalFiles(
      spark: SparkSession,
      name: String,
      paths: Seq[String],
      partitionColumns: Seq[String] = Nil,
      partitionValues: Map[String, Seq[String]] = Map.empty,
      format: String = "parquet",
      declaredSchema: Option[StructType] = None,
      readerOptions: Map[String, String] = Map.empty): StaticCatalog = {
    require(SupportedFormats.contains(format),
      s"unsupported catalog format '$format'")
    val (schema, nanosCols, ntzCols) = declaredSchema match {
      case Some(s) => (s, Nil: Seq[String], Nil: Seq[String])
      case None => format match {
        case "parquet" =>
          inferenceCache.computeIfAbsent(paths.head, { p =>
            // tolerate TIMESTAMP(NANOS) columns during inference (read as
            // long), then re-declare them TimestampType backed by the
            // catalog's conversion
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            val (nanos, ntz, required) = footerMeta(spark, p)
            val inferred = spark.read.parquet(p).schema
            (StructType(inferred.fields.map { f0 =>
              // Spark widens every inferred field to nullable; restore the
              // footer's repetition so the inferred declaration round-trips
              // through the strict nullability check (reference parity)
              val f = f0.copy(nullable = !required.contains(f0.name))
              if (nanos.contains(f.name) || ntz.contains(f.name))
                f.copy(dataType = TimestampType)
              else f
            }), nanos, ntz)
          })
        case "orc" =>
          // ORC is self-describing: footer-only schema read, cached like
          // the parquet path (format-prefixed key — same path could hold
          // either format across tests)
          inferenceCache.computeIfAbsent(s"orc|${paths.head}", { _ =>
            (spark.read.orc(paths.head).schema, Nil, Nil)
          })
        case other =>
          // inferring csv/json schemas requires a DATA scan, which catalog
          // resolution must never pay at any scale — require a declaration
          throw new BuzzException.BadRequest(
            s"$other catalog '$name' requires a declared schema " +
              "(\"schema\": \"col TYPE, ...\") — schema inference would scan the data")
      }
    }
    val files = paths.map { p =>
      SizedFile(p, FsUtil.status(spark, p).getLen, partitionValues.getOrElse(p, Nil))
    }
    new StaticCatalog(
      name, schema, partitionColumns, files, nanosCols, ntzCols, format, readerOptions)
  }

  /** Catalog over a parquet file or a directory of parquet files (the shape
    * a `Static` catalog uri takes in the JSON query API). A directory laid
    * out Hive-style (`col=value/` subdirectories) is discovered as a
    * partitioned catalog: partition columns come from the directory names,
    * values are strings (exactly the reference's partition model,
    * README.md:113), and the `partition_filter` prunes whole directories
    * before any data is read. */
  def overPath(
      spark: SparkSession,
      name: String,
      uri: String,
      partitionColumns: Seq[String] = Nil,
      partitionValuesFor: String => Seq[String] = _ => Nil,
      format: String = "parquet",
      declaredSchema: Option[StructType] = None,
      readerOptions: Map[String, String] = Map.empty): StaticCatalog = {
    require(SupportedFormats.contains(format),
      s"unsupported catalog format '$format'")
    if (!FsUtil.isDirectory(spark, uri)) {
      return overLocalFiles(spark, name, Seq(uri), partitionColumns,
        Map(uri -> partitionValuesFor(uri)), format, declaredSchema, readerOptions)
    }
    val found = FsUtil.walkDataFiles(spark, uri, s".$format")
    if (found.isEmpty)
      throw new BuzzException.BadRequest(s"no $format files under '$uri'")
    val discoveredCols = found.head._2.map(_._1)
    if (found.exists(_._2.map(_._1) != discoveredCols))
      throw new BuzzException.BadRequest(
        s"inconsistent Hive partition layout under '$uri'")
    if (discoveredCols.nonEmpty && partitionColumns.nonEmpty)
      throw new BuzzException.BadRequest(
        s"'$uri' is Hive-partitioned (${discoveredCols.mkString(",")}); " +
          "explicit partitionColumns conflict with the discovered layout")
    val cols = if (discoveredCols.nonEmpty) discoveredCols else partitionColumns
    val valuesFor: String => Seq[String] =
      if (discoveredCols.nonEmpty) {
        val byPath = found.toMap
        p => byPath(p).map(_._2)
      } else partitionValuesFor
    overLocalFiles(spark, name, found.map(_._1), cols,
      found.map { case (p, _) => p -> valuesFor(p) }.toMap,
      format, declaredSchema, readerOptions)
  }
}
