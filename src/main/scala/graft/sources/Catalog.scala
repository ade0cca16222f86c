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

  /** Names of partition columns; values are strings appended after the data
    * columns (static_catalog.rs:111-120). */
  def partitionColumns: Seq[String]

  def files: Seq[SizedFile]

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
    * Files are grouped by partition tuple so each group is a single
    * multi-file scan (keeps Spark's file → task packing, vectorized reader,
    * and parquet pushdown intact); groups are unioned. Partition values
    * become literal columns — constant-folded by Catalyst, so a filter on
    * them prunes whole branches of the union at optimization time.
    */
  final def read(spark: SparkSession, selected: Seq[SizedFile]): DataFrame = {
    if (selected.isEmpty) {
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], fullSchema)
    }
    val groups = selected.groupBy(_.partitionValues).toSeq.sortBy(_._1.mkString("/"))
    val dfs = groups.map { case (partVals, fs) =>
      val base = spark.read.schema(schema).parquet(fs.map(_.key): _*)
      partitionColumns.zip(partVals).foldLeft(base) { case (df, (p, v)) =>
        df.withColumn(p, lit(v))
      }
    }
    dfs.reduce(_.unionAll(_))
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
    val files: Seq[SizedFile])
  extends SplittableCatalog {
  require(
    files.forall(_.partitionValues.length == partitionColumns.length),
    "every file must carry one value per partition column")
}

object StaticCatalog {
  /** Catalog over local parquet files, inferring schema from the first file. */
  def overLocalFiles(
      spark: SparkSession,
      name: String,
      paths: Seq[String],
      partitionColumns: Seq[String] = Nil,
      partitionValues: Map[String, Seq[String]] = Map.empty): StaticCatalog = {
    // tolerate TIMESTAMP(NANOS) columns (surfaced as long epoch-nanos);
    // Spark's reader rejects them outright otherwise
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(paths.head).schema
    val files = paths.map { p =>
      val len = new java.io.File(p).length()
      SizedFile(p, len, partitionValues.getOrElse(p, Nil))
    }
    new StaticCatalog(name, schema, partitionColumns, files)
  }
}
