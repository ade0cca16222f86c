package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps (data skipping): a per-file (rows, min, max,
  * null_count) manifest for one column, read from parquet FOOTERS — no data
  * pages touched — and a conservative pruner that drops every file whose
  * value range provably cannot satisfy a BETWEEN predicate. This is the
  * Delta/Iceberg file-stats skipping primitive, layered over the same
  * split-only catalog model the reference uses (`catalog/mod.rs` keeps only
  * paths + partition values; zone maps extend that metadata with column
  * ranges, so range predicates prune FILES the way partition filters prune
  * directories).
  *
  * 100 TB shape: the manifest build distributes footer reads across the
  * cluster (one task per file batch — a 10⁶-file lake reads 10⁶ footers in
  * parallel, ~KB each, never a data page); the manifest itself is
  * files-sized, the same cardinality the catalog already carries. Pruning
  * collects only the surviving path strings (manifest-bounded driver
  * traffic). Missing or unreadable stats KEEP the file — skipping is an
  * optimization and must never be a correctness bet. */
object ZoneMap {

  /** Distributed footer-stats manifest for `column` over `paths`: one row
    * per file — (file, rows, min, max, null_count), min/max as doubles
    * (exact for integer values < 2⁵³; a file whose chunk statistics are
    * absent yields NULL min/max and is never pruned; null_count is NULL
    * when any chunk leaves its null count unset). Supports INT32 /
    * INT64 / FLOAT / DOUBLE physical chunks — the numeric-range predicates
    * zone maps serve. */
  def fileStats(spark: SparkSession, paths: Seq[String], column: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    // Hadoop Configuration is not serializable — ship its entries and
    // rebuild on the executor (defaults + session overlay)
    val confProps = spark.sessionState.newHadoopConf().asScala
      .map(e => e.getKey -> e.getValue).toMap
    val parallelism = math.min(paths.size, spark.sparkContext.defaultParallelism).max(1)
    val rows = spark.sparkContext
      .parallelize(paths, parallelism)
      .map { p =>
        val conf = new org.apache.hadoop.conf.Configuration(true)
        confProps.foreach { case (k, v) => conf.set(k, v) }
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(p), conf))
        val footer = try reader.getFooter finally reader.close()
        var rows = 0L; var nulls = 0L
        // parquet-mr Statistics.getNumNulls returns -1 when unset —
        // accumulating that would drive the manifest's null_count negative,
        // so an unset chunk makes the FILE's null_count unknown (NULL)
        var nullsKnown = true
        var mn = Option.empty[Double]; var mx = Option.empty[Double]
        var statsComplete = true
        footer.getBlocks.asScala.foreach { block =>
          rows += block.getRowCount
          block.getColumns.asScala
            .filter(_.getPath.toDotString == column)
            .foreach { chunk =>
              val st = chunk.getStatistics
              if (st == null || st.isEmpty) statsComplete = false
              else {
                if (st.isNumNullsSet) nulls += st.getNumNulls
                else nullsKnown = false
                if (st.hasNonNullValue) {
                  def num(v: AnyRef): Double = v match {
                    case i: java.lang.Integer => i.toDouble
                    case l: java.lang.Long    => l.toDouble
                    case f: java.lang.Float   => f.toDouble
                    case d: java.lang.Double  => d
                    case _ => statsComplete = false; Double.NaN
                  }
                  val lo = num(st.genericGetMin.asInstanceOf[AnyRef])
                  val hi = num(st.genericGetMax.asInstanceOf[AnyRef])
                  if (!lo.isNaN && !hi.isNaN) {
                    mn = Some(mn.fold(lo)(math.min(_, lo)))
                    mx = Some(mx.fold(hi)(math.max(_, hi)))
                  }
                } // an all-null chunk contributes no range but stays complete
              }
            }
        }
        val (fmn, fmx) =
          if (statsComplete) (mn, mx) else (None, None) // conservative: unknown range
        (p, rows, fmn, fmx, if (nullsKnown) Some(nulls) else None)
      }
    spark.createDataFrame(rows)
      .toDF("file", "rows", "min", "max", "null_count")
  }

  /** Paths whose zone CAN satisfy `column BETWEEN lo AND hi`: a file is
    * skipped only when its stats prove max < lo or min > hi; NULL stats
    * (absent/unsupported footers) keep the file. Collects the manifest's
    * surviving path column — files-sized by construction. */
  def prunePaths(stats: DataFrame, lo: Double, hi: Double): Seq[String] =
    stats
      .filter(col("min").isNull || col("max").isNull ||
        !(col("max") < lit(lo) || col("min") > lit(hi)))
      .select(col("file"))
      .collect().map(_.getString(0)).toSeq
}
