package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write paths for pipeline outputs. The reference engine has NO sink —
  * results are pretty-printed to stdout (`/root/reference/code/src/services/
  * fuse/fuse_service.rs:132-135`) — but a training-data pipeline's product
  * is files, so the library goes beyond parity here: Hive-partitioned
  * parquet, the layout every downstream reader (Spark, DuckDB, trainers'
  * dataloaders) natively prunes. */
object Sinks {

  /** Write `df` as Hive-partitioned parquet (`partitionCol=value/` dirs)
    * and return a per-partition manifest (partition value, row count)
    * computed by READING BACK the written files — the manifest makes the
    * sink verifiable end-to-end, not fire-and-forget.
    *
    * Scale notes: `partitionBy` shuffles nothing by itself (each task
    * writes its rows into per-value files), so skew shows up as many small
    * files per hot partition — callers with heavy skew should
    * `repartition(partitionCol)` first to get one file per value per
    * shuffle partition. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): DataFrame = {
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
    df.sparkSession.read.parquet(path)
      .groupBy(col(partitionCol))
      .agg(count(lit(1)).as("n"))
  }

  /** Write `df` as a BUCKETED parquet table (external, at `path`): rows are
    * hash-distributed into `numBuckets` files per partition by `bucketCol`,
    * and the layout is recorded in the session catalog. Joins and
    * aggregations between tables bucketed the same way on the same key run
    * WITHOUT an exchange — at the 100 TB scale, pre-bucketing the big fact
    * tables once converts every subsequent key-join from a full shuffle
    * into a zip of co-located buckets (asserted in PlanQualitySpec).
    * Returns the re-read table. */
  def writeBucketed(
      df: DataFrame, table: String, path: String,
      bucketCol: String, numBuckets: Int): DataFrame = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)
    spark.table(table)
  }
}
