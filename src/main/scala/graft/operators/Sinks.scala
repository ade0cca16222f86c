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
}
