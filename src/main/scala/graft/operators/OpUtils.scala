package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Shared plan-shaping helpers for the pipeline operators. */
private[operators] object OpUtils {

  /** Spread a too-narrow input across the cluster before CPU-heavy
    * per-document work. A small corpus arrives as one or two file splits
    * (one task), which would serialize the per-row computation; at real
    * scale the scan already has thousands of splits and this is a no-op. */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Persist a relation that the downstream plan references several times
    * (multiple join sides / aggregation branches): one materialization
    * instead of recomputing the upstream per branch. MEMORY_AND_DISK spills
    * instead of recomputing at 100 TB. */
  def shared(df: DataFrame): DataFrame =
    df.persist(StorageLevel.MEMORY_AND_DISK)
}
