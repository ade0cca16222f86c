package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Shared plan-shaping helpers for the pipeline operators. */
private[operators] object OpUtils {

  /** Spread a too-narrow input across the cluster before CPU-heavy
    * per-document work. A small corpus arrives as one or two file splits
    * (one task), which would serialize the per-row computation; at real
    * scale the scan already has thousands of splits and this is a no-op.
    *
    * Parallelism is ESTIMATED from analyzed-plan statistics (leaf
    * sizeInBytes over the file-split size): materializing `df.rdd` for
    * `getNumPartitions` would physically plan every operator input a second
    * time, once here and once when the operator's own plan executes. */
  def widen(df: DataFrame): DataFrame = {
    val session = df.sparkSession
    val target = session.sparkContext.defaultParallelism
    val bytesPerSplit = BigInt(session.sessionState.conf.filesMaxPartitionBytes)
    val sizes = df.queryExecution.analyzed.collectLeaves().map(_.stats.sizeInBytes)
    // a leaf with no computed statistics reports the defaultSizeInBytes
    // sentinel (Long.MaxValue by default) — treating that as "huge" would
    // silently skip the repartition exactly where it matters (e.g. a
    // LogicalRDD with 1-2 partitions), so fall back to measuring the real
    // partition count for unknown-size inputs
    val unknown = BigInt(session.sessionState.conf.defaultSizeInBytes)
    if (sizes.exists(_ >= unknown)) {
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    } else {
      val estSplits = sizes.map(s => (s / bytesPerSplit + 1).min(Int.MaxValue)).sum
      if (estSplits < target) df.repartition(target) else df
    }
  }

  private val persisted = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[DataFrame, java.lang.Boolean]())

  /** Persist a relation that the downstream plan references several times
    * (multiple join sides / aggregation branches): one materialization
    * instead of recomputing the upstream per branch. MEMORY_AND_DISK spills
    * instead of recomputing at 100 TB.
    *
    * Skips the persist when an equal plan is already cached
    * (`df.storageLevel` resolves through the cache manager's plan-equality
    * lookup) — re-persisting logs a CacheManager warning per call and does
    * nothing. Frames persisted here are released by
    * [[PipelineCache.clear]]. */
  def shared(df: DataFrame): DataFrame =
    if (df.storageLevel != StorageLevel.NONE) df
    else {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      persisted.add(p)
      p
    }

  /** Register an externally-persisted frame for [[PipelineCache.clear]]
    * release — for operators that manage persist lifetimes themselves
    * (e.g. the CC round loop) but whose FINAL frame outlives the call and
    * must not leak past the pipeline scope. */
  private[operators] def track(df: DataFrame): Unit = persisted.add(df)

  private[operators] def unpersistAll(): Unit = {
    persisted.forEach(df => df.unpersist(blocking = false))
    persisted.clear()
  }
}

/** Lifecycle scope for the intermediate relations the pipeline operators
  * persist (signature sets, LSH pair lists). A long-lived session otherwise
  * accumulates MEMORY_AND_DISK relations until eviction; call `clear()`
  * between pipeline runs to release them without touching caches the
  * application registered itself (unlike `spark.catalog.clearCache()`). */
object PipelineCache {
  def clear(): Unit = {
    OpUtils.unpersistAll()
    Similarity.clearIndexCache()
  }
}
