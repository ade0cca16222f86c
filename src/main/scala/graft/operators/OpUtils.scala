package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Shared plan-shaping helpers for the pipeline operators. */
private[graft] object OpUtils {

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

  /** 64-bit content signature over `cols` that cannot collide on
    * null-shifted rows. Spark's hash functions SKIP null inputs (a null
    * argument leaves the running seed untouched), so a bare
    * `xxhash64(cols)` hashes ("a", NULL) and (NULL, "a") identically —
    * a deterministic collision class, not the random 2⁻⁶⁴ one.
    * Interleaving an `isnull` flag after every value pins each column's
    * position in the fold: any value/null shift changes the flag sequence
    * and therefore the hash. */
  def nullSafeContentHash(cols: Seq[String]): Column =
    xxhash64(cols.flatMap(c => Seq(col(c), isnull(col(c)).cast("int"))): _*)

  /** Distributed PER-GROUP rank under `orderCols` — the grouped analog of
    * Curation's hash-order prefix sum, for when
    * `row_number().over(Window.partitionBy(group).orderBy(...))` would
    * funnel each group's FULL membership through one task (a handful of
    * languages over a web corpus = a handful of tasks doing everything).
    *
    * Shape: range-repartition on (group, orderCols) gives a total order
    * across partitions WITHIN each group (a group's rows in partition p all
    * precede its rows in p+1); ranks are then per-(partition, group)
    * row_numbers plus the group's start offset in that partition, from a
    * (#partitions × #groups)-row broadcast table. Parallelism is
    * #partitions × #groups instead of #groups. The ranged frame must be
    * MATERIALIZED ONCE: the offset branch and the rank branch both read it,
    * and a re-executed range exchange may sample different boundaries —
    * the two branches would then disagree on pid assignment and silently
    * corrupt ranks. When the session has BOTH a checkpoint directory
    * (`sc.setCheckpointDir`) and checkpoint GC enabled
    * (`spark.cleaner.referenceTracking.cleanCheckpoints=true`), the frame
    * is reliably checkpointed, which survives executor loss; checkpointing
    * without the cleaner flag would leak one full copy of the frame to the
    * checkpoint FS per call (Spark never deletes them), so in that case —
    * and with no checkpoint dir — the frame is persisted MEMORY_AND_DISK
    * instead, which freezes pids for the normal case but NOT across a
    * mid-job executor loss that forces a lineage recompute.
    * Resilience-critical deployments should set both knobs.
    *
    * `orderCols` MUST be a total order within each group (end with a
    * unique id column): the range partitioner may split order-ties across
    * partition boundaries, and tied rows would then take arbitrary —
    * though still valid — rank assignments run to run. */
  def groupedRank(
      df: DataFrame, groupCol: String, orderCols: Seq[Column], rankCol: String): DataFrame = {
    Seq(rankCol, "__gr_pid", "__gr_n", "__gr_r", "__gr_off").foreach(c =>
      require(!df.columns.contains(c), s"groupedRank reserves the '$c' column; rename it first"))
    val parts = df.sparkSession.sparkContext.defaultParallelism
    val rangedRaw = df
      .repartitionByRange(parts, (col(groupCol) +: orderCols): _*)
      .withColumn("__gr_pid", spark_partition_id())
    // reliable checkpoint when available AND garbage-collected (see
    // docstring — without cleanCheckpoints every call leaks a frame copy to
    // the checkpoint FS); the persist fallback freezes pid assignment only
    // as long as no lineage recompute occurs. The downgrade is LOUD: a
    // deployment that set a checkpoint dir expecting resilience must know
    // it isn't getting it until the cleaner flag is also set.
    val sc = df.sparkSession.sparkContext
    val cleanerOn =
      sc.getConf.getBoolean("spark.cleaner.referenceTracking.cleanCheckpoints", false)
    val ranged =
      if (sc.getCheckpointDir.isDefined && cleanerOn) rangedRaw.checkpoint()
      else {
        if (sc.getCheckpointDir.isDefined && checkpointDowngradeWarned.compareAndSet(false, true))
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            "groupedRank: checkpoint dir is set but " +
              "spark.cleaner.referenceTracking.cleanCheckpoints is false — falling back to " +
              "persist (no executor-loss resilience); enable the cleaner flag to checkpoint " +
              "without leaking checkpoint files")
        sharedPinned(rangedRaw)
      }
    val offsets = ranged.groupBy(col("__gr_pid"), col(groupCol))
      .agg(count(lit(1)).as("__gr_n"))
      .withColumn("__gr_off",
        coalesce(sum(col("__gr_n")).over(
          Window.partitionBy(col(groupCol)).orderBy(col("__gr_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__gr_pid"), col(groupCol), col("__gr_off"))
    // null-SAFE group equality on the offsets join: a NULL group is a group
    // (groupBy and Window.partitionBy both rank it) — plain equality would
    // silently drop every null-group row here
    val off = offsets
      .withColumnRenamed("__gr_pid", "__gr_pid2")
      .withColumnRenamed(groupCol, "__gr_g2")
    ranged
      .withColumn("__gr_r", row_number().over(
        Window.partitionBy(col("__gr_pid"), col(groupCol)).orderBy(orderCols: _*)))
      .join(broadcast(off),
        col("__gr_pid") === col("__gr_pid2") && col(groupCol) <=> col("__gr_g2"))
      .withColumn(rankCol, (col("__gr_r") + col("__gr_off")).cast("long"))
      .drop("__gr_pid", "__gr_pid2", "__gr_g2", "__gr_r", "__gr_off")
  }

  private val checkpointDowngradeWarned = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Insertion-ordered registry of operator-persisted frames, bounded by
    * [[maxTracked]]: a long-lived session running many pipelines would
    * otherwise accumulate MEMORY_AND_DISK relations without limit and push
    * every later query into storage-memory pressure (measured: queries
    * running 4–10× their isolated time late in a 137-query session). When
    * the cap is exceeded the OLDEST tracked frame is unpersisted — its
    * pipeline has almost always completed; if one is still running, the
    * evicted frame recomputes from lineage (slower, never wrong). */
  private val persisted =
    new java.util.LinkedHashMap[DataFrame, java.lang.Boolean]()

  /** Eviction cap, settable via `spark.graft.pipelineCache.maxRelations`
    * (read lazily off the evicting frame's session). Sized for "a few
    * concurrent pipelines": the heaviest operator persists ~4 frames. */
  private def maxTracked(df: DataFrame): Int =
    try df.sparkSession.conf.get("spark.graft.pipelineCache.maxRelations", "32").toInt
    catch { case _: NumberFormatException => 32 }

  private def trackBounded(p: DataFrame): Unit = {
    val evict = persisted.synchronized {
      persisted.put(p, java.lang.Boolean.TRUE)
      val cap = maxTracked(p)
      val out = scala.collection.mutable.ArrayBuffer[DataFrame]()
      val it = persisted.entrySet().iterator()
      while (persisted.size() - out.size > cap && it.hasNext) {
        val e = it.next()
        if (e.getKey ne p) out += e.getKey
      }
      out.foreach(persisted.remove)
      out
    }
    evict.foreach(_.unpersist(blocking = false))
  }

  /** Persist a relation that the downstream plan references several times
    * (multiple join sides / aggregation branches): one materialization
    * instead of recomputing the upstream per branch. MEMORY_AND_DISK spills
    * instead of recomputing at 100 TB.
    *
    * Skips the persist when an equal plan is already cached
    * (`df.storageLevel` resolves through the cache manager's plan-equality
    * lookup) — re-persisting logs a CacheManager warning per call and does
    * nothing. Frames persisted here are released by
    * [[PipelineCache.clear]] or LRU-evicted past the registry cap. */
  def shared(df: DataFrame): DataFrame =
    if (df.storageLevel != StorageLevel.NONE) df
    else {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      trackBounded(p)
      p
    }

  /** [[shared]] minus LRU eviction, for frames whose RECOMPUTE would be a
    * correctness bug, not a slowdown — e.g. [[groupedRank]]'s
    * range-partitioned frame, where a re-executed range exchange may sample
    * different partition boundaries and silently corrupt ranks. Pinned
    * frames are only released by [[PipelineCache.clear]]. */
  private[operators] def sharedPinned(df: DataFrame): DataFrame =
    if (df.storageLevel != StorageLevel.NONE) df
    else {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK)
      pinned.synchronized { pinned.add(p) }
      p
    }

  private val pinned = new java.util.HashSet[DataFrame]()

  /** Materialize one round of an ITERATIVE operator and TRUNCATE its
    * logical plan (eager `localCheckpoint` → the round becomes a
    * LogicalRDD leaf). Chained rounds that merely `persist` keep nesting
    * the full prior plan in 2-3 branches per round — persisted data
    * short-circuits EXECUTION but not ANALYSIS, so Catalyst re-walks an
    * exponentially growing tree (3^rounds copies of the base plan for a
    * round shaped like `cur ⋈ f(cur) ⋈ f(cur)`) and planning, not the
    * data, OOMs the driver. This is the GraphX-Pregel checkpoint
    * discipline applied to DataFrame rounds.
    *
    * Local (not reliable) checkpoint: executor loss mid-job forces a
    * recompute-from-source failure rather than silent corruption — the
    * [[groupedRank]] caveat, acceptable for bounded-round analytics jobs;
    * use `sc.setCheckpointDir` + `Dataset.checkpoint` where rounds must
    * survive preemption. Round RDDs are freed by the ContextCleaner once
    * the next round drops the last reference. */
  private[operators] def roundCheckpoint(df: DataFrame): DataFrame =
    df.localCheckpoint(eager = true)

  /** Register an externally-persisted frame for [[PipelineCache.clear]]
    * release — for operators that manage persist lifetimes themselves
    * (e.g. the CC round loop) but whose FINAL frame outlives the call and
    * must not leak past the pipeline scope. */
  private[operators] def track(df: DataFrame): Unit = trackBounded(df)

  private[operators] def unpersistAll(): Unit = {
    val all = persisted.synchronized {
      val keys = new java.util.ArrayList(persisted.keySet())
      persisted.clear()
      keys
    }
    all.forEach(df => df.unpersist(blocking = false))
    val pins = pinned.synchronized {
      val keys = new java.util.ArrayList(pinned)
      pinned.clear()
      keys
    }
    pins.forEach(df => df.unpersist(blocking = false))
  }
}

/** Probe hook for the scale harness (which lives outside this package):
  * ranks `df`'s rows per its 2nd column ordered by (3rd column desc, 1st
  * column) with the distributed [[OpUtils.groupedRank]] assembly and
  * returns the maximum rank (= the largest group's cardinality when the
  * assembly is correct). */
object OpProbe {
  def groupedRankMax(df: DataFrame): Long = {
    val Array(idC, grpC, ordC) = df.columns
    OpUtils.groupedRank(df, grpC, Seq(col(ordC).desc, col(idC)), "__probe_rank")
      .agg(max(col("__probe_rank"))).collect()(0).getLong(0)
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
