package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twins of the corpus-curation operators, for incremental
  * ingestion pipelines (`readStream` over a landing directory / log →
  * curate → `writeStream` to the training corpus). The narrow operators
  * ([[graft.operators.Curation.piiRedact]], quality scoring, language ID)
  * are stateless and run unchanged on a streaming DataFrame; the stateful
  * ones live here. */
object CorpusStream {

  /** Streaming exact dedup: emit only the first-seen document per content
    * hash. State is the set of hashes inside the watermark horizon —
    * bounded, because a document arriving later than `watermark` after its
    * duplicate is allowed through (the batch dedup pass downstream remains
    * the source of truth; this trims the stream early). The streaming
    * analogue of [[graft.operators.Dedup.exact]]. */
  def dedupExactStreaming(
      docs: DataFrame,
      textCol: String,
      tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("__h", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h") // internal dedup key — the output schema is the input's

  /** Streaming CDC classification at ingest: label each arriving row of a
    * "new snapshot" stream against a STATIC prior snapshot as `added`
    * (key unseen before) or `changed` (key present, compared columns
    * differ); unchanged rows are dropped. The streaming twin of
    * [[graft.operators.Joins.snapshotDiff]] — with the twin's inherent
    * asymmetry: `removed` is UNDECIDABLE on a stream (absence of a key is
    * only known when the snapshot closes), so deletions remain the batch
    * diff's job — documented here rather than silently half-answered.
    *
    * Per micro-batch this is stateless: the prior snapshot is projected
    * ONCE to (key, null-safe xxhash64 of compared columns — see
    * [[graft.operators.OpUtils.nullSafeContentHash]] for why a bare
    * xxhash64 collides deterministically on null-shifted rows) — the
    * id-only-exchange discipline — and each batch left-joins that static
    * side. Returns append-mode rows: all stream columns plus `status`. */
  def snapshotDiffStreaming(
      stream: DataFrame,
      priorSnapshot: DataFrame,
      keyCol: String,
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "snapshotDiffStreaming needs compare columns")
    val prior = priorSnapshot.select(
      col(keyCol),
      graft.operators.OpUtils.nullSafeContentHash(compareCols).as("__prior_h"))
    stream
      .withColumn("__new_h", graft.operators.OpUtils.nullSafeContentHash(compareCols))
      .join(prior, Seq(keyCol), "left")
      .withColumn("status",
        when(col("__prior_h").isNull, lit("added"))
          .when(col("__prior_h") =!= col("__new_h"), lit("changed")))
      .filter(col("status").isNotNull)
      .drop("__prior_h", "__new_h")
  }

  /** Streaming near-duplicate detection at ingest: flag stream documents
    * that are MinHash-near-duplicates (Jaccard ≥ `threshold` on word
    * shingles) of a STATIC reference corpus — an already-curated training
    * set, or an eval/benchmark suite for ingest-time decontamination.
    *
    * Per micro-batch this is stateless (the reference never changes), so
    * the whole check is a stream-static join pipeline Spark re-runs
    * against the persisted index each batch: stream docs shingle narrowly,
    * explode to (band, bucket) rows, equi-join the id-only index bucket
    * table ([[graft.operators.Dedup.minhashIndex]]), join each surviving
    * candidate's reference set back ONCE, verify exact Jaccard with the
    * sorted-merge kernel. A final `dropDuplicatesWithinWatermark` emits
    * each flagged doc once (state = flagged ids inside the watermark
    * horizon, bounded), with an arbitrary witnessing reference doc.
    *
    * Returns append-mode rows (idCol, tsCol, ref_id, jac). The keep-side
    * complement is an anti-join of the ingest batch against these ids in
    * the downstream compaction pass — streaming can only say "flagged",
    * because "never flagged" is undecidable until the batch closes. */
  def nearDupHitsStreaming(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      refCorpus: DataFrame,
      refIdCol: String,
      refTextCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 256,
      bands: Int = 64,
      threshold: Double = 0.8,
      watermark: String = "1 hour"): DataFrame = {
    import graft.operators.Dedup
    import graft.functions.GraftFunctions.{minhashBandKeys, sortedIntersectCount, wordShinglesExpr}
    val (refSets, refBuckets) =
      Dedup.minhashIndex(refCorpus, refIdCol, refTextCol, shingleSize, numHashes, bands)
    val exploded = docs
      .withWatermark(tsCol, watermark)
      .select(col(idCol), col(tsCol), wordShinglesExpr(col(textCol), shingleSize).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(col(idCol), col(tsCol), col("__sh"),
        posexplode(minhashBandKeys(col("__sh"), numHashes, bands)))
      .select(col(idCol), col(tsCol), col("__sh"),
        col("pos").as("band"), col("col").as("bucket"))
    exploded
      .join(refBuckets.withColumnRenamed("id", "ref_id"), Seq("band", "bucket"))
      // a true near-dup collides in ~every band by design — dedup the
      // (doc, ref) candidate BEFORE the set join, so verification runs
      // once per candidate pair, not once per colliding band (the
      // streaming analogue of the batch dropDuplicates-then-verify order);
      // state is candidate pairs inside the watermark horizon
      .select(col(idCol), col(tsCol), col("__sh"), col("ref_id"))
      .dropDuplicatesWithinWatermark(idCol, "ref_id")
      .join(refSets.select(col("id").as("ref_id"), col("sh").as("__ref_sh")), "ref_id")
      .withColumn("__sa", size(col("__sh")))
      .withColumn("__sb", size(col("__ref_sh")))
      .filter(least(col("__sa"), col("__sb")) >= lit(threshold) * greatest(col("__sa"), col("__sb")))
      .withColumn("__inter", sortedIntersectCount(col("__sh"), col("__ref_sh")))
      .withColumn("jac",
        col("__inter").cast("double") / (col("__sa") + col("__sb") - col("__inter")))
      .filter(col("jac") >= threshold)
      .select(col(idCol), col(tsCol), col("ref_id"), round(col("jac"), 6).as("jac"))
      .dropDuplicatesWithinWatermark(idCol)
  }

  /** [[nearDupHitsStreaming]] over a SAVED minhash index — the streaming
    * leg of the incremental-dedup story: the accumulated corpus lives as
    * [[graft.operators.Dedup.saveMinhashIndex]]'s parquet tables
    * (refreshed by the batch pipeline), each ingest micro-batch joins them
    * stream-static, and history is never re-shingled by either leg. The
    * index `sets` table already carries the 64-bit hashed shingle image,
    * so the stream side hashes its own shingles once (per doc, narrow)
    * and verification merges fixed-width longs. Same output contract as
    * [[nearDupHitsStreaming]]: append-mode (idCol, tsCol, ref_id, jac),
    * each flagged doc once. */
  def nearDupHitsStreamingIndexed(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      indexSets: DataFrame,
      indexBuckets: DataFrame,
      shingleSize: Int = 3,
      numHashes: Int = 256,
      bands: Int = 64,
      threshold: Double = 0.8,
      watermark: String = "1 hour"): DataFrame = {
    import graft.functions.GraftFunctions.{minhashBandKeys, sortedIntersectCount, wordShinglesExpr}
    val exploded = docs
      .withWatermark(tsCol, watermark)
      .select(col(idCol), col(tsCol), wordShinglesExpr(col(textCol), shingleSize).as("__sh"))
      .filter(size(col("__sh")) > 0)
      .select(col(idCol), col(tsCol),
        // the SAME hash-image helper the index writer uses — any change to
        // the stored image changes both sides together
        graft.operators.Dedup.hashedSet(col("__sh")).as("__shl"),
        size(col("__sh")).as("__sa"),
        posexplode(minhashBandKeys(col("__sh"), numHashes, bands)))
      .select(col(idCol), col(tsCol), col("__shl"), col("__sa"),
        col("pos").as("band"), col("col").as("bucket"))
    exploded
      .join(indexBuckets.withColumnRenamed("id", "ref_id"), Seq("band", "bucket"))
      .select(col(idCol), col(tsCol), col("__shl"), col("__sa"), col("ref_id"))
      .dropDuplicatesWithinWatermark(idCol, "ref_id")
      .join(indexSets.select(
        col("id").as("ref_id"), col("shl").as("__ref_shl"), col("s").as("__sb")), "ref_id")
      .filter(least(col("__sa"), col("__sb")) >= lit(threshold) * greatest(col("__sa"), col("__sb")))
      .withColumn("__inter", sortedIntersectCount(col("__shl"), col("__ref_shl")))
      .withColumn("jac",
        col("__inter").cast("double") / (col("__sa") + col("__sb") - col("__inter")))
      .filter(col("jac") >= threshold)
      .select(col(idCol), col(tsCol), col("ref_id"), round(col("jac"), 6).as("jac"))
      .dropDuplicatesWithinWatermark(idCol)
  }

  /** Streaming ANN radius hits of a query-vector stream against a SAVED
    * IVF index ([[graft.operators.Similarity.saveIvfIndex]] dir): each
    * arriving vector probes its `nProbe` nearest buckets and emits every
    * indexed neighbor with cosine ≥ `threshold` — the online twin of
    * [[graft.operators.Similarity.rangeSearch]], for embedding-space
    * contamination/near-dup alerts on an ingest stream.
    *
    * Shape: centroids load ONCE at stream definition (driver-sized, the
    * same footprint the batch path holds); per micro-batch the work is a
    * stateless stream–static equi-join on the bucket key against the
    * partitioned index — probed buckets prune the static side's file scan,
    * and no state store is involved (append mode, trivially watermarked).
    * Emits (idCol, tsCol, neighbor_id, sim). */
  def annHitsStreamingIndexed(
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      tsCol: String,
      indexDir: String,
      threshold: Double,
      nProbe: Int = 0,
      watermark: String = "1 hour"): DataFrame = {
    import graft.functions.GraftFunctions.{cosineSim, nearestCentroids}
    val spark = queries.sparkSession
    val (cents, nlist, bucketed) =
      graft.operators.Similarity.loadIvfIndex(spark, indexDir)
    val probe = math.max(1, if (nProbe <= 0)
      graft.operators.Similarity.ivfProbeCount(nlist) else math.min(nProbe, nlist))
    queries
      .withWatermark(tsCol, watermark)
      .select(col(idCol), col(tsCol), col(vecCol).as("__qv"),
        explode(nearestCentroids(col(vecCol), cents, probe)).as("bucket"))
      .join(bucketed, Seq("bucket"))
      .filter(col("neighbor_id") =!= col(idCol))
      .withColumn("sim", cosineSim(col("cv"), col("__qv")))
      .filter(col("sim") >= threshold)
      .select(col(idCol), col(tsCol), col("neighbor_id"), round(col("sim"), 6).as("sim"))
  }

  /** End-to-end incremental curation: streaming dedup + the stateless
    * curation passes, composed exactly as the batch pipeline but runnable
    * under `readStream`/`writeStream`:
    *   1. first-seen-only per content hash (bounded state via watermark),
    *   2. PII redaction (narrow regexp pass; the OUTPUT text is the
    *      redacted text),
    *   3. composite quality score ≥ `minQuality`,
    *   4. language filter (keep `keepLangs`, empty set = keep all).
    * Emits (id, ts, lang_pred, quality, text) append-mode rows — the shape
    * a `writeStream.format("parquet").partitionBy(...)` training-corpus
    * sink wants. Decontamination stays batch-side: its eval-set join is a
    * broadcast of STATIC data and belongs in the downstream batch pass, not
    * in per-microbatch state. */
  /** Streaming Delta producer: every micro-batch lands as ONE transactional
    * [[graft.operators.Sinks.deltaAppend]] commit — the continuous-ingest
    * end of the Delta loop (deltaAppend grows it, OPTIMIZE compacts it,
    * the DeltaCatalog and plain Spark read it, each micro-batch is a
    * time-travel point). foreachBatch + the append's staged-then-rename
    * commit gives per-batch atomicity: a crashed batch leaves invisible
    * orphan parquet, and on restart Structured Streaming replays the batch
    * from the checkpoint — and the append stamps every commit with the
    * protocol's `txn` action (appId, batchId), so a batch replayed AFTER
    * its commit landed is recognized by its watermark and SKIPPED:
    * exactly-once end to end, the same SetTransaction handshake upstream
    * Delta writers use. `appId` defaults to a per-table sink identity;
    * set it explicitly when several independent streams feed one table.
    *
    * Returns the started query; caller owns its lifecycle. */
  def deltaSinkStreaming(
      stream: org.apache.spark.sql.DataFrame,
      tablePath: String,
      checkpointDir: String,
      partitionCols: Seq[String] = Nil,
      appId: String = ""): org.apache.spark.sql.streaming.StreamingQuery = {
    val app = if (appId.nonEmpty) appId else s"graft-stream:$tablePath"
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // skip empty micro-batches: a zero-row commit would still bump the
        // Delta version and pollute time travel with no-op snapshots
        if (!batch.isEmpty)
          graft.operators.Sinks.deltaAppend(
            batch, tablePath, partitionCols, Some((app, batchId)))
        ()
      }
      .start()
  }

  def curateStreaming(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      minQuality: Double = 0.5,
      keepLangs: Set[String] = Set.empty,
      watermark: String = "1 hour"): DataFrame = {
    import graft.operators.Curation
    import graft.functions.GraftFunctions
    import GraftFunctions.langId

    // langId resolves through the SQL function registry — register the
    // kernels so the pipeline works on a plain session (no extensions conf,
    // no prior registerAll call)
    GraftFunctions.registerAll(docs.sparkSession)
    val deduped = dedupExactStreaming(docs, textCol, tsCol, watermark)
    // stateless, narrow passes compose directly on the streaming frame.
    // Quality and language are computed on the RAW text — the same input the
    // batch path (TextAnalysis.qualityScore over the source text) scores —
    // and the formula is the shared TextAnalysis.qualityScoreCol, so batch
    // and streaming keep/drop identically. Redaction only rewrites the
    // OUTPUT text; scoring redacted text would shift word-length stats for
    // any PII-bearing doc and diverge from batch.
    val scored = deduped
      .withColumn("n_words", size(split(col(textCol), " ")))
      .withColumn("avg_word_len",
        round(
          length(regexp_replace(col(textCol), " ", "")).cast("double") /
            col("n_words"), 6))
      .withColumn("quality",
        graft.operators.TextAnalysis.qualityScoreCol(col("n_words"), col("avg_word_len")))
      .withColumn("lang_pred", langId(col(textCol)))
      .withColumn("text_clean",
        regexp_replace(col(textCol), Curation.PiiPattern, "<PII>"))
    val kept =
      if (keepLangs.isEmpty) scored
      else scored.filter(col("lang_pred").isin(keepLangs.toSeq: _*))
    kept
      .filter(col("quality") >= minQuality)
      .select(
        col(idCol), col(tsCol), col("lang_pred"), col("quality"),
        col("text_clean").as(textCol))
  }
}
