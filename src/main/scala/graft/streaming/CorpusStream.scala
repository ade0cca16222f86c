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
      .withColumn("h", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("h")
}
