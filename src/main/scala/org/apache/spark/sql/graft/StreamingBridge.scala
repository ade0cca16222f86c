package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** Bridge into Spark's `private[sql]` streaming-DataFrame constructor —
  * the same visibility pattern as [[ArrowBridge]]. A V1 streaming
  * `Source.getBatch` must return a Dataset whose logical plan is marked
  * `isStreaming`; Spark's own file stream source builds it with
  * `internalCreateDataFrame(rdd, schema, isStreaming = true)`, and so
  * does the Delta tail source here. The wrapped RDD is the batch plan's
  * own execution, so all of Catalyst's work on the batch plan (pushdown,
  * pruning, whole-stage codegen) is preserved — only the streaming flag
  * changes. */
object StreamingBridge {

  /** `df`'s plan re-rooted as a streaming batch DataFrame. */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** The inverse, for tests that drive a `Source` directly: a streaming
    * batch re-rooted as a plain batch DataFrame so actions run on it.
    * Unwraps the streaming `LogicalRDD` (the shape [[asStreamingBatch]]
    * builds) — planning through the streaming wrapper would trip
    * Catalyst's batch-execution check. */
  def asBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rdd = df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
      case _ => df.queryExecution.toRdd
    }
    spark.internalCreateDataFrame(rdd, df.schema, isStreaming = false)
  }
}
