package graft.plans

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.BuzzQuery
import graft.sources.{SchemaVerifier, SplittableCatalog}

/** Executes a validated two-step buzz query.
  *
  * Reference lifecycle (`/root/reference/code/src/services/fuse/
  * fuse_service.rs:61-146`): plan → dispatch reduce stage → dispatch one
  * worker per file → workers stream pre-aggregated batches into the reducer →
  * collect. In Spark the whole thing is ONE lazily-composed query: the map
  * SQL runs against the pruned file scan, its result is registered as a temp
  * view under the map step's name, and the reduce SQL runs over that view.
  * Spark inserts the map→reduce exchange itself (a shuffle), does
  * partial/final aggregation automatically, and schedules file splits across
  * executors — which is exactly the hbee/hcomb fleet, minus the bespoke
  * transport. No collect() happens between the stages, so the exchange stays
  * pipelined and spillable at 100 TB.
  */
final class BuzzEngine(
    catalogs: Map[String, SplittableCatalog],
    verifySchemas: Boolean = false) {

  private val planner = new QueryPlanner(catalogs)

  def plan(spark: SparkSession, query: BuzzQuery): DistributedPlan =
    planner.plan(spark, query)

  /** Plan + build the final DataFrame (lazy; no job runs until an action). */
  def run(spark: SparkSession, query: BuzzQuery): DataFrame = {
    val p = plan(spark, query)
    if (verifySchemas) SchemaVerifier.verify(p.files.map(_.key), p.catalog.schema)
    val source = p.catalog.read(spark, p.files)
    source.createOrReplaceTempView(p.catalog.name)
    val mapDf = spark.sql(p.mapStep.sql)
    mapDf.createOrReplaceTempView(p.mapStep.name)
    spark.sql(p.reduceStep.sql)
  }

  def runJson(spark: SparkSession, json: String): DataFrame =
    run(spark, BuzzQuery.fromJson(json))
}

/** Per-query observability, parity with the reference's per-worker metrics
  * (`/root/reference/code/src/services/hbee/hbee_service.rs:45-52`:
  * query_duration, downloaded_bytes, processed_bytes). Spark already tracks
  * these per task; this listener aggregates them per query run. */
final class QueryMetricsListener extends SparkListener {
  val bytesRead = new LongAdder
  val recordsRead = new LongAdder
  val shuffleBytesWritten = new LongAdder
  val taskTimeMs = new LongAdder
  val tasks = new LongAdder

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      bytesRead.add(m.inputMetrics.bytesRead)
      recordsRead.add(m.inputMetrics.recordsRead)
      shuffleBytesWritten.add(m.shuffleWriteMetrics.bytesWritten)
      taskTimeMs.add(m.executorRunTime)
      tasks.increment()
    }
  }

  def summary: Map[String, Long] = Map(
    "downloaded_bytes" -> bytesRead.sum(),
    "processed_rows" -> recordsRead.sum(),
    "shuffle_bytes" -> shuffleBytesWritten.sum(),
    "task_time_ms" -> taskTimeMs.sum(),
    "tasks" -> tasks.sum())
}
