package graft.plans

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.model.{BuzzException, BuzzQuery}
import graft.sources.{CatalogResolver, SchemaVerifier, SplittableCatalog}

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

  /** Catalog resolution happens per query: constructor-injected catalogs
    * (the reference's compiled-in set) are joined by catalogs resolved from
    * the query's own `catalogs` array (Static uri → parquet catalog,
    * DeltaLake uri → delta-log catalog — fuse_service.rs:40-59); a query
    * catalog wins on name collision, like re-registration would. */
  def plan(spark: SparkSession, query: BuzzQuery): DistributedPlan = {
    val resolved = catalogs ++ CatalogResolver.resolve(spark, query.catalogs)
    new QueryPlanner(resolved).plan(spark, query)
  }

  /** Validate + build the final DataFrame (lazy; no job runs until an
    * action). Uses [[QueryPlanner.validateAndPrune]] rather than the full
    * [[plan]]: the statements are analyzed ONCE, against the real source,
    * instead of first against empty relations — halving the per-query
    * analysis work the two-stage-overhead gate pays on every cold rep.
    * Analysis failures still surface as [[BuzzException.PlanError]] before
    * any job runs (`spark.sql` analyzes eagerly; see `analyzed`).
    *
    * The catalog and map-output temp views exist only while the statements
    * are analyzed: `spark.sql` resolves views eagerly, so the returned
    * DataFrame keeps its resolved plan after the views are dropped, and any
    * SAME-NAMED session view a user had registered (e.g. via
    * `Tables.registerAll`) is restored — running a query must not mutate
    * session catalog state. Concurrent `run` calls in one session that share
    * a catalog or step name would still race between register and drop;
    * use distinct step names (or sessions) for concurrent queries. */
  def run(spark: SparkSession, query: BuzzQuery): DataFrame =
    buildDf(spark, validateAndPrune(spark, query))

  private def validateAndPrune(spark: SparkSession, query: BuzzQuery): PrunedPlan = {
    val resolved = catalogs ++ CatalogResolver.resolve(spark, query.catalogs)
    new QueryPlanner(resolved).validateAndPrune(spark, query)
  }

  /** `spark.sql` with analysis failures translated to the planner's error
    * type — the run path's analysis happens here (against the real
    * source), so bad SQL must fault identically to [[plan]]'s eager
    * empty-relation analysis. Runtime failures are untouched (they occur
    * at action time, after this returns). */
  private def analyzed(spark: SparkSession, sql: String): DataFrame =
    try spark.sql(sql)
    catch {
      case e: BuzzException.BuzzError => throw e
      case e: Exception =>
        throw new BuzzException.PlanError(s"analysis of '$sql' failed: ${e.getMessage}")
    }

  /** Analyze `sql` with its single relation reference BOUND DIRECTLY to
    * `df`'s analyzed plan (a SubqueryAlias substituted for the
    * UnresolvedRelation before analysis) — the hot run path. The session
    * catalog is never touched: no temp-view create/drop/restore churn
    * (measured ~30-40 ms of the cold two-stage rep's fixed cost), no
    * same-named-view races between concurrent runs, and the
    * view-restoration contract holds trivially. Statements containing a
    * CTE fall back to the caller's view path: a WITH clause can shadow
    * the bound name, and Spark's own scoping — inner scope wins — must
    * decide that, not this substitution.
    *
    * Resolution of the bound name follows the session's case-sensitivity
    * rule, matching [[QueryPlanner.validateAndPrune]]'s `resolves` (the
    * statement already passed soleSource, so the bound name is its only
    * relation). Analysis failures map to PlanError like [[analyzed]]. */
  private def analyzedAgainst(
      spark: SparkSession, sql: String, name: String, df: DataFrame): Option[DataFrame] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
    import org.apache.spark.sql.catalyst.plans.logical.{SubqueryAlias, UnresolvedWith}
    val parsed =
      try spark.sessionState.sqlParser.parsePlan(sql)
      catch {
        case e: Exception =>
          throw new BuzzException.PlanError(s"cannot parse '$sql': ${e.getMessage}")
      }
    val hasCte = parsed.collectFirst { case w: UnresolvedWith => w }.isDefined
    if (hasCte) None
    else {
      def resolves(a: String, b: String): Boolean =
        if (spark.sessionState.conf.caseSensitiveAnalysis) a == b else a.equalsIgnoreCase(b)
      val bound = parsed.transformUp {
        case r: UnresolvedRelation
            if resolves(r.multipartIdentifier.mkString("."), name) =>
          SubqueryAlias(name, df.queryExecution.analyzed)
      }
      try Some(org.apache.spark.sql.graft.PlanBridge.ofRows(spark, bound))
      catch {
        case e: BuzzException.BuzzError => throw e
        case e: Exception =>
          throw new BuzzException.PlanError(s"analysis of '$sql' failed: ${e.getMessage}")
      }
    }
  }

  private def buildDf(spark: SparkSession, p: PrunedPlan): DataFrame = {
    // strict pre-flight schema verification for the self-describing
    // formats: parquet checks physical type + repetition (the reference's
    // exact contract), ORC checks presence + category (its footer carries
    // no repetition). csv/json read under a DECLARED schema where Spark
    // itself surfaces mismatches (and csv validates header names).
    if (verifySchemas && p.catalog.format == "parquet")
      // footers store PHYSICAL names — verify against those (identity
      // unless the table carries column-mapping renames)
      SchemaVerifier.verify(
        p.files.map(_.key),
        graft.sources.ColumnMapping.toPhysical(p.catalog.schema),
        spark.sessionState.newHadoopConf(),
        missingNullableOk = p.catalog.missingNullableOk)
    else if (verifySchemas && p.catalog.format == "orc")
      SchemaVerifier.verifyOrc(
        p.files.map(_.key), p.catalog.schema, spark.sessionState.newHadoopConf(),
        missingNullableOk = p.catalog.missingNullableOk)
    val source = p.catalog.read(spark, p.files)
    // hot path: bind each statement's sole relation to its input plan
    // directly (no session-catalog mutation — see analyzedAgainst); a
    // statement carrying a CTE takes the temp-view fallback below so WITH
    // scoping behaves exactly as spark.sql would resolve it
    val direct = analyzedAgainst(spark, p.mapStep.sql, p.catalog.name, source)
      .flatMap(mapDf => analyzedAgainst(spark, p.reduceStep.sql, p.mapStep.name, mapDf))
    direct.getOrElse {
      val names = Seq(p.catalog.name, p.mapStep.name).distinct
      val sessionCatalog = spark.sessionState.catalog
      val prior = names.map(n => n -> sessionCatalog.getRawTempView(n))
      try {
        source.createOrReplaceTempView(p.catalog.name)
        val mapDf = analyzed(spark, p.mapStep.sql)
        mapDf.createOrReplaceTempView(p.mapStep.name)
        analyzed(spark, p.reduceStep.sql)
      } finally {
        names.foreach(spark.catalog.dropTempView)
        prior.foreach { case (n, v) =>
          v.foreach(raw => sessionCatalog.createTempView(n, raw, overrideIfExists = true))
        }
      }
    }
  }

  def runJson(spark: SparkSession, json: String): DataFrame =
    run(spark, BuzzQuery.fromJson(json))

  /** DRY-RUN plan introspection: validate and plan the query WITHOUT
    * executing it, and report what execution would do — catalog identity,
    * format, file counts at each pruning stage (partition filter, then
    * zone-map footer pruning), bytes to read, and both derived output
    * schemas as DDL. This is the "what will this query touch" answer an
    * operator wants BEFORE committing a 100 TB scan, and it exercises the
    * exact planner path `run` uses (same validation errors surface).
    * Everything here is metadata-sized — no data file is opened except
    * zone-map footers the planner would read anyway. */
  def explainJson(spark: SparkSession, json: String): String = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val query = BuzzQuery.fromJson(json)
    val p = plan(spark, query)
    val filesTotal = p.catalog.files.size
    val afterPartition = p.catalog.prune(spark, p.mapStep.partitionFilter).size
    val obj =
      ("catalog" ->
        ("name" -> p.catalog.name) ~
        ("format" -> p.catalog.format) ~
        ("partition_columns" -> p.catalog.partitionColumns) ~
        ("schema" -> p.catalog.schema.toDDL)) ~
      ("files" ->
        ("total" -> filesTotal) ~
        ("after_partition_filter" -> afterPartition) ~
        ("after_zone_pruning" -> p.files.size) ~
        ("bytes_to_read" -> p.files.map(_.length).sum)) ~
      ("map" ->
        ("name" -> p.mapStep.name) ~
        ("sql" -> p.mapStep.sql) ~
        ("partition_filter" -> p.mapStep.partitionFilter) ~
        ("output_schema" -> p.mapOutputSchema.toDDL)) ~
      ("reduce" ->
        ("name" -> p.reduceStep.name) ~
        ("sql" -> p.reduceStep.sql) ~
        ("output_schema" -> p.reduceOutputSchema.toDDL))
    JsonMethods.compact(JsonMethods.render(obj))
  }

  /** Execute and collect with per-query metrics — parity with the
    * reference's per-worker observability (hbee_service.rs:45-52 logs
    * query_duration / downloaded_bytes / processed_bytes per worker; Spark
    * tracks the same per task, and the listener aggregates them for the
    * query's duration).
    *
    * The listener is SparkContext-wide: metrics are exact when this is the
    * only job running (the reference's hbee is likewise one process per
    * query); tasks of an unrelated concurrent job in the same context would
    * be attributed to this query. */
  def runAndCollect(spark: SparkSession, query: BuzzQuery): (Array[Row], Map[String, Long]) = {
    val listener = new QueryMetricsListener
    spark.sparkContext.addSparkListener(listener)
    try {
      val p = validateAndPrune(spark, query)
      val df = buildDf(spark, p)
      val rows =
        try df.collect()
        catch { case e: Throwable => throw attributeWorkerFailure(e, p.files.map(_.key)) }
      // the listener bus is async: wait until task-end events stop arriving
      var last = -1L
      var stableChecks = 0
      var waitedMs = 0
      while (stableChecks < 2 && waitedMs < 2000) {
        val t = listener.tasks.sum()
        if (t == last) stableChecks += 1 else { stableChecks = 0; last = t }
        Thread.sleep(50)
        waitedMs += 50
      }
      (rows, listener.summary + ("scan_time_ms" -> scanTimeMs(df.queryExecution.executedPlan)))
    } finally {
      spark.sparkContext.removeSparkListener(listener)
    }
  }

  /** Map a worker (task) failure back to the FILE that caused it — parity
    * with the reference's collector, which logs which hbee failed and why
    * (`collector.rs:39-62`: the FAIL action carries the hbee's reason up to
    * the fuse). Spark buries the file in a cause-chain message; this walks
    * the chain, matches it against the query's own planned file list, and
    * rethrows a [[BuzzException.ExecutionError]] that NAMES the file (plus
    * the root cause), with the original exception attached. Unattributable
    * failures (reduce-side OOM, network) still map to ExecutionError with
    * the root message. */
  private def attributeWorkerFailure(e: Throwable, fileKeys: Seq[String]): Throwable = {
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(16).toSeq
    val messages = chain.flatMap(t => Option(t.getMessage))
    def tokens(key: String): Seq[String] = {
      val noScheme = key.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:/*", "/")
      Seq(key, noScheme).distinct
    }
    val failing = fileKeys.find(k => tokens(k).exists(t => messages.exists(_.contains(t))))
    val root = chain.last
    val err = new BuzzException.ExecutionError(
      failing.fold("worker failed")(f => s"worker failed on file $f") +
        s": ${root.getClass.getSimpleName}: ${String.valueOf(root.getMessage).take(300)}")
    err.initCause(e)
    err
  }

  /** Total parquet-scan wall time from the executed plan's SQL metrics —
    * the IO-side observability half the reference reports per worker
    * (`range_cache.rs:62-82`: waiting_download_ms). Traverses AQE stage and
    * reused-exchange boundaries (leaf nodes to the naive `collect`). */
  private def scanTimeMs(plan: org.apache.spark.sql.execution.SparkPlan): Long = {
    import org.apache.spark.sql.execution.{FileSourceScanExec, ReusedSubqueryExec}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val own = plan match {
      case s: FileSourceScanExec =>
        s.metrics.get("scanTime").map { m =>
          if (m.metricType == "nsTiming") m.value / 1000000L else m.value
        }.getOrElse(0L)
      case _ => 0L
    }
    val children = plan match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      // Reused* nodes POINT BACK at a subtree that is also reachable from
      // its original position — descending would double-count its scans
      case _: ReusedExchangeExec    => Nil
      case _: ReusedSubqueryExec    => Nil
      case other                    => other.children
    }
    own + children.map(scanTimeMs).sum
  }
}

/** Per-query observability, parity with the reference's per-worker metrics
  * (`/root/reference/code/src/services/hbee/hbee_service.rs:45-52`:
  * query_duration, downloaded_bytes, processed_bytes). Spark already tracks
  * these per task; this listener aggregates them per query run. */
final class QueryMetricsListener extends SparkListener {
  val bytesRead = new LongAdder
  val recordsRead = new LongAdder
  val shuffleBytesWritten = new LongAdder
  val shuffleBytesRead = new LongAdder
  val shuffleFetchWaitMs = new LongAdder
  val taskTimeMs = new LongAdder
  val tasks = new LongAdder
  val failedTasks = new LongAdder

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    // per-worker failure observability (collector.rs:39-62 parity): count
    // tasks that ended in anything but Success — retried-then-succeeded
    // work still shows up here as the failed attempts it cost
    if (taskEnd.reason != org.apache.spark.Success) failedTasks.increment()
    val m = taskEnd.taskMetrics
    if (m != null) {
      bytesRead.add(m.inputMetrics.bytesRead)
      recordsRead.add(m.inputMetrics.recordsRead)
      shuffleBytesWritten.add(m.shuffleWriteMetrics.bytesWritten)
      shuffleBytesRead.add(
        m.shuffleReadMetrics.localBytesRead + m.shuffleReadMetrics.remoteBytesRead)
      // blocked-on-fetch time — the reducer-side analog of the reference's
      // waiting_download_ms (range_cache.rs:62-82): time the reduce stage
      // spent waiting on map output rather than computing
      shuffleFetchWaitMs.add(m.shuffleReadMetrics.fetchWaitTime)
      taskTimeMs.add(m.executorRunTime)
      tasks.increment()
    }
  }

  def summary: Map[String, Long] = Map(
    "downloaded_bytes" -> bytesRead.sum(),
    "processed_rows" -> recordsRead.sum(),
    "shuffle_bytes" -> shuffleBytesWritten.sum(),
    "shuffle_bytes_read" -> shuffleBytesRead.sum(),
    "shuffle_fetch_wait_ms" -> shuffleFetchWaitMs.sum(),
    "task_time_ms" -> taskTimeMs.sum(),
    "tasks" -> tasks.sum(),
    "failed_tasks" -> failedTasks.sum())
}
