package graft.plans

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.StructType

import graft.model._
import graft.sources.{SizedFile, SplittableCatalog}

/** The validated distributed plan: which files the map stage reads, the two
  * SQL statements, and the derived map-output schema.
  * Reference: `DistributedPlan` at
  * `/root/reference/code/src/services/fuse/query_planner.rs:17-44`. Spark
  * owns zone/worker assignment, so zones collapse to a partition count. */
final case class DistributedPlan(
    catalog: SplittableCatalog,
    files: Seq[SizedFile],
    mapStep: BuzzStep,
    reduceStep: BuzzStep,
    mapOutputSchema: StructType,
    reduceOutputSchema: StructType)

/** [[DistributedPlan]] minus the derived output schemas: everything the
  * EXECUTION path needs. `run` builds the real DataFrames anyway, so
  * deriving schemas from empty relations first would analyze each
  * statement twice per query — a fixed cost the two-stage-overhead gate
  * pays on every cold rep. `mapSource` is the identifier the map SQL
  * reads (as written, pre case-normalization), kept for the plan-time
  * empty-relation analysis that [[QueryPlanner.plan]] layers on top. */
final case class PrunedPlan(
    catalog: SplittableCatalog,
    files: Seq[SizedFile],
    mapStep: BuzzStep,
    reduceStep: BuzzStep,
    mapSource: String)

/** Validates a two-step buzz query and prunes the catalog, mirroring
  * `QueryPlanner.plan` (`/root/reference/code/src/services/fuse/
  * query_planner.rs:59-177`):
  *
  *  - exactly two steps, HBee then HComb (assert at :66-71);
  *  - each statement is a linear single-table plan (>1-input plans rejected
  *    at :150-153 / services/utils.rs:12-15);
  *  - the map step must read a registered catalog (:161-165);
  *  - the reduce step must read exactly the map step's name (:103-109);
  *  - partition pruning happens before execution (catalog/mod.rs:52-99);
  *  - the map output schema is derived by analyzing the map SQL against an
  *    empty relation with the catalog schema (:79, :92-109).
  */
final class QueryPlanner(catalogs: Map[String, SplittableCatalog]) {

  /** Full validation: [[validateAndPrune]] plus eager derivation of both
    * output schemas by analyzing each statement against an empty relation
    * — analysis errors surface HERE, with no source read. The execution
    * path ([[BuzzEngine.run]]) uses [[validateAndPrune]] directly and
    * analyzes each statement once against the real source instead. */
  def plan(spark: SparkSession, query: BuzzQuery): DistributedPlan = {
    val v = validateAndPrune(spark, query)
    // Analyze the map SQL against an empty relation to derive its output
    // schema and surface analysis errors at plan time, then validate the
    // reduce SQL the same way against that schema.
    val mapSchema =
      analyzeAgainstEmpty(spark, v.mapStep.sql, v.mapSource, v.catalog.fullSchema)
    val reduceSchema =
      analyzeAgainstEmpty(spark, v.reduceStep.sql, v.mapStep.name, mapSchema)
    DistributedPlan(v.catalog, v.files, v.mapStep, v.reduceStep, mapSchema, reduceSchema)
  }

  /** Structural validation + file pruning — every plan-SHAPE error (step
    * count/kinds, zones, multi-source statements, unknown catalog, reduce
    * source mismatch, dead partition_filter) surfaces here; statement
    * ANALYSIS is the caller's (eager empty-relation analysis in [[plan]],
    * real-source analysis in the run path). */
  private[graft] def validateAndPrune(spark: SparkSession, query: BuzzQuery): PrunedPlan = {
    if (query.steps.length != 2)
      throw new BuzzException.PlanError(
        s"exactly 2 steps (HBee, HComb) required, got ${query.steps.length}")
    // the reference asserts a single zone (hcomb_manager.rs:28,51); accept
    // the field but reject silently-ignored capacities instead of "working"
    if (query.capacity.zones != 1)
      throw new BuzzException.NotImplemented(
        s"capacity.zones must be 1 (got ${query.capacity.zones}); the reference " +
          "asserts a single zone and Spark owns worker placement")
    val Seq(mapStep, reduceStep) = query.steps
    if (mapStep.stepType != BuzzStepType.HBee)
      throw new BuzzException.PlanError("step 1 must be an HBee (map) step")
    if (reduceStep.stepType != BuzzStepType.HComb)
      throw new BuzzException.PlanError("step 2 must be an HComb (reduce) step")

    // the reduce step has no catalog to prune — a partition_filter there
    // would be silently dead, so reject it like the zones check above
    if (reduceStep.partitionFilter.isDefined)
      throw new BuzzException.PlanError(
        "partition_filter is only valid on the HBee (map) step — the HComb " +
          "(reduce) step reads the map output, not a catalog")

    // identifier comparison follows the session's resolution rules
    // (spark.sql.caseSensitive=false by default) — `FROM Evt_Part` must
    // resolve a catalog registered as `evt_part`, exactly as spark.sql would
    def resolves(a: String, b: String): Boolean =
      if (spark.sessionState.conf.caseSensitiveAnalysis) a == b else a.equalsIgnoreCase(b)

    val mapSource = soleSource(spark, mapStep.sql)
    val catalog = catalogs.collectFirst { case (n, c) if resolves(n, mapSource) => c }
      .getOrElse(
        throw new BuzzException.PlanError(s"map step reads unknown table '$mapSource'"))

    val reduceSource = soleSource(spark, reduceStep.sql)
    if (!resolves(reduceSource, mapStep.name))
      throw new BuzzException.PlanError(
        s"reduce step must read the map step's output '${mapStep.name}', reads '$reduceSource'")

    // zone-map file skipping after partition pruning: a range predicate in
    // the map SQL's WHERE prunes FILES through the footer-stats manifest
    // the way partition_filter prunes directories (beyond-reference — the
    // reference's catalog is split-only; same pruning-as-metadata-query
    // idea as catalog/mod.rs:52-69, extended to column ranges). Purely an
    // optimization: the map SQL still applies the full predicate to the
    // surviving files, so a conservative manifest can never change results.
    val pruned = catalog.prune(spark, mapStep.partitionFilter)
    val files =
      if (catalog.format == "parquet" || catalog.format == "orc")
        graft.sources.ZoneMap.pruneForQuery(
          spark, catalog.schema, pruned, mapStep.sql, catalog.format)
      else pruned // csv/json carry no footer stats; nothing to prune by
    PrunedPlan(catalog, files, mapStep, reduceStep, mapSource)
  }

  /** The single base table a statement reads; rejects multi-source plans
    * (joins/unions/subquery sources — including SELF-joins, which have one
    * distinct name but two relation inputs), parity with the reference's
    * linear-plan restriction (every >1-input plan node is rejected,
    * services/utils.rs:12-15). Compares full multipart identifiers so
    * `db1.t` and `db2.t` are different sources. */
  private[graft] def soleSource(spark: SparkSession, sql: String): String = {
    val parsed: LogicalPlan =
      try spark.sessionState.sqlParser.parsePlan(sql)
      catch {
        case e: Exception => throw new BuzzException.PlanError(s"cannot parse '$sql': ${e.getMessage}")
      }
    val occurrences = relationNames(parsed)
    occurrences match {
      case Seq(one) => one
      case Seq()    => throw new BuzzException.PlanError(s"statement reads no table: $sql")
      case many     => throw new BuzzException.PlanError(
        "buzz statements are single-table (linear plans); found " +
          s"${many.length} relation reads: ${many.mkString(", ")}")
    }
  }

  /** Every relation a parsed statement reads — INCLUDING relations inside
    * expression subqueries (`WHERE x IN (SELECT ...)`), which
    * `LogicalPlan.collect` alone misses because subquery plans live inside
    * expression trees, not the plan's children. Without this, a subquery
    * smuggles a second table read past the single-table validation. */
  private def relationNames(plan: LogicalPlan): Seq[String] = {
    val direct = plan.collect {
      case r: UnresolvedRelation => r.multipartIdentifier.mkString(".")
    }
    val nested = plan.flatMap { node =>
      node.expressions.flatMap(_.collect {
        case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression => s.plan
      })
    }.flatMap(relationNames)
    direct ++ nested
  }

  private def analyzeAgainstEmpty(
      spark: SparkSession, sql: String, viewName: String, schema: StructType): StructType = {
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    withTempView(spark, viewName, empty) {
      try spark.sql(sql).schema
      catch {
        case e: BuzzException.BuzzError => throw e
        case e: Exception => throw new BuzzException.PlanError(s"analysis of '$sql' failed: ${e.getMessage}")
      }
    }
  }

  /** Register `df` under `name` for the duration of `body`, then restore
    * whatever temp view previously held that name — analysis-time planning
    * must not destroy session catalog state as a side effect (a view
    * registered via e.g. `Tables.registerAll` would otherwise silently
    * vanish after `plan()`). */
  private def withTempView[T](spark: SparkSession, name: String, df: DataFrame)(body: => T): T = {
    val sessionCatalog = spark.sessionState.catalog
    val prior = sessionCatalog.getRawTempView(name)
    df.createOrReplaceTempView(name)
    try body
    finally {
      spark.catalog.dropTempView(name)
      prior.foreach(v => sessionCatalog.createTempView(name, v, overrideIfExists = true))
    }
  }
}
