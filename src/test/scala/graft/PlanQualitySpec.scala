package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: these queries must keep the properties that make
  * them scale — pushed filters, pruned columns, broadcast dimensions. A
  * regression here is a 100×-scale performance bug even if results stay
  * correct. */
class PlanQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def formatted(name: String): String = {
    val df = SparkEntry.queries(name)(spark, TestSpark.sf)
    df.queryExecution.executedPlan.toString() + "\n" +
      df.queryExecution.toString()
  }

  test("q2 filter reaches the parquet scan (PushedFilters)") {
    val plan = formatted("q2_filter_project")
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("l_returnflag"), "returnflag filter should be pushed")
  }

  test("q2 scan reads only the projected columns (ReadSchema pruning)") {
    val plan = formatted("q2_filter_project")
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!read.contains("l_shipdate"), s"unused column not pruned: $read")
    assert(!read.contains("l_tax"), s"unused column not pruned: $read")
  }

  test("q10 join broadcasts the customer dimension") {
    val plan = formatted("q10_join_agg")
    assert(plan.contains("BroadcastHashJoin"), "dimension join should broadcast")
  }

  test("q1 aggregate is split partial/final (two HashAggregates)") {
    val plan = formatted("q1_agg")
    val aggs = plan.linesIterator.count(l => l.contains("HashAggregate"))
    assert(aggs >= 2, s"expected partial+final HashAggregate, got $aggs")
  }

  test("q1 stays inside whole-stage codegen") {
    // AQE only materializes codegen'd stages once executed
    val df = SparkEntry.queries("q1_agg")(spark, TestSpark.sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    // codegen'd operators carry the "*(stageId)" prefix in tree strings
    assert(plan.contains("*(1)"), s"no codegen stage in:\n${plan.take(800)}")
  }

  test("two-stage engine query is one Spark plan with an exchange, no collect") {
    val df = SparkEntry.queries("q3_two_stage")(spark, TestSpark.sf)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("Exchange") || plan.contains("AQEShuffleRead"),
      "map/reduce boundary should be a shuffle exchange inside one plan")
  }

  test("dedup LSH bucket joins carry only ids, not shingle payloads") {
    val df = SparkEntry.queries("dedup_minhash")(spark, TestSpark.sf)
    val plan = df.queryExecution.optimizedPlan.toString()
    // the band self-join inputs must not include the shingle array column
    val joinSection = plan.linesIterator
      .dropWhile(l => !l.contains("Join"))
      .take(8).mkString("\n")
    assert(!joinSection.contains("sh#"),
      s"band join should not shuffle shingle arrays:\n$joinSection")
  }
}
