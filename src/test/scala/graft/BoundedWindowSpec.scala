package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.scalatest.funsuite.AnyFunSuite

/** Proof that the documented "bounded relation" unpartitioned windows are
  * actually bounded: several operators deliberately run a global
  * `Window.orderBy` over a RELATION WHOSE CARDINALITY IS A CONTRACT —
  * pid-offset tables (≤ #partitions rows), day-span survival curves,
  * k-limited rank lists. Spark logs `WindowExec: No Partition Defined` for
  * every one of them, indistinguishable in a log scan from a real
  * corpus-sized funnel. This spec EXECUTES each query and reads, from the
  * executed plan, the records actually written into every unpartitioned
  * window's shuffle — asserting the bound instead of assuming it. A
  * regression that grows one of these relations to corpus size fails here
  * before it becomes a 100 TB single-task funnel. */
class BoundedWindowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Child traversal across adaptive/reuse wrappers (the scanTimeMs walk). */
  private def kids(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: QueryStageExec        => Seq(q.plan)
    case _: ReusedExchangeExec    => Nil
    case other                    => other.children
  }

  private def collectPlans(p: SparkPlan): Seq[SparkPlan] =
    p +: kids(p).flatMap(collectPlans)

  /** Records written into the nearest shuffle BELOW `p` — the rows that
    * actually flow through a window running above that exchange. */
  private def shuffleRecordsBelow(p: SparkPlan): Option[Long] = p match {
    case e: ShuffleExchangeExec =>
      e.metrics.collectFirst {
        case (k, m) if k.toLowerCase.contains("records") => m.value
      }
    case other => kids(other).flatMap(shuffleRecordsBelow).headOption
  }

  /** Execute `name` and return the shuffle-record counts feeding each
    * unpartitioned window in its executed plan. */
  private def unpartitionedWindowInputs(name: String): Seq[Long] = {
    val df = SparkEntry.queries(name)(spark, TestSpark.sf)
    df.count() // materialize so shuffle metrics are populated
    val windows = collectPlans(df.queryExecution.executedPlan).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    windows.flatMap(w => shuffleRecordsBelow(w.child))
  }

  private val parallelism = TestSpark.spark.sparkContext.defaultParallelism

  // (query, bound, why) — the bound IS the documented contract
  private val contracts = Seq(
    ("curate_shuffle", parallelism.toLong, "pid-offset table: one row per range partition"),
    ("curate_token_budget", parallelism.toLong, "pid-offset table: one row per range partition"),
    ("curate_rank_normalize", parallelism.toLong, "pid-offset table over the value-count frame"),
    ("profile_ks", 2L * parallelism, "two pid-offset branches, one row per partition each"),
    ("profile_gini", 2L * parallelism, "pid-offset + pid-cum branches, one row per partition"),
    ("events_survival", 4000L, "per-lifetime-day curve: bounded by the fixture's day span"),
    ("ann_rrf_hybrid", 50L, "rank list already LIMITed to k=50 before the window"))

  contracts.foreach { case (name, bound, why) =>
    test(s"$name: unpartitioned window inputs stay within $bound rows ($why)") {
      val inputs = unpartitionedWindowInputs(name)
      assert(inputs.nonEmpty,
        s"$name no longer contains an unpartitioned window — remove it from this spec")
      inputs.foreach { n =>
        assert(n <= bound,
          s"$name: an unpartitioned window consumed $n rows (> $bound) — " +
            "the bounded-relation contract is broken and this IS a single-task funnel")
      }
      graft.operators.PipelineCache.clear()
    }
  }
}
