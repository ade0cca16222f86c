package graft

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.plans.BuzzEngine
import graft.sources.StaticCatalog
import graft.streaming.StreamingTwoStage

/** The pipelined-reduce liveness twin must emit a refined result per
  * micro-batch and converge to the batch engine's answer — the behavioral
  * analog of the reference's hcomb consuming worker streams as they arrive
  * (hcomb_service.rs:69-86). */
class StreamingTwoStageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def twoStage = BuzzQuery(
    steps = Seq(
      BuzzStep(
        "SELECT n_regionkey, count(*) AS cnt, sum(n_nationkey) AS snk " +
          "FROM nation_src GROUP BY n_regionkey",
        "nation_map", BuzzStepType.HBee, None),
      BuzzStep(
        "SELECT n_regionkey, sum(cnt) AS n, sum(snk) AS sum_nk " +
          "FROM nation_map GROUP BY n_regionkey",
        "r", BuzzStepType.HComb, None)),
    capacity = BuzzCapacity(1),
    catalogs = Nil)

  test("streaming two-stage emits per-batch results and converges to the batch answer") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream2s").toString
    Tables.load(spark, TestSpark.sf, "nation")
      .repartition(3).write.mode("overwrite").parquet(dir)

    val cat = StaticCatalog.overPath(spark, "nation_src", dir)
    val perBatch = ArrayBuffer[(Long, Map[String, (Long, Long)])]()
    val q = StreamingTwoStage.run(
      spark, Map("nation_src" -> cat), twoStage,
      (result, batchId) => {
        val rows = result.collect()
          .map(r => r.get(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
        perBatch.synchronized { perBatch += batchId -> rows }
      })
    q.awaitTermination(120000)

    // one file per trigger over a 3-file directory → 2+ incremental results
    assert(perBatch.length >= 2, s"expected 2+ micro-batches, got ${perBatch.length}")
    // liveness: the FIRST result arrives before the full map stage is done
    // (strictly fewer rows counted than the final converged answer)
    val firstTotal = perBatch.head._2.values.map(_._1).sum
    val lastTotal = perBatch.last._2.values.map(_._1).sum
    assert(firstTotal < lastTotal,
      s"first batch should be partial: first=$firstTotal last=$lastTotal")

    // convergence: the final per-batch result equals the batch engine's
    val expected = new BuzzEngine(Map("nation_src" -> cat)).run(spark, twoStage)
      .collect().map(r => r.get(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(perBatch.last._2 == expected)
  }

  test("streaming twin rejects partition filters and multi-directory catalogs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream2s_rej").toString
    Tables.load(spark, TestSpark.sf, "nation")
      .repartition(1).write.mode("overwrite").parquet(dir)
    val cat = StaticCatalog.overPath(spark, "nation_src", dir)
    val filtered = twoStage.copy(steps =
      twoStage.steps.head.copy(partitionFilter = Some("length >= 0")) +: twoStage.steps.tail)
    intercept[BuzzException.NotImplemented] {
      StreamingTwoStage.run(spark, Map("nation_src" -> cat), filtered, (_, _) => ())
    }
  }

  test("streaming twin rejects a catalog covering only part of the source directory") {
    // the directory source would consume EVERY file under the parent; a
    // subset catalog must be rejected instead of silently widening its input
    val dir = java.nio.file.Files.createTempDirectory("graft_stream2s_sub").toString
    Tables.load(spark, TestSpark.sf, "nation")
      .repartition(2).write.mode("overwrite").parquet(dir)
    val all = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
    assert(all.length == 2)
    val subset = StaticCatalog.overLocalFiles(spark, "nation_src", Seq(all.head))
    intercept[BuzzException.NotImplemented] {
      StreamingTwoStage.run(spark, Map("nation_src" -> subset), twoStage, (_, _) => ())
    }
  }
}
