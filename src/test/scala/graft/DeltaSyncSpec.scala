package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.BuzzException
import graft.operators.Sinks
import graft.sources.DeltaCatalog

/** Incremental table-to-table sync: the Delta streaming-source contract as
  * an idempotent batch call — full snapshot first, then only new commits'
  * files, exactly-once via the SetTransaction watermark. */
class DeltaSyncSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def rows(dir: String): Map[Long, Long] = {
    val cat = DeltaCatalog.fromDeltaLog(spark, dir, "sync_read")
    cat.read(spark, cat.files).select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("snapshot first, then increments; replay is exactly-once") {
    val src = tmpDir("sync_src")
    val dst = tmpDir("sync_dst")
    Sinks.deltaAppend((0L until 10L).map(i => (i, i * 2)).toDF("id", "v"), src)
    Sinks.deltaAppend((10L until 20L).map(i => (i, i * 2)).toDF("id", "v"), src)
    Sinks.deltaSync(spark, src, dst, "tail1")
    assert(rows(dst).keySet === (0L until 20L).toSet)
    // nothing new: the sync is a no-op at the current dst version
    val vNoop = Sinks.deltaSync(spark, src, dst, "tail1")
    assert(Sinks.deltaSync(spark, src, dst, "tail1") === vNoop)
    assert(rows(dst).keySet === (0L until 20L).toSet)
    // incremental: only the new commit's files ship
    Sinks.deltaAppend((20L until 25L).map(i => (i, i * 2)).toDF("id", "v"), src)
    Sinks.deltaSync(spark, src, dst, "tail1")
    assert(rows(dst).keySet === (0L until 25L).toSet)
    // replaying the SAME increment (crash-retry) lands nothing twice
    Sinks.deltaSync(spark, src, dst, "tail1")
    assert(rows(dst).size === 25)
    // a second consumer has its own watermark
    val dst2 = tmpDir("sync_dst2")
    Sinks.deltaSync(spark, src, dst2, "tail2")
    assert(rows(dst2).size === 25)
  }

  test("dataChange=false commits (OPTIMIZE) are skipped, never duplicated") {
    val src = tmpDir("sync_opt_src")
    val dst = tmpDir("sync_opt_dst")
    Sinks.deltaAppend((0L until 10L).map(i => (i, i)).toDF("id", "v").coalesce(4), src)
    Sinks.deltaSync(spark, src, dst, "tail")
    Sinks.deltaOptimize(spark, src, targetBytes = 1L << 30) // bytes moved, no facts
    Sinks.deltaAppend(Seq((100L, 1L)).toDF("id", "v"), src)
    Sinks.deltaSync(spark, src, dst, "tail")
    assert(rows(dst).keySet === (0L until 10L).toSet + 100L)
  }

  test("a fact-retracting source commit fails loudly") {
    val src = tmpDir("sync_dml_src")
    val dst = tmpDir("sync_dml_dst")
    Sinks.deltaAppend((0L until 10L).map(i => (i, i)).toDF("id", "v").coalesce(1), src)
    Sinks.deltaSync(spark, src, dst, "tail")
    Sinks.deltaDeleteWhere(spark, src, "id = 3")
    val e = intercept[BuzzException.BadRequest] {
      Sinks.deltaSync(spark, src, dst, "tail")
    }
    assert(e.getMessage.contains("retracts"))
    // the FIRST sync of an already-DML'd table is fine: snapshot semantics
    val dst3 = tmpDir("sync_dml_dst3")
    Sinks.deltaSync(spark, src, dst3, "fresh")
    assert(rows(dst3).keySet === (0L until 10L).toSet - 3L)
  }

  test("initial sync applies deletion vectors; a later DV commit fails loudly") {
    val src = tmpDir("sync_dv_src")
    Sinks.deltaAppend((0L until 10L).map(i => (i, i)).toDF("id", "v").coalesce(1), src)
    Sinks.deltaDeleteVectors(spark, src, "id BETWEEN 3 AND 5")
    val dst = tmpDir("sync_dv_dst")
    Sinks.deltaSync(spark, src, dst, "tail")
    assert(rows(dst).keySet === (0L until 10L).toSet -- Set(3L, 4L, 5L))
    Sinks.deltaDeleteVectors(spark, src, "id = 7")
    intercept[BuzzException.BadRequest] { Sinks.deltaSync(spark, src, dst, "tail") }
  }

  test("partitioned sources sync partitioned; mid-span evolution lands additively") {
    val src = tmpDir("sync_part_src")
    val dst = tmpDir("sync_part_dst")
    Sinks.deltaAppend(
      (0L until 10L).map(i => (i, i, if (i < 5) "a" else "b")).toDF("id", "v", "g"),
      src, Seq("g"))
    Sinks.deltaSync(spark, src, dst, "tail")
    val dstCat = DeltaCatalog.fromDeltaLog(spark, dst, "sp")
    assert(dstCat.partitionColumns === Seq("g"))
    // source evolves: a new nullable column appears mid-stream
    Sinks.deltaAppend(
      Seq((100L, 1L, 9L, "a")).toDF("id", "v", "w", "g"), src, Seq("g"),
      mergeSchema = true)
    Sinks.deltaSync(spark, src, dst, "tail")
    val out = DeltaCatalog.fromDeltaLog(spark, dst, "sp2")
    val got = out.read(spark, out.files)
    assert(got.count() === 11L)
    assert(got.filter(col("id") === 100L).head.getAs[Long]("w") === 9L)
    assert(got.filter(col("id") === 0L).isEmpty === false)
  }
}
