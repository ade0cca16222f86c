package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.BuzzException
import graft.operators.Sinks
import graft.sources.DeltaCatalog

/** SHALLOW CLONE: a new Delta table whose v0 references the source's live
  * files by absolute path — zero data copied; every subsequent write to
  * the clone is copy-on-write into the clone's own directory. */
class DeltaCloneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def rows(dir: String): Map[Long, Long] = {
    val cat = DeltaCatalog.fromDeltaLog(spark, dir, "clone_read")
    cat.read(spark, cat.files).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def localParquetCount(dir: String): Long =
    Files.walk(Paths.get(dir)).filter(_.toString.endsWith(".parquet"))
      .filter(!_.toString.contains("_delta_log")).count()

  test("clone copies ZERO data files and reads identically") {
    val src = tmpDir("clone_src")
    Sinks.deltaAppend((0L until 10L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1), src)
    Sinks.deltaAppend((100L until 110L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1), src)
    val dst = tmpDir("clone_dst")
    assert(Sinks.deltaCloneShallow(spark, src, dst) === 0L)
    assert(localParquetCount(dst) === 0L, "shallow clone must not copy data")
    assert(rows(dst) === rows(src))
    // fresh identity, same schema
    assert(DeltaCatalog.tableId(spark, dst) !== DeltaCatalog.tableId(spark, src))
    // cloning ONTO an existing table is a client error
    intercept[BuzzException.BadRequest] { Sinks.deltaCloneShallow(spark, src, dst) }
    intercept[BuzzException.BadRequest] {
      Sinks.deltaCloneShallow(spark, tmpDir("clone_empty"), tmpDir("clone_dst2"))
    }
  }

  test("writes to the clone are copy-on-write into the CLONE; the source is untouched") {
    val src = tmpDir("clone_cow_src")
    Sinks.deltaAppend((0L until 10L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1), src)
    val srcFiles: Seq[String] = {
      import scala.jdk.CollectionConverters._
      Files.walk(Paths.get(src)).iterator().asScala
        .map(_.toString).filter(_.endsWith(".parquet")).toSeq
    }
    val dst = tmpDir("clone_cow_dst")
    Sinks.deltaCloneShallow(spark, src, dst)
    // row-level DML on the clone rewrites into the clone's directory
    Sinks.deltaDeleteWhere(spark, dst, "id BETWEEN 3 AND 5")
    Sinks.deltaAppend(Seq((500L, 1L)).toDF("id", "v").coalesce(1), dst)
    assert(rows(dst).keySet === ((0L to 2L) ++ (6L to 9L)).toSet + 500L)
    // source answers exactly as before, its physical files untouched
    assert(rows(src).keySet === (0L until 10L).toSet)
    srcFiles.foreach(f => assert(Files.exists(Paths.get(f.stripPrefix("file:")))))
    // the clone's own vacuum never deletes source bytes
    Sinks.deltaVacuum(spark, dst)
    assert(rows(src).keySet === (0L until 10L).toSet)
  }

  test("clone carries deletion vectors and stats forward") {
    val src = tmpDir("clone_dv_src")
    Sinks.deltaAppend((0L until 10L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1), src)
    Sinks.deltaAppend((100L until 110L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1), src)
    Sinks.deltaDeleteVectors(spark, src, "id BETWEEN 3 AND 5")
    val dst = tmpDir("clone_dv_dst")
    Sinks.deltaCloneShallow(spark, src, dst)
    assert(rows(dst).keySet === ((0L to 2L) ++ (6L to 9L) ++ (100L to 109L)).toSet)
    assert(DeltaCatalog.fromDeltaLog(spark, dst, "cdv").deletionVectors.size === 1)
    // carried stats keep MERGE file pruning alive on the clone: updating
    // one low key must not rewrite the (cloned) high file reference
    val preHigh = DeltaCatalog.fromDeltaLog(spark, dst, "cdv_pre").files
      .map(_.key).filter(_.nonEmpty).find(k =>
        spark.read.parquet(k).agg(min(col("id"))).head.getLong(0) === 100L).get
    Sinks.deltaMerge(spark, dst, Seq((1L, 999L)).toDF("id", "v"), "id")
    val post = DeltaCatalog.fromDeltaLog(spark, dst, "cdv_post").files.map(_.key).toSet
    assert(post.contains(preHigh))
    val got = rows(dst)
    assert(got(1L) === 999L && !got.contains(4L) && got(100L) === 200L)
  }

  test("clone of a PARTITIONED table keeps partition values") {
    val src = tmpDir("clone_part_src")
    Sinks.deltaAppend(
      (0L until 20L).map(i => (i, i * 2, if (i < 10) "a" else "b"))
        .toDF("id", "v", "g"), src, Seq("g"))
    val dst = tmpDir("clone_part_dst")
    Sinks.deltaCloneShallow(spark, src, dst)
    val cat = DeltaCatalog.fromDeltaLog(spark, dst, "cp")
    assert(cat.partitionColumns === Seq("g"))
    val byG = cat.read(spark, cat.files).groupBy(col("g")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG === Map("a" -> 10L, "b" -> 10L))
  }
}
