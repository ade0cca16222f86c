package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.BuzzException
import graft.operators.Sinks
import graft.sources.DeltaCatalog

/** CDC apply ([[Sinks.deltaApplyChanges]]) and log-based replication
  * ([[Sinks.deltaReplicate]]): feed-dialect netting, the delete leg,
  * SetTransaction idempotence, candidate-file pruning, CDF re-capture on
  * the replica, and src→dst convergence across row-level DML. */
class DeltaCdcApplySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def liveMap(dir: String): Map[Long, Long] = {
    val cat = DeltaCatalog.fromDeltaLog(spark, dir, "apply_read")
    cat.read(spark, cat.files).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** ids 0-9 (v0, one file) and 10-19 (v1, one file). */
  private def twoFileTable(dir: String): Unit = {
    Sinks.deltaAppend((0L until 10L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1), dir)
    Sinks.deltaAppend((10L until 20L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1), dir)
  }

  test("apply: upserts replace/insert, deletes drop, absent-key delete no-ops") {
    val dir = tmpDir("apply_basic")
    twoFileTable(dir)
    val changes = Seq(
      (5L, 500L, "update_postimage"),
      (5L, 10L, "update_preimage"), // informational — dropped by netting
      (100L, 1L, "insert"),
      (7L, 0L, "delete"),
      (999L, 0L, "delete")          // absent key: no-op, not an error
    ).toDF("id", "v", "_change_type")
    Sinks.deltaApplyChanges(spark, dir, changes, "id")
    val live = liveMap(dir)
    assert(live(5L) === 500L)
    assert(live(100L) === 1L)
    assert(!live.contains(7L))
    assert(live.size === 20) // 20 - 1 delete + 1 insert
  }

  test("apply nets by _commit_version: the LAST change per key wins") {
    val dir = tmpDir("apply_net")
    twoFileTable(dir)
    val changes = Seq(
      // id 3: updated at v5 then DELETED at v7 — nets to the delete
      (3L, 300L, "update_postimage", 5L),
      (3L, 0L, "delete", 7L),
      // id 4: deleted at v5 then RE-INSERTED at v7 — nets to the insert
      (4L, 0L, "delete", 5L),
      (4L, 444L, "insert", 7L),
      // id 6: two updates — the later one wins
      (6L, 60L, "update_postimage", 5L),
      (6L, 600L, "update_postimage", 7L)
    ).toDF("id", "v", "_change_type", "_commit_version")
    Sinks.deltaApplyChanges(spark, dir, changes, "id")
    val live = liveMap(dir)
    assert(!live.contains(3L))
    assert(live(4L) === 444L)
    assert(live(6L) === 600L)
    assert(live.size === 19)
  }

  test("apply rejects duplicate net keys, null keys, and unknown change types") {
    val dir = tmpDir("apply_dup")
    twoFileTable(dir)
    val dup = Seq((5L, 1L, "insert"), (5L, 2L, "insert"))
      .toDF("id", "v", "_change_type")
    val e1 = intercept[BuzzException.BadRequest](
      Sinks.deltaApplyChanges(spark, dir, dup, "id"))
    assert(e1.getMessage.contains("duplicate"))
    val nul = Seq((Option.empty[Long], 1L, "insert"))
      .toDF("id", "v", "_change_type")
    val e2 = intercept[BuzzException.BadRequest](
      Sinks.deltaApplyChanges(spark, dir, nul, "id"))
    assert(e2.getMessage.contains("NULL"))
    val bad = Seq((5L, 1L, "upsert")).toDF("id", "v", "_change_type")
    val e3 = intercept[BuzzException.BadRequest](
      Sinks.deltaApplyChanges(spark, dir, bad, "id"))
    assert(e3.getMessage.contains("unknown _change_type"))
    // a NULL type or NULL version would be silently DROPPED by the
    // netting (null never equals anything) — both must fail loudly
    val nulType = Seq((5L, 1L, Option.empty[String]))
      .toDF("id", "v", "_change_type")
    val e4 = intercept[BuzzException.BadRequest](
      Sinks.deltaApplyChanges(spark, dir, nulType, "id"))
    assert(e4.getMessage.contains("unknown _change_type"))
    val nulVer = Seq((5L, 1L, "insert", Option.empty[Long]))
      .toDF("id", "v", "_change_type", "_commit_version")
    val e5 = intercept[BuzzException.BadRequest](
      Sinks.deltaApplyChanges(spark, dir, nulVer, "id"))
    assert(e5.getMessage.contains("NULL _commit_version"))
  }

  test("apply is exactly-once under the SetTransaction handshake") {
    val dir = tmpDir("apply_txn")
    twoFileTable(dir)
    val changes = Seq((5L, 500L, "update_postimage")).toDF("id", "v", "_change_type")
    val v1 = Sinks.deltaApplyChanges(spark, dir, changes, "id",
      txn = Some(("app1", 10L)))
    // replayed batch: same (appId, version) — skipped, version unchanged
    val v2 = Sinks.deltaApplyChanges(spark, dir,
      Seq((5L, 999L, "update_postimage")).toDF("id", "v", "_change_type"),
      "id", txn = Some(("app1", 10L)))
    assert(v2 === v1)
    assert(liveMap(dir)(5L) === 500L)
  }

  test("apply prunes: a 2-key change set rewrites only the files that can hold them") {
    val dir = tmpDir("apply_prune")
    // four single-file commits with disjoint id ranges
    (0 until 4).foreach(i =>
      Sinks.deltaAppend(
        (i * 10L until (i + 1) * 10L).map(j => (j, j)).toDF("id", "v").coalesce(1), dir))
    val head = Sinks.deltaApplyChanges(spark, dir,
      Seq((5L, 500L, "update_postimage"), (35L, 0L, "delete"))
        .toDF("id", "v", "_change_type"), "id")
    // the APPLY commit must remove exactly the two candidate files
    val removed = graft.sources.FsUtil
      .readString(spark, f"$dir/_delta_log/$head%020d.json")
      .linesIterator.count(_.contains("\"remove\""))
    assert(removed === 2, s"expected 2 rewritten files, got $removed")
    val live = liveMap(dir)
    assert(live(5L) === 500L && !live.contains(35L) && live.size === 39)
  }

  test("apply re-captures CDF on a feed-enabled table (deletes ship the base row)") {
    val dir = tmpDir("apply_cdf")
    twoFileTable(dir)
    Sinks.deltaSetProperties(spark, dir,
      Map("delta.enableChangeDataFeed" -> "true")) // v2
    val v = Sinks.deltaApplyChanges(spark, dir, Seq(
      (5L, 500L, "update_postimage"),
      (100L, 1L, "insert"),
      (7L, 0L, "delete")).toDF("id", "v", "_change_type"), "id") // v3
    val rows = Sinks.deltaChangeFeed(spark, dir, v - 1, v)
      .select(col("_change_type"), col("id"), col("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(rows === Seq(
      ("delete", 7L, 14L),
      ("insert", 100L, 1L),
      ("update_postimage", 5L, 500L),
      ("update_preimage", 5L, 10L)))
  }

  test("replicate: bootstrap, incremental DML convergence, caught-up no-op") {
    val src = tmpDir("repl_src")
    val dst = tmpDir("repl_dst") + "/replica"
    twoFileTable(src)
    Sinks.deltaSetProperties(spark, src,
      Map("delta.enableChangeDataFeed" -> "true"))
    // bootstrap ships the snapshot
    Sinks.deltaReplicate(spark, src, dst, "id")
    assert(liveMap(dst) === liveMap(src))
    // row-level DML on src: update + insert (MERGE), then a delete
    Sinks.deltaMerge(spark, src,
      Seq((5L, 500L), (100L, 1L)).toDF("id", "v"), "id")
    Sinks.deltaDeleteWhere(spark, src, "id = 8")
    Sinks.deltaReplicate(spark, src, dst, "id")
    val srcLive = liveMap(src)
    assert(liveMap(dst) === srcLive)
    assert(srcLive(5L) === 500L && srcLive(100L) === 1L && !srcLive.contains(8L))
    // caught up: a third call commits nothing
    val before = DeltaCatalog.latestVersion(spark, s"$dst/_delta_log")
    assert(Sinks.deltaReplicate(spark, src, dst, "id") === before)
    assert(DeltaCatalog.latestVersion(spark, s"$dst/_delta_log") === before)
  }

  test("replicate a PARTITIONED source, partition-moving update included") {
    val src = tmpDir("repl_part_src")
    val dst = tmpDir("repl_part_dst") + "/replica"
    Sinks.deltaAppend(
      Seq((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "a")).toDF("id", "v", "p"),
      src, Seq("p"))
    Sinks.deltaSetProperties(spark, src,
      Map("delta.enableChangeDataFeed" -> "true"))
    Sinks.deltaReplicate(spark, src, dst, "id")
    // id=1 MOVES partition a -> b (value update too); id=2 deleted
    Sinks.deltaMerge(spark, src, Seq((1L, 11L, "b")).toDF("id", "v", "p"), "id")
    Sinks.deltaDeleteWhere(spark, src, "id = 2")
    Sinks.deltaReplicate(spark, src, dst, "id")
    def rows(dir: String): Set[(Long, Long, String)] = {
      val cat = DeltaCatalog.fromDeltaLog(spark, dir, "repl_part_read")
      cat.read(spark, cat.files).select(col("id"), col("v"), col("p"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    }
    val s = rows(src)
    assert(rows(dst) === s)
    assert(s === Set((1L, 11L, "b"), (3L, 30L, "a")))
  }

  test("a zero-change span advances the watermark with a txn-only commit") {
    val src = tmpDir("repl_wm_src")
    val dst = tmpDir("repl_wm_dst") + "/replica"
    twoFileTable(src) // v0, v1
    Sinks.deltaReplicate(spark, src, dst, "id") // bootstrap @ src v1
    Sinks.deltaOptimize(spark, src, targetBytes = 1L << 30) // src v2, no facts
    val appId = s"graft-replicate:$src"
    Sinks.deltaReplicate(spark, src, dst, "id")
    // the span (1,2] nets to nothing: no data commit, but the watermark
    // MUST land (txn-only) or every later call re-reads the span
    assert(DeltaCatalog.lastTxnVersion(spark, dst, appId) === Some(2L))
    assert(liveMap(dst).size === 20)
    // caught up: a third call commits nothing further
    val before = DeltaCatalog.latestVersion(spark, s"$dst/_delta_log")
    assert(Sinks.deltaReplicate(spark, src, dst, "id") === before)
    assert(DeltaCatalog.latestVersion(spark, s"$dst/_delta_log") === before)
  }

  test("replicate falls back to keyed resync across a RESTORE on src") {
    val src = tmpDir("repl_restore_src")
    val dst = tmpDir("repl_restore_dst") + "/replica"
    twoFileTable(src) // v0, v1
    Sinks.deltaSetProperties(spark, src,
      Map("delta.enableChangeDataFeed" -> "true")) // v2
    Sinks.deltaReplicate(spark, src, dst, "id")
    Sinks.deltaMerge(spark, src, Seq((5L, 500L)).toDF("id", "v"), "id") // v3
    val preMerge = 2L
    Sinks.deltaRestore(spark, src, preMerge) // v4: rewrite WITHOUT cdc
    Sinks.deltaMerge(spark, src, Seq((6L, 600L)).toDF("id", "v"), "id") // v5
    // the span (2, 5] contains the restore — feed not expressible, the
    // keyed snapshot diff must converge the replica anyway
    Sinks.deltaReplicate(spark, src, dst, "id")
    val s = liveMap(src)
    assert(liveMap(dst) === s)
    assert(s(5L) === 10L, "restore rolled the first merge back")
    assert(s(6L) === 600L)
    // and the watermark advanced: a follow-up call is a no-op
    val before = DeltaCatalog.latestVersion(spark, s"$dst/_delta_log")
    assert(Sinks.deltaReplicate(spark, src, dst, "id") === before)
  }

  test("replicate of a NEVER-CDF source resyncs instead of failing") {
    val src = tmpDir("repl_nocdf_src")
    val dst = tmpDir("repl_nocdf_dst") + "/replica"
    twoFileTable(src)
    Sinks.deltaReplicate(spark, src, dst, "id")
    // row-level DML with no CDF: the span's feed is not recorded
    Sinks.deltaMerge(spark, src, Seq((5L, 500L), (100L, 1L)).toDF("id", "v"), "id")
    Sinks.deltaReplicate(spark, src, dst, "id")
    assert(liveMap(dst) === liveMap(src))
    assert(liveMap(dst)(5L) === 500L)
  }

  test("deltaResync repairs a replica someone wrote to directly") {
    val src = tmpDir("resync_src")
    val dst = tmpDir("resync_dst") + "/replica"
    twoFileTable(src)
    Sinks.deltaResync(spark, src, dst, "id") // bootstrap leg
    assert(liveMap(dst) === liveMap(src))
    // drift: a foreign row lands on the replica, a real row vanishes
    Sinks.deltaAppend(Seq((999L, 9L)).toDF("id", "v"), dst)
    Sinks.deltaDeleteWhere(spark, dst, "id = 3")
    val v = Sinks.deltaResync(spark, src, dst, "id")
    assert(liveMap(dst) === liveMap(src))
    // minimal apply: the repair commit nets exactly 2 changes (the
    // foreign row deleted, id=3 re-inserted) — candidate-file bounded
    val removed = graft.sources.FsUtil
      .readString(spark, f"$dst/_delta_log/$v%020d.json")
      .linesIterator.count(_.contains("\"remove\""))
    assert(removed <= 2, s"resync rewrote $removed files for a 2-row drift")
  }

  test("replicate survives an OPTIMIZE on src (ships nothing) and refuses a foreign dst") {
    val src = tmpDir("repl_opt_src")
    val dst = tmpDir("repl_opt_dst") + "/replica"
    twoFileTable(src)
    Sinks.deltaReplicate(spark, src, dst, "id")
    Sinks.deltaOptimize(spark, src, targetBytes = 1L << 30)
    Sinks.deltaAppend(Seq((20L, 40L)).toDF("id", "v"), src)
    Sinks.deltaReplicate(spark, src, dst, "id")
    assert(liveMap(dst) === liveMap(src))
    assert(liveMap(dst).size === 21)
    // a table that is NOT this source's replica must be refused
    val foreign = tmpDir("repl_foreign")
    Sinks.deltaAppend(Seq((1L, 1L)).toDF("id", "v"), foreign)
    val e = intercept[BuzzException.BadRequest](
      Sinks.deltaReplicate(spark, src, foreign, "id"))
    assert(e.getMessage.contains("watermark"))
  }
}
