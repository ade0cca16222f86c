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
    // a NULL KEY in a VERSIONED change set must also fail loudly: the
    // vmax netting join matches keys null-safely (<=>) so the row
    // SURVIVES to the key-discipline check — null-unsafe equality
    // dropped it before the check ever ran, silently discarding the
    // change instead of rejecting it
    val nulKeyVer = Seq((Option.empty[Long], 1L, "insert", 5L))
      .toDF("id", "v", "_change_type", "_commit_version")
    val e6 = intercept[BuzzException.BadRequest](
      Sinks.deltaApplyChanges(spark, dir, nulKeyVer, "id"))
    assert(e6.getMessage.contains("NULL"))
  }

  test("replicate REPORTS its work (chunks/versions/rows/files) and the commits carry the numbers") {
    val src = tmpDir("repl_report_src")
    val dst = tmpDir("repl_report_dst") + "/replica"
    twoFileTable(src)                                          // v0, v1
    Sinks.deltaSetProperties(spark, src,
      Map("delta.enableChangeDataFeed" -> "true"))             // v2
    val boot = Sinks.deltaReplicateReport(spark, src, dst, Seq("id"))
    assert(boot.bootstrapped && !boot.resynced && boot.chunks === 0L)
    Sinks.deltaMerge(spark, src, Seq((5L, 500L)).toDF("id", "v"), "id") // v3
    Sinks.deltaDeleteWhere(spark, src, "id = 12")                       // v4
    val r = Sinks.deltaReplicateReport(spark, src, dst, Seq("id"),
      maxVersionsPerApply = 1) // one watermarked chunk per lagged commit
    assert(!r.bootstrapped && !r.resynced)
    assert(r.chunks === 2L && r.versions === 2L,
      s"expected 2 chunks over 2 versions, got ${r.chunks}/${r.versions}")
    assert(r.rowsNetted === 2L, s"1 update + 1 delete net, got ${r.rowsNetted}")
    assert(r.filesRewritten === 2L && r.filesAdded >= 2L,
      s"each chunk rewrites its one candidate file, got ${r.filesRewritten}/${r.filesAdded}")
    // the numbers are DURABLE: each apply commit's operationParameters
    // carry them, so deltaHistory answers long after the call returned
    val applies = Sinks.deltaHistory(spark, dst).collect()
      .filter(_.getString(2) == "APPLY CHANGES")
      .map(_.getAs[Map[String, String]](3))
      .filter(_.contains("netChanges"))
    assert(applies.map(_("netChanges").toLong).sum === 2L)
    assert(applies.map(_("filesRewritten").toLong).sum === 2L)
    // caught up: the report says so in zeros
    val up = Sinks.deltaReplicateReport(spark, src, dst, Seq("id"))
    assert(up.chunks === 0L && up.versions === 0L && up.rowsNetted === 0L
      && !up.bootstrapped && !up.resynced)
    // the replica actually converged
    val cat = DeltaCatalog.fromDeltaLog(spark, dst, "repl_report_read")
    val rows = cat.read(spark, cat.files).collect()
      .map(rr => rr.getLong(0) -> rr.getLong(1)).toMap
    assert(rows(5L) === 500L && !rows.contains(12L) && rows.size === 19)
  }

  test("bootstrap report on the bench fixture shape: fresh replica pins the boot_ok predicate live") {
    // the benched sink_delta_replicate_report row replays a TEMPLATE
    // bootstrap (built once per testdata signature) and pins its recorded
    // boot_ok — this spec runs the SAME bootstrap sequence (append half /
    // enable CDF / append the rest) FRESH every test run and asserts the
    // exact predicate the bench row pins, so a regression in bootstrap
    // reporting fails here even while the bench template stays cached
    // (VERDICT r15 #5).
    val src = tmpDir("repl_boot_live_src")
    val dst = tmpDir("repl_boot_live_dst") + "/replica"
    Sinks.deltaAppend((0L until 10L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1), src) // v0
    Sinks.deltaSetProperties(spark, src,
      Map("delta.enableChangeDataFeed" -> "true"))                                          // v1
    Sinks.deltaAppend((10L until 20L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1), src) // v2
    val boot = Sinks.deltaReplicateReport(spark, src, dst, Seq("id"))
    assert(boot.bootstrapped && !boot.resynced && boot.chunks === 0L && boot.versions === 0L,
      s"bench boot_ok predicate must hold on a live bootstrap, got $boot")
    // the replica really carries the full source state after bootstrap
    assert(liveMap(dst) === (0L until 20L).map(i => i -> i * 2).toMap)
  }

  test("a change set missing a dst data column projects typed NULLs (the chunked-resume evolution seam)") {
    // reachable in chunked replicate: a crashed run already evolved the
    // replica, the resume's smaller chunk ends before the source's ADD
    // COLUMN commit — those rows' column did not exist at their commits,
    // so UNDER allowMissingColumns the apply writes typed nulls instead
    // of wedging on SchemaMismatch. The DEFAULT stays loud: a direct
    // caller's dropped projection must never silently null out values.
    val dir = tmpDir("apply_missing_col")
    Sinks.deltaAppend(
      Seq((5L, 10L, "keep"), (6L, 12L, "stay")).toDF("id", "v", "w").coalesce(1), dir)
    val changes = Seq((5L, 500L, "update_postimage"), (100L, 1L, "insert"))
      .toDF("id", "v", "_change_type") // no `w`
    val loud = intercept[BuzzException.SchemaMismatch](
      Sinks.deltaApplyChanges(spark, dir, changes, "id"))
    assert(loud.getMessage.contains("w") &&
      loud.getMessage.contains("allowMissingColumns"))
    Sinks.deltaApplyChanges(spark, dir, changes, Seq("id"),
      allowMissingColumns = true)
    val cat = DeltaCatalog.fromDeltaLog(spark, dir, "missing_col_read")
    val rows = cat.read(spark, cat.files).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), Option(r.getString(2))))).toMap
    assert(rows(5L) === ((500L, None)), "updated row's missing column is null")
    assert(rows(6L) === ((12L, Some("stay"))), "untouched row keeps its value")
    assert(rows(100L) === ((1L, None)), "inserted row's missing column is null")
    // a missing PARTITION column still fails loudly — rows must land somewhere
    val pdir = tmpDir("apply_missing_part")
    Sinks.deltaAppend(
      Seq((1L, 2L, "a")).toDF("id", "v", "p"), pdir, Seq("p"))
    val noPart = Seq((1L, 3L, "update_postimage")).toDF("id", "v", "_change_type")
    val e = intercept[BuzzException.SchemaMismatch](
      Sinks.deltaApplyChanges(spark, pdir, noPart, "id"))
    assert(e.getMessage.contains("partition"))
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
    val rep = Sinks.deltaReplicateReport(spark, src, dst, Seq("id"))
    // the resync leg is NOT a maxVersionsPerApply-bounded chunk: the
    // report keeps `chunks` as the feed-apply count (zero here — the
    // FIRST chunk was already inexpressible) and records the fallback in
    // `resynced`, never double-encoding it
    assert(rep.resynced && !rep.bootstrapped)
    assert(rep.chunks === 0L, s"resync leg must not count as a chunk, got ${rep.chunks}")
    assert(rep.versions === 3L, s"expected 3 source versions consumed, got ${rep.versions}")
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

  private def liveMap2(dir: String): Map[(Long, String), Long] = {
    val cat = DeltaCatalog.fromDeltaLog(spark, dir, "apply_read2")
    cat.read(spark, cat.files).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
  }

  test("COMPOSITE keys: apply matches on the tuple, not any single column") {
    val dir = tmpDir("apply_ck")
    // (k1, k2) is the key; k1 alone is heavily duplicated
    Sinks.deltaAppend(
      (0L until 10L).flatMap(i => Seq((i, "a", i * 2), (i, "b", i * 3)))
        .toDF("k1", "k2", "v").coalesce(1), dir)
    val changes = Seq(
      (5L, "a", 500L, "update_postimage"), // touches ONLY (5,a), not (5,b)
      (5L, "b", 10L, "update_preimage"),   // informational
      (7L, "b", 0L, "delete"),             // (7,a) must survive
      (100L, "a", 1L, "insert"),
      // two changes sharing k1 — distinct tuples, NOT a duplicate key
      (3L, "a", 30L, "update_postimage"),
      (3L, "b", 31L, "update_postimage")
    ).toDF("k1", "k2", "v", "_change_type")
    Sinks.deltaApplyChanges(spark, dir, changes, Seq("k1", "k2"))
    val live = liveMap2(dir)
    assert(live((5L, "a")) === 500L && live((5L, "b")) === 15L)
    assert(!live.contains((7L, "b")) && live((7L, "a")) === 14L)
    assert(live((100L, "a")) === 1L)
    assert(live((3L, "a")) === 30L && live((3L, "b")) === 31L)
    // a genuinely duplicated TUPLE still fails
    val dup = Seq((1L, "a", 1L, "insert"), (1L, "a", 2L, "insert"))
      .toDF("k1", "k2", "v", "_change_type")
    val e = intercept[BuzzException.BadRequest](
      Sinks.deltaApplyChanges(spark, dir, dup, Seq("k1", "k2")))
    assert(e.getMessage.contains("duplicate"))
    // a NULL key COMPONENT fails
    val nul = Seq((Some(1L), None: Option[String], 1L, "insert"))
      .toDF("k1", "k2", "v", "_change_type")
    val e2 = intercept[BuzzException.BadRequest](
      Sinks.deltaApplyChanges(spark, dir, nul, Seq("k1", "k2")))
    assert(e2.getMessage.contains("NULL"))
  }

  test("COMPOSITE keys: merge + netting + replicate converge end to end") {
    val src = tmpDir("repl_ck_src")
    val dst = tmpDir("repl_ck_dst") + "/replica"
    Sinks.deltaAppend(
      (0L until 8L).flatMap(i => Seq((i, "x", i), (i, "y", i * 10)))
        .toDF("k1", "k2", "v").coalesce(1), src)
    Sinks.deltaSetProperties(spark, src,
      Map("delta.enableChangeDataFeed" -> "true"))
    Sinks.deltaReplicate(spark, src, dst, Seq("k1", "k2")) // bootstrap
    // composite-key MERGE (CDF-captured), then a delete of one tuple
    Sinks.deltaMerge(spark, src,
      Seq((2L, "x", 222L), (2L, "y", 223L), (50L, "x", 5L))
        .toDF("k1", "k2", "v"), Seq("k1", "k2"))
    Sinks.deltaDeleteWhere(spark, src, "k1 = 4 AND k2 = 'y'")
    Sinks.deltaReplicate(spark, src, dst, Seq("k1", "k2"))
    assert(liveMap2(dst) === liveMap2(src))
    assert(liveMap2(dst)((2L, "x")) === 222L)
    assert(!liveMap2(dst).contains((4L, "y")) &&
      liveMap2(dst).contains((4L, "x")))
    // netting by _commit_version on the tuple: later change wins per tuple
    val feed = Seq(
      (1L, "x", 111L, "update_postimage", 5L),
      (1L, "x", 0L, "delete", 7L),
      (1L, "y", 119L, "update_postimage", 7L)
    ).toDF("k1", "k2", "v", "_change_type", "_commit_version")
    Sinks.deltaApplyChanges(spark, dst, feed, Seq("k1", "k2"))
    assert(!liveMap2(dst).contains((1L, "x")))
    assert(liveMap2(dst)((1L, "y")) === 119L)
  }

  test("chunked catch-up: maxVersionsPerApply applies a long lag as bounded watermarked commits") {
    val src = tmpDir("repl_chunk_src")
    val dst = tmpDir("repl_chunk_dst") + "/replica"
    twoFileTable(src)
    Sinks.deltaSetProperties(spark, src,
      Map("delta.enableChangeDataFeed" -> "true"))
    Sinks.deltaReplicate(spark, src, dst, "id") // bootstrap @ src v2
    // 7 commits of lag, with CROSS-CHUNK ordering semantics to honor:
    // id=1 updated in an early commit, deleted in a late one
    Sinks.deltaMerge(spark, src, Seq((1L, 111L)).toDF("id", "v"), "id")
    Sinks.deltaMerge(spark, src, Seq((30L, 1L)).toDF("id", "v"), "id")
    Sinks.deltaMerge(spark, src, Seq((31L, 2L)).toDF("id", "v"), "id")
    Sinks.deltaOptimize(spark, src, targetBytes = 1L << 30)
    Sinks.deltaMerge(spark, src, Seq((32L, 3L)).toDF("id", "v"), "id")
    Sinks.deltaDeleteWhere(spark, src, "id = 1")
    Sinks.deltaMerge(spark, src, Seq((33L, 4L)).toDF("id", "v"), "id")
    val dstBefore = DeltaCatalog.latestVersion(spark, s"$dst/_delta_log")
    Sinks.deltaReplicate(spark, src, dst, Seq("id"), maxVersionsPerApply = 2)
    assert(liveMap(dst) === liveMap(src))
    assert(!liveMap(dst).contains(1L) && liveMap(dst)(33L) === 4L)
    // the catch-up landed as MULTIPLE commits (ceil(7/2) chunks, empties
    // as txn-only watermarks), each individually crash-resumable
    val dstAfter = DeltaCatalog.latestVersion(spark, s"$dst/_delta_log")
    assert(dstAfter - dstBefore >= 3,
      s"expected >=3 chunked commits, got ${dstAfter - dstBefore}")
    // watermark is at src head; re-running is a no-op
    assert(Sinks.deltaReplicate(spark, src, dst, Seq("id"), 2) === dstAfter)
  }

  test("replicate converges across a single-path PING-PONG lag, chunk boundaries cutting mid-oscillation") {
    // the r13 residual's APPLY side: a lag oscillating ONE path (add,
    // remove, add, … — repeated RESTOREs between two versions) reaches
    // the replica through ALIASED multi-version runs (one read,
    // explode-labeled occurrences), and per-key netting must land on
    // each key's LAST occurrence. maxVersionsPerApply = 3 over a
    // 13-commit lag makes every chunk boundary cut mid-oscillation, so
    // each chunk's net FLIPS the ping-ponged keys' presence — [add,
    // remove, add] nets insert, [remove, add, remove] nets delete —
    // and the final lone ADD must leave them alive.
    val src = tmpDir("repl_pp_src")
    val dst = tmpDir("repl_pp_dst") + "/replica"
    Sinks.deltaAppend(
      (0L until 10L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1), src) // v0
    Sinks.deltaReplicate(spark, src, dst, "id") // bootstrap @ v0
    val stage = tmpDir("repl_pp_stage")
    (100L until 110L).map(i => (i, i * 3)).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dest = new java.io.File(src, "pp.parquet")
    Files.copy(part.toPath, dest.toPath)
    (1 to 6).foreach { k =>
      DeltaLogFixtures.writeAdd(src, 2L * k - 1, "pp.parquet", dest.length)
      DeltaLogFixtures.writeRemove(src, 2L * k, "pp.parquet")
    }
    DeltaLogFixtures.writeAdd(src, 13L, "pp.parquet", dest.length)
    val dstBefore = DeltaCatalog.latestVersion(spark, s"$dst/_delta_log")
    Sinks.deltaReplicate(spark, src, dst, Seq("id"), maxVersionsPerApply = 3)
    assert(liveMap(dst) === liveMap(src))
    assert(liveMap(dst)(104L) === 312L && liveMap(dst)(4L) === 8L &&
      liveMap(dst).size === 20)
    // ceil(13/3) = 5 individually-watermarked chunks landed
    val dstAfter = DeltaCatalog.latestVersion(spark, s"$dst/_delta_log")
    assert(dstAfter - dstBefore === 5,
      s"expected 5 chunked commits, got ${dstAfter - dstBefore}")
    // caught up: re-running is a no-op at the same watermark
    assert(Sinks.deltaReplicate(spark, src, dst, Seq("id"), 3) === dstAfter)
  }

  test("ADDITIVE src evolution mid-replication evolves the replica (old rows null); resync agrees") {
    val src = tmpDir("repl_evolve_src")
    val dst = tmpDir("repl_evolve_dst") + "/replica"
    twoFileTable(src)
    Sinks.deltaSetProperties(spark, src,
      Map("delta.enableChangeDataFeed" -> "true"))
    Sinks.deltaReplicate(spark, src, dst, "id") // bootstrap, 2-column era
    // src evolves: ALTER ADD COLUMN via an evolving append, then DML
    // touching the new column
    Sinks.deltaAppend(Seq((20L, 40L, "fresh")).toDF("id", "v", "tag"), src,
      mergeSchema = true)
    Sinks.deltaMerge(spark, src,
      Seq((5L, 500L, "tagged")).toDF("id", "v", "tag"), "id")
    Sinks.deltaReplicate(spark, src, dst, "id")
    val cat = DeltaCatalog.fromDeltaLog(spark, dst, "evolve_read")
    assert(cat.schema.fieldNames.toSeq === Seq("id", "v", "tag"))
    val rows = cat.read(spark, cat.files).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), Option(r.getString(2))))).toMap
    assert(rows(20L) === ((40L, Some("fresh"))))
    assert(rows(5L) === ((500L, Some("tagged"))))
    assert(rows(3L) === ((6L, None)), "pre-evolution rows read null tag")
    assert(rows.size === 21)
    // resync across the same evolution finds NOTHING to repair (and would
    // itself evolve an un-evolved replica rather than dropping the column)
    val head = DeltaCatalog.latestVersion(spark, s"$dst/_delta_log")
    Sinks.deltaResync(spark, src, dst, "id")
    val srcCat = DeltaCatalog.fromDeltaLog(spark, src, "evolve_src_read")
    assert(cat.read(spark, cat.files).count() ===
      srcCat.read(spark, srcCat.files).count())
    val repairs = (head + 1 to DeltaCatalog.latestVersion(spark, s"$dst/_delta_log"))
      .map(v => graft.sources.FsUtil
        .readString(spark, f"$dst/_delta_log/$v%020d.json"))
      .count(_.contains("\"add\""))
    assert(repairs === 0, "a converged evolved replica must resync to zero changes")
  }

  test("the feed plans BOUNDED width: many small same-kind commits read as ONE relation") {
    val src = tmpDir("feed_width_src")
    Sinks.deltaAppend(Seq((0L, 0L)).toDF("id", "v"), src)
    Sinks.deltaSetProperties(spark, src,
      Map("delta.enableChangeDataFeed" -> "true"))
    // 40 one-file insert commits — the replication-lag shape
    (1L to 40L).foreach(i =>
      Sinks.deltaAppend(Seq((i, i)).toDF("id", "v").coalesce(1), src))
    val head = DeltaCatalog.latestVersion(spark, s"$src/_delta_log")
    val feed = Sinks.deltaChangeFeed(spark, src, 1L, head)
    // one insert run: 1 file scan + 1 broadcast (path -> version) local
    // relation — NOT one leaf per commit
    val leaves = feed.queryExecution.optimizedPlan.collectLeaves().size
    assert(leaves <= 4, s"40-commit span planned $leaves leaves")
    assert(feed.count() === 40L)
    assert(feed.select("_commit_version").distinct().count() === 40L)
    // alternating kinds still label versions exactly: delete, insert,
    // delete — three runs, each version's rows correct
    Sinks.deltaDeleteWhere(spark, src, "id = 40")        // cdc-captured
    Sinks.deltaAppend(Seq((50L, 5L)).toDF("id", "v"), src)
    val head2 = DeltaCatalog.latestVersion(spark, s"$src/_delta_log")
    val tail = Sinks.deltaChangeFeed(spark, src, head, head2)
      .select(col("_commit_version"), col("_change_type"), col("id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(tail === Seq(
      (head + 1, "delete", 40L),
      (head + 2, "insert", 50L)).sorted)
    // the keyed snapshot-diff reader batches its DEGENERATE commits the
    // same way: 40 insert-only commits = one 'added' relation (+ the
    // version map), not 40 diff joins
    val diff = Sinks.deltaChangesBetween(spark, src, 1L, head, Seq("id"), Seq("v"))
    val diffLeaves = diff.queryExecution.optimizedPlan.collectLeaves().size
    assert(diffLeaves <= 4, s"40-commit diff span planned $diffLeaves leaves")
    assert(diff.count() === 40L)
    assert(diff.select("status").distinct().collect().map(_.getString(0)).toSeq === Seq("added"))
    assert(diff.select("version").distinct().count() === 40L)
  }
}
