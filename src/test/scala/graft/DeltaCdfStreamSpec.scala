package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sinks
import graft.sources.DeltaCatalog

/** The streaming change feed (`graft-delta-cdf`): row-level changes per
  * version span, authoritative `_change_data` reads for CDF commits,
  * derived inserts/deletes otherwise, exactly-once across restarts, and
  * streaming REPLICATION end to end (source feed → foreachBatch
  * [[Sinks.deltaApplyChanges]] with the txn handshake). */
class DeltaCdfStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def runOnce(dir: String, ckpt: String, name: String,
      options: Map[String, String] = Map.empty): Unit = {
    val reader = spark.readStream.format("graft-delta-cdf").option("path", dir)
    val q = options.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  private def runDurable(dir: String, ckpt: String, out: String): Unit = {
    val q = spark.readStream.format("graft-delta-cdf").option("path", dir)
      .load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  private def changeRows(df: org.apache.spark.sql.DataFrame): Seq[(Long, String, Long, Long)] =
    df.select(col("_commit_version"), col("_change_type"), col("id"), col("v"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq

  test("inserts, update images, and deletes stream with exact values and versions") {
    val dir = tmpDir("cdfs_basic")
    val ckpt = tmpDir("cdfs_basic_ckpt")
    Sinks.deltaAppend((0L until 10L).map(i => (i, i * 2)).toDF("id", "v"), dir) // v0
    Sinks.deltaSetProperties(spark, dir,
      Map("delta.enableChangeDataFeed" -> "true"))                              // v1
    Sinks.deltaMerge(spark, dir, Seq((5L, 500L), (100L, 1L)).toDF("id", "v"), "id") // v2
    Sinks.deltaDeleteWhere(spark, dir, "id = 8")                                // v3
    runOnce(dir, ckpt, "cdfs_basic")
    val rows = changeRows(spark.table("cdfs_basic"))
    assert(rows.filter(_._1 == 0L) ===
      (0L until 10L).map(i => (0L, "insert", i, i * 2)))
    assert(rows.filter(_._1 >= 2L) === Seq(
      (2L, "insert", 100L, 1L),
      (2L, "update_postimage", 5L, 500L),
      (2L, "update_preimage", 5L, 10L),
      (3L, "delete", 8L, 16L)))
  }

  test("restart resumes exactly-once; OPTIMIZE ships nothing") {
    val dir = tmpDir("cdfs_restart")
    val ckpt = tmpDir("cdfs_restart_ckpt")
    val out = tmpDir("cdfs_restart_out")
    Sinks.deltaAppend((0L until 10L).map(i => (i, i)).toDF("id", "v"), dir)   // v0
    runDurable(dir, ckpt, out)
    // while the query is down: CDF on, compaction, an update, an append
    Sinks.deltaSetProperties(spark, dir,
      Map("delta.enableChangeDataFeed" -> "true"))                            // v1
    Sinks.deltaOptimize(spark, dir, targetBytes = 1L << 30)                   // v2
    Sinks.deltaUpdate(spark, dir, "id = 3", Map("v" -> "v + 100"))            // v3
    Sinks.deltaAppend(Seq((10L, 10L)).toDF("id", "v"), dir)                   // v4
    runDurable(dir, ckpt, out)
    runDurable(dir, ckpt, out) // nothing new: zero rows
    val rows = changeRows(spark.read.parquet(out))
    assert(rows.count(_._1 == 0L) === 10)       // initial snapshot once
    assert(rows.count(_._1 == 2L) === 0)        // OPTIMIZE invisible
    assert(rows.filter(_._1 == 3L) === Seq(
      (3L, "update_postimage", 3L, 103L),
      (3L, "update_preimage", 3L, 3L)))
    assert(rows.filter(_._1 == 4L) === Seq((4L, "insert", 10L, 10L)))
    assert(rows.size === 13)
  }

  test("startingVersion skips history; maxFilesPerTrigger paces spans") {
    val dir = tmpDir("cdfs_pace")
    val ckpt = tmpDir("cdfs_pace_ckpt")
    (0 until 3).foreach(i =>
      Sinks.deltaAppend(
        (i * 10L until (i + 1) * 10L).map(j => (j, j)).toDF("id", "v").coalesce(1), dir))
    val q = spark.readStream.format("graft-delta-cdf").option("path", dir)
      .option("startingVersion", "1")
      .option("maxFilesPerTrigger", "1")
      .load()
      .writeStream.format("memory").queryName("cdfs_pace")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    val ids = spark.table("cdfs_pace").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids === (10L until 30L)) // v0 skipped
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches === 2, s"expected 2 paced batches, got $dataBatches")
  }

  test("a rewrite commit without cdc actions fails the query loudly") {
    val dir = tmpDir("cdfs_rewrite")
    val ckpt = tmpDir("cdfs_rewrite_ckpt")
    Sinks.deltaAppend((0L until 10L).map(i => (i, i)).toDF("id", "v"), dir)
    // CDF never enabled: this merge rewrites rows with no recorded feed
    Sinks.deltaMerge(spark, dir, Seq((5L, 500L)).toDF("id", "v"), "id")
    val e = intercept[StreamingQueryException](runOnce(dir, ckpt, "cdfs_rw"))
    assert(e.getCause.getMessage.contains("without"),
      s"unexpected: ${e.getCause.getMessage}")
  }

  test("schema evolution: mid-RUN fails loudly; a fresh stream conforms old eras") {
    val dir = tmpDir("cdfs_evolve")
    Sinks.deltaAppend((0L until 5L).map(i => (i, i)).toDF("id", "v"), dir) // v0
    // evolution landing WHILE the query runs: the run's schema is pinned
    // at start, so the evolved batch must fail loudly — silently
    // projecting the new column away would corrupt a replica applying
    // this feed
    val q = spark.readStream.format("graft-delta-cdf").option("path", dir)
      .load()
      .writeStream.format("memory").queryName("cdfs_evolving")
      .option("checkpointLocation", tmpDir("cdfs_evolve_ckpt"))
      .start()
    try {
      q.processAllAvailable() // ships v0's inserts under (id, v)
      Sinks.deltaAppend(Seq((5L, 5L, 99L)).toDF("id", "v", "extra"), dir,
        mergeSchema = true) // v1 evolves mid-run
      val e = intercept[StreamingQueryException](q.processAllAvailable())
      assert(e.getMessage.contains("evolved mid-stream") ||
        e.getCause.getMessage.contains("evolved mid-stream"))
    } finally q.stop()
    // a FRESH stream (pinned to the evolved schema) replays the pre-
    // evolution era's changes with the missing column conformed to null
    val ckpt2 = tmpDir("cdfs_evolve_ckpt2")
    val out2 = tmpDir("cdfs_evolve_out2")
    runDurable(dir, ckpt2, out2)
    val rows = spark.read.parquet(out2)
    assert(rows.count() === 6)
    assert(rows.filter(col("_change_type") === "insert").count() === 6)
    assert(rows.filter(col("extra").isNotNull).count() === 1)
  }

  test("streaming replication: feed → apply with the txn handshake, exactly-once") {
    val src = tmpDir("cdfs_repl_src")
    val dst = tmpDir("cdfs_repl_dst") + "/replica"
    val ckpt = tmpDir("cdfs_repl_ckpt")
    Sinks.deltaAppend((0L until 20L).map(i => (i, i * 2)).toDF("id", "v"), src) // v0
    Sinks.deltaSetProperties(spark, src,
      Map("delta.enableChangeDataFeed" -> "true"))                              // v1
    // replica bootstrap (batch), then the live leg applies the feed
    Sinks.deltaReplicate(spark, src, dst, "id")
    val startV = DeltaCatalog.latestVersion(spark, s"$src/_delta_log") + 1
    def runRepl(): Unit = {
      val q = spark.readStream.format("graft-delta-cdf").option("path", src)
        .option("startingVersion", startV.toString)
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          Sinks.deltaApplyChanges(spark, dst,
            batch, "id", txn = Some((s"cdfs-repl:$src", batchId)))
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    Sinks.deltaMerge(spark, src, Seq((5L, 500L), (100L, 1L)).toDF("id", "v"), "id")
    runRepl()
    // downtime DML, then a resumed run catches up exactly-once
    Sinks.deltaDeleteWhere(spark, src, "id = 8")
    Sinks.deltaUpdate(spark, src, "id = 6", Map("v" -> "v + 1"))
    runRepl()
    def live(dir: String): Map[Long, Long] = {
      val cat = DeltaCatalog.fromDeltaLog(spark, dir, "repl_cmp")
      cat.read(spark, cat.files).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val s = live(src)
    assert(live(dst) === s)
    assert(s(5L) === 500L && s(100L) === 1L && s(6L) === 13L && !s.contains(8L))
  }

  test("batch-boundary semantics: images of ONE key split across batches still converge") {
    // an update's preimage+postimage always share a commit (and so a
    // batch), but successive updates of the SAME key land in successive
    // batches under maxFilesPerTrigger=1 — batch N applies postimage v_n,
    // batch N+1 ships {preimage v_n, postimage v_(n+1)}: the preimage is
    // informational (netting drops it) and the apply must not see the
    // repeat of v_n's value as a conflict
    val src = tmpDir("cdfs_bb_src")
    val dst = tmpDir("cdfs_bb_dst") + "/replica"
    val ckpt = tmpDir("cdfs_bb_ckpt")
    Sinks.deltaAppend((0L until 10L).map(i => (i, i)).toDF("id", "v").coalesce(1), src)
    Sinks.deltaSetProperties(spark, src,
      Map("delta.enableChangeDataFeed" -> "true"))
    Sinks.deltaReplicate(spark, src, dst, "id")
    val startV = DeltaCatalog.latestVersion(spark, s"$src/_delta_log") + 1
    // three successive updates of id=3 (+ a delete-then-reinsert of id=4):
    // each is its own commit, forced into its own micro-batch
    Sinks.deltaMerge(spark, src, Seq((3L, 100L)).toDF("id", "v"), "id")
    Sinks.deltaMerge(spark, src, Seq((3L, 200L)).toDF("id", "v"), "id")
    Sinks.deltaDeleteWhere(spark, src, "id = 4")
    Sinks.deltaMerge(spark, src, Seq((4L, 444L), (3L, 300L)).toDF("id", "v"), "id")
    var applies = 0
    val q = spark.readStream.format("graft-delta-cdf").option("path", src)
      .option("startingVersion", startV.toString)
      .option("maxFilesPerTrigger", "1")
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        Sinks.deltaApplyChanges(spark, dst,
          batch, "id", txn = Some((s"cdfs-bb:$src", batchId)))
        applies += 1
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(applies >= 4, s"pacing should split the 4 commits, got $applies batches")
    def live(dir: String): Map[Long, Long] = {
      val cat = DeltaCatalog.fromDeltaLog(spark, dir, "bb_cmp")
      cat.read(spark, cat.files).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(live(dst) === live(src))
    assert(live(dst)(3L) === 300L && live(dst)(4L) === 444L)
  }

  test("streaming replication with a COMPOSITE key: feed → apply(Seq) converges") {
    val src = tmpDir("cdfs_ck_src")
    val dst = tmpDir("cdfs_ck_dst") + "/replica"
    val ckpt = tmpDir("cdfs_ck_ckpt")
    Sinks.deltaAppend(
      (0L until 6L).flatMap(i => Seq((i, "a", i), (i, "b", i * 10)))
        .toDF("k1", "k2", "v").coalesce(1), src)
    Sinks.deltaSetProperties(spark, src,
      Map("delta.enableChangeDataFeed" -> "true"))
    Sinks.deltaReplicate(spark, src, dst, Seq("k1", "k2"))
    val startV = DeltaCatalog.latestVersion(spark, s"$src/_delta_log") + 1
    // tuple-keyed DML: k1=2 exists under BOTH k2 values; only (2,a) moves
    Sinks.deltaMerge(spark, src,
      Seq((2L, "a", 222L)).toDF("k1", "k2", "v"), Seq("k1", "k2"))
    Sinks.deltaDeleteWhere(spark, src, "k1 = 4 AND k2 = 'b'")
    val q = spark.readStream.format("graft-delta-cdf").option("path", src)
      .option("startingVersion", startV.toString)
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        Sinks.deltaApplyChanges(spark, dst,
          batch, Seq("k1", "k2"), txn = Some((s"cdfs-ck:$src", batchId)))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    def live(dir: String): Map[(Long, String), Long] = {
      val cat = DeltaCatalog.fromDeltaLog(spark, dir, "ck_cmp")
      cat.read(spark, cat.files).collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    }
    val s = live(src)
    assert(live(dst) === s)
    assert(s((2L, "a")) === 222L && s((2L, "b")) === 20L && !s.contains((4L, "b")))
  }

  test("a mid-stream RENAME conforms losslessly under the pinned names (only drops fail)") {
    val dir = tmpDir("cdfs_rename")
    val ckpt = tmpDir("cdfs_rename_ckpt")
    Sinks.deltaAppend((0L until 5L).map(i => (i, i * 2)).toDF("id", "v"), dir) // v0
    Sinks.deltaSetProperties(spark, dir,
      Map("delta.enableChangeDataFeed" -> "true"))                             // v1
    val q = spark.readStream.format("graft-delta-cdf").option("path", dir)
      .load()
      .writeStream.format("memory").queryName("cdfs_rename")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable() // ships v0 inserts under (id, v)
      // rename lands WHILE the query runs; later changes store the same
      // PHYSICAL column, so the pinned stream keeps surfacing it as `v`
      Sinks.deltaRenameColumn(spark, dir, "v", "w")                            // v2
      Sinks.deltaMerge(spark, dir, Seq((3L, 300L)).toDF("id", "w"), "id")      // v3
      q.processAllAvailable()
    } finally q.stop()
    val rows = changeRows(spark.table("cdfs_rename"))
    assert(rows.filter(_._1 == 3L) === Seq(
      (3L, "update_postimage", 3L, 300L),
      (3L, "update_preimage", 3L, 6L)), "post-rename changes conform to the pinned name 'v'")
  }

  test("maxVersionsPerTrigger paces catch-up; each trigger parses each commit JSON once") {
    val dir = tmpDir("cdfs_vpt")
    val ckpt = tmpDir("cdfs_vpt_ckpt")
    Sinks.deltaAppend(Seq((0L, 0L)).toDF("id", "v"), dir)
    // 8 one-row commits of lag
    (1L to 8L).foreach(i =>
      Sinks.deltaAppend(Seq((i, i)).toDF("id", "v").coalesce(1), dir))
    val q = spark.readStream.format("graft-delta-cdf").option("path", dir)
      .option("maxVersionsPerTrigger", "3")
      .load()
      .writeStream.format("memory").queryName("cdfs_vpt")
      .option("checkpointLocation", ckpt)
      .start()
    val parsesBefore = Sinks.uncachedCommitParses
    try q.processAllAvailable() finally q.stop()
    val parses = Sinks.uncachedCommitParses - parsesBefore
    assert(spark.table("cdfs_vpt").count() === 9)
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches === 3, s"9 versions / 3 per trigger: got $dataBatches")
    // admission (getOffset) and the batch walk (getBatch) share ONE parse
    // per commit via the memo: 9 commits -> at most 9 uncached parses
    // across the whole run (plus none for replayed versions)
    assert(parses <= 9, s"9 commits parsed $parses times — memo not serving")
  }

  test("restart INTO a 1000-commit backlog: admission chunks it and the stream converges exactly-once") {
    // the streaming twin of replicate's chunked catch-up: a stream that
    // was down while 1000 one-file commits landed must resume from its
    // checkpoint, admit the backlog in maxVersionsPerTrigger-bounded
    // triggers (each trigger's plan bounded by runs, not commits), and
    // deliver every version exactly once.
    val dir = tmpDir("cdfs_lag")
    val ckpt = tmpDir("cdfs_lag_ckpt")
    val out = tmpDir("cdfs_lag_out")
    Sinks.deltaAppend(
      (0L until 5L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1), dir) // v0
    runDurable(dir, ckpt, out) // batch 0: the snapshot as inserts
    // 1000 commits of lag, hand-authored for speed (one copied 5-row
    // file + one add JSON per commit — the protocol shape deltaAppend
    // would write, without 1000 Spark write jobs)
    val part = new java.io.File(dir).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    (1 to 1000).foreach { i =>
      val dest = new java.io.File(dir, s"lag-$i.parquet")
      java.nio.file.Files.copy(part.toPath, dest.toPath)
      DeltaLogFixtures.writeAdd(dir, i.toLong, s"lag-$i.parquet", dest.length)
    }
    val q = spark.readStream.format("graft-delta-cdf").option("path", dir)
      .option("maxVersionsPerTrigger", "100")
      .option("maxFilesPerTrigger", "100000")
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches === 10, s"1000 versions / 100 per trigger: got $dataBatches")
    val rows = spark.read.parquet(out)
    assert(rows.count() === 5L + 5L * 1000L, "every commit's rows exactly once")
    assert(rows.select("_commit_version").distinct().count() === 1001L)
    assert(rows.filter(col("_change_type") =!= "insert").count() === 0L)
    // convergence is stable: nothing new, nothing re-delivered
    runDurable(dir, ckpt, out)
    assert(spark.read.parquet(out).count() === 5L + 5L * 1000L)
  }

  test("restart INTO a PING-PONG backlog: aliased runs per trigger, every occurrence exactly-once") {
    // the streaming twin of the r13 residual: the down-time lag
    // oscillates ONE path (add, remove, add, … — repeated RESTOREs
    // between two versions). Each resumed trigger's 50-commit span
    // aliases onto 2 runs (one read per kind, explode-labeled
    // occurrences) instead of ~25 relations per kind, and the stream
    // must still deliver every occurrence of every version exactly
    // once across the trigger boundaries that cut mid-oscillation.
    val dir = tmpDir("cdfs_pp")
    val ckpt = tmpDir("cdfs_pp_ckpt")
    val out = tmpDir("cdfs_pp_out")
    Sinks.deltaAppend(
      (0L until 5L).map(i => (i, i * 2)).toDF("id", "v").coalesce(1), dir) // v0
    runDurable(dir, ckpt, out) // batch 0: the snapshot as inserts
    val part = new java.io.File(dir).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
    val dest = new java.io.File(dir, "pp.parquet")
    java.nio.file.Files.copy(part.toPath, dest.toPath)
    (1 to 100).foreach { k =>
      DeltaLogFixtures.writeAdd(dir, 2L * k - 1, "pp.parquet", dest.length)
      DeltaLogFixtures.writeRemove(dir, 2L * k, "pp.parquet")
    }
    val q = spark.readStream.format("graft-delta-cdf").option("path", dir)
      .option("maxVersionsPerTrigger", "50")
      .option("maxFilesPerTrigger", "100000")
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches === 4, s"200 versions / 50 per trigger: got $dataBatches")
    val rows = spark.read.parquet(out)
    // 5 snapshot inserts + 100 add-occurrences x 5 rows + 100
    // remove-occurrences x 5 rows, each under its own version label
    assert(rows.count() === 5L + 5L * 200L, "every occurrence exactly once")
    assert(rows.select("_commit_version").distinct().count() === 201L)
    assert(rows.filter(col("_change_type") === "insert")
      .filter(col("_commit_version") > 0).count() === 500L)
    assert(rows.filter(col("_change_type") === "delete").count() === 500L)
    // odd versions are the adds, even the removes — spot-check one row
    // through a mid-oscillation trigger boundary (v50 remove, v51 add)
    val edge = rows.filter(col("id") === 3L)
      .filter(col("_commit_version").isin(50L, 51L))
      .select(col("_commit_version"), col("_change_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(edge === Seq((50L, "delete"), (51L, "insert")))
    // convergence is stable: nothing new, nothing re-delivered
    runDurable(dir, ckpt, out)
    assert(spark.read.parquet(out).count() === 5L + 5L * 200L)
  }
}
