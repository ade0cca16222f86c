package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sinks
import graft.streaming.CorpusStream

/** The Delta streaming tail (`graft-delta-tail`): exactly-once
  * version-span batches across restarts, OPTIMIZE skipped not duplicated,
  * admission control in fact-adding files, and the sync contract's loud
  * failures (retraction, rename) live inside a running query. */
class DeltaTailStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def runOnce(dir: String, ckpt: String, name: String,
      options: Map[String, String] = Map.empty): Unit = {
    val reader = spark.readStream.format("graft-delta-tail").option("path", dir)
    val q = options.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }
      .load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** Durable run: the parquet FILE sink supports checkpoint recovery
    * (the memory sink refuses it), so restart semantics are testable —
    * its manifest makes output exactly-once across restarts. */
  private def runDurable(dir: String, ckpt: String, out: String): Unit = {
    val q = spark.readStream.format("graft-delta-tail").option("path", dir)
      .load()
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  private def memIds(name: String): Seq[Long] =
    spark.table(name).select("id").collect().map(_.getLong(0)).sorted.toSeq

  private def outIds(out: String): Seq[Long] =
    spark.read.parquet(out).select("id").collect().map(_.getLong(0)).sorted.toSeq

  test("each commit's facts ship exactly once, across a restart, OPTIMIZE skipped") {
    val dir = tmpDir("tail_basic")
    val ckpt = tmpDir("tail_basic_ckpt")
    val out = tmpDir("tail_basic_out")
    Sinks.deltaAppend((0L until 10L).map(i => (i, i * 2)).toDF("id", "v"), dir)
    Sinks.deltaAppend((10L until 20L).map(i => (i, i * 2)).toDF("id", "v"), dir)
    runDurable(dir, ckpt, out)
    assert(outIds(out) === (0L until 20L))
    // new facts + a dataChange=false rewrite land while the query is DOWN
    Sinks.deltaAppend((20L until 30L).map(i => (i, i * 2)).toDF("id", "v"), dir)
    Sinks.deltaOptimize(spark, dir, targetBytes = 1L << 30)
    // restart from the same checkpoint: resumed offsets admit exactly the
    // new commit — 0-19 are never re-delivered, and the compaction ships
    // NOTHING (its rows would otherwise all duplicate)
    runDurable(dir, ckpt, out)
    assert(outIds(out) === (0L until 30L))
    // nothing new: a third run ships zero rows
    runDurable(dir, ckpt, out)
    assert(outIds(out) === (0L until 30L))
  }

  test("maxFilesPerTrigger paces version spans without loss or duplication") {
    val dir = tmpDir("tail_pace")
    val ckpt = tmpDir("tail_pace_ckpt")
    (0 until 4).foreach(i =>
      Sinks.deltaAppend(
        (i * 10L until (i + 1) * 10L).map(j => (j, j)).toDF("id", "v").coalesce(1), dir))
    val q = spark.readStream.format("graft-delta-tail").option("path", dir)
      .option("maxFilesPerTrigger", "1")
      .load()
      .writeStream.format("memory").queryName("tail_paced")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(memIds("tail_paced") === (0L until 40L))
    // one single-file commit per batch: four data-carrying batches
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches === 4, s"expected 4 paced batches, got $dataBatches")
  }

  test("startingVersion skips the history before it") {
    val dir = tmpDir("tail_startv")
    val ckpt = tmpDir("tail_startv_ckpt")
    Sinks.deltaAppend((0L until 10L).map(i => (i, i)).toDF("id", "v"), dir)  // v0
    Sinks.deltaAppend((10L until 20L).map(i => (i, i)).toDF("id", "v"), dir) // v1
    runOnce(dir, ckpt, "tail_startv", Map("startingVersion" -> "1"))
    assert(memIds("tail_startv") === (10L until 20L))
  }

  test("the tail composes with the streaming twins (exact dedup over live commits)") {
    val dir = tmpDir("tail_compose")
    val ckpt = tmpDir("tail_compose_ckpt")
    // two commits sharing duplicate text across the version boundary:
    // the dedup twin must keep one row per distinct text over the STREAM,
    // not per batch — the live end-to-end leg of deltaSync's pipeline
    Sinks.deltaAppend(
      Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
        .toDF("id", "text")
        .withColumn("ts", lit(java.sql.Timestamp.valueOf("2026-01-01 00:00:00"))),
      dir)
    Sinks.deltaAppend(
      Seq((4L, "beta"), (5L, "gamma"))
        .toDF("id", "text")
        .withColumn("ts", lit(java.sql.Timestamp.valueOf("2026-01-01 00:01:00"))),
      dir)
    val tail = spark.readStream.format("graft-delta-tail").option("path", dir)
      .option("maxFilesPerTrigger", "1").load()
    val q = CorpusStream.dedupExactStreaming(tail, "text", "ts")
      .writeStream.format("memory").queryName("tail_dedup")
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    val texts = spark.table("tail_dedup").select("text")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(texts === Seq("alpha", "beta", "gamma"))
  }

  test("schema evolution: mid-RUN fails loudly; a fresh stream conforms old eras") {
    val dir = tmpDir("tail_evolve")
    Sinks.deltaAppend((0L until 5L).map(i => (i, i)).toDF("id", "v"), dir) // v0
    // evolution landing WHILE the query runs: the run's schema is pinned
    // at start, so the evolved batch must fail loudly — silently
    // projecting the new column away would drop its facts
    val q = spark.readStream.format("graft-delta-tail").option("path", dir)
      .load()
      .writeStream.format("memory").queryName("tail_evolving")
      .option("checkpointLocation", tmpDir("tail_evolve_ckpt"))
      .start()
    try {
      q.processAllAvailable() // ships v0 under (id, v)
      Sinks.deltaAppend((5L until 8L).map(i => (i, i, s"t$i")).toDF("id", "v", "tag"),
        dir, mergeSchema = true) // v1 evolves mid-run
      val e = intercept[StreamingQueryException](q.processAllAvailable())
      assert(e.getMessage.contains("evolved mid-stream") ||
        e.getCause.getMessage.contains("evolved mid-stream"))
    } finally q.stop()
    // a FRESH stream (pinned to the evolved schema) replays the pre-
    // evolution era with the missing column conformed to null — per-
    // version batches force an old-era span through the conform-up path
    val q2 = spark.readStream.format("graft-delta-tail").option("path", dir)
      .option("maxFilesPerTrigger", "1")
      .load()
      .writeStream.format("memory").queryName("tail_evolved")
      .option("checkpointLocation", tmpDir("tail_evolve_ckpt2"))
      .start()
    try q2.processAllAvailable() finally q2.stop()
    val rows = spark.table("tail_evolved")
      .select("id", "tag").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(rows.size === 8)
    assert((0L until 5L).forall(rows(_).isEmpty), "old era must read tag as null")
    assert((5L until 8L).forall(i => rows(i).contains(s"t$i")))
  }

  test("lakehouse in, curated stream out: tail → curateStreaming is exactly-once across a restart") {
    import java.sql.Timestamp
    val dir = tmpDir("tail_curate")
    val ckpt = tmpDir("tail_curate_ckpt")
    val out = tmpDir("tail_curate_out")
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val goodA = Seq.fill(12)(
      "the quick brown fox jumps over the lazy dog today again").mkString(" ")
    val goodB = Seq.fill(12)(
      "a different well formed english sentence with many plain words here").mkString(" ")
    def runCurated(): Unit = {
      val tail = spark.readStream.format("graft-delta-tail").option("path", dir)
        .option("maxFilesPerTrigger", "1").load()
      val q = CorpusStream.curateStreaming(tail, "id", "text", "ts", minQuality = 0.5)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    // v0 lands on the LIVE table: one good doc (with PII to redact), one
    // quality reject
    Sinks.deltaAppend(Seq(
      (1L, goodA + " mail me at a@b.com", ts(0)),
      (2L, "short", ts(1))).toDF("id", "text", "ts"), dir)
    runCurated()
    val first = spark.read.parquet(out).collect()
    assert(first.map(_.getLong(0)).toSeq === Seq(1L))
    val text1 = first(0).getString(first(0).fieldIndex("text"))
    assert(text1.contains("<PII>") && !text1.contains("a@b.com"))
    // while the query is DOWN, the lakehouse keeps moving: v1 carries an
    // exact dup of v0's good doc (same text) plus a fresh good doc
    Sinks.deltaAppend(Seq(
      (3L, goodA + " mail me at a@b.com", ts(10)),
      (4L, goodB, ts(11))).toDF("id", "text", "ts"), dir)
    // RESTART from the same checkpoint: the tail resumes at its committed
    // version offset, and the dedup state (persisted in the checkpoint)
    // suppresses the cross-restart duplicate — id 3 never lands
    runCurated()
    val second = spark.read.parquet(out).collect().map(_.getLong(0)).sorted.toSeq
    assert(second === Seq(1L, 4L),
      s"expected exactly-once curated ids [1,4], got $second")
    // a third run with nothing new re-delivers NOTHING
    runCurated()
    assert(spark.read.parquet(out).count() === 2L)
  }

  test("steady-state triggers pay ZERO full replays (one pinned replay at start only)") {
    import graft.sources.DeltaCatalog
    val dir = tmpDir("tail_noreplay")
    Sinks.deltaAppend((0L until 10L).map(i => (i, i)).toDF("id", "v").coalesce(1), dir)
    // stream starts: exactly one pinned snapshot replay
    val src = new graft.streaming.DeltaTailSource(spark, dir, Map("maxFilesPerTrigger" -> "1"))
    // live commits land AFTER the pin — the shape of an unbounded stream
    Sinks.deltaAppend((10L until 20L).map(i => (i, i)).toDF("id", "v").coalesce(1), dir)
    Sinks.deltaAppend((20L until 30L).map(i => (i, i)).toDF("id", "v").coalesce(1), dir)
    var prev: Option[org.apache.spark.sql.execution.streaming.Offset] = None
    var shipped = Seq.empty[Long]
    val before = DeltaCatalog.uncachedReplays
    (0 until 3).foreach { _ =>
      val off = src.getOffset.get
      val batch = src.getBatch(prev, off)
      // execute the batch plan for real (the streaming flag blocks direct
      // actions), proving catalogFromMeta's files-supplied read works end
      // to end
      val ids = org.apache.spark.sql.graft.StreamingBridge.asBatch(batch)
        .select("id").collect().map(_.getLong(0))
      shipped = shipped ++ ids
      prev = Some(off)
    }
    val replays = DeltaCatalog.uncachedReplays - before
    assert(replays == 0,
      s"steady-state tail triggers paid $replays full replays, expected 0")
    assert(shipped.sorted === (0L until 30L))
  }

  test("each trigger parses each new commit JSON once (admission + batch share the memo)") {
    val dir = tmpDir("tail_oneparse")
    Sinks.deltaAppend((0L until 5L).map(i => (i, i)).toDF("id", "v").coalesce(1), dir)
    val src = new graft.streaming.DeltaTailSource(spark, dir, Map.empty)
    // 4 live one-file commits; one trigger walks them ALL: getOffset's
    // factFileCount per candidate version + getBatch's appendOnlyFactFiles
    // re-read would be 2 parses per commit without the memo
    (1L to 4L).foreach(i =>
      Sinks.deltaAppend(Seq((10L + i, i)).toDF("id", "v").coalesce(1), dir))
    Sinks.invalidateCommitParseCache()
    val before = Sinks.uncachedCommitParses
    val off = src.getOffset.get
    val batch = src.getBatch(None, off)
    assert(org.apache.spark.sql.graft.StreamingBridge.asBatch(batch).count() === 9)
    val parses = Sinks.uncachedCommitParses - before
    assert(parses <= 5, s"5 commits parsed $parses times in one trigger — memo not serving")
  }

  test("a retracting commit and a rename both fail the query loudly") {
    val dir = tmpDir("tail_retract")
    Sinks.deltaAppend((0L until 10L).map(i => (i, i)).toDF("id", "v"), dir)
    Sinks.deltaDeleteWhere(spark, dir, "id = 3")
    val e = intercept[StreamingQueryException] {
      runOnce(dir, tmpDir("tail_retract_ckpt"), "tail_retract")
    }
    assert(e.getMessage.contains("retracts") || e.getCause.getMessage.contains("retracts"))

    val dir2 = tmpDir("tail_rename")
    Sinks.deltaAppend((0L until 10L).map(i => (i, i)).toDF("id", "v"), dir2)
    val ckpt2 = tmpDir("tail_rename_ckpt")
    val out2 = tmpDir("tail_rename_out")
    runDurable(dir2, ckpt2, out2) // drains v0 cleanly
    Sinks.deltaRenameColumn(spark, dir2, "v", "w")
    Sinks.deltaAppend((10L until 20L).map(i => (i, i)).toDF("id", "w"), dir2)
    val e2 = intercept[StreamingQueryException] {
      runDurable(dir2, ckpt2, out2)
    }
    assert(e2.getMessage.contains("renames") || e2.getCause.getMessage.contains("renames"))
  }
}
