package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches

/** Sketch properties in BOTH regimes: exact below capacity (what the
  * sf0.01 oracle relies on) and bounded-error past it (what a 100 TB
  * deployment actually runs in), plus the merge laws that make the
  * summary-table pattern sound. */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("theta set algebra is exact below sketch capacity") {
    // A = [0, 3000), B = [2000, 6000): overlap 1000, union 6000
    val a = spark.range(0, 3000).toDF("k")
    val b = spark.range(2000, 6000).toDF("k")
    val row = Sketches.thetaOverlap(a, "k", b, "k").collect()(0)
    assert(row.getLong(0) == 3000, s"est_a ${row.getLong(0)}")
    assert(row.getLong(1) == 4000, s"est_b ${row.getLong(1)}")
    assert(row.getLong(2) == 1000, s"est_both ${row.getLong(2)}")
    assert(row.getLong(3) == 6000, s"est_union ${row.getLong(3)}")
    assert(row.getLong(4) == 2000, s"est_only_a ${row.getLong(4)}")
  }

  test("theta overlap is bounded-error past capacity") {
    // lgK=12 (k=4096) against 100k-element sets: estimates must land
    // within ~5 standard errors (RSE ≈ 1/√4096 ≈ 1.6%)
    val a = spark.range(0, 100000).toDF("k")
    val b = spark.range(50000, 150000).toDF("k")
    val row = Sketches.thetaOverlap(a, "k", b, "k", lgK = 12).collect()(0)
    def ok(est: Long, truth: Double): Boolean =
      math.abs(est - truth) / truth < 5.0 / math.sqrt(4096.0)
    assert(ok(row.getLong(0), 100000), s"est_a ${row.getLong(0)}")
    assert(ok(row.getLong(2), 50000), s"est_both ${row.getLong(2)}")
    assert(ok(row.getLong(3), 150000), s"est_union ${row.getLong(3)}")
  }

  test("hll rollup of cells equals the single-pass sketch estimate") {
    // 60k values scattered over 20 cells: merging the per-cell sketches
    // must give the same estimate as sketching the whole column directly —
    // the law that lets a summary table replace re-scans
    val df = spark.range(0, 120000)
      .select((col("id") % 20).as("cell"), (col("id") % 60000).as("v"))
    val viaCells = Sketches.hllRollup(
      Sketches.hllCells(df, Seq("cell"), "v", lgK = 12)
        .withColumn("g", lit(1)), Seq("g"))
      .collect()(0).getLong(1)
    val direct = df.agg(
      hll_sketch_estimate(hll_sketch_agg(col("v"), 12))).collect()(0).getLong(0)
    assert(viaCells == direct, s"cells $viaCells vs direct $direct")
    // and the estimate itself is inside 5 standard errors of 60000
    assert(math.abs(viaCells - 60000.0) / 60000.0 < 5 * 1.04 / math.sqrt(4096.0),
      s"estimate $viaCells too far from 60000")
  }

  test("hll cells are exact in the sparse regime (the oracle precondition)") {
    // cell = id%5, v = id%900; 900 ≡ 0 (mod 5) so each cell sees exactly
    // the 180 values v with v%5 == cell
    val df = spark.range(0, 5000)
      .select((col("id") % 5).as("cell"), (col("id") % 900).as("v"))
    val out = Sketches.hllRollup(
      Sketches.hllCells(df, Seq("cell"), "v"), Seq("cell"))
      .orderBy("cell")
      .collect().map(r => r.getLong(1)).toSeq
    assert(out == Seq(180, 180, 180, 180, 180), s"got $out")
  }

  test("kll quantiles are exact order statistics below capacity") {
    // 1..1000 scattered over 10 cells, merged back: inclusive-rank rule
    // says p50 = smallest v with (#≤v)/1000 ≥ 0.5 = 500
    val df = spark.range(1, 1001)
      .select((col("id") % 10).as("cell"), col("id").cast("double").as("v"))
    val out = Sketches.kllRollup(
      Sketches.kllCells(df, Seq("cell"), "v", k = 2048)
        .withColumn("g", lit(1)), Seq("g"), Seq(0.5, 0.9, 0.99), k = 2048)
      .collect()(0)
    val qs = out.getSeq[Double](1)
    assert(qs == Seq(500.0, 900.0, 990.0), s"got $qs")
    assert(out.getLong(2) == 10) // n_cells
  }

  test("kll cells merge to the same quantiles as one direct sketch (exact regime)") {
    val df = spark.range(0, 3000)
      .select((col("id") % 7).as("cell"), (col("id") * 3 % 1009).cast("double").as("v"))
    val viaCells = Sketches.kllRollup(
      Sketches.kllCells(df, Seq("cell"), "v", k = 4096)
        .withColumn("g", lit(1)), Seq("g"), Seq(0.25, 0.5, 0.75), k = 4096)
      .collect()(0).getSeq[Double](1)
    val direct = df.agg(graft.functions.GraftFunctions.kllQuantiles(
      graft.functions.GraftFunctions.kllSketchAgg(col("v"), 4096),
      Seq(0.25, 0.5, 0.75)).as("qs")).collect()(0).getSeq[Double](0)
    assert(viaCells == direct, s"cells $viaCells vs direct $direct")
  }

  test("kll rank error is bounded past capacity") {
    // k=200 (ε ≈ 1.33%) against 100k uniform values: estimated p50 must
    // land within 8ε of the true rank (compaction is randomized, so the
    // bound is generous rather than flake-prone)
    val df = spark.range(0, 100000).select(col("id").cast("double").as("v"))
    val qs = df.agg(graft.functions.GraftFunctions.kllQuantiles(
      graft.functions.GraftFunctions.kllSketchAgg(col("v"), 200),
      Seq(0.5)).as("qs")).collect()(0).getSeq[Double](0)
    assert(math.abs(qs.head - 50000.0) / 100000.0 < 8 * 0.0133,
      s"p50 estimate ${qs.head} too far from 50000")
  }

  test("kll skips nulls") {
    val df = Seq(Some(1.0), None, Some(3.0), Some(2.0), None)
      .toDF("v").withColumn("g", lit(1))
    val qs = Sketches.kllRollup(
      Sketches.kllCells(df, Seq("g"), "v"), Seq("g"), Seq(0.5))
      .collect()(0).getSeq[Double](1)
    assert(qs == Seq(2.0), s"got $qs")
  }

  test("streaming hll cells merge with batch cells into one rollup") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def ts(day: Int, m: Int) = new Timestamp(1700000000000L + day * 86400000L + m * 60000L)
    // two days of events; a third-day tick past the watermark closes them
    val rows = Seq(
      (ts(0, 1), "a", 1L), (ts(0, 2), "a", 2L), (ts(0, 3), "a", 1L),
      (ts(1, 1), "a", 3L), (ts(1, 2), "a", 4L), (ts(1, 3), "b", 9L),
      (ts(4, 0), "z", 0L))
    val stream = MemoryStream[(Timestamp, String, Long)]
    stream.addData(rows)
    val q = Sketches.hllCellsStreaming(
        stream.toDF().toDF("ts", "g", "u"), "g", "u", watermark = "1 day")
      .writeStream.format("memory").queryName("sketch_cells_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      stream.addData(Seq((ts(6, 0), "z", 0L))) // advance the watermark
      q.processAllAvailable()
      val cells = spark.table("sketch_cells_out")
      // streamed cells are byte-compatible with batch cells: one rollup
      // over the STREAM-written table gives the exact per-group distincts
      val rolled = Sketches.hllRollup(cells.select(col("g"), col("hll")), Seq("g"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rolled("a") == 4, s"got $rolled") // users 1,2,3,4
      assert(rolled("b") == 1, s"got $rolled")
      // and per-cell estimates match the batch producer on the same rows
      val batchCells = Sketches.hllCells(
        rows.toDF("ts", "g", "u").filter(col("g") === "a")
          .select(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
            col("g"), col("u")),
        Seq("day", "g"), "u")
      val streamEst = cells.filter(col("g") === "a")
        .select(col("day"), hll_sketch_estimate(col("hll")).as("e"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val batchEst = batchCells
        .select(col("day"), hll_sketch_estimate(col("hll")).as("e"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamEst == batchEst, s"stream $streamEst vs batch $batchEst")
    } finally q.stop()
  }

  test("frequent items are exact below map capacity") {
    // item i appears i times, i in 1..100: threshold 90 → items 90..100,
    // sorted count desc then item asc
    val df = spark.range(1, 101)
      .select(explode(sequence(lit(1), col("id"))).as("_"), col("id").as("item"))
    val out = df.agg(graft.functions.GraftFunctions
        .freqItemsAgg(col("item"), 256, 90L).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item"), col("h.est"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == (100L to 90L by -1).map(i => (i, i)).toSeq, s"got $out")
  }

  test("frequent items never miss a true heavy hitter past capacity") {
    // 50k distinct tail items (one hit each) vs 5 planted heavy items —
    // map size 128 forces constant purging; NO_FALSE_NEGATIVES must still
    // surface all 5, with counts within the sketch's max error
    val tail = spark.range(1000, 51000).select(col("id").as("item"))
    val heavy = spark.range(0, 5)
      .select(explode(sequence(lit(1), lit(5000))).as("_"), col("id").as("item"))
    val out = tail.select("item").unionAll(heavy.select("item"))
      .agg(graft.functions.GraftFunctions
        .freqItemsAgg(col("item"), 128, 4000L).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.item"), col("h.est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 4L).foreach { i =>
      assert(out.contains(i), s"lost heavy item $i: $out")
      // estimates may land either side of truth (purge subtracts, the
      // reported estimate adds the error offset back), but within ε·N
      assert(math.abs(out(i) - 5000) <= (3.5 * 75000 / 128).toLong,
        s"estimate for $i out of error band: ${out(i)}")
    }
  }

  test("sketch estimates are deterministic across runs") {
    val df = spark.range(0, 50000).toDF("k")
    def once(): Long = df.agg(
      hll_sketch_estimate(hll_sketch_agg(col("k"), 12))).collect()(0).getLong(0)
    assert(once() == once())
  }

  test("kllRollingQuantiles: exact trailing-window order statistics in-regime") {
    def row(day: Int, v: Double) =
      (java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 10:00:00"), v)
    // day 0: {10, 20}; day 2: {30, 40}; window 7 → day 2 sees all four
    val df = Seq(row(0, 10.0), row(0, 20.0), row(2, 30.0), row(2, 40.0))
      .toDF("ts", "value")
    val got = graft.operators.Sketches
      .kllRollingQuantiles(df, "ts", "value", Seq(0.5, 1.0), windowDays = 7, k = 64)
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Double](1), r.getLong(2))).toMap
    assert(got("2024-01-01") == ((Seq(10.0, 20.0), 1L)))
    // inclusive rank: p50 of {10,20,30,40} = 20 (cume_dist 0.5), max = 40
    assert(got("2024-01-03") == ((Seq(20.0, 40.0), 2L)))
  }

  test("hllRollingDistinct merges exactly the trailing cells per observed day") {
    def ts(day: Int, u: Long) =
      (java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 10:00:00"), u)
    // day 0: users {1,2}; day 2: {2,3}; day 9: {9} (gap > window)
    val df = Seq(ts(0, 1L), ts(0, 2L), ts(2, 2L), ts(2, 3L), ts(9, 9L))
      .toDF("ts", "user_id")
    val got = graft.operators.Sketches
      .hllRollingDistinct(df, "ts", "user_id", windowDays = 7)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      "2024-01-01" -> ((2L, 1L)),  // {1,2}, one cell
      "2024-01-03" -> ((3L, 2L)),  // {1,2,3}, days 0+2
      "2024-01-10" -> ((1L, 1L)))) // the gap excludes older cells
  }
}
