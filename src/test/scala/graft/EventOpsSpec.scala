package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventOps

class EventOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sessionize splits on >30min gaps") {
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val df = Seq(
      (1L, ts(0), 10L), (2L, ts(10), 10L), (3L, ts(70), 10L), // 2 sessions for user 10
      (4L, ts(0), 20L)) // 1 session for user 20
      .toDF("event_id", "ts", "user_id")
    val out = EventOps.sessionize(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(10L) == 2L)
    assert(out(20L) == 1L)
  }

  test("asofJoin picks the latest right row at or before each left ts, per key") {
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val left = Seq(
      (100L, 1L, ts(10)),  // after right rows at 0 and 5 → matches 5
      (101L, 1L, ts(5)),   // EXACTLY at right ts 5 → inclusive match
      (102L, 1L, ts(1)),   // only right 0 precedes
      (103L, 2L, ts(50)),  // other key: matches that key's row only
      (104L, 3L, ts(9)))   // key with no right rows → null
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (900L, 1L, ts(0)), (901L, 1L, ts(5)), (902L, 1L, ts(30)), // 30 is AFTER all left
      (903L, 2L, ts(49)))
      .toDF("event_id", "user_id", "ts")
    val out = EventOps.asofJoin(left, right, "user_id", "ts")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(r.fieldIndex("prior_event_id"))))
      .toMap
    assert(out(100L) == Some(901L))
    assert(out(101L) == Some(901L))
    assert(out(102L) == Some(900L))
    assert(out(103L) == Some(903L))
    assert(out(104L) == None)
  }

  test("asofJoinForward picks the earliest right row at or after each left ts, per key") {
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val left = Seq(
      (100L, 1L, ts(10)),  // before right rows at 30 → matches 30
      (101L, 1L, ts(30)),  // EXACTLY at right ts 30 → inclusive match
      (102L, 1L, ts(31)),  // nothing at or after → null
      (103L, 2L, ts(40)),  // other key: matches that key's row only
      (104L, 3L, ts(9)))   // key with no right rows → null
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (900L, 1L, ts(0)),   // BEFORE all left rows — never matched forward
      (901L, 1L, ts(30)),
      (903L, 2L, ts(49)))
      .toDF("event_id", "user_id", "ts")
    val out = EventOps.asofJoinForward(left, right, "user_id", "ts")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(r.fieldIndex("next_event_id"))))
      .toMap
    assert(out(100L) == Some(901L))
    assert(out(101L) == Some(901L))
    assert(out(102L) == None)
    assert(out(103L) == Some(903L))
    assert(out(104L) == None)
  }

  test("funnelCounts requires stage order, not mere presence") {
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "view", ts(0)), (1L, "click", ts(5)), (1L, "purchase", ts(9)),
      // user 2: clicked BEFORE viewing, purchase after — reaches view only
      (2L, "click", ts(0)), (2L, "view", ts(5)), (2L, "purchase", ts(9)),
      // user 3: view then click, no purchase
      (3L, "view", ts(1)), (3L, "click", ts(2)),
      // user 4: purchase at the exact click timestamp (inclusive >=)
      (4L, "view", ts(0)), (4L, "click", ts(3)), (4L, "purchase", ts(3)))
      .toDF("user_id", "event_type", "ts")
    val out = EventOps.funnelCounts(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out == Map("view" -> 4L, "click" -> 3L, "purchase" -> 2L))
  }

  test("funnelCounts with maxLag drops conversions outside the window") {
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val ev = Seq(
      // user 1: click 10 min after view, purchase 10 min after click → counts
      (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(20)),
      // user 2: click 90 min after view → outside the 60-min window; the
      // later purchase is unreachable even though it is in order
      (2L, "view", ts(0)), (2L, "click", ts(90)), (2L, "purchase", ts(95)),
      // user 3: click in-window, purchase 61 min after the click → out
      (3L, "view", ts(0)), (3L, "click", ts(30)), (3L, "purchase", ts(91)))
      .toDF("user_id", "event_type", "ts")
    val bounded = EventOps.funnelCounts(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), maxLagMinutes = Some(60))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(bounded == Map("view" -> 3L, "click" -> 2L, "purchase" -> 1L))
    // the unbounded funnel counts all three conversions
    val open = EventOps.funnelCounts(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(open == Map("view" -> 3L, "click" -> 3L, "purchase" -> 3L))
  }

  test("cohortRetention groups users by first-activity day and counts returns") {
    def day(d: Int, h: Int = 12) = Timestamp.valueOf(f"2024-01-${d}%02d $h%02d:00:00")
    val ev = Seq(
      // user 1: cohort day 1, returns day 2 and day 4 (two events day 2 —
      // must count once)
      (1L, day(1)), (1L, day(2)), (1L, day(2, 18)), (1L, day(4)),
      // user 2: cohort day 1, never returns
      (2L, day(1)),
      // user 3: cohort day 2, returns day 3
      (3L, day(2)), (3L, day(3)))
      .toDF("user_id", "ts")
    val out = EventOps.cohortRetention(ev, "user_id", "ts")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out == Map(
      ("2024-01-01", 0L) -> 2L, ("2024-01-01", 1L) -> 1L, ("2024-01-01", 3L) -> 1L,
      ("2024-01-02", 0L) -> 1L, ("2024-01-02", 1L) -> 1L))
  }

  test("rangeJoinCount counts same-key rows within the window, including bin edges") {
    def tsSec(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    val left = Seq(
      (1L, 10L, tsSec(100)),
      (2L, 10L, tsSec(1000)),  // far from every right row
      (3L, 20L, tsSec(100)))   // other key
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, tsSec(100)),   // Δ=0 for left 1
      (10L, tsSec(160)),   // Δ=60 ≤ 60 → inclusive boundary
      (10L, tsSec(161)),   // Δ=61 → out
      (10L, tsSec(41)),    // Δ=59, crosses a bin boundary below
      (20L, tsSec(90)))    // matches only left 3
      .toDF("user_id", "ts")
    val out = EventOps.rangeJoinCount(left, right, "user_id", "ts", "event_id", 60)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 0L, 3L -> 1L))
  }

  test("streaming hourly agg over MemoryStream matches the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.load(spark, TestSpark.sf, "events")
      .select($"ts", $"event_type", $"value")
    val rows = events.as[(Timestamp, String, Double)].collect().toSeq

    val stream = MemoryStream[(Timestamp, String, Double)]
    stream.addData(rows)
    val sdf = stream.toDF().toDF("ts", "event_type", "value")
    val q = EventOps.hourlyAggStreaming(sdf)
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // append mode only emits closed windows; compare the windows that
      // were emitted against the batch result for the same keys
      val streamed = spark.table("hourly_out")
        .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      val batch = EventOps.hourlyAgg(events)
        .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      assert(streamed.nonEmpty)
      streamed.foreach { case (k, v) => assert(batch(k) == v, s"window $k") }
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization emits closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val stream = MemoryStream[EventOps.Ev]
    stream.addData(Seq(
      EventOps.Ev(10L, ts(0)), EventOps.Ev(10L, ts(10)),
      EventOps.Ev(10L, ts(70)), EventOps.Ev(10L, ts(80)),
      EventOps.Ev(10L, ts(200))))
    val q = EventOps.sessionizeStreaming(stream.toDS())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // the processing-time timeout (which closes idle users' final
      // sessions) keeps the stream scheduling batches, so
      // processAllAvailable never sees a quiescent stream — poll the sink
      val deadline = System.currentTimeMillis() + 60000
      def sessions() = spark.table("sessions_out").collect()
      while (sessions().length < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      // batch 1 closes two sessions (0-10, 70-80); 200 stays open in state
      // until the 30-minute processing-time timeout (not reached here)
      assert(sessions().length == 2)
      assert(sessions().map(_.getInt(3)).sorted.toSeq == Seq(2, 2))
    } finally q.stop()
  }

  test("stream-static interval enrichment stamps each event with its containing status") {
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    // static SCD2 history for user 1: status a [0, 30), status b [30, open)
    val changelog = Seq(
      (1L, ts(0), "a", 1L), (1L, ts(30), "b", 2L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val intervals = EventOps.statusIntervals(
      changelog, "user_id", "event_type", "ts", "event_id")
    val stream = MemoryStream[EventOps.TypedEv]
    stream.addData(Seq(
      EventOps.TypedEv(1L, ts(10), "x"),  // inside [0,30) → a
      EventOps.TypedEv(1L, ts(30), "y"),  // exactly at the boundary → b
      EventOps.TypedEv(1L, ts(99), "z"),  // open interval → b
      EventOps.TypedEv(2L, ts(5), "q"))) // no history → NULL
    val q = EventOps.enrichWithIntervalsStreaming(
        stream.toDF(), intervals, "user_id", "ts")
      .select(col("event_type"), col("status"))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("enrich_out").collect()
        .map(r => r.getString(0) -> Option(r.getString(1))).toMap
      assert(got == Map(
        "x" -> Some("a"), "y" -> Some("b"), "z" -> Some("b"), "q" -> None))
    } finally q.stop()
  }

  test("streaming funnel emits conversions in-window, resets on expiry, allows repeats") {
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val stream = MemoryStream[EventOps.TypedEv]
    stream.addData(Seq(
      // user 1: clean in-window conversion (10 + 10 min hops)
      EventOps.TypedEv(1L, ts(0), "view"),
      EventOps.TypedEv(1L, ts(10), "click"),
      EventOps.TypedEv(1L, ts(20), "purchase"),
      // user 2: click 90 min after view — window expired, no conversion;
      // then a full in-window run that MUST convert (reset works)
      EventOps.TypedEv(2L, ts(0), "view"),
      EventOps.TypedEv(2L, ts(90), "click"),
      EventOps.TypedEv(2L, ts(100), "view"),
      EventOps.TypedEv(2L, ts(110), "click"),
      EventOps.TypedEv(2L, ts(120), "purchase"),
      // user 1 again: repeat conversion counts again
      EventOps.TypedEv(1L, ts(200), "view"),
      EventOps.TypedEv(1L, ts(210), "click"),
      EventOps.TypedEv(1L, ts(215), "purchase")))
    val q = EventOps.funnelStreaming(
        stream.toDS(), Seq("view", "click", "purchase"), maxLagMinutes = 60)
      .writeStream.format("memory").queryName("funnel_stream_out")
      .outputMode("append").start()
    try {
      // the processing-time timeout keeps scheduling batches, so
      // processAllAvailable never sees a quiescent stream — poll the sink
      // (the sessionizeStreaming test's lesson)
      val deadline = System.currentTimeMillis() + 60000
      def rowsNow() = spark.table("funnel_stream_out").collect()
      while (rowsNow().length < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val rows = rowsNow().map(r => (r.getLong(0), r.getLong(3)))
      assert(rows.length == 3, s"three conversions: ${rows.mkString(",")}")
      assert(rows.count(_._1 == 1L) == 2, "user 1 converts twice")
      val u2 = rows.filter(_._1 == 2L).toSeq
      assert(u2 == Seq((2L, 20L * 60000L)),
        s"user 2's conversion anchors at the SECOND view: $u2")
    } finally q.stop()
  }

  test("rollingDailyCounts averages over present days only, per type") {
    def day(d: Int, i: Long) =
      new Timestamp(1700000000000L + d * 86400000L + i * 1000L)
    // type a: days 0,1,3 (day 2 absent — must be SKIPPED, not zero-filled)
    // with counts 2,4,6; type b: one day, count 1
    val rows =
      (0L until 2L).map(i => (day(0, i), "a")) ++
        (0L until 4L).map(i => (day(1, i), "a")) ++
        (0L until 6L).map(i => (day(3, i), "a")) ++
        Seq((day(0, 0L), "b"))
    val df = rows.zipWithIndex.map { case ((t, ty), id) => (id.toLong, t, ty) }
      .toDF("event_id", "ts", "event_type")
    val got = EventOps.rollingDailyCounts(df, windowDays = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1).takeRight(2), r.getLong(2), r.getDouble(3)))
      .toSet
    // window 2: avg(self, previous PRESENT day) — day 3 pairs with day 1
    assert(got == Set(
      ("a", "14", 2L, 2.0), ("a", "15", 4L, 3.0), ("a", "17", 6L, 5.0),
      ("b", "14", 1L, 1.0)))
    intercept[IllegalArgumentException](EventOps.rollingDailyCounts(df, 0))
  }

  test("madScale: robust to an outlier that wrecks stddev") {
    def ts(i: Long) = new Timestamp(1700000000000L + i * 1000L)
    // values 1..9 plus outlier 1000: median 5.5, deviations |v-5.5| have
    // median 2.5 (outlier contributes one huge deviation, MAD unmoved)
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).zipWithIndex
      .map { case (v, i) => (i.toLong, ts(i), "a", v) }
      .toDF("event_id", "ts", "event_type", "value")
    val r = EventOps.madScale(df).collect()(0)
    assert((r.getLong(1), r.getDouble(2), r.getDouble(3)) == ((10L, 5.5, 2.5)))
  }

  test("calendarHourly zero-fills missing cells across the full span") {
    def ts(h: Long) = new Timestamp(1700000000000L / 3600000L * 3600000L + h * 3600000L)
    // type a active hours 0 and 2 (hour 1 missing); type b only hour 1 —
    // spine is hours 0..2 × both types = 6 cells, three of them zero
    val df = Seq((1L, ts(0), "a"), (2L, ts(2), "a"), (3L, ts(1), "b"))
      .toDF("event_id", "ts", "event_type")
    val got = EventOps.calendarHourly(df).collect()
      .map(r => (r.getString(0), r.getString(1).takeRight(8), r.getLong(2))).toSet
    val hrs = (0 to 2).map(h =>
      new java.text.SimpleDateFormat("HH:mm:ss").format(ts(h)))
    assert(got == Set(
      ("a", hrs(0), 1L), ("a", hrs(1), 0L), ("a", hrs(2), 1L),
      ("b", hrs(0), 0L), ("b", hrs(1), 1L), ("b", hrs(2), 0L)))
  }

  test("autocorrelation: alternating series oscillates, constant series is NULL") {
    def ts(h: Long) = new Timestamp(1700000000000L / 3600000L * 3600000L + h * 3600000L)
    // type a: hourly counts 1,2,1,2,1,2 → acf(1) = -1, acf(2) = +1,
    // acf(3) = -1; type c: one event every hour → zero variance → NULL
    val aRows = (0 to 5).flatMap(h => (0 until (1 + h % 2)).map(_ => (ts(h), "a")))
    val cRows = (0 to 5).map(h => (ts(h), "c"))
    val df = (aRows ++ cRows).zipWithIndex
      .map { case ((t0, ty), i) => (i.toLong, t0, ty) }
      .toDF("event_id", "ts", "event_type")
    val got = EventOps.autocorrelation(df, maxLag = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double])))).toMap
    assert(got(("a", 1L)) == ((5L, Some(-1.0))))
    assert(got(("a", 2L)) == ((4L, Some(1.0))))
    assert(got(("a", 3L)) == ((3L, Some(-1.0))))
    (1L to 3L).foreach(k => assert(got(("c", k))._2.isEmpty))
    intercept[IllegalArgumentException](EventOps.autocorrelation(df, maxLag = 0))
  }

  test("typeTransitions counts per-user steps and row-normalizes") {
    def ts(i: Long) = new Timestamp(1700000000000L + i * 1000L)
    // user 1: a,b,a,b → a→b ×2, b→a ×1; user 2: lone event (no pairs);
    // user 3: a,c → a→c ×1. Row a: p(b)=2/3, p(c)=1/3; row b: p(a)=1
    val df = Seq(
      (1L, ts(0), 1L, "a"), (2L, ts(1), 1L, "b"),
      (3L, ts(2), 1L, "a"), (4L, ts(3), 1L, "b"),
      (5L, ts(0), 2L, "a"),
      (6L, ts(0), 3L, "a"), (7L, ts(1), 3L, "c"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventOps.typeTransitions(df).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == Map(
      ("a", "b") -> ((2L, 0.666667)),
      ("a", "c") -> ((1L, 0.333333)),
      ("b", "a") -> ((1L, 1.0))))
  }

  test("fillForward carries the last observation, leaves leading nulls") {
    def ts(i: Long) = new Timestamp(1700000000000L + i * 1000L)
    val df = Seq(
      (1L, 1L, None, ts(0)), (2L, 1L, Some(5.0), ts(1)),
      (3L, 1L, None, ts(2)), (4L, 1L, Some(7.0), ts(3)), (5L, 1L, None, ts(4)),
      (6L, 2L, None, ts(0))
    ).toDF("event_id", "user_id", "v", "ts")
    val got = EventOps.fillForward(df, "user_id", "v", "ts", "event_id")
      .collect()
      .map(r => r.getLong(1) -> ((Option(r.get(3)).map(_.asInstanceOf[Double]),
        r.getBoolean(4))))
      .toMap
    assert(got == Map(
      1L -> ((None, true)), 2L -> ((Some(5.0), false)), 3L -> ((Some(5.0), true)),
      4L -> ((Some(7.0), false)), 5L -> ((Some(7.0), true)), 6L -> ((None, true))))
  }

  test("equiDepthHistogram buckets between its own quartiles") {
    def ts(i: Long) = new Timestamp(1700000000000L + i * 1000L)
    // values 1..8: q1=2.75, q2=4.5, q3=6.25 → exactly 2 per bucket
    val df = (1 to 8).map(i => (i.toLong, ts(i), "a", i.toDouble))
      .toDF("event_id", "ts", "event_type", "value")
    val got = EventOps.equiDepthHistogram(df).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("winsorizeValues clips at the rounded percentile band") {
    def ts(i: Long) = new Timestamp(1700000000000L + i * 1000L)
    // values 1..10: p05 = 1.45, p95 = 9.55 (linear interpolation at
    // 0.05·9 / 0.95·9) → one clip each side, clipped mean exactly 5.5
    val df = (1 to 10).map(i => (i.toLong, ts(i), "a", i.toDouble))
      .toDF("event_id", "ts", "event_type", "value")
    val got = EventOps.winsorizeValues(df).collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)) ==
      ((10L, 1L, 1L, 5.5)))
    intercept[IllegalArgumentException](EventOps.winsorizeValues(df, 0.9, 0.1))
  }

  test("dailyTrend regresses daily means, drops one-day types") {
    def ts(d: Int, i: Long) =
      Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:${i}%02.0f")
    val df = Seq(
      (1L, ts(0, 0), "a", 1.0), (2L, ts(0, 1), "a", 3.0), // day 0 mean 2
      (3L, ts(1, 0), "a", 4.0), // day 1 mean 4
      (4L, ts(2, 0), "a", 6.0), // day 2 mean 6 → slope 2
      (5L, ts(0, 0), "b", 9.0) // single day → dropped
    ).toDF("event_id", "ts", "event_type", "value")
    val got = EventOps.dailyTrend(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set(("a", 3L, 2.0)))
  }

  test("statusIntervals collapses runs and leaves the last interval open") {
    def ts(i: Long) = new Timestamp(1700000000000L + i * 60000L)
    // user 1: A A B A — runs collapse to A[0,2) B[2,3) A[3,∞);
    // user 2: single X stays open; same-ts rows order by event_id
    val df = Seq(
      (1L, 1L, "A", ts(0)), (2L, 1L, "A", ts(1)), (3L, 1L, "B", ts(2)),
      (4L, 1L, "A", ts(3)), (5L, 2L, "X", ts(0))
    ).toDF("event_id", "user_id", "status", "ts")
    val got = EventOps.statusIntervals(df, "user_id", "status", "ts", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2).getTime, Option(r.getTimestamp(3)).map(_.getTime)))
      .toSet
    def t0(i: Long) = 1700000000000L + i * 60000L
    assert(got == Set(
      (1L, "A", t0(0), Some(t0(2))),
      (1L, "B", t0(2), Some(t0(3))),
      (1L, "A", t0(3), None),
      (2L, "X", t0(0), None)))
  }

  test("statusIntervals: null statuses open, close and collapse like values") {
    def ts(i: Long) = new Timestamp(1700000000000L + i * 60000L)
    val df = Seq(
      (1L, 1L, None, ts(0)), (2L, 1L, None, ts(1)), (3L, 1L, Some("A"), ts(2))
    ).toDF("event_id", "user_id", "status", "ts")
    val got = EventOps.statusIntervals(df, "user_id", "status", "ts", "event_id")
      .collect()
      .map(r => (Option(r.getString(1)), Option(r.getTimestamp(3)).map(_.getTime)))
      .toSet
    assert(got == Set(
      (None, Some(1700000000000L + 2 * 60000L)), (Some("A"), None)))
  }

  test("anomalousHours flags the burst hour and only it") {
    def ts(hour: Long, i: Long) = new Timestamp(1700000000000L + hour * 3600000L + i * 1000L)
    // 9 calm hours at 2 events, one 40-event burst: mean 5.8, sd 11.4,
    // z(burst) = 34.2/11.4 = exactly 3.0 — also pins the INCLUSIVE
    // threshold boundary
    val rows = (0L until 9L).flatMap(h => Seq((h, 0L), (h, 1L))) ++
      (0L until 40L).map(i => (9L, i))
    val df = rows.zipWithIndex.map { case ((h, i), id) =>
      (id.toLong, ts(h, i), "click") }.toDF("event_id", "ts", "event_type")
    val out = EventOps.anomalousHours(df).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("n") == 40L)
    assert(out(0).getAs[Double]("z") == 3.0)
  }

  test("stream-stream attribution joins purchases to in-window clicks only") {
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    // user 1: clicks at t0 and t50, purchase at t60 → both attribute
    // (window 60 min, inclusive); user 2: click at t0, purchase at t90 →
    // out of window; user 3: purchase with no click at all
    clicks.addData(Seq((10L, ts(0), 1L), (11L, ts(50), 1L), (20L, ts(0), 2L)))
    purchases.addData(Seq((100L, ts(60), 1L), (200L, ts(90), 2L), (300L, ts(30), 3L)))
    val q = EventOps.attributionStreaming(
        clicks.toDF().toDF("event_id", "ts", "user_id"),
        purchases.toDF().toDF("event_id", "ts", "user_id"))
      .writeStream.format("memory").queryName("attr_stream_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("attr_stream_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((1L, 100L, 10L), (1L, 100L, 11L)))
    } finally q.stop()
  }

  test("streaming anomaly twin flags the burst window against precomputed stats") {
    implicit val sqlCtx = spark.sqlContext
    def ts(hour: Long, i: Long) = new Timestamp(1700000000000L + hour * 3600000L + i * 1000L)
    // history: calm hours at ~2 events → mean 2, sd small; stats built with
    // the SAME helper the batch detector uses
    val hist = (0L until 8L).flatMap(h => Seq((h, 0L), (h, 1L))) ++ Seq((3L, 2L))
    val histDf = hist.zipWithIndex.map { case ((h, i), id) =>
      (id.toLong, ts(h, i), "click") }.toDF("event_id", "ts", "event_type")
    val hourly = histDf.groupBy(
        date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val stats = EventOps.hourlyTypeStats(hourly)
    // stream: one calm hour (2 events), one 30-event burst, then a late
    // event 3 hours on that advances the watermark past both windows
    val stream = MemoryStream[(Long, Timestamp, String)]
    stream.addData(
      Seq((1000L, ts(20, 0), "click"), (1001L, ts(20, 1), "click")) ++
        (0L until 30L).map(i => (1100L + i, ts(21, i), "click")) ++
        Seq((2000L, ts(24, 0), "click")))
    val q = EventOps.anomalousHoursStreaming(
        stream.toDF().toDF("event_id", "ts", "event_type"), stats)
      .writeStream.format("memory").queryName("anomaly_stream_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // second batch so the advanced watermark closes the earlier windows
      stream.addData(Seq((2001L, ts(25, 0), "click")))
      q.processAllAvailable()
      val rows = spark.table("anomaly_stream_out").collect()
      assert(rows.length == 1, s"only the burst window flags: ${rows.mkString(",")}")
      assert(rows(0).getAs[Long]("n") == 30L)
      assert(math.abs(rows(0).getAs[Double]("z")) >= 3.0)
    } finally q.stop()
  }

  test("interpolateLinear fills gaps linearly, leaves edges null") {
    def ts(h: Long) = new Timestamp(1704067200000L + h * 3600000L) // 2024-01-01 00:00 UTC
    // type a: hours 0, 3 observed (10.0, 40.0) → hours 1,2 interpolate 20, 30
    // type b: hour 1 only → its hour-0 and hour-2..3 cells stay null
    val df = Seq(
      (1L, ts(0), "a", 10.0), (2L, ts(3), "a", 40.0),
      (3L, ts(1), "b", 7.0))
      .toDF("event_id", "ts", "event_type", "value")
    val out = EventOps.interpolateLinear(df).collect()
      .map(r => (r.getString(0), r.getString(1).substring(11, 13)) ->
        (Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3))).toMap
    assert(out.size == 8, "2 types x 4 spine hours")
    assert(out(("a", "00")) == ((Some(10.0), false)))
    assert(out(("a", "01")) == ((Some(20.0), true)))
    assert(out(("a", "02")) == ((Some(30.0), true)))
    assert(out(("a", "03")) == ((Some(40.0), false)))
    assert(out(("b", "01")) == ((Some(7.0), false)))
    assert(out(("b", "00"))._1.isEmpty && out(("b", "02"))._1.isEmpty &&
      out(("b", "03"))._1.isEmpty, "no extrapolation past the anchors")
  }

  test("interpolateLinear half-gap midpoint is exact (no float-tie drift)") {
    def ts(h: Long) = new Timestamp(1704067200000L + h * 3600000L) // 2024-01-01 00:00 UTC
    // anchors 29.3067 and 80.0150 → midpoint 54.66085 must half-up to
    // 54.6609 via the integer path (the double-rounding tie that split
    // engines before the integer rewrite)
    val df = Seq(
      (1L, ts(0), "a", 29.3067), (2L, ts(2), "a", 80.015))
      .toDF("event_id", "ts", "event_type", "value")
    val mid = EventOps.interpolateLinear(df).collect()
      .find(r => r.getString(1).endsWith("01:00:00")).get
    // value*100 cents: 2930.67 rounds to 2931 → anchor 29.31; 8001.5 → 8002
    // → 80.02; midpoint (293100+800200+2)/2 DIV 2 = 546650 → 54.665
    assert(mid.getDouble(2) == 54.665)
    assert(mid.getBoolean(3))
  }

  test("silenceGaps merges consecutive silent hours into maximal intervals") {
    def ts(h: Long) = new Timestamp(1704067200000L + h * 3600000L) // 2024-01-01 00:00 UTC
    // type a: events at hours 0, 3, 4, 7 → gaps [1..2] and [5..6]
    // type b: events at 0 and 7 only → one gap [1..6]
    val df = (Seq(0L, 3L, 4L, 7L).map(h => (h, ts(h), "a", 1.0)) ++
      Seq(0L, 7L).map(h => (100L + h, ts(h), "b", 1.0)))
      .toDF("event_id", "ts", "event_type", "value")
    val out = EventOps.silenceGaps(df).collect()
      .map(r => (r.getString(0), r.getString(1).substring(11, 13),
        r.getString(2).substring(11, 13), r.getLong(3))).toSet
    assert(out == Set(
      ("a", "01", "02", 2L), ("a", "05", "06", 2L), ("b", "01", "06", 6L)),
      s"got $out")
  }

  test("cusumChangepoint pins the level shift at its first shifted hour") {
    def ts(h: Long) = new Timestamp(1704067200000L + h * 3600000L) // 2024-01-01 00:00 UTC
    // 6 hours at 10, then 6 hours at 50: |cusum| peaks at the LAST low
    // hour (h=5); score = 6*20/12... verify position, magnitude > 0
    val rows = (0 until 6).map(h => (h.toLong, ts(h), "a", 10.0)) ++
      (6 until 12).map(h => (h.toLong, ts(h), "a", 50.0))
    val out = EventOps.cusumChangepoint(rows.toDF("event_id", "ts", "event_type", "value"))
      .collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(1) == 12L)
    assert(r.getString(2).endsWith("05:00:00"),
      s"peak |cusum| at the last pre-shift hour, got ${r.getString(2)}")
    // mean=30, cusum at h5 = 6*(10-30) = -120 → score 120.0
    assert(r.getDouble(3) == 120.0)
  }

  test("topEventPaths counts ordered length-3 sequences per user") {
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    // user 1: a b c d → paths a>b>c, b>c>d; user 2: a b c → a>b>c
    val df = Seq(
      (1L, ts(0), 1L, "a"), (2L, ts(1), 1L, "b"), (3L, ts(2), 1L, "c"),
      (4L, ts(3), 1L, "d"),
      (5L, ts(0), 2L, "a"), (6L, ts(1), 2L, "b"), (7L, ts(2), 2L, "c"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = EventOps.topEventPaths(df, k = 10).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(out.toSeq == Seq("a>b>c" -> 2L, "b>c>d" -> 1L),
      s"ranked n desc then path asc: ${out.mkString(",")}")
  }

  test("trendForecast projects the fitted line past the last observed day") {
    def ts(day: Long) = new Timestamp(1704067200000L + day * 86400000L) // 2024-01-01 UTC
    // type a: exact line value = day + 1 → slope 1, intercept 1,
    // forecasts for days 3/4/5 are 4/5/6; type b: single day → dropped
    val df = Seq(
      (1L, ts(0), 1L, "a", 1.0), (2L, ts(1), 1L, "a", 2.0),
      (3L, ts(2), 1L, "a", 3.0),
      (4L, ts(0), 1L, "b", 9.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.trendForecast(df, horizonDays = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == Map(
      ("a", 1L) -> 4.0, ("a", 2L) -> 5.0, ("a", 3L) -> 6.0), s"got $got")
    intercept[IllegalArgumentException](EventOps.trendForecast(df, horizonDays = 0))
  }

  test("dedupeEvents collapses same-minute replays and reports the replay fraction") {
    def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)
    val df = Seq(
      // user 1 click: 3 deliveries inside one minute + 1 in the next
      (1L, ts(0), 1L, "click", 0.0), (2L, ts(10), 1L, "click", 0.0),
      (3L, ts(59), 1L, "click", 0.0), (4L, ts(61), 1L, "click", 0.0),
      // different users never collapse
      (5L, ts(0), 2L, "click", 0.0),
      // view: clean single delivery
      (6L, ts(0), 1L, "view", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.dedupeEvents(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got("click") == ((5L, 3L, 0.4)), s"got ${got("click")}")
    assert(got("view") == ((1L, 1L, 0.0)))
  }

  test("streaming OHLC over MemoryStream matches the batch bars") {
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.load(spark, TestSpark.sf, "events")
      .select($"event_id", $"ts", $"event_type", $"value")
    val rows = events.as[(Long, Timestamp, String, Double)].collect().toSeq
    val stream = MemoryStream[(Long, Timestamp, String, Double)]
    stream.addData(rows)
    val sdf = stream.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = EventOps.ohlcStreaming(sdf)
      .writeStream.format("memory").queryName("ohlc_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ohlc_out").collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
        .toMap
      val batch = EventOps.ohlcDownsample(events).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
        .toMap
      assert(streamed.nonEmpty)
      streamed.foreach { case (k, v) => assert(batch(k) == v, s"bar $k") }
    } finally q.stop()
  }

  test("lastTouchAttribution credits the most recent prior touch, inclusive at equal ts") {
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val df = Seq(
      // user 1: click then purchase; later a view AT the purchase ts
      (1L, ts(0), 1L, "click", 0.0), (2L, ts(10), 1L, "purchase", 5.0),
      (3L, ts(20), 1L, "view", 0.0), (4L, ts(20), 1L, "purchase", 3.0),
      // user 2: purchase with no touch → direct
      (5L, ts(5), 2L, "purchase", 2.0),
      // user 3: click then signup then purchase → signup (most recent)
      (6L, ts(0), 3L, "click", 0.0), (7L, ts(1), 3L, "signup", 0.0),
      (8L, ts(2), 3L, "purchase", 1.0),
      // errors never count as touches
      (9L, ts(1), 2L, "error", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = EventOps.lastTouchAttribution(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == Map(
      "click" -> ((1L, 5.0)),
      "view" -> ((1L, 3.0)),
      "signup" -> ((1L, 1.0)),
      "direct" -> ((1L, 2.0))), s"got $got")
  }

  test("ohlcDownsample picks first/last by (ts, event_id) within each hour bar") {
    // hour-ALIGNED base so minutes 0..59 land in one bar
    def ts(min: Long) = new Timestamp(1699999200000L + min * 60000L)
    // hour 0 for type a: open at min 1 (value 5), close decided by the
    // event_id tie-break between the two rows at min 50 (higher id wins)
    val df = Seq(
      (3L, ts(1), "a", 5.0), (1L, ts(20), "a", 9.0),
      (4L, ts(50), "a", 2.0), (5L, ts(50), "a", 7.0),
      (6L, ts(61), "a", 3.0), // next hour, own bar
      (7L, ts(5), "b", 1.0))  // other type, own bar
      .toDF("event_id", "ts", "event_type", "value")
    val out = EventOps.ohlcDownsample(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6)))
      .toMap
    assert(out.size == 3)
    val hourA = out.keys.filter(_._2 == "a").minBy(_._1)
    assert(out(hourA) == (5.0, 9.0, 2.0, 7.0, 4L),
      s"open=first by ts, close=ts tie broken by event_id: ${out(hourA)}")
    val hourA2 = out.keys.filter(_._2 == "a").maxBy(_._1)
    assert(out(hourA2) == (3.0, 3.0, 3.0, 3.0, 1L))
    assert(out.find(_._1._2 == "b").get._2 == (1.0, 1.0, 1.0, 1.0, 1L))
  }

  test("rfmSegments grades each axis 1-4 against population quartiles") {
    def ts(day: Long) = new Timestamp(1700000000000L + day * 86400000L)
    // 4 users; user 4 is best on every axis (most recent, most events,
    // most value), user 1 worst on every axis
    val rows =
      Seq((1L, ts(0), 1L, 1.0)) ++
      (0 until 2).map(i => (10L + i, ts(2), 2L, 2.0)) ++
      (0 until 3).map(i => (20L + i, ts(4), 3L, 3.0)) ++
      (0 until 4).map(i => (30L + i, ts(6), 4L, 4.0))
    val out = EventOps.rfmSegments(
        rows.toDF("event_id", "ts", "user_id", "value"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
         r.getInt(4), r.getInt(5), r.getInt(6)))
      .toMap
    assert(out(1L) == ((6L, 1L, 1.0, 1, 1, 1)))
    assert(out(4L) == ((0L, 4L, 16.0, 4, 4, 4)))
    // middle users: strictly between on every score axis
    val (_, _, _, r2, f2, m2) = out(2L)
    val (_, _, _, r3, f3, m3) = out(3L)
    assert(r2 < r3 && f2 < f3 && m2 < m3,
      s"scores must be monotone in the underlying metric: ${out(2L)} vs ${out(3L)}")
  }

  test("survivalCurve computes the Kaplan-Meier estimator with right censoring") {
    def ts(day: Long) = new Timestamp(1700000000000L + day * 86400000L)
    // anchor = day 20 (user 4's last). censorDays=7:
    //   u1: t=0  churned   u2: t=10 churned
    //   u3: t=13 censored (last=day18, 2 days before anchor)
    //   u4: t=20 censored (defines the anchor)
    // KM: S(0)=3/4, S(10)=3/4 * 2/3 = 1/2, flat afterwards
    val df = Seq(
      (1L, ts(0), 1L, 0.0),
      (2L, ts(0), 2L, 0.0), (3L, ts(10), 2L, 0.0),
      (4L, ts(5), 3L, 0.0), (5L, ts(18), 3L, 0.0),
      (6L, ts(0), 4L, 0.0), (7L, ts(20), 4L, 0.0))
      .toDF("event_id", "ts", "user_id", "value")
    val out = EventOps.survivalCurve(df, censorDays = 7).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(out.keySet == Set(0L, 10L, 13L, 20L))
    assert(out(0L) == ((1L, 0L, 4L, 0.75)))
    assert(out(10L) == ((1L, 0L, 3L, 0.5)))
    assert(out(13L) == ((0L, 1L, 2L, 0.5)))
    assert(out(20L) == ((0L, 1L, 1L, 0.5)))
  }

  test("timeWeightedAverage weights each value by its holding duration") {
    def ts(min: Long) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    val df = Seq(
      // value 10 held 10 min, value 20 held 30 min, final 99 carries no dur:
      // twap = (10*10 + 20*30) / 40 = 17.5 — arithmetic mean would say 43
      (1L, ts(0), "a", 10.0), (2L, ts(10), "a", 20.0), (3L, ts(40), "a", 99.0),
      // single event on the series → no interval → no row
      (4L, ts(0), "b", 7.0))
      .toDF("event_id", "ts", "event_type", "value")
    val out = EventOps.timeWeightedAverage(df).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map("a" -> ((2L, 17.5))))
  }

  test("longestStreaks: gaps split islands, repeats within a day collapse") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 09:00:00")
    val df = Seq(
      // u1: days 0,1,2 then 5,6 → longest 3, active 5 (day 1 has 2 events)
      (1L, ts(0), 1L), (2L, ts(1), 1L), (3L, ts(1), 1L), (4L, ts(2), 1L),
      (5L, ts(5), 1L), (6L, ts(6), 1L),
      // u2: single day
      (7L, ts(3), 2L))
      .toDF("event_id", "ts", "user_id")
    val got = EventOps.longestStreaks(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> ((3L, 5L)), 2L -> ((1L, 1L))))
  }

  test("changeVolatility: exact moments of the day-over-day differences") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")
    // daily means 10, 20, 40 → changes {10, 20}: mean 15, stddev √50
    val df = Seq((1L, ts(0), "a", 10.0), (2L, ts(1), "a", 20.0), (3L, ts(2), "a", 40.0))
      .toDF("event_id", "ts", "event_type", "value")
    val r = EventOps.changeVolatility(df).collect().head
    assert(r.getLong(1) == 2L && r.getDouble(2) == 15.0)
    assert(math.abs(r.getDouble(3) - BigDecimal(math.sqrt(50))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("sessionStats: durations and sizes per gap-split session") {
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val df = Seq(
      // u1: session A = events at 0, 10 (600 s, 2 events); session B = 70 (0 s)
      (1L, ts(0), 1L), (2L, ts(10), 1L), (3L, ts(70), 1L),
      // u2: one session, 0..20 (1200 s, 3 events)
      (4L, ts(0), 2L), (5L, ts(5), 2L), (6L, ts(20), 2L))
      .toDF("event_id", "ts", "user_id")
    val r = EventOps.sessionStats(df).collect().head
    assert(r.getLong(0) == 3L)                       // three sessions
    assert(r.getDouble(1) == 2.0)                    // mean events (2+1+3)/3
    assert(r.getDouble(2) == 600.0)                  // mean dur (600+0+1200)/3
    assert(r.getDouble(3) == 600.0)                  // p50 of {0,600,1200}
  }

  test("maxDrawdown finds the deepest peak-to-trough drop, not max-minus-min") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")
    // series: 10, 50, 20, 40, 5 → drawdown peaks at 50−5 = 45;
    // naive max−min = 50−5 happens to agree, so add a series where the
    // min PRECEDES the max: 5, 50, 40 → drawdown 10, max−min would say 45
    val df = Seq(
      (1L, ts(0), "a", 10.0), (2L, ts(1), "a", 50.0), (3L, ts(2), "a", 20.0),
      (4L, ts(3), "a", 40.0), (5L, ts(4), "a", 5.0),
      (6L, ts(0), "b", 5.0), (7L, ts(1), "b", 50.0), (8L, ts(2), "b", 40.0))
      .toDF("event_id", "ts", "event_type", "value")
    val got = EventOps.maxDrawdown(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == Map("a" -> ((5L, 45.0)), "b" -> ((3L, 10.0))))
  }

  test("ewmaLevel: closed form equals the recursive adjust=true EWM") {
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00")
    // series a: days 0,1,2 with means 10, 20, 40 (α=0.3):
    // level = (0.49*10 + 0.7*20 + 1*40) / (0.49 + 0.7 + 1) = 58.9/2.19
    val df = Seq(
      (1L, ts(0), "a", 10.0), (2L, ts(1), "a", 20.0), (3L, ts(2), "a", 40.0),
      (4L, ts(0), "b", 5.0)) // single day → level = that mean
      .toDF("event_id", "ts", "event_type", "value")
    val got = EventOps.ewmaLevel(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val expA = BigDecimal(58.9 / 2.19)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("a") == ((3L, expA)))
    assert(got("b") == ((1L, 5.0)))
  }

  test("timeToConvert measures earliest-qualifying hop delays, exact percentiles") {
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val df = Seq(
      // u1: view@0 → click@10 (600 s), click@10 → buy@70 (3600 s)
      (1L, ts(0), 1L, "view"), (2L, ts(10), 1L, "click"), (3L, ts(70), 1L, "buy"),
      // u2: view@0 → click@20 (1200 s); no buy
      (4L, ts(0), 2L, "view"), (5L, ts(20), 2L, "click"),
      // u3: click before any view — click must NOT qualify
      (6L, ts(5), 3L, "click"), (7L, ts(8), 3L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = EventOps.timeToConvert(df, "user_id", "ts", "event_type",
        Seq("view", "click", "buy"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out(1L) == ((2L, 900.0, 1140.0))) // median of {600,1200}, p90 interp
    assert(out(2L) == ((1L, 3600.0, 3600.0)))
  }
}
