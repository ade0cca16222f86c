package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream operators. The aggregations are defined once over a
  * DataFrame, so the same code runs in batch (for the oracle-checked
  * queries) and under Structured Streaming `readStream` with a watermark
  * (exercised in tests with the parquet file source). */
object EventOps {

  /** Tumbling-hour aggregate per event type. Batch form groups on
    * date_trunc; the streaming form below uses window() + watermark — same
    * results on aligned hourly windows. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events.groupBy(
        date_trunc("hour", col("ts")).as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** Streaming variant: event-time window + watermark for late data. */
  def hourlyAggStreaming(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))

  /** Trailing `windowDays`-day moving average of DAILY event counts per
    * type — the ops-dashboard smoothing query. The window frame is ROWS
    * (not RANGE): each day row averages itself plus up to windowDays−1
    * PRESENT preceding day rows, so a day with zero events is skipped, not
    * zero-filled — the semantics of a moving average over an observation
    * series. Early rows average over their shorter prefix.
    *
    * 100 TB shape: the raw stream is reduced FIRST by one partial/final
    * aggregation to (type, day) — the only corpus-sized exchange — and the
    * window runs over that ~(#types × #days)-row table, where partitioning
    * by type is a handful of rows per task, not a per-type funnel of raw
    * events. The same discipline as [[hourlyTypeStats]]: never a window
    * over the raw stream.
    *
    * Returns (event_type, day, n, avg_n) with avg_n rounded to 4 dp. */
  def rollingDailyCounts(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val daily = events.groupBy(
        col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-(windowDays - 1L), Window.currentRow)
    daily.select(col("event_type"), col("day"), col("n"),
      round(avg(col("n")).over(w), 4).as("avg_n"))
  }

  /** Median absolute deviation per type — the robust scale estimate that
    * survives the outliers which wreck stddev (MAD breaks down at 50%
    * contamination, stddev at one bad row). Median rounded to 4 dp BEFORE
    * the deviation pass so both engines subtract the identical pivot;
    * deviations then hit a second exact-percentile aggregation.
    *
    * 100 TB shape: two grouped percentile passes with the #types-row
    * median table joined back unhinted in between — the same
    * exact-at-type-cardinality / KLL-cells-past-it contract as
    * [[winsorizeValues]]. Returns (event_type, n, med, mad). */
  def madScale(events: DataFrame): DataFrame = {
    val med = events.groupBy(col("event_type").as("__m_type"))
      .agg(round(expr("percentile(value, 0.5)"), 4).as("med"))
    events.join(med, col("event_type") <=> col("__m_type"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        min(col("med")).as("med"), // constant within the group
        round(expr("percentile(abs(value - med), 0.5)"), 4).as("mad"))
  }

  /** Dense hourly calendar: every (type, hour) cell across the corpus
    * span, ZERO-FILLED where no events landed — the complement of
    * [[rollingDailyCounts]]'s present-rows-only semantics, and what a
    * downstream forecaster actually wants (gaps are data, not absence of
    * rows). The spine is generated, never scanned.
    *
    * 100 TB shape: the raw stream reduces to hourly cells first (the one
    * corpus-sized exchange); the spine (hours × types) is a generated
    * few-thousand-row relation cross-joined broadcast-small and
    * left-joined against the cells. Returns (event_type, hour, n). */
  def calendarHourly(events: DataFrame): DataFrame =
    denseHourly(events).select(
      col("event_type"),
      date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hour"),
      col("n"))

  /** Shared dense (type, hr, n) series behind [[calendarHourly]] and
    * [[autocorrelation]]: hourly cells left-joined onto the generated
    * min..max hour spine × distinct types, zeros filled. `hr` stays a
    * native timestamp for downstream window math. */
  private def denseHourly(events: DataFrame): DataFrame = {
    val hourly = events.groupBy(
        col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n"))
    val spine = hourly.agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 hour"))).as("hr"))
    hourly.select(col("event_type")).distinct()
      .crossJoin(spine)
      .join(hourly, Seq("event_type", "hr"), "left")
      .select(
        col("event_type"), col("hr"),
        coalesce(col("n"), lit(0L)).cast("long").as("n"))
  }

  /** Per-type autocorrelation of the hourly count series at lags
    * 1..`maxLag` — the seasonality detector ("is there a daily cycle in
    * this event type"). Runs over the ZERO-FILLED dense series from
    * [[denseHourly]]: autocorrelation over a gappy observation series is
    * wrong (a missing hour is a zero count, and skipping it shifts every
    * subsequent lag pair). Pearson is assembled from raw moments with the
    * zero-variance guard ([[anomalousHours]] lesson — a constant series
    * has no autocorrelation, and ANSI `corr` would throw on the zero
    * divisor); NULL acf marks those types.
    *
    * 100 TB shape: the raw stream reduces FIRST to hourly cells (the one
    * corpus-sized exchange); the lag windows and the final moment
    * aggregation run over the (#types × #hours) dense series, and ALL
    * lags share one window sort (same partitionBy/orderBy spec → Spark
    * plans a single WindowExec). Never a window over the raw stream.
    *
    * Returns (event_type, lag_h, n_pairs, acf) with acf rounded to 6 dp. */
  def autocorrelation(events: DataFrame, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val dense = denseHourly(events).withColumn("__cur", col("n").cast("double"))
    val lagged = (1 to maxLag).foldLeft(dense) { (d, k) =>
      d.withColumn(s"__prev_$k", lag(col("__cur"), k).over(w))
    }
    val pairs = lagged.select(col("event_type"), col("__cur"),
      explode(array((1 to maxLag).map(k =>
        struct(lit(k).cast("long").as("lag_h"),
          col(s"__prev_$k").as("prev"))): _*)).as("p"))
      .select(col("event_type"), col("p.lag_h"), col("__cur"), col("p.prev"))
      .filter(col("prev").isNotNull)
    pairs.groupBy(col("event_type"), col("lag_h"))
      .agg(
        count(lit(1)).as("n_pairs"),
        covar_pop(col("__cur"), col("prev")).as("__cv"),
        stddev_pop(col("__cur")).as("__sa"),
        stddev_pop(col("prev")).as("__sb"))
      .select(col("event_type"), col("lag_h"), col("n_pairs"),
        round(when(col("__sa") > 0 && col("__sb") > 0,
          col("__cv") / (col("__sa") * col("__sb"))), 6).as("acf"))
  }

  /** Last-observation-carried-forward imputation: fill NULL readings with
    * the key's most recent non-null value in (tsCol, idCol) order — the
    * standard gap repair for sensor/metric streams before any windowed
    * math. Leading nulls (no prior observation) stay null; `was_missing`
    * records which rows were imputed.
    *
    * 100 TB shape: ONE window pass partitioned by the high-cardinality
    * entity key with an explicit ROWS frame — `last(_, ignoreNulls)` scans
    * the frame incrementally, no join, no sort beyond the window's own
    * per-key order. Values pass through untransformed, so engine parity is
    * bit-exact (no float arithmetic at all).
    *
    * Returns (keyCol, idCol, tsCol, v_filled, was_missing). */
  def fillForward(
      df: DataFrame, keyCol: String, valueCol: String,
      tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(keyCol), col(idCol), col(tsCol), col(valueCol))
      .withColumn("v_filled", last(col(valueCol), ignoreNulls = true).over(w))
      .withColumn("was_missing", col(valueCol).isNull)
      .drop(valueCol)
  }

  /** Equi-depth histogram: per type, bucket counts between the type's own
    * exact quartile boundaries — the distribution sketch that stays
    * readable under heavy tails where equi-WIDTH bins put everything in
    * bin 0. Boundaries are rounded to 4 dp before bucketing (the
    * [[winsorizeValues]] grid trick: kills cross-engine last-ulp
    * percentile drift at bucket edges); bucket b holds values in
    * (q_b, q_{b+1}], b=0 open below.
    *
    * 100 TB shape: one grouped percentile pass to a #types-row boundary
    * table (KLL-cells swap documented there too), joined back unhinted,
    * one re-aggregation. Returns (event_type, bucket, n). */
  def equiDepthHistogram(events: DataFrame): DataFrame = {
    val bounds = events.groupBy(col("event_type").as("__h_type"))
      .agg(
        round(expr("percentile(value, 0.25)"), 4).as("q1"),
        round(expr("percentile(value, 0.5)"), 4).as("q2"),
        round(expr("percentile(value, 0.75)"), 4).as("q3"))
    events.join(bounds, col("event_type") <=> col("__h_type"))
      .withColumn("bucket",
        when(col("value") <= col("q1"), 0L)
          .when(col("value") <= col("q2"), 1L)
          .when(col("value") <= col("q3"), 2L)
          .otherwise(3L))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Winsorization summary: clip each type's values at its own exact
    * [`pLo`, `pHi`] percentiles and report how much mass moved — the
    * robust-statistics pre-clean run before any mean-based metric on
    * heavy-tailed telemetry. Bounds are ROUNDED to 4 dp before comparing,
    * which pins the clip boundary to a grid both engines agree on (raw
    * interpolated percentiles can differ in the last ulp across engines;
    * a data point landing between the two reads would flip sides).
    *
    * 100 TB shape: one grouped percentile pass builds a #types-row bounds
    * table (exact `percentile` holds each group's values in the aggregate
    * buffer — fine at telemetry-type cardinality; swap in the KLL sketch
    * cells ([[graft.operators.Sketches]]) when a single group outgrows
    * executor memory), joined back UNHINTED (AQE broadcasts the tiny
    * side), then one re-aggregation. The raw stream crosses the exchange
    * twice, never more.
    *
    * Returns (event_type, n, n_lo, n_hi, avg_clipped). */
  def winsorizeValues(
      events: DataFrame, pLo: Double = 0.05, pHi: Double = 0.95): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad percentile band [$pLo, $pHi]")
    val bounds = events.groupBy(col("event_type").as("__w_type"))
      .agg(
        round(expr(s"percentile(value, $pLo)"), 4).as("lo"),
        round(expr(s"percentile(value, $pHi)"), 4).as("hi"))
    events.join(bounds, col("event_type") <=> col("__w_type"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("value") < col("lo"), 1)).as("n_lo"),
        count(when(col("value") > col("hi"), 1)).as("n_hi"),
        round(avg(greatest(least(col("value"), col("hi")), col("lo"))), 4)
          .as("avg_clipped"))
  }

  /** Per-type linear trend of the DAILY MEAN value: ordinary-least-squares
    * slope over the day index, the drift detector behind "is this metric
    * creeping". Types observed on fewer than two days are dropped (a
    * one-point series has no slope — and an unguarded var_pop = 0 would
    * emit NaN, the [[anomalousHours]] zero-variance lesson).
    *
    * 100 TB shape: the raw stream reduces FIRST to (type, day) means — the
    * only corpus-sized exchange — and the OLS runs as covar_pop/var_pop
    * aggregates over that tiny series, never a per-type sort or window.
    * The day index is anchored at a fixed epoch so the regressor stays
    * small-magnitude (no catastrophic cancellation in n·Σxy − ΣxΣy).
    *
    * Returns (event_type, n_days, slope) with slope rounded to 6 dp. */
  def dailyTrend(events: DataFrame, epoch: String = "2024-01-01"): DataFrame = {
    val daily = events.groupBy(
        col("event_type"),
        datediff(date_trunc("day", col("ts")), lit(epoch).cast("date"))
          .cast("double").as("x"))
      .agg(avg(col("value")).as("mv"))
    daily.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days"),
        round(covar_pop(col("x"), col("mv")) /
          var_pop(col("x")), 6).as("slope"))
      .filter(col("n_days") >= 2)
  }

  /** SCD2-style status history: compact a per-key changelog into validity
    * intervals, collapsing CONSECUTIVE RUNS of the same status — the
    * dimension-build that turns an event stream into point-in-time joinable
    * history (the batch complement of [[asofJoin]]). A row opens when the
    * status differs from the key's previous row and closes at the next
    * OPEN (exclusive end); the key's latest status stays open (null
    * valid_to). Ordering within a key is (ts, idCol) so same-timestamp
    * changelog rows resolve deterministically.
    *
    * 100 TB shape: two window passes (lag to find change points, lead over
    * the CHANGE ROWS ONLY to close intervals), both partitioned by the
    * entity key — million-key cardinality spreads across every task, and
    * the second pass runs over the compacted change rows, not the raw
    * stream. No joins, no global sort.
    *
    * Returns (keyCol, status, valid_from, valid_to) with timestamps kept
    * as native types for downstream as-of joins. */
  def statusIntervals(
      changelog: DataFrame,
      keyCol: String,
      statusCol: String,
      tsCol: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(idCol))
    val changes = changelog
      .select(col(keyCol), col(statusCol).as("status"), col(tsCol), col(idCol))
      .withColumn("__prev", lag(col("status"), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      // row_number anchors the first row: lag's boundary null would be
      // indistinguishable from a genuinely-NULL first status, which must
      // open an interval too; <=> keeps null runs collapsing like others
      .filter(col("__rn") === 1 || !(col("__prev") <=> col("status")))
      .drop("__prev", "__rn")
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col("status"),
        col(tsCol).as("valid_from"), col("valid_to"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * counts and row-normalized probabilities of each (prev_type →
    * next_type) step, ordering within a user by (ts, event_id) so
    * same-timestamp events resolve deterministically. The product-analytics
    * "what do users do next" matrix, and the input to sequence-model
    * sanity checks (does generated traffic match observed dynamics).
    *
    * 100 TB shape: ONE window pass partitioned by the high-cardinality
    * user id produces the step pairs; the matrix aggregation and the
    * row-normalizing window both run over the #types² count table — the
    * same raw-stream-reduces-first discipline as [[rollingDailyCounts]].
    *
    * Returns (prev_type, next_type, n, p) with p rounded to 6 dp. */
  def typeTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("__prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("__prev_type").isNotNull)
    val counts = pairs
      .groupBy(col("__prev_type").as("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val rowTotal = Window.partitionBy(col("prev_type"))
    counts.select(col("prev_type"), col("next_type"), col("n"),
      round(col("n") / sum(col("n")).over(rowTotal), 6).as("p"))
  }

  /** Linear interpolation over the dense hourly grid: per type, the hourly
    * MEAN value series with missing hours filled by linear interpolation
    * between the nearest present neighbors — the gap repair one step up
    * from [[fillForward]]'s LOCF (which biases a trending series; a ramp
    * metric LOCF-filled flatlines inside every gap). Hours before the
    * first or after the last observation stay null — extrapolation is a
    * model choice, not a fill. Present-hour means are rounded to 4 dp
    * BEFORE interpolating so both engines interpolate between identical
    * anchors; the interpolated value is rounded again on output.
    *
    * 100 TB shape: the raw stream reduces FIRST to hourly cells (the one
    * corpus-sized exchange); the generated spine × types table is
    * (#types × #hours) rows and the two ignore-nulls window passes
    * (carry-last-anchor forward, carry-next-anchor backward via one
    * forward pass + one mirrored frame) run over that series, never the
    * raw stream — the [[denseHourly]] discipline.
    *
    * Returns (event_type, hour, v, was_gap) for every spine cell. */
  def interpolateLinear(events: DataFrame): DataFrame = {
    // Engine-exact float contract: round(double, 4) TIE-BREAKS DIFFERENTLY
    // across engines when the computed double sits one ulp off a 5th-
    // decimal tie (a half-gap midpoint does exactly that — Spark's
    // BigDecimal sees ...849999...96 and rounds down, an engine keying off
    // the shortest decimal repr "…85" rounds up). So NOTHING here rounds a
    // computed double: anchors are exact integer ×10⁴ means (one
    // deterministic division off exact integer cents), the interpolation
    // is integer-rational pv·(dn−dt) + nv·dt over hour deltas, half-up is
    // integer (2·num + dn) DIV (2·dn), and the ONE float op is the final
    // exact-integer / 10⁴ display division — identical in any engine.
    val hourly = hourlyMeansE4(events)
    val spine = hourly.agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 hour"))).as("hr"))
    val dense = hourly.select(col("event_type")).distinct()
      .crossJoin(spine)
      .join(hourly, Seq("event_type", "hr"), "left")
    val back = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val us = unix_micros(col("hr"))
    val anchored = dense
      .withColumn("__pv", last(col("__vi"), ignoreNulls = true).over(back))
      .withColumn("__pt",
        last(when(col("__vi").isNotNull, us), ignoreNulls = true).over(back))
      .withColumn("__nv", first(col("__vi"), ignoreNulls = true).over(fwd))
      .withColumn("__nt",
        first(when(col("__vi").isNotNull, us), ignoreNulls = true).over(fwd))
      // hour-grid deltas (exact integer division — stamps are hour-aligned)
      .withColumn("__dt", expr("(unix_micros(hr) - __pt) DIV 3600000000"))
      .withColumn("__dn", expr("(__nt - __pt) DIV 3600000000"))
      // ANSI-safe: the DIV runs only on gap rows (dn >= 1 by construction
      // there); present rows have dn = 0 and must not evaluate it
      .withColumn("__e4", expr(
        """CASE WHEN __vi IS NULL AND __pv IS NOT NULL AND __nv IS NOT NULL
          |THEN (2 * (__pv * (__dn - __dt) + __nv * __dt) + __dn)
          |     DIV (2 * __dn) END""".stripMargin))
    anchored.select(
      col("event_type"),
      date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hour"),
      (when(col("__vi").isNotNull, col("__vi"))
        .otherwise(col("__e4")) / 10000.0).as("v"),
      col("__vi").isNull.as("was_gap"))
  }

  /** Hour-of-day seasonal profile per type over the ZERO-FILLED dense
    * calendar: mean hourly count by (type, hour-of-day) — the baseline a
    * forecaster or anomaly detector subtracts before looking at residuals
    * (a "quiet 3 AM" is seasonality, not an outage; [[silenceGaps]] and
    * this op are the two halves of that distinction). Zeros must be data
    * here: a present-rows-only mean would report a type's dead hours as
    * its busy ones' average.
    *
    * 100 TB shape: the raw stream reduces to hourly cells first; the
    * profile is a second aggregation of the (#types × #hours) spine down
    * to #types × 24 cells. Exact integer sums, one division, rounded 4.
    * Returns (event_type, hod, n_hours, mean_n). */
  def seasonalProfile(events: DataFrame): DataFrame =
    denseHourly(events)
      .groupBy(col("event_type"), hour(col("hr")).cast("long").as("hod"))
      .agg(
        count(lit(1)).as("n_hours"),
        round(sum(col("n")) / count(lit(1)).cast("double"), 4).as("mean_n"))

  /** Outage/gap detection — maximal runs of consecutive silent hours per
    * type over the dense hourly calendar (the gaps-and-islands problem):
    * where [[calendarHourly]] shows the zeros, this names the INTERVALS,
    * which is what an on-call actually files ("no clicks 02:00–05:00",
    * not 4 disconnected zero cells). Island key = hour index minus the
    * zero-cell rank — constant exactly within a consecutive zero run, and
    * pure integer arithmetic (engine-exact).
    *
    * 100 TB shape: the raw stream reduces to hourly cells first (the one
    * corpus-sized exchange — [[denseHourly]]); the zero-run window + the
    * island aggregation run over the (#types × #hours) spine only.
    * Returns (event_type, gap_start, gap_end, n_hours). */
  def silenceGaps(events: DataFrame): DataFrame = {
    val zeros = denseHourly(events).filter(col("n") === 0)
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    zeros
      .withColumn("__isl",
        (unix_micros(col("hr")) / 3600000000L).cast("long") -
          row_number().over(w))
      .groupBy(col("event_type"), col("__isl"))
      .agg(
        date_format(min(col("hr")), "yyyy-MM-dd HH:mm:ss").as("gap_start"),
        date_format(max(col("hr")), "yyyy-MM-dd HH:mm:ss").as("gap_end"),
        count(lit(1)).as("n_hours"))
      .drop("__isl")
  }

  /** CUSUM mean-shift changepoint per type: over the hourly-mean series,
    * the cumulative sum of deviations from the series mean peaks (in
    * absolute value) at the most likely single change point — the
    * classical offline CUSUM estimator, and the monitoring question "WHEN
    * did this metric move" that [[dailyTrend]]'s global slope can't
    * answer. Hourly means are rounded to 4 dp before the deviation pass
    * (identical anchors in both engines); the peak |CUSUM| is tie-broken
    * to the EARLIEST hour so the answer is deterministic.
    *
    * 100 TB shape: raw stream → hourly cells (one corpus-sized exchange);
    * the series mean joins back as a #types-row broadcast; the running
    * sum + argmax run per type over the tiny hourly series. Only present
    * hours enter the series (a silent-hour gap is absence of observation,
    * not a zero sample — zero-filling would manufacture a level shift at
    * every quiet night).
    *
    * Returns (event_type, n_hours, cp_hour, score) — score = max |CUSUM|
    * rounded to 4 dp. */
  def cusumChangepoint(events: DataFrame): DataFrame = {
    // the whole CUSUM runs in INTEGERS so the argmax is engine-exact:
    // hourly mean ×10⁴ as a long (one deterministic division off exact
    // integer cents), and s_k·n = n·Σ_{i≤k} vᵢ − k·Σvᵢ — a pure-integer
    // rescaling of the deviation cusum (n > 0 is constant per type, so
    // the argmax is unchanged). Floats appear only in the one reported
    // score division at the very end.
    val hourly = hourlyMeansE4(events)
    val m = hourly.groupBy(col("event_type").as("__c_type"))
      .agg(sum(col("__vi")).as("__mnum"), count(lit(1)).as("__n"))
    val run = Window.partitionBy(col("event_type")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = hourly.join(m, col("event_type") <=> col("__c_type"))
      .withColumn("__cum", sum(col("__vi")).over(run))
      .withColumn("__k", count(lit(1)).over(run))
      // the argmax key stays INTEGER — ranking by the rounded float score
      // would both collide distinct peaks onto one 4-dp value (wrong
      // earliest-hour pick) and reopen the cross-engine round() tie-break
      // divergence this operator exists to avoid
      .withColumn("__int",
        abs(col("__n") * col("__cum") - col("__k") * col("__mnum")))
    val pick = Window.partitionBy(col("event_type"))
      .orderBy(col("__int").desc, col("hr").asc)
    scored.withColumn("__rk", row_number().over(pick))
      .filter(col("__rk") === 1)
      .select(
        col("event_type"), col("__n").as("n_hours"),
        date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("cp_hour"),
        round(col("__int") / (col("__n") * 10000.0), 4).as("score"))
  }

  /** Shared engine-exact hourly-mean anchors ×10⁴ as integers: exact
    * integer-cent sums (order-free), ONE deterministic division, one
    * half-up to the 10⁻⁴ grid — the block [[interpolateLinear]] and
    * [[cusumChangepoint]] both build on (and whose DuckDB mirrors must
    * stay bit-in-sync with). Returns (event_type, hr, __vi). */
  private def hourlyMeansE4(events: DataFrame): DataFrame =
    events.groupBy(
        col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(
        sum(round(col("value") * 100, 0).cast("long")).as("__c"),
        count(lit(1)).as("__hn"))
      .select(col("event_type"), col("hr"),
        round(col("__c") * 100.0 / col("__hn"), 0).cast("long").as("__vi"))

  /** Top event-type paths: the k most frequent length-3 event sequences
    * across users (ordered by time within user) — the navigation-flow /
    * sankey feed one step up from [[typeTransitions]]'s first-order
    * matrix, which by construction cannot see that A→B→C outnumbers
    * A→B→D. Windows shorter than the path length contribute nothing;
    * ties rank path-ascending so the cut is deterministic.
    *
    * 100 TB shape: ONE window pass partitioned by the high-cardinality
    * user key (two leads share the single per-user sort), then a grouped
    * count over the ≤#types³-cardinality path table and a TakeOrdered
    * top-k — no per-path window, no global sort. Returns (path, n). */
  def topEventPaths(events: DataFrame, k: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("__n1", lead(col("event_type"), 1).over(w))
      .withColumn("__n2", lead(col("event_type"), 2).over(w))
      .filter(col("__n1").isNotNull && col("__n2").isNotNull)
      .select(concat_ws(">", col("event_type"), col("__n1"), col("__n2")).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(k)
  }

  /** Gap-based sessionization (30-minute inactivity gap) in batch: a session
    * starts where the gap from the previous event of the same user exceeds
    * the gap; session count per user = sum of starts. One shuffle on
    * user_id; the window sort is per-user and spills if a user is huge. */
  /** Peak concurrency per day: the maximum number of users simultaneously
    * "active" at any instant of the day, where a user's activity interval
    * is the CLOSED span [first event, last event] of their day. The
    * capacity-planning question ("how many concurrent sessions must we
    * serve?") that per-hour counts systematically understate, because
    * concurrency peaks between bucket boundaries.
    *
    * Sweep line, aggregate-first: events collapse to one interval per
    * (user, day) — two delta rows (+1 at start, −1 at end) — so the
    * exchange carries two rows per active user-day, never raw events. The
    * running sum is a window PARTITIONED BY day (per-day sweep; the
    * all-days sweep would be a single-reducer global sort): ordering is
    * (t, delta DESC) so a start at instant t is processed before an end at
    * t — closed intervals; two users touching at one instant count as 2,
    * and a single-event user counts as 1 at their moment. Ties among equal
    * (t, delta) rows leave the cumulative sum order-ambiguous only at
    * prefixes STRICTLY INSIDE the tie group; the per-day max is attained
    * at a group boundary, so the result is deterministic. */
  def peakConcurrency(events: DataFrame): DataFrame = {
    val iv = events
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min(col("ts")).as("s"), max(col("ts")).as("e"))
    val deltas = iv.select(col("day"), col("s").as("t"), lit(1).as("d"))
      .unionAll(iv.select(col("day"), col("e").as("t"), lit(-1).as("d")))
    val w = Window.partitionBy(col("day")).orderBy(col("t"), col("d").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.withColumn("run", sum(col("d")).over(w))
      .groupBy(col("day"))
      .agg(max(col("run")).cast("long").as("peak_concurrency"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("peak_concurrency"))
  }

  /** Session duration/size statistics: the per-session table behind
    * [[sessionize]]'s per-user counts — each (user, session) with its
    * event count and wall duration, reduced to one corpus row (sessions,
    * mean/p50/p95 duration seconds, mean events). The "how long is a
    * session really" readout that sizes streaming state timeouts and
    * sessionization gap parameters.
    *
    * Shape: the same single per-user window pass as [[sessionize]] (the
    * gap flag's running sum IS the session id — no second sort), one
    * grouped aggregation to session cardinality, then a one-row exact-
    * percentile reduce over the session-sized frame. Durations are µs
    * integers scaled once, so both engines interpolate identical
    * doubles. */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val tsUs = unix_micros(col("ts"))
    val run = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = events
      .withColumn("__ss_new",
        when(lag(tsUs, 1).over(w).isNull, 1)
          .when(tsUs - lag(tsUs, 1).over(w) > gapMinutes * 60000000L, 1)
          .otherwise(0))
      .withColumn("__ss_sid", sum(col("__ss_new")).over(run))
      .groupBy(col("user_id"), col("__ss_sid"))
      .agg(count(lit(1)).as("__ss_n"),
        ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))) / lit(1e6))
          .as("__ss_dur"))
    sessions.agg(
      count(lit(1)).as("n_sessions"),
      round(avg(col("__ss_n")), 4).as("mean_events"),
      round(avg(col("__ss_dur")), 2).as("mean_duration_s"),
      round(expr("percentile(__ss_dur, 0.5)"), 2).as("p50_duration_s"),
      round(expr("percentile(__ss_dur, 0.95)"), 2).as("p95_duration_s"))
  }

  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // compare gaps in epoch microseconds (not a seconds cast, which truncates
    // sub-second precision and disagrees with interval arithmetic at the edge)
    val tsUs = unix_micros(col("ts"))
    val gapped = events.withColumn(
      "new_s",
      when(lag(tsUs, 1).over(w).isNull, 1)
        .when(tsUs - lag(tsUs, 1).over(w) > gapMinutes * 60000000L, 1)
        .otherwise(0))
    gapped.groupBy(col("user_id"))
      .agg(
        sum(col("new_s")).cast("long").as("n_sessions"),
        count(lit(1)).as("n_events"))
  }

  /** As-of join: each left row picks up the LATEST right row of the same
    * key with `right.ts <= left.ts` (inclusive — a right row at the exact
    * left timestamp matches). The event-enrichment primitive: join every
    * click to the most recent prior view, every trade to the prevailing
    * quote.
    *
    * Spark has no AsOfJoin operator; the scale-safe composition is NOT a
    * range join (which explodes to |L|×|R| per key before picking the max)
    * but a tagged union + per-key ordered window: both sides shuffle ONCE
    * on the key, sort within partitions on (ts, side), and
    * `last(payload, ignoreNulls)` carries the newest right payload forward
    * into each left row. Cost = one exchange + one sort over |L|+|R| rows,
    * independent of match distance; per-key skew is the window sort's
    * (spillable) problem, same as any per-entity analytics window.
    *
    * Right rows sharing (key, ts) are ambiguous — pre-aggregate the right
    * side to one row per (key, ts) for deterministic output. Returns all
    * left columns plus each non-key right column as `<prefix><name>`
    * (NULL when no right row precedes the left row). */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      prefix: String = "prior_"): DataFrame = {
    val leftStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val leftType = left.select(leftStruct.as("s")).schema("s").dataType
    val rightCols = right.columns.filterNot(_ == keyCol).toSeq
    val rightStruct = struct(rightCols.map(col): _*)
    val rightType = right.select(rightStruct.as("s")).schema("s").dataType
    val l = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__t"), lit(1).as("__side"),
      leftStruct.as("__l"), lit(null).cast(rightType).as("__r"))
    val r = right.select(
      col(keyCol).as("__k"), col(tsCol).as("__t"), lit(0).as("__side"),
      lit(null).cast(leftType).as("__l"), rightStruct.as("__r"))
    // right (side 0) sorts before left (side 1) at equal ts → inclusive <=
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionAll(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    matched.select(
      left.columns.map(c => col(s"__l.$c").as(c)).toSeq ++
        rightCols.map(c => col(s"__m.$c").as(prefix + c)): _*)
  }

  /** Forward as-of join — the time-mirror of [[asofJoin]]: each left row
    * picks up the EARLIEST right row of the same key with
    * `right.ts >= left.ts` (inclusive). The "time-to-next-event" primitive:
    * every signup joined to its first purchase, every alert to the next
    * deploy. Same scale shape as the backward join — one tagged-union
    * exchange on the key, one per-key window sort, a first-ignore-nulls
    * carry over the FOLLOWING frame; never a per-key range explosion.
    *
    * At equal (key, ts) the left row (side 0) sorts BEFORE the right row,
    * so a right row at the exact left timestamp is inside the
    * current-row..following frame → inclusive >=. Right rows sharing
    * (key, ts) are ambiguous; pre-aggregate the right side for
    * deterministic output. Returns all left columns plus each non-key
    * right column as `<prefix><name>`. */
  def asofJoinForward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      prefix: String = "next_"): DataFrame = {
    val leftStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val leftType = left.select(leftStruct.as("s")).schema("s").dataType
    val rightCols = right.columns.filterNot(_ == keyCol).toSeq
    val rightStruct = struct(rightCols.map(col): _*)
    val rightType = right.select(rightStruct.as("s")).schema("s").dataType
    val l = left.select(
      col(keyCol).as("__k"), col(tsCol).as("__t"), lit(0).as("__side"),
      leftStruct.as("__l"), lit(null).cast(rightType).as("__r"))
    val r = right.select(
      col(keyCol).as("__k"), col(tsCol).as("__t"), lit(1).as("__side"),
      lit(null).cast(leftType).as("__l"), rightStruct.as("__r"))
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = l.unionAll(r)
      .withColumn("__m", first(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 0)
    matched.select(
      left.columns.map(c => col(s"__l.$c").as(c)).toSeq ++
        rightCols.map(c => col(s"__m.$c").as(prefix + c)): _*)
  }

  /** Ordered funnel: how many keys progressed through `stages` IN ORDER —
    * stage i counts keys with an event of type stages(i) at-or-after their
    * earliest qualifying stages(i−1) event. The product-analytics staple
    * (view → click → purchase conversion).
    *
    * Shape: one filtered grouped-min per stage, each joined to the previous
    * stage's (key, ts) frame — stages are few and static, so the plan is a
    * short chain of partial-aggregated shuffles on the key, never a per-key
    * sort or a self-join of the raw event table against itself. Returns
    * (stage_idx, stage, users). */
  def funnelCounts(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String],
      maxLagMinutes: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty)
    require(maxLagMinutes.forall(_ > 0), s"maxLagMinutes must be > 0: $maxLagMinutes")
    val base = events.select(
      col(keyCol).as("__k"), col(typeCol).as("__et"), col(tsCol).as("__t"))
    var prev: Option[DataFrame] = None
    val perStage = stages.map { s =>
      val filtered = base.filter(col("__et") === s)
      val qualifying = prev match {
        case None => filtered
        case Some(p) =>
          // windowed funnel: the next stage must land within maxLag of the
          // previous stage's earliest qualifying event — the realistic
          // conversion metric ("purchased within the session", not "ever").
          // µs integer comparison, same-instant events qualify (>=)
          val inOrder = col("__t") >= col("__pt")
          val bound = maxLagMinutes.fold(lit(true))(m =>
            unix_micros(col("__t")) <= unix_micros(col("__pt")) + m * 60000000L)
          filtered.join(p, Seq("__k")).filter(inOrder && bound)
      }
      val reached = qualifying.groupBy(col("__k")).agg(min(col("__t")).as("__pt"))
      prev = Some(reached)
      reached
    }
    perStage.zip(stages).zipWithIndex.map { case ((df, s), i) =>
      df.agg(count(lit(1)).as("users"))
        .select(
          lit(i + 1).cast("long").as("stage_idx"),
          lit(s).as("stage"),
          col("users"))
    }.reduce(_.unionAll(_))
  }

  /** Longest consecutive-day activity streak per user, top `k` — the
    * gaps-and-islands engagement metric ("longest daily streak"). Island
    * id = day − row_number over the user's DISTINCT active days: constant
    * within a consecutive run, so one grouped count per island and one
    * max per user finish it.
    *
    * Shape: the raw stream collapses to distinct (user, day) FIRST (the
    * cohortRetention discipline — windows only ever see ≤ users × days
    * rows), per-user windows carry the island arithmetic, TakeOrdered
    * cuts the deterministic top-k (streak DESC, user ASC). Returns
    * (user_id, streak_days, n_active_days). */
  def longestStreaks(events: DataFrame, k: Int = 20): DataFrame = {
    val active = events
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    active
      .withColumn("__st_isl",
        datediff(col("day"), lit("1970-01-01").cast("date")) -
          row_number().over(w))
      .groupBy(col("user_id"), col("__st_isl"))
      .agg(count(lit(1)).as("__st_len"))
      .groupBy(col("user_id"))
      .agg(max(col("__st_len")).as("streak_days"),
        sum(col("__st_len")).as("n_active_days"))
      .orderBy(col("streak_days").desc, col("user_id"))
      .limit(k)
  }

  /** Day-over-day change volatility per type: mean and sample stddev of
    * the consecutive differences of the daily-mean series — the stability
    * readout next to [[maxDrawdown]]'s worst case (differences, not
    * ratios: the series may cross zero, where returns are undefined and
    * an ANSI session faults the division). Daily means round to 6 dp
    * before differencing, so every diff is engine-identical.
    *
    * Shape: stream → (type, day) means, one per-type window lag over the
    * tiny series, one grouped moment aggregation. Returns (event_type,
    * n_changes, mean_change, volatility), stats rounded 6. */
  def changeVolatility(events: DataFrame): DataFrame = {
    val daily = events.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(avg(col("value")), 6).as("mv"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    daily
      .withColumn("__cv_ch", col("mv") - lag(col("mv"), 1).over(w))
      .filter(col("__cv_ch").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_changes"),
        round(avg(col("__cv_ch")), 6).as("mean_change"),
        round(stddev_samp(col("__cv_ch")), 6).as("volatility"))
  }

  /** Maximum drawdown of each type's daily-mean series: the deepest drop
    * from any running peak to a later trough — the worst-case "how far
    * did this metric fall before recovering" readout that a min/max pair
    * understates (min may precede max). Daily means are rounded to 6 dp
    * first, so the running max and the differences are engine-portable.
    *
    * Shape: the raw stream collapses to (type, day) means; the running
    * peak is a per-type ordered window over that tiny series (parallelism
    * = types, the aggregated-series-window discipline); one grouped max
    * finishes. Returns (event_type, n_days of the daily series,
    * max_drawdown rounded 6). */
  def maxDrawdown(events: DataFrame): DataFrame = {
    val daily = events.groupBy(
        col("event_type"), to_date(col("ts")).as("day"))
      .agg(round(avg(col("value")), 6).as("mv"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("__dd_peak", max(col("mv")).over(w))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days"),
        round(max(col("__dd_peak") - col("mv")), 6).as("max_drawdown"))
  }

  /** Exponentially weighted level of each type's daily-mean series — the
    * recency-biased "where is the metric NOW" companion to the OLS trend's
    * "where is it heading" ([[trendForecast]]). The recursive SES update
    * is unrolled to its closed form: level = Σ (1−α)^(last−day)·mean /
    * Σ (1−α)^(last−day) over observed days (the adjust=true EWM), so no
    * sequential scan exists to distribute — one grouped aggregation
    * computes every term. Daily means are rounded to 6 dp first so both
    * engines weight identical inputs; absent days simply age the earlier
    * observations (weights follow CALENDAR distance).
    *
    * Shape: events collapse to (type, day) means, join back the
    * type-cardinality max-day row, one more grouped sum — nothing beyond
    * series × days ever shuffles. Returns (event_type, n_days,
    * ewma_level rounded 4 dp). */
  def ewmaLevel(
      events: DataFrame, alpha: Double = 0.3,
      epoch: String = "2024-01-01"): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val d = events.groupBy(
        col("event_type"),
        datediff(to_date(col("ts")), lit(epoch).cast("date"))
          .cast("double").as("x"))
      .agg(round(avg(col("value")), 6).as("mv"))
    val m = d.groupBy(col("event_type")).agg(max(col("x")).as("xmax"))
    d.join(m, "event_type")
      .withColumn("__w", pow(lit(1.0 - alpha), col("xmax") - col("x")))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_days"),
        round(sum(col("__w") * col("mv")) / sum(col("__w")), 4).as("ewma_level"))
  }

  /** Time-weighted average value per (type, day): each reading is held
    * until the next one of the same series, and the mean weights each
    * value by how long it was in force — the correct daily average for
    * irregularly-sampled state series (prices, gauges, queue depths),
    * where the arithmetic mean over-counts bursts of rapid updates. The
    * day's LAST reading carries no intra-day duration and contributes no
    * weight (documented boundary; a day with one event yields no row).
    *
    * Shape: one window pass per (type, day) partition computes the lead
    * timestamp (parallelism = series × days, the partitioned-window
    * discipline), then one grouped aggregation forms
    * Σ value·duration / Σ duration from µs-integer durations — identical
    * doubles on any engine. Returns (event_type, day, n_intervals,
    * twap rounded 4 dp). */
  def timeWeightedAverage(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"), to_date(col("ts")).as("__day"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("__next_us", lead(unix_micros(col("ts")), 1).over(w))
      .filter(col("__next_us").isNotNull)
      .withColumn("__dur", (col("__next_us") - unix_micros(col("ts"))).cast("double"))
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(
        count(lit(1)).as("n_intervals"),
        round(sum(col("value") * col("__dur")) / sum(col("__dur")), 4).as("twap"))
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_intervals"), col("twap"))
  }

  /** Time-to-convert percentiles for each consecutive funnel hop: among
    * users who reached both stages (earliest-qualifying times, the exact
    * [[funnelCounts]] semantics), the count and the exact p50/p90 of the
    * conversion delay in seconds — the "HOW FAST do they convert"
    * companion to the funnel's "how many".
    *
    * Shape: the per-stage reach tables are user-cardinality aggregates of
    * stage-filtered events (each a filtered scan + one grouped min); a hop's
    * delays join two of those small tables on the user id, and the exact
    * percentile aggregates a (reached-users)-sized double column — the raw
    * stream never feeds a percentile. Delays are µs integers scaled by
    * 1e-6, so both engines interpolate identical doubles. */
  def timeToConvert(
      events: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "timeToConvert needs at least two stages")
    val base = events.select(
      col(keyCol).as("__k"), col(typeCol).as("__et"), col(tsCol).as("__t"))
    var prev: Option[DataFrame] = None
    val reached = stages.map { s =>
      val filtered = base.filter(col("__et") === s)
      val qualifying = prev match {
        case None => filtered
        case Some(p) => filtered.join(p, Seq("__k")).filter(col("__t") >= col("__pt"))
      }
      val r = qualifying.groupBy(col("__k")).agg(min(col("__t")).as("__pt"))
      prev = Some(r)
      r
    }
    stages.sliding(2).toSeq.zipWithIndex.map { case (pair, i) =>
      val delays = reached(i).select(col("__k"), col("__pt").as("__t1"))
        .join(reached(i + 1).select(col("__k"), col("__pt").as("__t2")), "__k")
        .select(((unix_micros(col("__t2")) - unix_micros(col("__t1"))) / lit(1e6))
          .as("__dt"))
      delays.agg(
        count(lit(1)).as("n_users"),
        round(expr("percentile(__dt, 0.5)"), 2).as("p50_s"),
        round(expr("percentile(__dt, 0.9)"), 2).as("p90_s"))
        .select(
          lit(i + 1).cast("long").as("hop"),
          lit(pair.head).as("from_stage"),
          lit(pair(1)).as("to_stage"),
          col("n_users"), col("p50_s"), col("p90_s"))
    }.reduce(_.unionAll(_))
  }

  /** Cohort retention: users grouped by their first-activity day (the
    * cohort), counted on each later day-offset they return — the classic
    * engagement matrix behind "day-N retention".
    *
    * Shape: distinct (user, day) activity first (one pre-aggregation that
    * collapses the event stream to at most users × days rows), the per-user
    * first day derived from THAT small relation, then an id-keyed join and
    * one grouped count — the raw event table crosses exactly one exchange.
    * Returns (cohort_day string, day_offset, users). */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val active = events
      .select(col(userCol).as("user"), to_date(col(tsCol)).as("day"))
      .distinct()
    // per-user first day as a window min over the ALREADY-SMALL distinct
    // relation: one shuffle on user, no self-join, active referenced once
    val byUser = Window.partitionBy(col("user"))
    active.withColumn("cohort", min(col("day")).over(byUser))
      .groupBy(col("cohort"), datediff(col("day"), col("cohort")).as("day_offset"))
      .agg(count(lit(1)).as("users")) // (user, day) is distinct ⇒ count = distinct users
      .select(
        date_format(col("cohort"), "yyyy-MM-dd").as("cohort_day"),
        col("day_offset").cast("long").as("day_offset"),
        col("users"))
  }

  /** Bounded range join: for every left row, the COUNT of right rows of the
    * same key within ±`windowSeconds` — proximity enrichment (errors near
    * clicks, trades near quotes) without Spark's default plan for a time
    * inequality join, which is a per-key cross product filtered after the
    * fact.
    *
    * Scale shape: both sides are binned into window-width buckets; each
    * left row joins its own bin ±1 (a right row within the window is
    * always in one of those three bins, and each (left, right) pair meets
    * in exactly ONE bin — the right row's — so no dedup is needed). The
    * equi-join on (key, bin) shuffles each side once; candidates are 3
    * bins wide per left row instead of |L|×|R| per key; the exact |Δt| ≤
    * window filter runs on the joined rows. Left rows with no neighbor
    * come back with 0. */
  def rangeJoinCount(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      windowSeconds: Long): DataFrame = {
    val winUs = windowSeconds * 1000000L
    val lBin = floor(unix_micros(col(tsCol)) / winUs).cast("long")
    val l = left.select(
        col(idCol), col(keyCol), unix_micros(col(tsCol)).as("__lus"), lBin.as("__b"))
      .withColumn("__bin", explode(array(col("__b") - 1, col("__b"), col("__b") + 1)))
      .drop("__b")
    val r = right.select(
      col(keyCol), unix_micros(col(tsCol)).as("__rus"),
      floor(unix_micros(col(tsCol)) / winUs).cast("long").as("__bin"))
    val counts = l.join(r, Seq(keyCol, "__bin"))
      .filter(abs(col("__lus") - col("__rus")) <= winUs)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_nearby"))
    left.select(col(idCol))
      .join(counts, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_nearby"), lit(0L)).as("n_nearby"))
  }

  /** OLS forecast extending [[dailyTrend]]: fit slope AND intercept per
    * type over the daily-mean series, then project `horizonDays` values
    * past the last observed day — the capacity-planning readout ("where
    * is this metric in three days if the drift holds"). Slope and
    * intercept are rounded to 6 dp BEFORE projection so both engines
    * extrapolate the identical line.
    *
    * 100 TB shape: same as dailyTrend — one corpus-sized reduction to
    * (type, day) means, OLS as covar/var aggregates over that tiny
    * series, horizons exploded from a literal sequence (#types ×
    * horizon rows). Returns (event_type, horizon, forecast). */
  def trendForecast(
      events: DataFrame, horizonDays: Int = 3,
      epoch: String = "2024-01-01"): DataFrame = {
    require(horizonDays >= 1, s"horizonDays must be >= 1, got $horizonDays")
    val daily = events.groupBy(
        col("event_type"),
        datediff(date_trunc("day", col("ts")), lit(epoch).cast("date"))
          .cast("double").as("x"))
      .agg(avg(col("value")).as("mv"))
    daily.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("__tf_n"),
        max(col("x")).as("__tf_xmax"),
        round(covar_pop(col("x"), col("mv")) / var_pop(col("x")), 6).as("__tf_b"),
        round(avg(col("mv")), 6).as("__tf_my"),
        round(avg(col("x")), 6).as("__tf_mx"))
      .filter(col("__tf_n") >= 2)
      .select(col("event_type"), col("__tf_xmax"), col("__tf_b"),
        // intercept from the ROUNDED slope, itself rounded — the engines
        // then share the projection inputs bit-for-bit
        round(col("__tf_my") - col("__tf_b") * col("__tf_mx"), 6).as("__tf_a"),
        explode(sequence(lit(1), lit(horizonDays))).as("horizon"))
      .select(col("event_type"), col("horizon").cast("long").as("horizon"),
        round(col("__tf_a") + col("__tf_b") * (col("__tf_xmax") + col("horizon")), 4)
          .as("forecast"))
  }

  /** Last-touch marketing attribution, batch form (the streaming twin is
    * [[attributionStreaming]]): each purchase's value is credited to the
    * user's most recent prior touch event (inclusive at equal ts — a touch
    * logged at the purchase timestamp still gets credit), purchases with
    * no prior touch fall into the 'direct' channel. Touches sharing a
    * (user, ts) cell are pre-collapsed to the max-event-id one, so the
    * as-of carry is deterministic.
    *
    * 100 TB shape: rides [[asofJoin]] — one tagged-union exchange on
    * user_id, one per-user window carry (per-user event counts bound the
    * partition, never the corpus), then a channel-cardinality aggregate.
    * Returns (channel, n_purchases, revenue), revenue 4 dp. */
  def lastTouchAttribution(
      events: DataFrame,
      purchaseType: String = "purchase",
      touchTypes: Seq[String] = Seq("click", "view", "signup")): DataFrame = {
    require(touchTypes.nonEmpty, "lastTouchAttribution requires touch types")
    val purchases = events.filter(col("event_type") === purchaseType)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val touches = events.filter(col("event_type").isin(touchTypes: _*))
      .groupBy(col("user_id"), col("ts"))
      .agg(max(struct(col("event_id"), col("event_type"))).as("__lt_m"))
      .select(col("user_id"), col("ts"),
        col("__lt_m.event_type").as("channel"))
    asofJoin(purchases, touches, "user_id", "ts", prefix = "touch_")
      .groupBy(coalesce(col("touch_channel"), lit("direct")).as("channel"))
      .agg(
        count(lit(1)).as("n_purchases"),
        round(sum(col("value")), 4).as("revenue"))
  }

  /** Hourly OHLC downsample per event type: open/high/low/close of `value`
    * within each (hour, type) bar, ties on ts broken by event_id so both
    * engines pick the same open/close row. The resample that turns a raw
    * tick stream into a bounded bar table a dashboard can hold whole.
    *
    * 100 TB shape: ONE grouped aggregation — min_by/max_by are ordinary
    * partial-aggregable Catalyst aggregates, so every map task reduces its
    * splits to at most one candidate bar per (hour, type) before the
    * exchange, and the result is (#hours × #types) rows regardless of
    * input size. Returns (hour, event_type, open, high, low, close, n). */
  def ohlcDownsample(events: DataFrame): DataFrame =
    events.groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
      .agg(
        round(expr("min_by(value, struct(ts, event_id))"), 4).as("open"),
        round(max(col("value")), 4).as("high"),
        round(min(col("value")), 4).as("low"),
        round(expr("max_by(value, struct(ts, event_id))"), 4).as("close"),
        count(lit(1)).as("n"))
      .select(
        date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("open"), col("high"), col("low"),
        col("close"), col("n"))

  /** Streaming twin of [[ohlcDownsample]]: the same min_by/max_by bar
    * aggregation under an event-time window + watermark — bars finalize
    * one watermark delay after their hour closes. Same alignment contract
    * as [[hourlyAggStreaming]]. */
  def ohlcStreaming(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        round(expr("min_by(value, struct(ts, event_id))"), 4).as("open"),
        round(max(col("value")), 4).as("high"),
        round(min(col("value")), 4).as("low"),
        round(expr("max_by(value, struct(ts, event_id))"), 4).as("close"),
        count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("open"), col("high"), col("low"),
        col("close"), col("n"))

  /** Idempotency pass over an event stream: collapse duplicate deliveries
    * — rows sharing (user, type, minute) — to the FIRST by (ts, event_id),
    * and report per type how much of the stream was replay. At-least-once
    * ingestion (Kafka redeliveries, SDK retries, backfill overlap) makes
    * this the first transform of every event pipeline; running it as a
    * grouped min_by aggregation (never a per-key ranking window) keeps it
    * one partial-aggregated exchange — each map task forwards at most one
    * candidate per (user, type, minute) cell.
    *
    * Returns (event_type, n_total, n_kept, dup_frac), dup_frac 6 dp. */
  def dedupeEvents(events: DataFrame): DataFrame =
    events
      .groupBy(
        col("user_id"), col("event_type"),
        date_trunc("minute", col("ts")).as("__de_m"))
      .agg(count(lit(1)).as("__de_n"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("__de_n")).as("n_total"),
        count(lit(1)).as("n_kept"),
        round(lit(1.0) - count(lit(1)).cast("double") / sum(col("__de_n")), 6)
          .as("dup_frac"))

  /** RFM segmentation: per-user Recency (days since last activity, against
    * the corpus max day as the anchor), Frequency (event count) and
    * Monetary (summed value), each graded 1–4 against the population
    * quartiles. r_score counts DOWN with staleness (4 = most recent) so
    * all three scores read "higher is better"; boundary ties grade
    * identically in both engines because the quartiles are rounded to 4 dp
    * before comparison and the comparison is strict `>`.
    *
    * 100 TB shape: one per-user aggregation (the only corpus-sized
    * exchange — users ≪ events), then a 1-row anchor and a 1-row quartile
    * frame cross-joined broadcast-small onto the per-user table. The
    * quartiles are exact percentiles of the PER-USER table; at extreme
    * user cardinality swap `percentile` for `approx_percentile` — the
    * grading logic is unchanged. Returns (user_id, recency_days,
    * frequency, monetary, r_score, f_score, m_score). */
  def rfmSegments(events: DataFrame): DataFrame = {
    val perUser = events.groupBy(col("user_id"))
      .agg(
        max(col("ts")).as("last_ts"),
        count(lit(1)).as("frequency"),
        round(sum(col("value")), 4).as("monetary"))
    val anchor = perUser.agg(max(to_date(col("last_ts"))).as("anchor"))
    val m = perUser.crossJoin(broadcast(anchor))
      .select(
        col("user_id"),
        datediff(col("anchor"), to_date(col("last_ts"))).cast("long")
          .as("recency_days"),
        col("frequency"), col("monetary"))
    val qs = m.agg(
        expr("percentile(recency_days, array(0.25, 0.5, 0.75))").as("rq"),
        expr("percentile(frequency, array(0.25, 0.5, 0.75))").as("fq"),
        expr("percentile(monetary, array(0.25, 0.5, 0.75))").as("mq"))
      .select(
        round(col("rq")(0), 4).as("r1"), round(col("rq")(1), 4).as("r2"),
        round(col("rq")(2), 4).as("r3"),
        round(col("fq")(0), 4).as("f1"), round(col("fq")(1), 4).as("f2"),
        round(col("fq")(2), 4).as("f3"),
        round(col("mq")(0), 4).as("m1"), round(col("mq")(1), 4).as("m2"),
        round(col("mq")(2), 4).as("m3"))
    def grade(c: Column, q1: Column, q2: Column, q3: Column): Column =
      lit(1) + (c > q1).cast("int") + (c > q2).cast("int") + (c > q3).cast("int")
    m.crossJoin(broadcast(qs)).select(
      col("user_id"), col("recency_days"), col("frequency"), col("monetary"),
      (lit(5) - grade(col("recency_days"), col("r1"), col("r2"), col("r3")))
        .as("r_score"),
      grade(col("frequency"), col("f1"), col("f2"), col("f3")).as("f_score"),
      grade(col("monetary"), col("m1"), col("m2"), col("m3")).as("m_score"))
  }

  /** Kaplan–Meier survival curve over user lifetimes. A user's lifetime is
    * last-day − first-day; users still active within `censorDays` of the
    * corpus end are right-CENSORED (we never saw them churn), everyone
    * else's lifetime ends in an observed churn. S(t) multiplies the
    * per-time survival fractions (1 − d/n) over event times ≤ t, computed
    * as exp of a running sum of logs so it prefix-sums in both engines;
    * once the at-risk set empties the curve pins to exactly 0 (ln(0)
    * diverges and Spark's log returns null there — the CASE guard keeps
    * the engines identical).
    *
    * 100 TB shape: one per-user aggregation (the only corpus-sized
    * exchange), then everything runs on the (lifetime → counts) table,
    * whose size is bounded by the calendar span in days — the global
    * ordered window is over THAT bounded table, never the raw stream.
    * Returns (lifetime_days, n_churned, n_censored, at_risk, survival). */
  def survivalCurve(events: DataFrame, censorDays: Int = 7): DataFrame = {
    require(censorDays >= 1, s"censorDays must be >= 1, got $censorDays")
    val life = events.groupBy(col("user_id"))
      .agg(
        to_date(min(col("ts"))).as("first_day"),
        to_date(max(col("ts"))).as("last_day"))
    val anchor = life.agg(max(col("last_day")).as("anchor"))
    val marked = life.crossJoin(broadcast(anchor))
      .select(
        datediff(col("last_day"), col("first_day")).cast("long").as("t"),
        (datediff(col("anchor"), col("last_day")) >= censorDays)
          .cast("int").as("churned"))
    val byT = marked.groupBy(col("t")).agg(
      sum(col("churned")).cast("long").as("d"),
      (count(lit(1)) - sum(col("churned"))).cast("long").as("c"))
    val tot = byT.agg(sum(col("d") + col("c")).as("n_total"))
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT.crossJoin(broadcast(tot))
      .withColumn("at_risk",
        (col("n_total") - coalesce(sum(col("d") + col("c")).over(wPrev), lit(0L)))
          .cast("long"))
      .select(
        col("t").as("lifetime_days"), col("d").as("n_churned"),
        col("c").as("n_censored"), col("at_risk"),
        when(sum(when(col("d") >= col("at_risk"), 1).otherwise(0)).over(wCum) > 0,
            lit(0.0))
          .otherwise(round(exp(sum(
            log(lit(1.0) - col("d").cast("double") / col("at_risk"))).over(wCum)), 6))
          .as("survival"))
  }

  /** Streaming sessionization with explicit state: flatMapGroupsWithState
    * with a processing-time timeout; emits a row per closed session. The
    * streaming analogue of [[sessionize]] for unbounded input. */
  case class Ev(user_id: Long, ts: Timestamp)
  case class SessionState(start: Long, last: Long, n: Int)
  case class ClosedSession(user_id: Long, start: Long, end: Long, n_events: Int)

  /** Volume-anomaly detection over the hourly event stream: flag (hour,
    * event_type) cells whose event count sits `nSigma`+ population standard
    * deviations from that type's mean hourly count — the monitoring pass
    * that catches ingestion gaps, bot bursts and replay storms in an event
    * pipeline. Shape: ONE partial-aggregated hourly count (the raw events
    * cross exactly that exchange); the per-type mean/stddev table is
    * event-type-cardinality (tiny) and broadcasts back onto the hourly
    * cells. Mean and stddev are rounded to 6 dp BEFORE the z-score (and z
    * to 4 dp before thresholding), so the flag decision is engine-stable.
    * A zero-variance type (every hourly count identical — heartbeats) by
    * definition has no outlier hours and is filtered out BEFORE the z-score
    * is formed; without that guard 0.0/0.0 = NaN, and Spark's NaN ordering
    * makes abs(NaN) >= nSigma TRUE, flagging every hour of a perfectly
    * regular type. A NULL event_type is a real cohort (groupBy keeps it),
    * so the stats join is null-safe (<=>) rather than equality.
    * Returns (hour, event_type, n, z) for |z| ≥ nSigma. */
  def anomalousHours(events: DataFrame, nSigma: Double = 3.0): DataFrame = {
    // persisted: the stats branch and the join's left side both read it —
    // without this the raw events cross the count exchange twice
    val hourly = graft.operators.OpUtils.shared(events.groupBy(
        date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n")))
    hourly.join(broadcast(hourlyTypeStats(hourly)), col("event_type") <=> col("__an_type"))
      .withColumn("z", round((col("n") - col("mean_n")) / col("sd_n"), 4))
      .filter(abs(col("z")) >= nSigma)
      .select(
        date_format(col("hour"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("z"))
  }

  /** Per-type hourly-count statistics from the (hour, event_type, n) cells:
    * (`__an_type`, mean_n, sd_n), zero-variance types dropped. Shared by
    * the batch detector and — precomputed over history — the streaming
    * twin. */
  def hourlyTypeStats(hourly: DataFrame): DataFrame =
    hourly.groupBy(col("event_type"))
      .agg(
        round(avg(col("n")), 6).as("mean_n"),
        round(stddev_pop(col("n")), 6).as("sd_n"))
      .filter(col("sd_n") > 0)
      .withColumnRenamed("event_type", "__an_type")

  /** Streaming twin of [[anomalousHours]]: hourly WINDOWED counts under a
    * watermark, z-scored against PRECOMPUTED per-type stats — the batch
    * pipeline's [[hourlyTypeStats]] over history, refreshed out of band.
    * (An append-mode stream cannot both accumulate a type's full hourly
    * history for the mean/sd AND emit per-hour verdicts — the stats are a
    * slowly-changing static input by design, exactly like the saved
    * minhash index in the dedup twins.) Emits append-mode
    * (hour, event_type, n, z) once each hourly window closes; state is the
    * open windows inside the watermark horizon, bounded. */
  def anomalousHoursStreaming(
      events: DataFrame,
      stats: DataFrame,
      nSigma: Double = 3.0,
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(stats), col("event_type") <=> col("__an_type"))
      .withColumn("z", round((col("n") - col("mean_n")) / col("sd_n"), 4))
      .filter(abs(col("z")) >= nSigma)
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("z"))

  /** Stream-stream interval join: attribute each purchase to the same
    * user's clicks within the preceding `windowMinutes` — the canonical
    * watermarked stream-stream join (clicks arrive on one stream,
    * purchases on another; neither side is static). The time-range
    * predicate plus BOTH watermarks is what bounds the join state: Spark
    * evicts a buffered click once the purchase-side watermark passes
    * click_ts + window, so state is (watermark + interval)-sized per key,
    * never the full history. The batch analog is the bin±1 equi-join of
    * [[rangeJoinCounts]]; this is its liveness twin (results emit as the
    * watermark closes, no batch boundary).
    *
    * Returns (user_id, purchase_id, click_id, purchase_ts, click_ts). */
  def attributionStreaming(
      clicks: DataFrame,
      purchases: DataFrame,
      windowMinutes: Int = 60,
      watermark: String = "2 hours"): DataFrame = {
    require(windowMinutes >= 1, s"windowMinutes must be >= 1, got $windowMinutes")
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", watermark)
    p.join(c, expr(
        s"""c_user = p_user AND
           |click_ts >= purchase_ts - INTERVAL $windowMinutes MINUTES AND
           |click_ts <= purchase_ts""".stripMargin))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"))
  }

  /** Stream-static dimension enrichment: each streaming event picks up the
    * SCD2 status interval containing it — the live twin of
    * the batch point-in-interval lookup (events_interval_join). The
    * interval table is a slowly-changing STATIC side (rebuilt out of band
    * by [[statusIntervals]], like the saved-index dedup twins); Spark
    * re-broadcasts it per micro-batch, so the join is stateless — no
    * watermark, no state store, append mode. At most one interval
    * contains a given (key, ts) by SCD2 construction, so the left join
    * preserves stream cardinality. Unmatched events keep NULL status
    * (probe before the key's first interval). */
  def enrichWithIntervalsStreaming(
      events: DataFrame,
      intervals: DataFrame,
      keyCol: String,
      tsCol: String): DataFrame = {
    val iv = broadcast(intervals.select(
      col(keyCol).as("__iv_k"), col("status"),
      col("valid_from").as("__vf"), col("valid_to").as("__vt")))
    events.join(iv,
      col(keyCol) === col("__iv_k") &&
        col(tsCol) >= col("__vf") &&
        (col("__vt").isNull || col(tsCol) < col("__vt")),
      "left")
      .drop("__iv_k", "__vf", "__vt")
  }

  case class TypedEv(user_id: Long, ts: Timestamp, event_type: String)
  case class FunnelState(stageIdx: Int, stageTs: Long, startedTs: Long)
  case class Conversion(user_id: Long, started: Long, converted: Long, duration_ms: Long)

  /** Streaming twin of the WINDOWED funnel ([[funnelCounts]] with maxLag):
    * per-user stage progression held in `flatMapGroupsWithState`, emitting
    * a [[Conversion]] the moment a user completes every stage in order
    * with each hop inside the lag window. The batch op is a census (how
    * many users ever converted); this is its liveness twin — a conversion
    * FEED, emitting per completion and resetting so repeat conversions
    * count again.
    *
    * Semantics mirror the batch op's earliest-qualifying rule: progress
    * never resets on a repeated earlier stage (the first 'view' anchors
    * the window, a second one is ignored); an over-lag gap resets to
    * stage zero, and the expiring event may itself restart the funnel.
    * State per user is ONE (stageIdx, ts, started) triple — bytes, not
    * history — and idle users' entries are reaped by a processing-time
    * timeout of stages×lag. */
  def funnelStreaming(
      events: Dataset[TypedEv],
      stages: Seq[String],
      maxLagMinutes: Long = 60): Dataset[Conversion] = {
    require(stages.nonEmpty)
    import events.sparkSession.implicits._
    val lagMs = maxLagMinutes * 60000L
    val empty = FunnelState(0, 0L, 0L)
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Conversion](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        case (user, evs, state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var cur = state.getOption.getOrElse(empty)
            val out = Seq.newBuilder[Conversion]
            evs.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              if (cur.stageIdx > 0 && t - cur.stageTs > lagMs) cur = empty
              if (e.event_type == stages(cur.stageIdx)) {
                val started = if (cur.stageIdx == 0) t else cur.startedTs
                cur = FunnelState(cur.stageIdx + 1, t, started)
                if (cur.stageIdx == stages.size) {
                  out += Conversion(user, started, t, t - started)
                  cur = empty
                }
              }
            }
            if (cur == empty) { if (state.exists) state.remove() }
            else {
              state.update(cur)
              state.setTimeoutDuration(lagMs * stages.size)
            }
            out.result().iterator
          }
      }
  }

  def sessionizeStreaming(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        case (user, evs, state: GroupState[SessionState]) =>
          // processing-time timeout closes the FINAL session of a user who
          // goes idle — without it, the last session per user is never
          // emitted and its state entry lives forever
          if (state.hasTimedOut) {
            val out = state.getOption.map(s => ClosedSession(user, s.start, s.last, s.n))
            state.remove()
            out.iterator
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed += ClosedSession(user, s.start, s.last, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutDuration(gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
