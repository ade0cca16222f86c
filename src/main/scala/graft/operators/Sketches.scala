package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches (Apache DataSketches via Spark's native
  * hll_ / theta_ expressions) — the pre-aggregated summary-table pattern
  * that makes distinct-count analytics affordable at 100 TB.
  *
  * The scale story is the MERGE, not the estimate: materialize one small
  * sketch per partition cell (per day, per source, per shard) in a summary
  * table, then answer any coarser rollup — per month, per corpus, across
  * corpora — by unioning CELLS. The raw data is scanned exactly once, ever;
  * every subsequent distinct-count question costs |cells|, not |rows|, and
  * a new day appends one cell instead of invalidating the total. Exact
  * COUNT(DISTINCT) offers no such decomposition: its partials are the full
  * key sets, so every rollup re-shuffles every key.
  *
  * Theta sketches add set ALGEBRA (intersection, difference) — e.g.
  * estimate train∩eval contamination or cross-corpus user overlap without
  * materializing a join. A theta sketch is EXACT below its nominal capacity
  * k = 2^lgK (it keeps raw 64-bit key hashes until k overflows, only then
  * sampling); past k the relative standard error is ~1/√k. HLL estimates
  * are likewise exact while the sketch is still in its sparse/coupon
  * regime and ~1.04/√(2^lgK) RSE once dense. */
object Sketches {

  /** Per-cell HLL distinct sketches: one binary sketch of `valueCol` per
    * `groupCols` cell — the summary table you'd write daily. One narrow
    * partial/final aggregation; cells are a few KB each at any row count. */
  def hllCells(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      lgK: Int = 14): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lgK).as("hll"))

  /** Streaming twin of [[hllCells]]: watermarked daily windows emit one
    * immutable HLL cell per (window, group) once the window closes
    * (append mode) — the summary-table PRODUCER as a continuous job. The
    * emitted binary cells are byte-compatible with the batch cells, so one
    * [[hllRollup]] serves history written by either path; state is the
    * open windows inside the watermark horizon, each a few-KB sketch
    * buffer rather than a key set. */
  def hllCellsStreaming(
      events: DataFrame,
      groupCol: String,
      valueCol: String,
      lgK: Int = 14,
      watermark: String = "2 days"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day").as("w"), col(groupCol))
      .agg(hll_sketch_agg(col(valueCol), lgK).as("hll"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col(groupCol), col("hll"))

  /** Roll sketch cells up to coarser groups: distinct estimates from
    * unioning CELLS — the raw rows are never touched again. Also returns
    * how many cells merged into each estimate. */
  def hllRollup(cells: DataFrame, groupCols: Seq[String]): DataFrame =
    cells.groupBy(groupCols.map(col): _*)
      .agg(
        hll_sketch_estimate(hll_union_agg(col("hll"))).as("est_distinct"),
        count(lit(1)).as("n_cells"))

  /** Trailing-window distinct counts from DAILY CELLS: for every observed
    * day, the distinct `valueCol` estimate over the trailing `windowDays`
    * — the "rolling 7-day active users" series, answered by merging a
    * handful of immutable per-day sketches instead of re-scanning (and
    * re-shuffling the keys of) up to `windowDays`× the raw stream per
    * output row. Each cell EXPLODES to the ≤ `windowDays` output days it
    * contributes to (aggregate-first: `windowDays` rows per cell, never a
    * range join), then one union-merge per day; a trailing semi-join
    * keeps only days that actually occur. At sketch-sparse cardinalities
    * the estimates are exact (the oracle regime); at 100 TB the same
    * plan answers within HLL's ±1.04/√2^lgK. Returns (day string,
    * est_distinct_window, n_days_merged). */
  def hllRollingDistinct(
      events: DataFrame, tsCol: String, valueCol: String,
      windowDays: Int = 7, lgK: Int = 14): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val cells = hllCells(
      events.select(to_date(col(tsCol)).as("__rd_day"), col(valueCol)),
      Seq("__rd_day"), valueCol, lgK)
    val spine = cells.select(col("__rd_day").as("__rd_d"))
    cells
      .select(explode(expr(
        s"sequence(__rd_day, date_add(__rd_day, ${windowDays - 1}))"))
        .as("__rd_d"), col("hll"))
      .join(spine, Seq("__rd_d"), "left_semi")
      .groupBy(col("__rd_d"))
      .agg(
        hll_sketch_estimate(hll_union_agg(col("hll"))).as("est_distinct_window"),
        count(lit(1)).as("n_days_merged"))
      .select(date_format(col("__rd_d"), "yyyy-MM-dd").as("day"),
        col("est_distinct_window"), col("n_days_merged"))
  }

  /** Per-cell KLL quantile sketches over `valueCol` — the quantile analog
    * of [[hllCells]], via the custom [[graft.functions.KllSketchAgg]]
    * (Spark ships no mergeable quantile sketch). Size `k` above the
    * merged-cell row count to stay in the exact deterministic regime;
    * past it the estimate carries the KLL ±ε. */
  def kllCells(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      k: Int = 200): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.GraftFunctions.kllSketchAgg(col(valueCol), k).as("kll"))

  /** Roll KLL cells up to coarser groups and evaluate `probs` quantiles on
    * the merged sketch — raw values are never touched again. Returns the
    * group columns + `qs` (array<double>, one entry per prob, INCLUSIVE
    * rank semantics) + `n_cells`. */
  def kllRollup(cells: DataFrame, groupCols: Seq[String], probs: Seq[Double],
      k: Int = 200): DataFrame =
    cells.groupBy(groupCols.map(col): _*)
      .agg(
        graft.functions.GraftFunctions.kllMergeAgg(col("kll"), k).as("merged"),
        count(lit(1)).as("n_cells"))
      .select(groupCols.map(col) ++ Seq(
        graft.functions.GraftFunctions.kllQuantiles(col("merged"), probs).as("qs"),
        col("n_cells")): _*)

  /** Trailing-window quantiles from daily KLL cells — the quantile twin
    * of [[hllRollingDistinct]], same aggregate-first shape: per-day cells
    * explode to the ≤ `windowDays` output days they serve, one merge +
    * quantile evaluation per day, the raw values never re-shuffled. With
    * `k` above the merged-window row count the quantiles are the exact
    * inclusive-rank order statistics (the oracle regime); past it, KLL's
    * ±ε. Returns (day string, qs array over `probs`, n_days_merged). */
  def kllRollingQuantiles(
      events: DataFrame, tsCol: String, valueCol: String, probs: Seq[Double],
      windowDays: Int = 7, k: Int = 200): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val cells = kllCells(
      events.select(to_date(col(tsCol)).as("__rq_day"), col(valueCol)),
      Seq("__rq_day"), valueCol, k)
    val spine = cells.select(col("__rq_day").as("__rq_d"))
    val exploded = cells
      .select(explode(expr(
        s"sequence(__rq_day, date_add(__rq_day, ${windowDays - 1}))"))
        .as("__rq_d"), col("kll"))
      .join(spine, Seq("__rq_d"), "left_semi")
    kllRollup(exploded, Seq("__rq_d"), probs, k)
      .select(date_format(col("__rq_d"), "yyyy-MM-dd").as("day"),
        col("qs"), col("n_cells").as("n_days_merged"))
  }

  /** Set-algebra estimate between two keyed relations via theta sketches:
    * |A|, |B|, |A∩B|, |A∪B|, |A∖B| from ONE aggregation per side and a
    * 1-row × 1-row combine — no join of the underlying keys. With lgK
    * sized above both cardinalities the numbers are exact; past that,
    * ±1/√(2^lgK) — either way the 100 TB contamination question ("is the
    * overlap ~0 or ~10%?") is answered before any full decontamination
    * join is paid for. */
  def thetaOverlap(
      a: DataFrame,
      aCol: String,
      b: DataFrame,
      bCol: String,
      lgK: Int = 20): DataFrame = {
    val sa = a.agg(theta_sketch_agg(col(aCol), lgK).as("ska"))
    val sb = b.agg(theta_sketch_agg(col(bCol), lgK).as("skb"))
    // both sides are single-row aggregates — the cross join combines two
    // scalars, not relations
    sa.crossJoin(sb).select(
      theta_sketch_estimate(col("ska")).as("est_a"),
      theta_sketch_estimate(col("skb")).as("est_b"),
      theta_sketch_estimate(theta_intersection(col("ska"), col("skb"))).as("est_both"),
      // theta_union has its OWN nominal k (default lgK=12) — pass the
      // sketch lgK through or the union silently downsamples below it
      theta_sketch_estimate(theta_union(col("ska"), col("skb"), lgK)).as("est_union"),
      theta_sketch_estimate(theta_difference(col("ska"), col("skb"))).as("est_only_a"))
  }
}
