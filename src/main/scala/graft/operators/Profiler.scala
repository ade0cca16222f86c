package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the per-column data-quality summary (row count, null
  * count, distinct count, min/max) every ingestion pipeline runs before
  * trusting a new drop of training data.
  *
  * 100 TB shape: ALL columns are profiled in ONE aggregation over ONE scan —
  * never a scan-per-column loop. The per-column statistics ride a single
  * 1-row aggregate (partial/final, map-side combined), and the row-per-column
  * output shape is produced by exploding that 1-row frame driver-free. Exact
  * distinct counts make Spark plan an Expand (one input row replicated per
  * DISTINCT aggregate — rows × #cols intermediate, still one scan); at real
  * scale pass `exact = false` to switch every distinct count to HLL
  * `approx_count_distinct` (±2.3% at the default precision), which drops the
  * Expand and keeps the aggregate state fixed-size per column. The oracle
  * pins the exact mode; the approx mode shares every other expression.
  *
  * Min/max are cast to string so heterogeneous column types share one output
  * schema — the profiler idiom. Cast formatting is engine-sensitive for
  * floats (exponent thresholds differ), so float columns should be rounded
  * BEFORE profiling (round is monotone, so round(min) = min(round)).
  *
  * Returns one row per profiled column:
  * (col_name, n_rows, n_nulls, n_distinct, min_val, max_val). */
object Profiler {

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile requires at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    val aggs = count(lit(1)).cast("long").as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).cast("long").as(s"__cnt_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).cast("long").as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val agged = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__cnt_$c")).cast("long").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_val"),
        col(s"__max_$c").as("max_val"))
    }
    agged.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }

  /** Categorical value-distribution profile per column: distinct-value
    * count, top-value share, and Shannon entropy (bits) — the skew screen
    * that catches a "language" column that is 99% one value or an
    * exploded-cardinality "source" before they bite a training run. NULL
    * is profiled as a category (a 40%-NULL column is exactly what this
    * exists to surface). Entropy is assembled as
    * log2(N) − Σ n·log2(n) / N from the per-value counts, so the whole
    * profile is ONE unpivot scan + one (column, value) aggregation + one
    * #columns-row reduce.
    *
    * 100 TB shape: the unpivot is a narrow map-side explode (#cols rows
    * per input row, all profiled columns read in the SAME scan); the only
    * corpus-sized exchange carries (column, value) pairs, which partial
    * aggregation collapses to distinct-value cardinality before the wire.
    *
    * Returns (col_name, n_values, n_rows, top_share, entropy). */
  def valueSkew(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "valueSkew requires at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("value"))): _*)).as("p"))
      .select(col("p.col_name"), col("p.value"))
    val counts = pairs.groupBy(col("col_name"), col("value"))
      .agg(count(lit(1)).as("n"))
    counts.groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n_values"),
        sum(col("n")).as("n_rows"),
        round(max(col("n")) / sum(col("n")).cast("double"), 6).as("top_share"),
        round(
          (log(sum(col("n")).cast("double")) -
            sum(col("n") * log(col("n").cast("double"))) / sum(col("n")).cast("double"))
            / log(lit(2.0)), 6).as("entropy"))
  }

  /** Pairwise Pearson correlations for the given numeric column pairs —
    * the redundancy screen run before feature selection or schema slimming
    * ("these two columns are the same signal"). ALL pairs compute in ONE
    * aggregation over ONE scan (the [[profile]] discipline): each `corr`
    * is a fixed-size moment accumulator, so the map-side state is a few
    * doubles per pair regardless of row count. Correlations rounded to
    * 6 dp for cross-engine float parity; a zero-variance column yields a
    * NULL correlation — under ANSI semantics Spark's `corr` THROWS on the
    * zero divisor inside its own aggregate finalization (no projection can
    * guard it), so Pearson is assembled from the raw moments instead:
    * covar_pop / (stddev_pop · stddev_pop), with the division guarded in
    * the post-aggregation projection. Same single-pass moment state,
    * DuckDB-NULL-compatible.
    *
    * Returns one row per pair: (col_a, col_b, n, corr). */
  def correlations(df: DataFrame, pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "correlations requires at least one column pair")
    val missing = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    val aggs = count(lit(1)).cast("long").as("__n") +: pairs.zipWithIndex.flatMap {
      case ((a, b), i) =>
        val (ca, cb) = (col(a).cast("double"), col(b).cast("double"))
        Seq(
          covar_pop(ca, cb).as(s"__cv_$i"),
          stddev_pop(ca).as(s"__sa_$i"),
          stddev_pop(cb).as(s"__sb_$i"))
    }
    val agged = df.agg(aggs.head, aggs.tail: _*)
    val entries = pairs.zipWithIndex.map { case ((a, b), i) =>
      struct(
        lit(a).as("col_a"), lit(b).as("col_b"),
        col("__n").as("n"),
        round(when(col(s"__sa_$i") > 0 && col(s"__sb_$i") > 0,
          col(s"__cv_$i") / (col(s"__sa_$i") * col(s"__sb_$i"))), 6).as("corr"))
    }
    agged.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }
}
