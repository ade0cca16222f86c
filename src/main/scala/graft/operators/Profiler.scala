package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Chi-square test of independence between two categorical columns —
    * "is quality stratified by source", "does language depend on crawl" —
    * with Cramér's V as the effect size (chi2 alone grows with N; V is
    * the [0,1]-normalized association strength). NULL is a category on
    * both axes (null-safe joins throughout). Expected counts come from
    * the R×C marginal lattice so ZERO-OBSERVED cells contribute — summing
    * observed cells only understates chi2. V is NULL when either axis is
    * constant (dof = 0: independence is vacuous).
    *
    * 100 TB shape: one grouped count of the corpus (the only corpus-sized
    * exchange, partial-agg collapsed to R×C cells), then marginals,
    * lattice and the final reduce all run at category cardinality; the
    * scalar totals ride along as broadcast single-row frames, never a
    * driver collect.
    *
    * Returns one row: (n, n_a, n_b, dof, chi2, cramers_v), rounded 6 dp. */
  def chiSquare(df: DataFrame, colA: String, colB: String): DataFrame = {
    val missing = Seq(colA, colB).filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    val counts = df
      .groupBy(col(colA).cast("string").as("__a"), col(colB).cast("string").as("__b"))
      .agg(count(lit(1)).as("__n"))
    val rowm = counts.groupBy(col("__a").as("__ra_a")).agg(sum(col("__n")).as("__ra"))
    val colm = counts.groupBy(col("__b").as("__cb_b")).agg(sum(col("__n")).as("__cb"))
    val total = counts.agg(sum(col("__n")).as("__nn"))
    val nA = rowm.agg(count(lit(1)).as("__n_a"))
    val nB = colm.agg(count(lit(1)).as("__n_b"))
    val lattice = rowm.crossJoin(colm)
      .join(counts,
        col("__ra_a") <=> col("__a") && col("__cb_b") <=> col("__b"), "left")
      .crossJoin(broadcast(total))
      .select(col("__ra"), col("__cb"),
        coalesce(col("__n"), lit(0L)).cast("double").as("__obs"),
        col("__nn").cast("double").as("__nnd"))
    val e = col("__ra").cast("double") * col("__cb").cast("double") / col("__nnd")
    lattice
      .agg(
        max(col("__nnd")).cast("long").as("n"),
        sum(pow(col("__obs") - e, 2) / e).as("__chi2"))
      .crossJoin(broadcast(nA)).crossJoin(broadcast(nB))
      .select(
        col("n"), col("__n_a").as("n_a"), col("__n_b").as("n_b"),
        ((col("__n_a") - 1) * (col("__n_b") - 1)).cast("long").as("dof"),
        round(col("__chi2"), 6).as("chi2"),
        round(when((col("__n_a") > 1) && (col("__n_b") > 1),
          sqrt(col("__chi2") / (col("n") *
            least(col("__n_a") - 1, col("__n_b") - 1)))), 6).as("cramers_v"))
  }

  /** Mutual information between two categorical columns, with the axis
    * entropies and the normalized MI (MI / √(H(A)·H(B))) — the
    * "how much does knowing A tell you about B" companion to
    * [[chiSquare]]: chi2 tests independence, MI measures it in nats, and
    * NMI puts it on 0..1 so thresholds transfer across column pairs.
    * Only observed cells contribute (0·ln 0 = 0 by convention, so the
    * empty lattice cells drop out and no dense cross join is needed —
    * unlike chi2, whose expected-count sum genuinely spans the lattice).
    * nmi is NULL when either axis is constant (its entropy is 0).
    *
    * 100 TB shape: the raw scan reduces through ONE (a, b) partial-agg
    * count; marginals and the total are re-aggregations of that
    * axis-bounded count table, joined back onto it — nothing downstream
    * exceeds |A|×|B| observed cells. NULL is a category: the marginal
    * join-back is null-safe (<=>), mirroring the oracle's IS NOT
    * DISTINCT FROM.
    *
    * Returns one row: (n, mi, h_a, h_b, nmi), rounded 6 dp. */
  def mutualInformation(df: DataFrame, colA: String, colB: String): DataFrame = {
    val missing = Seq(colA, colB).filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    val counts = df
      .groupBy(col(colA).cast("string").as("__a"), col(colB).cast("string").as("__b"))
      .agg(count(lit(1)).as("__n"))
    val rowm = counts.groupBy(col("__a").as("__ra_a")).agg(sum(col("__n")).as("__ra"))
    val colm = counts.groupBy(col("__b").as("__cb_b")).agg(sum(col("__n")).as("__cb"))
    val total = counts.agg(sum(col("__n")).cast("double").as("__nn"))
    def entropy(cnt: Column): Column = {
      val p = cnt.cast("double") / col("__nn")
      (-sum(p * log(p))).as("__h")
    }
    val ha = rowm.crossJoin(broadcast(total)).agg(entropy(col("__ra")))
      .select(col("__h").as("__ha"))
    val hb = colm.crossJoin(broadcast(total)).agg(entropy(col("__cb")))
      .select(col("__h").as("__hb"))
    val pab = col("__n").cast("double") / col("__nn")
    counts
      .join(rowm, col("__a") <=> col("__ra_a"))
      .join(colm, col("__b") <=> col("__cb_b"))
      .crossJoin(broadcast(total))
      .agg(
        max(col("__nn")).cast("long").as("n"),
        sum(pab * log(col("__n").cast("double") * col("__nn") /
          (col("__ra").cast("double") * col("__cb").cast("double")))).as("__mi"))
      .crossJoin(broadcast(ha)).crossJoin(broadcast(hb))
      .select(
        col("n"),
        round(col("__mi"), 6).as("mi"),
        round(col("__ha"), 6).as("h_a"),
        round(col("__hb"), 6).as("h_b"),
        round(when((col("__ha") > 0) && (col("__hb") > 0),
          col("__mi") / sqrt(col("__ha") * col("__hb"))), 6).as("nmi"))
  }

  /** Full-row duplicate census: total rows, distinct rows, and the
    * duplicated surplus — the ingest-health check that catches doubled
    * loads and replayed partitions before any per-column profile would
    * (column stats barely move when 3% of rows are exact copies; this
    * number is exactly that 3%). One grouped count over all columns (one
    * exchange, partial-aggregated) re-aggregated to a single row.
    * Returns (n_rows, n_distinct, n_dup_rows, dup_frac). */
  def duplicateRows(df: DataFrame): DataFrame =
    df.groupBy(df.columns.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("__d_n"))
      .agg(
        sum(col("__d_n")).cast("long").as("n_rows"),
        count(lit(1)).as("n_distinct"),
        (sum(col("__d_n")) - count(lit(1))).cast("long").as("n_dup_rows"),
        round((sum(col("__d_n")) - count(lit(1))).cast("double") /
          sum(col("__d_n")), 6).as("dup_frac"))

  /** Tukey-fence outlier counts per numeric column: quartiles, the
    * 1.5·IQR fences, and how many values fall outside each — the standard
    * first answer to "is this column's tail real or corrupt". Quartiles
    * and fences are rounded to 4 dp BEFORE counting so both engines
    * compare against the identical pivot (the [[madScale]] discipline);
    * NULLs are excluded from both the quartiles and the counts.
    *
    * 100 TB shape: one unpivot scan feeds a per-column exact-percentile
    * aggregation (exact at column-count cardinality; swap in
    * approx_percentile past ~10⁹ rows per column, the fences logic
    * unchanged), and the column-cardinality fence table joins back
    * unhinted for one counting pass. Two exchanges of the unpivoted
    * stream, nothing wider.
    *
    * Returns (col_name, n, q1, q3, lo_fence, hi_fence, n_low, n_high). */
  def outliers(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "outliers requires at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    val unp = OpUtils.shared(df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("double").as("v"))): _*)).as("p"))
      .select(col("p.col_name"), col("p.v"))
      .filter(col("v").isNotNull))
    val iqr = col("q3") - col("q1")
    val fences = unp.groupBy(col("col_name").as("__o_c"))
      .agg(
        round(expr("percentile(v, 0.25)"), 4).as("q1"),
        round(expr("percentile(v, 0.75)"), 4).as("q3"))
      .select(col("__o_c"), col("q1"), col("q3"),
        round(col("q1") - lit(1.5) * iqr, 4).as("__o_lo"),
        round(col("q3") + lit(1.5) * iqr, 4).as("__o_hi"))
    unp.join(fences, col("col_name") <=> col("__o_c"))
      .groupBy(col("col_name"))
      .agg(
        count(lit(1)).as("n"),
        min(col("q1")).as("q1"), min(col("q3")).as("q3"),
        min(col("__o_lo")).as("lo_fence"), min(col("__o_hi")).as("hi_fence"),
        sum(when(col("v") < col("__o_lo"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("v") > col("__o_hi"), 1L).otherwise(0L)).as("n_high"))
  }

  /** Top-`k` most frequent values per profiled column — the "what is
    * actually in this column" companion to [[valueSkew]]'s summary stats.
    * NULL is a value; ties break on the value itself (NULLS FIRST, pinned
    * on both engines).
    *
    * 100 TB shape: same one-scan unpivot + (column, value) partial-agg
    * count as [[valueSkew]]; the per-column ranking then goes through
    * [[OpUtils.groupedRank]] — range partition on (column, count desc,
    * value), per-partition row_numbers + a broadcast offset table — so a
    * high-cardinality column's count table never funnels through one
    * task the way `Window.partitionBy(column)` would.
    *
    * Returns (col_name, rank, value, n). */
  def topValues(df: DataFrame, cols: Seq[String], k: Int = 5): DataFrame = {
    require(cols.nonEmpty, "topValues requires at least one column")
    require(k >= 1, s"k must be >= 1, got $k")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(", ")}")
    val counts = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("value"))): _*)).as("p"))
      .select(col("p.col_name"), col("p.value"))
      .groupBy(col("col_name"), col("value"))
      .agg(count(lit(1)).as("n"))
    OpUtils.groupedRank(counts, "col_name",
        Seq(col("n").desc, col("value").asc_nulls_first), "rank")
      .filter(col("rank") <= k)
      .select(col("col_name"), col("rank").cast("long").as("rank"),
        col("value"), col("n"))
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

  /** Population-stability-index drift report between the two slices of
    * `df` split by boolean `condA`: per category of `colName`,
    * (p_A − p_B)·ln(p_A/p_B) with add-half smoothing — the standard
    * "did the lang/source/topic mix shift between snapshots" monitor run
    * before a new crawl joins the training mix (rule of thumb: Σ > 0.2 =
    * investigate). Smoothing ((c + 0.5)/(n + 0.5·k), k = distinct
    * categories over BOTH slices) keeps one-sided categories finite, so
    * brand-new and vanished categories contribute large-but-bounded terms
    * instead of ±∞. NULL is a category.
    *
    * 100 TB shape: ONE scan, ONE partial-aggregated exchange (both
    * slices' counts come from the same groupBy via conditional counts);
    * the scalar totals and category count ride a 1-row broadcast.
    * Category-cardinality everywhere downstream.
    *
    * Returns (value, n_a, n_b, psi_term) — Σ(psi_term) is the PSI. */
  def psi(df: DataFrame, colName: String, condA: Column): DataFrame = {
    require(df.columns.contains(colName), s"column not in frame: $colName")
    val counts = df
      .groupBy(col(colName).cast("string").as("value"))
      .agg(
        count(when(condA, 1)).as("n_a"),
        count(when(!condA, 1)).as("n_b"))
    val scalars = counts.agg(
      sum(col("n_a")).cast("double").as("__na"),
      sum(col("n_b")).cast("double").as("__nb"),
      count(lit(1)).cast("double").as("__k"))
    counts.crossJoin(broadcast(scalars))
      .select(col("value"), col("n_a"), col("n_b"),
        round(
          ((col("n_a") + 0.5) / (col("__na") + lit(0.5) * col("__k")) -
            (col("n_b") + 0.5) / (col("__nb") + lit(0.5) * col("__k"))) *
            log(((col("n_a") + 0.5) / (col("__na") + lit(0.5) * col("__k"))) /
              ((col("n_b") + 0.5) / (col("__nb") + lit(0.5) * col("__k")))),
          6).as("psi_term"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic for numeric `valueCol`
    * between the `condA` slice and the rest: D = max over observed values
    * of |CDF_A − CDF_B| — the continuous-distribution companion to [[psi]]
    * ("did latency/price/score values drift", not just category mix).
    * NULL values are excluded (a CDF has no place for them); rows where
    * `condA` is NULL count toward neither slice.
    *
    * 100 TB shape: one grouped count collapses the corpus to the distinct
    * value table (the only corpus-sized exchange); both CDFs are then ONE
    * DISTRIBUTED prefix sum over that table in value order — range
    * partition, per-partition running windows, partition start offsets
    * from a #partitions-row broadcast table — never a single-reducer
    * `Window.orderBy(value)` funnel over the whole domain (plan-asserted).
    * The ranged frame is materialized once so the offset and window
    * branches agree on partition ids (the [[Curation]] prefix-sum
    * discipline).
    *
    * Returns one row: (n_a, n_b, ks) with ks rounded to 6 dp. */
  def ksStatistic(df: DataFrame, valueCol: String, condA: Column): DataFrame = {
    require(df.columns.contains(valueCol), s"column not in frame: $valueCol")
    val parts = df.sparkSession.sparkContext.defaultParallelism
    val counts = df
      .filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("double").as("__ks_v"))
      .agg(
        count(when(condA, 1)).as("__ks_ca"),
        count(when(!condA, 1)).as("__ks_cb"))
    val totals = counts.agg(
      sum(col("__ks_ca")).as("n_a"), sum(col("__ks_cb")).as("n_b"))
    // sharedPinned: pid-keyed two-branch frame — see giniConcentration
    val ranged = OpUtils.sharedPinned(counts
      .repartitionByRange(parts, col("__ks_v"))
      .withColumn("__ks_pid", spark_partition_id()))
    val offsets = ranged.groupBy(col("__ks_pid"))
      .agg(sum(col("__ks_ca")).as("__ks_na"), sum(col("__ks_cb")).as("__ks_nb"))
      .select(col("__ks_pid"),
        coalesce(sum(col("__ks_na")).over(
          Window.orderBy(col("__ks_pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("__ks_offa"),
        coalesce(sum(col("__ks_nb")).over(
          Window.orderBy(col("__ks_pid")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)).as("__ks_offb"))
    val w = Window.partitionBy(col("__ks_pid")).orderBy(col("__ks_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranged
      .withColumn("__ks_ra", sum(col("__ks_ca")).over(w))
      .withColumn("__ks_rb", sum(col("__ks_cb")).over(w))
      .join(broadcast(offsets), "__ks_pid")
      .crossJoin(broadcast(totals))
      .select(col("n_a"), col("n_b"),
        abs((col("__ks_ra") + col("__ks_offa")).cast("double") / col("n_a") -
          (col("__ks_rb") + col("__ks_offb")).cast("double") / col("n_b")).as("__ks_d"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(round(max(col("__ks_d")), 6).as("ks"))
  }

  /** Per-dimension health check over an `Array[Float]` embedding column:
    * count, zero count, mean, population stddev, min, max for each
    * coordinate — the screen that catches collapsed dimensions (sd ≈ 0),
    * dead ReLU coordinates (all zeros), and scale drift between model
    * versions before any of them poison a similarity index.
    *
    * 100 TB shape: one posexplode fans each vector into (dim, value) rows
    * — a narrow ×dim row multiply with no payload amplification (the
    * vector itself already held those floats) — then ONE partial-aggregated
    * exchange collapses to #dims cells per partition before the shuffle.
    * Nothing downstream exceeds dim-cardinality. Floats widen to double
    * BEFORE aggregation (exact), stats round to 4 dp for engine parity.
    *
    * Returns (dim 1-based, n, n_zero, mean, sd, min_v, max_v). */
  def embeddingStats(df: DataFrame, vecCol: String): DataFrame = {
    require(df.columns.contains(vecCol), s"column not in frame: $vecCol")
    df.select(posexplode(col(vecCol)).as(Seq("__es_d", "__es_f")))
      .select((col("__es_d") + 1).cast("long").as("dim"),
        col("__es_f").cast("double").as("v"))
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("v") === 0.0, 1)).as("n_zero"),
        round(avg(col("v")), 4).as("mean"),
        round(stddev_pop(col("v")), 4).as("sd"),
        round(min(col("v")), 4).as("min_v"),
        round(max(col("v")), 4).as("max_v"))
  }

  /** Benford first-digit screen over a positive 2-dp money column: the
    * observed leading-significant-digit distribution against Benford's law
    * p(d) = log₁₀(1 + 1/d) — the cheap anomaly flag for fabricated or
    * truncated numeric data (organic multi-scale amounts follow the law;
    * generated or clipped ones visibly don't).
    *
    * Digit extraction is ENGINE-EXACT: ×100 to exact integer cents (which
    * preserves the leading significant digit for any value ≥ 0.01), then
    * the first character of the INTEGER's decimal string — never
    * floor(x/10^floor(log10 x)), whose log10 wobbles one ulp across
    * engines exactly at the power-of-ten boundaries where the digit flips.
    *
    * 100 TB shape: one narrow projection + one 9-row grouped count, totals
    * as a single-row broadcast. Returns (digit, n, p_obs, p_benford). */
  def benfordDigits(df: DataFrame, valueCol: String): DataFrame = {
    // enforce the documented >= 0.01 domain: below it the cents grid
    // rounds to 0 (a bogus digit-0 row with NULL p_benford) or shifts the
    // leading digit (0.006 → cents 1)
    val digits = df
      .filter(col(valueCol) >= 0.01)
      .select(substring(round(col(valueCol) * 100, 0).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("__t"))
    digits.crossJoin(broadcast(total))
      .select(
        col("digit"), col("n"),
        round(col("n") / col("__t"), 6).as("p_obs"),
        round(log(10.0, lit(1.0) + lit(1.0) / col("digit")), 6).as("p_benford"))
  }

  /** Functional-dependency audit: for each candidate `lhs → rhs`, count the
    * lhs groups whose rhs is NOT single-valued — the data-quality check
    * behind "is this column a key" / "did denormalization drift" that a
    * schema can't answer (constraints aren't enforced in a lake). A
    * candidate HOLDS when zero groups violate; the violation COUNT (not
    * just the boolean) grades how broken a near-dependency is.
    *
    * 100 TB shape: one partial-aggregated exchange per candidate keyed on
    * its lhs (distinct-rhs is computed per group, map-side combined), each
    * collapsing to a single summary row — candidates shuffle on different
    * keys by definition, so they cannot share an exchange, but each is the
    * minimal one for its key and the scan is the only repeated cost
    * (amortize by caching the projected input upstream if the candidate
    * list is long). Nulls: rhs NULLs count as a value (a group with
    * {x, NULL} is a violation); lhs NULL is a group like any other.
    *
    * Returns one row per candidate: (lhs, rhs, n_groups, n_violations,
    * holds). */
  /** Unique-key discovery: which candidate columns actually key the table
    * — (col, n_rows, n_distinct, n_nulls, is_unique), where a unique key
    * must be null-free AND collision-free. The schema-inference step
    * before a merge/SCD sink or a [[graft.operators.Joins.snapshotDiff]]
    * trusts a "key" that silently duplicates.
    *
    * One aggregation over one scan for ALL candidates (exact distincts
    * via the profiler's Expand plan), exploded to a row per column. */
  def keyCandidates(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "keyCandidates needs at least one column")
    val aggs = cols.flatMap(c => Seq(
      countDistinct(col(c)).as(s"__kc_d_$c"),
      count(when(col(c).isNull, 1)).as(s"__kc_n_$c")))
    df.agg(count(lit(1)).as("__kc_rows"), aggs: _*)
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col("__kc_rows").as("n_rows"),
          col(s"__kc_d_$c").as("n_distinct"),
          col(s"__kc_n_$c").as("n_nulls"))): _*)).as("x"))
      .select(col("x.col_name").as("col_name"), col("x.n_rows").as("n_rows"),
        col("x.n_distinct").as("n_distinct"), col("x.n_nulls").as("n_nulls"),
        (col("x.n_distinct") === col("x.n_rows") && col("x.n_nulls") === 0)
          .as("is_unique"))
  }

  /** Per-column Shannon entropy over the value distribution — the
    * information-density readout that flags near-constant columns
    * (entropy ≈ 0: dead feature, leaked default) and key-like columns
    * (normalized entropy ≈ 1: every value distinct) in one table. NULLs
    * are excluded (entropy of the OBSERVED distribution; the null share
    * is [[profile]]'s row). `norm_entropy` divides by ln(n_distinct) —
    * 0 for single-valued columns by convention.
    *
    * Shape: one unpivot explode feeds one (col, value) grouped count,
    * re-aggregated at column cardinality — the corpus crosses one
    * exchange, values travel as strings exactly like the single-pass
    * profiler. Returns (col_name, n_values, n_distinct, entropy,
    * norm_entropy), entropies rounded 6 dp. */
  def columnEntropy(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnEntropy needs at least one column")
    val cells = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("x"))
      .select(col("x.col_name").as("col_name"), col("x.v").as("v"))
      .filter(col("v").isNotNull)
    cells.groupBy(col("col_name"), col("v"))
      .agg(count(lit(1)).as("__ce_c"))
      .groupBy(col("col_name"))
      .agg(
        sum(col("__ce_c")).as("n_values"),
        count(lit(1)).as("n_distinct"),
        (-sum(col("__ce_c").cast("double") * log(col("__ce_c"))) /* staged below */)
          .as("__ce_part"))
      .select(
        col("col_name"), col("n_values"), col("n_distinct"),
        // H = ln n − (Σ c·ln c)/n: one pass over the count cells, no
        // per-cell division — identical arithmetic on the oracle side
        round(log(col("n_values")) + col("__ce_part") / col("n_values"), 6)
          .as("entropy"),
        round(
          when(col("n_distinct") > 1,
            (log(col("n_values")) + col("__ce_part") / col("n_values")) /
              log(col("n_distinct")))
            .otherwise(lit(0.0)), 6).as("norm_entropy"))
  }

  /** Data-quality expectations: evaluate every (ruleId, SQL predicate)
    * over the table in ONE aggregation and report per rule how many rows
    * violate it — the ingestion contract check ("prices positive, status
    * in the enum, dates in range") run before a drop of data is trusted,
    * with rules as declarative predicates so the same strings document
    * the contract. A row violates a rule when the predicate is false OR
    * null (an unknown is not a pass — the conservative reading).
    *
    * 100 TB shape: all rules ride one partial/final aggregate over one
    * scan (the profiler's discipline — never a scan per rule); the
    * row-per-rule output explodes from that single aggregated row.
    * Returns (rule, n_rows, n_violations, violation_rate rounded 6 dp,
    * pass). */
  def expectations(df: DataFrame, rules: Seq[(String, String)]): DataFrame = {
    require(rules.nonEmpty, "expectations needs at least one rule")
    require(rules.map(_._1).distinct.size == rules.size, "rule ids must be unique")
    val aggs = rules.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(coalesce(expr(pred), lit(false)), 0L).otherwise(1L)).as(s"__xp_$i")
    }
    val one = df.agg(count(lit(1)).as("__xp_n"), aggs: _*)
    one.select(explode(array(rules.zipWithIndex.map { case ((id, _), i) =>
        struct(lit(id).as("rule"), col("__xp_n").as("n_rows"),
          col(s"__xp_$i").as("n_violations"))
      }: _*)).as("__xp"))
      .select(
        col("__xp.rule").as("rule"),
        col("__xp.n_rows").as("n_rows"),
        col("__xp.n_violations").as("n_violations"),
        round(col("__xp.n_violations").cast("double") / col("__xp.n_rows"), 6)
          .as("violation_rate"),
        (col("__xp.n_violations") === 0L).as("pass"))
  }

  /** Exact join-cardinality forecast WITHOUT running the join: for an
    * equi-join on `keyCol`, |A ⋈ B| = Σ_k cntA(k)·cntB(k) — computable
    * from the two per-key count tables, whose join is key-cardinality
    * sized instead of output-sized. The "is this join about to explode"
    * check run before committing a 100 TB shuffle (a predicted 10¹²-row
    * output means a missing predicate or a needed pre-aggregation), plus
    * the hot-key maximum that decides whether [[graft.operators.Joins
    * .saltedJoin]] is warranted. Returns one row (n_left, n_right,
    * n_join_keys, join_rows, max_key_rows). */
  def joinCardinality(
      left: DataFrame, right: DataFrame, keyCol: String): DataFrame = {
    val la = left.groupBy(col(keyCol).as("__jc_k")).agg(count(lit(1)).as("__jc_a"))
    val rb = right.groupBy(col(keyCol).as("__jc_k")).agg(count(lit(1)).as("__jc_b"))
    val nl = left.agg(count(lit(1)).as("n_left"))
    val nr = right.agg(count(lit(1)).as("n_right"))
    la.join(rb, "__jc_k")
      .select((col("__jc_a") * col("__jc_b")).as("__jc_p"))
      .agg(
        count(lit(1)).as("n_join_keys"),
        coalesce(sum(col("__jc_p")), lit(0L)).as("join_rows"),
        coalesce(max(col("__jc_p")), lit(0L)).as("max_key_rows"))
      .crossJoin(broadcast(nl)).crossJoin(broadcast(nr))
      .select(col("n_left"), col("n_right"), col("n_join_keys"),
        col("join_rows"), col("max_key_rows"))
  }

  /** Activity concentration: the Gini coefficient of per-key event counts
    * plus the Pareto cut "how many keys produce 80% of the volume" — the
    * imbalance readout behind sampling, capping and skew decisions (a
    * corpus where 1% of sources carry 80% of documents needs
    * [[graft.operators.Curation]] caps; a join key with that profile
    * needs [[graft.operators.Joins.saltedJoin]]).
    *
    * Everything derives from the count-of-counts table (distinct count
    * value c, multiplicity m) with INTEGER arithmetic: users with count c
    * occupy a contiguous ascending-rank run, so Σ rank·count =
    * Σ c·(m·below + m(m+1)/2) exactly, and the 80% cut compares 5·cum
    * against 4·total — no float enters until the final Gini division, so
    * the result is bit-identical across engines and partitionings.
    *
    * Shape: per-key counts → count-of-counts (two grouped aggregations),
    * then the KS discipline for the global ascending prefix: range
    * partition by c, per-partition window sums, partition offsets
    * broadcast back — never a single-reducer global window. Returns one
    * row (n_keys, total, gini rounded 6, keys_for_80pct). */
  def giniConcentration(df: DataFrame, keyCol: String): DataFrame = {
    val parts = df.sparkSession.sparkContext.defaultParallelism
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("__gc_c"))
      .groupBy(col("__gc_c").as("c")).agg(count(lit(1)).as("m"))
    val totals = counts.agg(
      sum(col("m")).as("n"), sum(col("c") * col("m")).as("t"))
    // sharedPinned, not shared: the pid-keyed frame feeds both the offset
    // and the prefix branch — an LRU-evicted recompute may resample range
    // boundaries and silently corrupt the prefix sums (groupedRank hazard)
    val ranged = OpUtils.sharedPinned(counts
      .repartitionByRange(parts, col("c"))
      .withColumn("__gc_pid", spark_partition_id()))
    val offsets = ranged.groupBy(col("__gc_pid"))
      .agg(sum(col("m")).as("__gc_pm"),
        sum(col("c") * col("m")).as("__gc_pe"))
      .select(col("__gc_pid"),
        coalesce(sum(col("__gc_pm")).over(
          Window.orderBy(col("__gc_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("__gc_om"),
        coalesce(sum(col("__gc_pe")).over(
          Window.orderBy(col("__gc_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("__gc_oe"))
    val w = Window.partitionBy(col("__gc_pid")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = ranged
      .withColumn("__gc_cm", sum(col("m")).over(w))
      .withColumn("__gc_ce", sum(col("c") * col("m")).over(w))
      .join(broadcast(offsets), "__gc_pid")
      .select(col("c"), col("m"),
        (col("__gc_cm") + col("__gc_om")).as("um"),
        (col("__gc_ce") + col("__gc_oe")).as("ue"))
      .crossJoin(broadcast(totals))
    val s = pre.agg(sum(
      expr("c * (m * (um - m) + (m * (m + 1)) div 2)")).as("s"))
    val cut = pre
      .filter(expr("5 * (t - ue) < 4 * t AND 5 * (t - ue + m * c) >= 4 * t"))
      .select(expr(
        "n - um + (4 * t - 5 * (t - ue) + 5 * c - 1) div (5 * c)").as("k"))
    totals.crossJoin(broadcast(s)).crossJoin(broadcast(cut))
      .select(
        col("n").as("n_keys"), col("t").as("total"),
        round(lit(2.0) * col("s") / (col("n").cast("double") * col("t")) -
          (col("n") + 1).cast("double") / col("n"), 6).as("gini"),
        col("k").as("keys_for_80pct"))
  }

  /** Welch two-sample t-test over every group pair: are the groups' value
    * means distinguishable given unequal variances and sizes? The A/B
    * screen ("did variant B move the metric?") and the drift alarm
    * ("does this source's quality score differ from the rest?") in one
    * table. t and the Welch–Satterthwaite degrees of freedom are computed
    * from per-group (n, mean, variance) ROUNDED to 6 dp first, so the
    * derived statistics are bit-identical across engines and across runs
    * regardless of partial-aggregation addition order.
    *
    * 100 TB shape: one partial/final aggregation collapses the corpus to
    * group-cardinality rows; the pair expansion is a self-join of that
    * tiny table (broadcast by AQE), so the quadratic factor is in GROUP
    * COUNT only — never rows. Returns (group_a, group_b, n_a, n_b,
    * mean_a, mean_b, t_stat rounded 4 dp, welch_df rounded 2 dp),
    * group_a < group_b. */
  def welchPairs(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val stats = df.groupBy(col(groupCol).as("g"))
      .agg(
        count(col(valueCol)).as("n"),
        round(avg(col(valueCol)), 6).as("m"),
        round(var_samp(col(valueCol)), 6).as("v"))
      .filter(col("n") >= 2)
    val a = stats.select(col("g").as("group_a"), col("n").as("n_a"),
      col("m").as("mean_a"), col("v").as("v_a"))
    val b = stats.select(col("g").as("group_b"), col("n").as("n_b"),
      col("m").as("mean_b"), col("v").as("v_b"))
    val sa = col("v_a") / col("n_a")
    val sb = col("v_b") / col("n_b")
    // zero-variance guard: two constant-valued groups (sample variance
    // rounds to 0 at 6 dp) make sa + sb a zero divisor, which an ANSI
    // session faults — pin the degenerate pair to NULL t/df explicitly
    // (the degreeAssortativity discipline), mirrored in the DuckDB oracle
    val degenerate = sa + sb === 0.0
    a.join(b, col("group_a") < col("group_b"))
      .select(
        col("group_a"), col("group_b"), col("n_a"), col("n_b"),
        col("mean_a"), col("mean_b"),
        when(degenerate, lit(null).cast("double"))
          .otherwise(round((col("mean_a") - col("mean_b")) / sqrt(sa + sb), 4))
          .as("t_stat"),
        when(degenerate, lit(null).cast("double"))
          .otherwise(round(pow(sa + sb, 2) /
            (pow(sa, 2) / (col("n_a") - 1) + pow(sb, 2) / (col("n_b") - 1)), 2))
          .as("welch_df"))
  }

  def functionalDeps(df: DataFrame, candidates: Seq[(String, String)]): DataFrame = {
    require(candidates.nonEmpty, "no FD candidates given")
    candidates.foreach { case (l, r) =>
      require(df.columns.contains(l) && df.columns.contains(r),
        s"FD candidate columns not in frame: $l -> $r")
    }
    candidates.map { case (l, r) =>
      df.select(col(l).as("__fd_l"), col(r).as("__fd_r"))
        .groupBy(col("__fd_l"))
        // count NULL as a distinct rhs value: countDistinct ignores nulls,
        // so add a has-null flag to the per-group distinct tally
        .agg((countDistinct(col("__fd_r")) +
          max(when(col("__fd_r").isNull, 1).otherwise(0))).as("__d"))
        .agg(
          count(lit(1)).as("n_groups"),
          count(when(col("__d") > 1, 1)).as("n_violations"))
        .select(
          lit(l).as("lhs"), lit(r).as("rhs"),
          col("n_groups"), col("n_violations"),
          (col("n_violations") === 0).as("holds"))
    }.reduce(_ unionAll _)
  }
}
