package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dominance-based row selection (Pareto frontier / skyline). */
object Selection {

  /** Pareto frontier (skyline) over `dimCols`, maximizing every dimension:
    * keep exactly the rows not dominated by any other row, where q
    * dominates p iff q >= p on EVERY dim and q > p on at least one.
    * Negate a column upstream to minimize it. Rows with identical dim
    * vectors do not dominate each other — all copies of a frontier point
    * survive (matching the strict-dominance NOT EXISTS definition).
    *
    * Plan: two-phase distributed skyline. Phase 1 runs the in-memory
    * dominance filter per partition (mapPartitions, no shuffle) — a point
    * dominated by a partition-mate is dominated globally, so local pruning
    * is lossless. Phase 2 re-runs the same filter over the surviving
    * candidates in ONE task for the exact global answer. For independently
    * distributed dims the expected skyline is O((ln n)^(d-1)), so the
    * candidate set is tiny regardless of input size; correlated dims grow
    * it, ANTI-correlated dims (the adversarial case — every point on the
    * frontier) grow it toward n, which is why the final single-task pass is
    * guarded: more than `maxCandidates` survivors after local pruning fails
    * loudly instead of funnelling the table through one task. The local
    * filter keeps its buffer bounded by the partition's OWN skyline size
    * (dominated entries are evicted on insert), so phase 1 memory follows
    * the same bound.
    *
    * 100 TB shape: one narrow projection scan, zero shuffles until the
    * candidate set (already frontier-sized) is drawn together; the id
    * travels as a long and dims as doubles, so phase-2's exchange is
    * candidates x (8 + 8d) bytes. Returns (idCol as long, dimCols as
    * double), one row per surviving input row. */
  def skyline(
      df: DataFrame, idCol: String, dimCols: Seq[String],
      maxCandidates: Long = 2000000L): DataFrame = {
    require(dimCols.nonEmpty, "skyline needs at least one dimension")
    val spark = df.sparkSession
    import spark.implicits._

    def dominates(a: Seq[Double], b: Seq[Double]): Boolean = {
      var ge = true; var gt = false; var i = 0
      while (ge && i < a.length) {
        if (a(i) < b(i)) ge = false
        else if (a(i) > b(i)) gt = true
        i += 1
      }
      ge && gt
    }
    // the buffer holds distinct frontier VECTORS, each with every row id
    // carrying it: per-row work is bounded by the frontier's
    // distinct-vector count even when frontier points repeat heavily
    // (exact duplicates never dominate each other, so a per-row buffer
    // would grow with the duplicate count and square the pass)
    def skyFilter(it: Iterator[(Long, Seq[Double])]): Iterator[(Long, Seq[Double])] = {
      val buf = scala.collection.mutable.ArrayBuffer
        .empty[(Seq[Double], scala.collection.mutable.ArrayBuffer[Long])]
      it.foreach { case (id, v) =>
        var dominated = false
        var dup: scala.collection.mutable.ArrayBuffer[Long] = null
        var i = 0
        while (!dominated && (dup eq null) && i < buf.length) {
          val (q, ids) = buf(i)
          if (q == v) dup = ids
          else if (dominates(q, v)) dominated = true
          i += 1
        }
        if (dup ne null) dup += id
        else if (!dominated) {
          buf.filterInPlace { case (q, _) => !dominates(v, q) }
          buf += ((v, scala.collection.mutable.ArrayBuffer(id)))
        }
      }
      buf.iterator.flatMap { case (v, ids) => ids.iterator.map(id => (id, v)) }
    }

    val pts = df.select(
      col(idCol).cast("long"),
      array(dimCols.map(c => col(c).cast("double")): _*)).as[(Long, Seq[Double])]
    val cands = OpUtils.shared(pts.mapPartitions(skyFilter _).toDF("__id", "__dims"))
    val n = cands.count()
    require(n <= maxCandidates,
      s"skyline: $n candidates survived local pruning (> maxCandidates=$maxCandidates) — " +
        "dims too anti-correlated for a single-task final pass; reduce dims or raise the cap")
    val sky = cands.as[(Long, Seq[Double])]
      .repartition(1).mapPartitions(skyFilter _).toDF("__id", "__dims")
    dimCols.zipWithIndex
      .foldLeft(sky) { case (d, (c, i)) => d.withColumn(c, col("__dims")(i)) }
      .select(col("__id").as(idCol) +: dimCols.map(col): _*)
  }
}
