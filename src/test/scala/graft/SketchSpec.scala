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

  test("sketch estimates are deterministic across runs") {
    val df = spark.range(0, 50000).toDF("k")
    def once(): Long = df.agg(
      hll_sketch_estimate(hll_sketch_agg(col("k"), 12))).collect()(0).getLong(0)
    assert(once() == once())
  }
}
