package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Profiler

/** The single-pass profiler must report exact per-column stats (including
  * null accounting and string-cast min/max) and degrade only the distinct
  * counts in approx mode. */
class ProfilerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), 2.5),
    (2L, None, 1.0),
    (3L, Some("b"), 4.0),
    (4L, Some("a"), 1.0)
  ).toDF("id", "tag", "score")

  test("exact profile: counts, nulls, distincts, min/max per column") {
    val got = Profiler.profile(df, Seq("id", "tag", "score"))
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("tag") == ((4L, 1L, 2L, "a", "b")))
    assert(got("score") == ((4L, 0L, 3L, "1.0", "4.0")))
  }

  test("approx mode keeps every non-distinct stat identical") {
    val exact = Profiler.profile(df, Seq("id", "tag"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(4), r.getString(5))).toSet
    val approx = Profiler.profile(df, Seq("id", "tag"), exact = false)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(4), r.getString(5))).toSet
    assert(exact == approx)
    // at 4 distinct values HLL is exact too
    val nd = Profiler.profile(df, Seq("id"), exact = false).collect()(0).getLong(3)
    assert(nd == 4L)
  }

  test("an all-null column profiles without error") {
    val got = Profiler.profile(
        df.withColumn("gone", org.apache.spark.sql.functions.lit(null).cast("string")),
        Seq("gone"))
      .collect()(0)
    assert(got.getLong(2) == 4L && got.getLong(3) == 0L)
    assert(got.isNullAt(4) && got.isNullAt(5))
  }

  test("rejects unknown and empty column lists") {
    intercept[IllegalArgumentException](Profiler.profile(df, Seq.empty))
    intercept[IllegalArgumentException](Profiler.profile(df, Seq("nope")))
    intercept[IllegalArgumentException](Profiler.correlations(df, Seq.empty))
    intercept[IllegalArgumentException](Profiler.correlations(df, Seq(("id", "nope"))))
  }

  test("valueSkew: distinct counts, top share, entropy; NULL is a category") {
    val sdf = Seq(
      (Some("en"), Some("s1")), (Some("en"), Some("s1")),
      (Some("en"), None), (Some("de"), None))
      .toDF("lang", "source")
    val got = Profiler.valueSkew(sdf, Seq("lang", "source")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // lang: {en:3, de:1} → H(3/4, 1/4) = 0.811278 bits
    assert(got("lang") == ((2L, 4L, 0.75, 0.811278)))
    // source: {s1:2, NULL:2} → the nulls COUNT as a value; H = 1 bit
    assert(got("source") == ((2L, 4L, 0.5, 1.0)))
    intercept[IllegalArgumentException](Profiler.valueSkew(sdf, Seq.empty))
    intercept[IllegalArgumentException](Profiler.valueSkew(sdf, Seq("nope")))
  }

  test("correlations: perfect, inverse and degenerate pairs in one pass") {
    val cdf = Seq((1.0, 2.0, -1.0, 7.0), (2.0, 4.0, -2.0, 7.0),
        (3.0, 6.0, -3.0, 7.0))
      .toDF("x", "y2", "neg", "const")
    val got = Profiler.correlations(cdf,
        Seq(("x", "y2"), ("x", "neg"), ("x", "const")))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(got(("x", "y2")) == ((3L, Some(1.0))))
    assert(got(("x", "neg")) == ((3L, Some(-1.0))))
    assert(got(("x", "const")) == ((3L, None))) // zero variance → NULL
  }
}
