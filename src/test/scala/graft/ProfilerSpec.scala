package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions.col

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

  test("chiSquare: perfect association, independence, degenerate axis, NULL category") {
    val dep = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")).toDF("u", "v")
    val r1 = Profiler.chiSquare(dep, "u", "v").collect()(0)
    // 2×2 perfect association: chi2 = N = 4, dof = 1, V = 1
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3),
      r1.getDouble(4), r1.getDouble(5)) == ((4L, 2L, 2L, 1L, 4.0, 1.0)))
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")).toDF("u", "v")
    val r2 = Profiler.chiSquare(ind, "u", "v").collect()(0)
    assert(r2.getDouble(4) == 0.0 && r2.getDouble(5) == 0.0)
    // constant second axis: dof 0, V undefined
    val const = Seq(("a", "x"), ("b", "x")).toDF("u", "v")
    val r3 = Profiler.chiSquare(const, "u", "v").collect()(0)
    assert(r3.getLong(3) == 0L && r3.isNullAt(5))
    // NULL is a category: {NULL→x, a→y} is perfect association with n_a = 2
    val nul = Seq((None: Option[String], "x"), (Some("a"), "y")).toDF("u", "v")
    val r4 = Profiler.chiSquare(nul, "u", "v").collect()(0)
    assert(r4.getLong(1) == 2L && r4.getDouble(5) == 1.0)
    intercept[IllegalArgumentException](Profiler.chiSquare(dep, "u", "nope"))
  }

  test("mutualInformation: perfect association, independence, degenerate axis, NULL category") {
    // 2×2 perfect association: MI = H(A) = H(B) = ln 2, NMI = 1
    val dep = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")).toDF("u", "v")
    val r1 = Profiler.mutualInformation(dep, "u", "v").collect()(0)
    val ln2 = BigDecimal(math.log(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((r1.getLong(0), r1.getDouble(1), r1.getDouble(2), r1.getDouble(3),
      r1.getDouble(4)) == ((4L, ln2, ln2, ln2, 1.0)))
    // independent uniform axes: MI = 0, NMI = 0
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")).toDF("u", "v")
    val r2 = Profiler.mutualInformation(ind, "u", "v").collect()(0)
    assert(r2.getDouble(1) == 0.0 && r2.getDouble(4) == 0.0)
    // constant second axis: H(B) = 0 → NMI undefined
    val const = Seq(("a", "x"), ("b", "x")).toDF("u", "v")
    val r3 = Profiler.mutualInformation(const, "u", "v").collect()(0)
    assert(r3.getDouble(1) == 0.0 && r3.getDouble(3) == 0.0 && r3.isNullAt(4))
    // NULL is a category: {NULL→x, a→y} is perfect 2×2 association
    val nul = Seq((None: Option[String], "x"), (Some("a"), "y")).toDF("u", "v")
    val r4 = Profiler.mutualInformation(nul, "u", "v").collect()(0)
    assert(r4.getDouble(4) == 1.0)
    intercept[IllegalArgumentException](Profiler.mutualInformation(dep, "u", "nope"))
  }

  test("duplicateRows counts the exact-copy surplus, NULL-safe") {
    val df = Seq(
      (Some("a"), 1), (Some("a"), 1), (Some("a"), 2),
      (None: Option[String], 3), (None: Option[String], 3))
      .toDF("s", "k")
    val r = Profiler.duplicateRows(df).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)) ==
      ((5L, 3L, 2L, 0.4)))
  }

  test("outliers counts values beyond the rounded 1.5 IQR Tukey fences") {
    // 1..8 plus one spike: q1=3, q3=7 (exact interpolation on 9 values),
    // fences [-3, 13] → only the spike is high; NULL excluded from n
    val df = (1 to 8).map(i => (Some(i.toDouble), 1.0)) ++
      Seq((Some(100.0), 1.0), (None, 1.0))
    val got = Profiler.outliers(df.toDF("x", "c"), Seq("x", "c")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
         r.getDouble(5), r.getLong(6), r.getLong(7)))
      .toMap
    assert(got("x") == ((9L, 3.0, 7.0, -3.0, 13.0, 0L, 1L)), s"got ${got("x")}")
    // constant column: zero-width IQR, fences collapse to the value
    assert(got("c") == ((10L, 1.0, 1.0, 1.0, 1.0, 0L, 0L)))
    intercept[IllegalArgumentException](Profiler.outliers(df.toDF("x", "c"), Seq()))
  }

  test("topValues ranks by count desc with NULLS FIRST value ties") {
    val vdf = Seq(Some("b"), Some("b"), Some("a"), None).map(Tuple1(_)).toDF("lang")
    val got = Profiler.topValues(vdf, Seq("lang"), k = 3).collect()
      .map(r => (r.getLong(1), Option(r.getString(2)), r.getLong(3))).toSet
    // b ×2 leads; the count-1 tie between NULL and "a" resolves NULL first
    assert(got == Set((1L, Some("b"), 2L), (2L, None, 1L), (3L, Some("a"), 1L)))
    intercept[IllegalArgumentException](Profiler.topValues(vdf, Seq("lang"), k = 0))
    intercept[IllegalArgumentException](Profiler.topValues(vdf, Seq.empty))
  }

  test("embeddingStats: exact per-dim stats, float widening, zero counting") {
    val edf = Seq(
      Seq(1.0f, 0.0f, 2.5f),
      Seq(3.0f, 0.0f, 2.5f)).map(Tuple1(_)).toDF("embedding")
    val got = Profiler.embeddingStats(edf, "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).sortBy(_._1)
    // dim 1: mean 2, sd 1; dim 2: all-zero (dead coordinate); dim 3: collapsed
    assert(got(0) == ((1L, 2L, 0L, 2.0, 1.0, 1.0, 3.0)))
    assert(got(1) == ((2L, 2L, 2L, 0.0, 0.0, 0.0, 0.0)))
    assert(got(2) == ((3L, 2L, 0L, 2.5, 0.0, 2.5, 2.5)))
    intercept[IllegalArgumentException](Profiler.embeddingStats(edf, "nope"))
  }

  test("psi: identical slices score ~0, disjoint categories bounded, NULL is a category") {
    val sdf2 = Seq(("x", true), ("x", false), ("y", true), ("y", false))
      .toDF("c", "a")
    val same = Profiler.psi(sdf2, "c", col("a"))
      .collect().map(_.getDouble(3))
    assert(same.forall(_ == 0.0)) // p_A = p_B per category exactly
    // category only in slice A: finite, positive contribution
    val dis = Seq(("only_a", true), ("both", true), ("both", false))
      .toDF("c", "a")
    val terms = Profiler.psi(dis, "c", col("a"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(terms("only_a") > 0.0 && !terms("only_a").isInfinite)
    // hand-check: k=2, na=2, nb=1; only_a: pa=(1+.5)/3, pb=(0+.5)/2
    val (pa, pb) = (1.5 / 3.0, 0.5 / 2.0)
    val want = BigDecimal((pa - pb) * math.log(pa / pb))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(terms("only_a") == want)
    val nul = Seq((None: Option[String], true), (Some("v"), false)).toDF("c", "a")
    assert(Profiler.psi(nul, "c", col("a")).count() == 2) // NULL category kept
    intercept[IllegalArgumentException](Profiler.psi(sdf2, "nope", col("a")))
  }

  test("ksStatistic: known two-sample D, identical samples D=0, NULLs excluded") {
    // A = {1,2,3,4}, B = {3,4,5,6}: D = max|F_A - F_B| = 0.5 (at v=2)
    val kdf = (Seq(1, 2, 3, 4).map(v => (v.toDouble, true)) ++
      Seq(3, 4, 5, 6).map(v => (v.toDouble, false))).toDF("v", "a")
    val r = Profiler.ksStatistic(kdf, "v", col("a")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((4L, 4L, 0.5)))
    val same = (1 to 5).flatMap(v => Seq((v.toDouble, true), (v.toDouble, false)))
      .toDF("v", "a")
    assert(Profiler.ksStatistic(same, "v", col("a")).collect()(0).getDouble(2) == 0.0)
    // NULL values drop from both CDFs
    val withNull = Seq((Some(1.0), true), (None, true), (Some(1.0), false))
      .toDF("v", "a")
    val r2 = Profiler.ksStatistic(withNull, "v", col("a")).collect()(0)
    assert((r2.getLong(0), r2.getLong(1), r2.getDouble(2)) == ((1L, 1L, 0.0)))
    intercept[IllegalArgumentException](Profiler.ksStatistic(kdf, "nope", col("a")))
  }

  test("ksStatistic CDFs never funnel through a global orderBy window") {
    val kdf = Seq((1.0, true), (2.0, false)).toDF("v", "a")
    val plan = Profiler.ksStatistic(kdf, "v", col("a"))
      .queryExecution.executedPlan.toString()
    // every window spec must involve the range partition id — either as
    // the partition key (the per-partition running sums) or as the order
    // key of the #partitions-row offsets table; a value-ordered window
    // with no pid would be the single-reducer CDF funnel
    val specs = "windowspecdefinition\\([^)]*".r.findAllIn(plan).toSeq
    assert(specs.nonEmpty, s"expected window operators:\n${plan.take(800)}")
    assert(specs.forall(_.contains("__ks_pid")),
      s"found a window not keyed by the range pid:\n${specs.mkString("\n")}")
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

  test("benfordDigits extracts the leading significant digit across scales") {
    import spark.implicits._
    // 0.05, 5.0, 523.17, 92.0, 0.0 (dropped), 1234.56
    val df = Seq(0.05, 5.0, 523.17, 92.0, 0.0, 1234.56).toDF("v")
    val out = graft.operators.Profiler.benfordDigits(df, "v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(5L -> 3L, 9L -> 1L, 1L -> 1L),
      s"three 5s (0.05, 5.0, 523.17), one 9, one 1; zero dropped: $out")
    val row = graft.operators.Profiler.benfordDigits(df, "v")
      .filter($"digit" === 1L).collect()(0)
    assert(row.getDouble(3) == 0.30103, "Benford p(1) = log10(2)")
  }

  test("functionalDeps: key holds, drifted dependency counts violations, NULL is a value") {
    import spark.implicits._
    val df = Seq(
      // k → v holds (each k single-valued); k → w violated by k=1 {a, b}
      // and by k=3 {c, NULL} (null counts as a distinct rhs value)
      (1L, "x", "a"), (1L, "x", "b"),
      (2L, "y", "c"), (2L, "y", "c"),
      (3L, "z", "c"), (3L, "z", null))
      .toDF("k", "v", "w")
    val out = graft.operators.Profiler.functionalDeps(
        df, Seq(("k", "v"), ("k", "w")))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out(("k", "v")) == ((3L, 0L, true)))
    assert(out(("k", "w")) == ((3L, 2L, false)))
  }

  test("keyCandidates: unique needs distinct == rows AND zero nulls") {
    val df = Seq(
      (1L, "a", Some("x")), (2L, "a", Some("y")), (3L, "b", None))
      .toDF("k", "dup", "nul")
    val out = graft.operators.Profiler.keyCandidates(df, Seq("k", "dup", "nul"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out("k") == ((3L, 0L, true)))
    assert(out("dup") == ((2L, 0L, false)))   // collides
    assert(out("nul") == ((2L, 1L, false)))   // distinct-but-null: NOT a key
  }

  test("joinCardinality predicts the exact equi-join output size") {
    val l = Seq(1L, 1L, 2L, 3L).toDF("k")
    val r = Seq(1L, 1L, 1L, 3L, 4L).toDF("k")
    val row = graft.operators.Profiler.joinCardinality(l, r, "k").collect().head
    // actual join: key 1 → 2·3 = 6 rows, key 3 → 1 → total 7, hot key 6
    assert((row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getLong(4)) == ((4L, 5L, 2L, 7L, 6L)))
    assert(l.join(r, "k").count() == 7L)
  }

  test("giniConcentration: hand-computed gini and 80% cut, partition-invariant") {
    // counts per key: a→4, b→2, c→1, d→1 (8 events total).
    // ascending ranks (1,1,2,4): S = 1·1 + 2·1 + 3·2 + 4·4 = 25
    // gini = 2·25/(4·8) − 5/4 = 0.3125
    // 80% of 8 = 6.4 events: a(4) + b(2) = 6 < 6.4 → need c too → 3 keys
    val rows = Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d")
    val df = rows.zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("e", "k")
    for (parts <- Seq(1, 5)) {
      val r = graft.operators.Profiler
        .giniConcentration(df.repartition(parts), "k").collect().head
      assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)) ==
        ((4L, 8L, 0.3125, 3L)), s"parts=$parts got $r")
    }
    // exact boundary: counts 4,1 → 80% of 5 = 4.0, met by the top key alone
    val b = (Seq.fill(4)("a") ++ Seq("b")).zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("e", "k")
    assert(graft.operators.Profiler.giniConcentration(b, "k")
      .collect().head.getLong(3) == 1L)
  }

  test("columnEntropy: uniform → ln k, constant → 0, nulls excluded") {
    val df = Seq(
      ("a", "x", null.asInstanceOf[String]),
      ("b", "x", "only"),
      ("c", "x", null.asInstanceOf[String]),
      ("d", "x", "only"))
      .toDF("u", "k", "n")
    val out = graft.operators.Profiler.columnEntropy(df, Seq("u", "k", "n"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val ln4 = BigDecimal(math.log(4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out("u") == ((4L, 4L, ln4, 1.0))) // uniform over 4 → H = ln 4, norm 1
    assert(out("k") == ((4L, 1L, 0.0, 0.0))) // constant column
    assert(out("n") == ((2L, 1L, 0.0, 0.0))) // nulls excluded from n_values
  }

  test("expectations count false AND null as violations, one row per rule") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "ok"), (2L, "ok"), (null, "bad"), (4L, null))
      .toDF("k", "s")
    val out = graft.operators.Profiler.expectations(df, Seq(
        "k_nonnull" -> "k IS NOT NULL",       // 1 violation (null k)
        "s_is_ok" -> "s = 'ok'",              // 2: 'bad' is false, null s is null
        "always" -> "1 = 1"))                 // 0
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(4))).toMap
    assert(out("k_nonnull") == ((4L, 1L, false)))
    assert(out("s_is_ok") == ((4L, 2L, false)))
    assert(out("always") == ((4L, 0L, true)))
  }

  test("expectations evaluate every rule in one scan/aggregate") {
    val df = Seq((1L, "a")).toDF("k", "s")
    val plan = graft.operators.Profiler.expectations(df, Seq(
        "r1" -> "k > 0", "r2" -> "s IS NOT NULL", "r3" -> "k < 10"))
      .queryExecution.executedPlan.toString()
    assert("LocalTableScan|Scan".r.findAllIn(plan).size <= 1,
      s"rules must share one scan:\n${plan.take(900)}")
  }

  test("welchPairs computes t and dof from rounded group moments") {
    val df = Seq(
      "a" -> 1.0, "a" -> 2.0, "a" -> 3.0, "a" -> 4.0,   // n=4 m=2.5 v=5/3
      "b" -> 10.0, "b" -> 12.0, "b" -> 14.0,            // n=3 m=12 v=4
      "c" -> 7.0)                                       // n=1 → filtered out
      .toDF("g", "v")
    val rows = graft.operators.Profiler.welchPairs(df, "g", "v").collect()
    assert(rows.length == 1) // only (a, b); c has n < 2
    val r = rows.head
    assert((r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)) ==
      (("a", "b", 4L, 3L)))
    val va = BigDecimal(5.0 / 3).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sa = va / 4; val sb = 4.0 / 3
    val t = (2.5 - 12.0) / math.sqrt(sa + sb)
    val dof = math.pow(sa + sb, 2) /
      (math.pow(sa, 2) / 3 + math.pow(sb, 2) / 2)
    assert(math.abs(r.getDouble(6) - BigDecimal(t).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(r.getDouble(7) - BigDecimal(dof).setScale(2,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }
}
