package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Joins, Selection}
import graft.streaming.EventOps

class SelectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("skyline keeps exactly the non-dominated rows, duplicates included") {
    val df = Seq(
      (1L, 5.0, 1.0), // frontier (best x)
      (2L, 3.0, 3.0), // frontier (middle)
      (3L, 1.0, 5.0), // frontier (best y)
      (4L, 3.0, 3.0), // duplicate of 2 — equal vectors don't dominate
      (5L, 2.0, 2.0), // dominated by 2
      (6L, 3.0, 1.0), // dominated by 2 (ties x, loses y)
      (7L, 5.0, 1.0)) // duplicate of 1
      .toDF("id", "x", "y")
    val got = Selection.skyline(df, "id", Seq("x", "y"))
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == Seq(1L, 2L, 3L, 4L, 7L))
  }

  test("skyline is partition-invariant (two-phase pass is exact)") {
    val df = (1L to 500L).map(i => (i, (i % 37).toDouble, (i % 11).toDouble))
      .toDF("id", "x", "y")
    val a = Selection.skyline(df.repartition(1), "id", Seq("x", "y"))
      .select("id").as[Long].collect().sorted.toSeq
    val b = Selection.skyline(df.repartition(13), "id", Seq("x", "y"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
    // closed form: only rows with x=36 AND y=10 are undominated
    // (both dims cycle independently, so (36,10) exists in 1..500)
    val expect = (1L to 500L).filter(i => i % 37 == 36 && i % 11 == 10).toSeq
    assert(a == expect)
  }

  test("skyline fails loudly past maxCandidates instead of a mega final task") {
    // anti-correlated dims: every point is on the frontier
    val df = (1L to 100L).map(i => (i, i.toDouble, -i.toDouble)).toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException] {
      Selection.skyline(df, "id", Seq("x", "y"), maxCandidates = 10L).collect()
    }
    assert(e.getMessage.contains("maxCandidates"))
  }

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val oldDf = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "v")
    val newDf = Seq((2L, "b", 20.0), (3L, "c", 31.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val got = Joins.snapshotDiff(oldDf, newDf, Seq("k"), Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("peakConcurrency counts closed-interval overlap, single events count 1") {
    def ts(min: Int) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    val df = Seq(
      // day 1: u1 spans 0-60, u2 spans 30-90, u3 fires once at 45 → peak 3
      (1L, ts(0), 1L), (2L, ts(60), 1L),
      (3L, ts(30), 2L), (4L, ts(90), 2L),
      (5L, ts(45), 3L),
      // day 2 (offset 1440): disjoint users → peak 1
      (6L, ts(1440), 1L), (7L, ts(1441), 1L),
      (8L, ts(1500), 2L))
      .toDF("event_id", "ts", "user_id")
    val got = EventOps.peakConcurrency(df)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.values.toSeq.sorted == Seq(1L, 3L))
    assert(got.size == 2)
  }

  test("peakConcurrency: touching endpoints count as concurrent (closed)") {
    def ts(min: Int) = new java.sql.Timestamp(1704067200000L + min * 60000L)
    val df = Seq(
      (1L, ts(0), 1L), (2L, ts(30), 1L), // u1 ends at 30
      (3L, ts(30), 2L), (4L, ts(60), 2L)) // u2 starts at 30
      .toDF("event_id", "ts", "user_id")
    val got = EventOps.peakConcurrency(df).collect()
    assert(got.head.getLong(1) == 2L)
  }

  test("trigramSimilarityJoin matches exhaustive jaccard on a crafted corpus") {
    graft.functions.GraftFunctions.registerAll(spark)
    val names = Seq(
      1L -> "alpha beta gamma", 2L -> "alpha beta gamma!", // near-identical
      3L -> "beta alpha gamma", // transposed words — edit distance >> 1
      4L -> "delta epsilon zeta", 5L -> "totally different",
      6L -> "alpha beta gamma", // exact duplicate of 1
      7L -> "xy") // too short for a trigram — must drop out
    val tau = 0.5
    def grams(s: String) = s.sliding(3).toSet
    val expect = (for {
      (ia, sa) <- names; (ib, sb) <- names
      if ia < ib && sa.length >= 3 && sb.length >= 3
      ga = grams(sa); gb = grams(sb)
      j = (ga & gb).size.toDouble / (ga | gb).size
      if j >= tau
    } yield (ia, ib)).toSet
    val got = graft.operators.Joins
      .trigramSimilarityJoin(names.toDF("id", "s"), "id", "s", tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
    assert(expect.contains((1L, 3L))) // the transposition fuzzyPairs misses
    assert(!got.exists(p => p._1 == 7L || p._2 == 7L))
  }

  test("trigramSimilarityJoin prefix filter is exact under permutation stress") {
    graft.functions.GraftFunctions.registerAll(spark)
    // randomized-ish corpus from a fixed seed: words drawn from a tiny
    // vocab so similar and dissimilar pairs both occur
    val rnd = new scala.util.Random(7)
    val vocab = Vector("red", "blue", "green", "widget", "gadget", "spring")
    val names = (1L to 60L).map(i =>
      i -> Seq.fill(3 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val tau = 0.7
    def grams(s: String) = s.sliding(3).toSet
    val expect = (for {
      (ia, sa) <- names; (ib, sb) <- names
      if ia < ib
      j = (grams(sa) & grams(sb)).size.toDouble / (grams(sa) | grams(sb)).size
      if j >= tau
    } yield (ia, ib)).toSet
    val got = graft.operators.Joins
      .trigramSimilarityJoin(names.toDF("id", "s").repartition(5), "id", "s", tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect, s"missing=${expect -- got} extra=${got -- expect}")
  }

  test("trigramCandidatePairs equals the abstract PPJoin positional model") {
    graft.functions.GraftFunctions.registerAll(spark)
    // Pure-Scala reference of the candidate stage's semantics — rarity
    // order, prefix length, length filter, positional overlap cap — with
    // Spark supplying only the gram hash (so the rarity tiebreak matches
    // production bit for bit). Asserts the production candidate set IS
    // the model's, and that the positional cap strictly prunes the plain
    // prefix-filter set on this corpus (the r14 superlinearity fix).
    val rnd = new scala.util.Random(11)
    val vocab = Vector("red", "blue", "green", "widget", "gadget", "spring",
      "acme", "corp", "ltd")
    val names = (1L to 80L).map(i =>
      i -> Seq.fill(3 + rnd.nextInt(4))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val tau = 0.7
    val gramSets = names.filter(_._2.length >= 3)
      .map { case (id, s) => id -> s.sliding(3).toSet }.toMap
    val allGrams = gramSets.values.flatten.toSeq.distinct
    val hash = allGrams.toDF("g")
      .select(col("g"), xxhash64(col("g")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val df_ = allGrams.map(g =>
      hash(g) -> gramSets.values.count(_.contains(g)).toLong).toMap
    // per-id: gram hashes in rarity order (df asc, hash asc)
    val ordered = gramSets.map { case (id, gs) =>
      id -> gs.toSeq.map(hash).sortBy(h => (df_(h), h))
    }
    def ua(n: Int) = n - math.ceil(tau * n).toInt
    // corpus-global blocking arity, same rule as production
    val nMin = ordered.values.map(_.size).min
    val uaMax = ordered.values.map(hs => ua(hs.size)).max
    def comb(m: Long, k: Int): Long =
      if (k == 2) m * (m - 1) / 2 else m * (m - 1) * (m - 2) / 6
    val arity = (3 to 2 by -1).find(k =>
      k <= math.ceil(tau * nMin).toLong && comb(uaMax + k, k) <= 64L).getOrElse(1)
    // (key = K-subset of the extended prefix in rarity order,
    //  id, n, 0-indexed slot of the key's last gram)
    def entries(k: Int) = for {
      (id, hs) <- ordered.toSeq
      ext = hs.take(ua(hs.size) + k).zipWithIndex
      sub <- ext.combinations(k)
    } yield (sub.map(_._1), id, hs.size, sub.last._2)
    def pairsWith(k: Int, positional: Boolean) = (for {
      (_, es) <- entries(k).groupBy(_._1).toSeq
      (_, ia, na, pa) <- es; (_, ib, nb, pb) <- es
      if ia < ib && nb * tau <= na && na * tau <= nb
      if !positional ||
        math.min(na - pa, nb - pb) + (k - 1) + 1e-9 >=
          tau / (1.0 + tau) * (na + nb)
    } yield (ia, ib)).toSet
    val model = pairsWith(arity, positional = true)
    val plain = pairsWith(1, positional = false)
    val got = Joins.trigramCandidatePairs(names.toDF("id", "s"), "id", "s", tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(arity >= 2, s"corpus should trigger a multi-gram arity, got $arity")
    assert(got == model,
      s"arity=$arity missing=${model -- got} extra=${got -- model}")
    assert(model.subsetOf(plain) && model.size < plain.size,
      s"positional+arity cap should strictly prune: ${model.size} vs ${plain.size}")
    // recall witness: every verified pair is a candidate
    val verified = Joins.trigramSimilarityJoin(names.toDF("id", "s"), "id", "s", tau)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.subsetOf(got))
  }

  test("goldenFields: mode with min-tie and rounded max per resolved entity") {
    graft.functions.GraftFunctions.registerAll(spark)
    // names 'aa1'/'aa2'/'aa3' chain at edit distance 1 (one entity);
    // 'zz9' is a singleton and must not appear
    val df = Seq(
      (1L, "aa1", "B", 10.005),
      (2L, "aa2", "A", 30.0),
      (3L, "aa3", "B", 20.0),
      (9L, "zz9", "C", 99.0))
      .toDF("id", "name", "seg", "bal")
    val out = Joins.goldenFields(df, "id", "name", Nil, "seg", "bal").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 30.0)      // max balance
    assert(r.getString(3) == "B")       // mode: B twice beats A once
    // tie case: two values with equal counts → smallest wins
    val tie = Seq((1L, "aa1", "Z", 1.0), (2L, "aa2", "A", 2.0))
      .toDF("id", "name", "seg", "bal")
    assert(Joins.goldenFields(tie, "id", "name", Nil, "seg", "bal")
      .collect().head.getString(3) == "A")
  }

  test("rrfFuse sums 1/(c+rank) across lists, absent ids contribute 0") {
    val lex = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    val vec = Seq((20L, 1L), (40L, 2L)).toDF("id", "rank")
    val got = graft.operators.Similarity.rrfFuse(Seq(lex, vec), k = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    // 20 is in both lists → highest; 10 (rank 1 in one list) beats 40 (rank 2)
    assert(got.map(_._1).toSeq == Seq(20L, 10L, 40L, 30L))
    assert(math.abs(got.head._2 - (1.0 / 62 + 1.0 / 61)) < 1e-6)
  }

  test("skyline emits no shuffle before the candidate set") {
    val df = (1L to 200L).map(i => (i, (i % 7).toDouble, (i % 5).toDouble))
      .toDF("id", "x", "y")
    val plan = Selection.skyline(df, "id", Seq("x", "y"))
      .queryExecution.executedPlan.toString
    // exactly one exchange: the repartition(1) drawing frontier candidates
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
  }
}
