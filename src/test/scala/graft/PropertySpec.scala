package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{SortedIntersectCount, TopKBuffer}
import graft.sources.{SizedFile, StaticCatalog}

/** Property-based invariants (ScalaCheck) for the hand-written kernels and
  * the pruning layer — the pieces where an off-by-one survives example
  * tests. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(prop: Prop, minTests: Int = 100): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(r.passed, r.status.toString)
  }

  test("sorted-merge intersect count == set intersection size") {
    val genSet = Gen.listOf(Gen.alphaNumStr.map(_.take(8))).map(_.toSet)
    check(Prop.forAll(genSet, genSet) { (a: Set[String], b: Set[String]) =>
      val expr = SortedIntersectCount(null, null)
      val toArr = (s: Set[String]) =>
        new GenericArrayData(s.toSeq.sorted.map(UTF8String.fromString(_): Any).toArray)
      val n = expr.nullSafeEval(toArr(a), toArr(b)).asInstanceOf[Int]
      n == a.intersect(b).size
    })
  }

  test("TopKBuffer == sort-desc-take-k, ties to the smaller id") {
    val genPairs = Gen.listOf(Gen.zip(Gen.choose(-10.0, 10.0), Gen.choose(0L, 50L)))
    val genK = Gen.choose(1, 12)
    check(Prop.forAll(genPairs, genK) { (pairs: List[(Double, Long)], k: Int) =>
      val buf = new TopKBuffer(k)
      pairs.foreach { case (s, id) => buf.insert(s, id) }
      val got = (0 until buf.n)
        .map(i => (buf.scores(i), buf.ids(i)))
        .sortBy { case (s, id) => (-s, id) }
      // duplicate (score,id) inserts each occupy a slot, like rows would
      val ref = pairs.sortBy { case (s, id) => (-s, id) }.take(k)
      got == ref
    })
  }

  test("TopKBuffer merge across partitions == global top-k") {
    val genPairs = Gen.listOf(Gen.zip(Gen.choose(-5.0, 5.0), Gen.choose(0L, 40L)))
    check(Prop.forAll(genPairs, genPairs, Gen.choose(1, 8)) {
      (p1: List[(Double, Long)], p2: List[(Double, Long)], k: Int) =>
        val b1 = new TopKBuffer(k); p1.foreach { case (s, id) => b1.insert(s, id) }
        val b2 = new TopKBuffer(k); p2.foreach { case (s, id) => b2.insert(s, id) }
        (0 until b2.n).foreach(i => b1.insert(b2.scores(i), b2.ids(i)))
        val got = (0 until b1.n)
          .map(i => (b1.scores(i), b1.ids(i)))
          .sortBy { case (s, id) => (-s, id) }
        val ref = (p1 ++ p2).sortBy { case (s, id) => (-s, id) }.take(k)
        got == ref
    })
  }

  test("asofJoin == per-left-row argmax over prior right rows (randomized)") {
    import java.sql.Timestamp
    import graft.streaming.EventOps
    val sp = spark
    import sp.implicits._
    def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)
    val genSide = Gen.listOf(Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 40L)))
    check(Prop.forAll(genSide, genSide) { (ls: List[(Long, Long)], rs: List[(Long, Long)]) =>
      if (ls.isEmpty) true else {
        val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, ts(t)) }
        // operator contract: right unique per (key, ts); derive a
        // deterministic id from the pair so the reference can predict it
        val right = rs.distinct.map { case (k, t) => (1000L + k * 100 + t, k, ts(t)) }
        val out = EventOps.asofJoin(
            left.toDF("event_id", "user_id", "ts"),
            right.toDF("event_id", "user_id", "ts"), "user_id", "ts")
          .collect()
          .map(r => r.getLong(0) -> Option(r.get(r.fieldIndex("prior_event_id"))))
          .toMap
        val ref = left.map { case (id, k, t) =>
          val prior = rs.distinct.filter { case (rk, rt) => rk == k && ts(rt).compareTo(t) <= 0 }
          id -> prior.sortBy(_._2).lastOption.map { case (rk, rt) => 1000L + rk * 100 + rt }
        }.toMap
        out == ref
      }
    }, minTests = 12)
  }

  test("rangeJoinCount == brute-force window count (randomized)") {
    import java.sql.Timestamp
    import graft.streaming.EventOps
    val sp = spark
    import sp.implicits._
    def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)
    val genSide = Gen.listOf(Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 60L)))
    val genWin = Gen.choose(1L, 12L)
    check(Prop.forAll(genSide, genSide, genWin) {
      (ls: List[(Long, Long)], rs: List[(Long, Long)], w: Long) =>
        if (ls.isEmpty) true else {
          val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, ts(t)) }
          val right = rs.map { case (k, t) => (k, ts(t)) }
          val out = EventOps.rangeJoinCount(
              left.toDF("event_id", "user_id", "ts"),
              right.toDF("user_id", "ts"), "user_id", "ts", "event_id", w)
            .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
          val ref = ls.zipWithIndex.map { case ((k, t), i) =>
            i.toLong -> rs.count { case (rk, rt) => rk == k && math.abs(rt - t) <= w }.toLong
          }.toMap
          out == ref
        }
    }, minTests = 12)
  }

  test("partition pruning == filtering the file list directly") {
    val genN = Gen.choose(0, 12)
    val genCut = Gen.choose(0, 12)
    check(Prop.forAll(genN, genCut) { (n: Int, cut: Int) =>
      val files = (0 until n).map(i => SizedFile(s"f$i", 10L, Seq(f"v$i%03d")))
      val cat = new StaticCatalog(
        "prop", StructType(Seq(StructField("x", LongType))), Seq("p"), files)
      val pruned = cat.prune(spark, Some(f"p <= 'v$cut%03d'")).map(_.key)
      val expected = files.filter(_.partitionValues.head <= f"v$cut%03d").map(_.key)
      pruned == expected
    }, minTests = 20)
  }
}
