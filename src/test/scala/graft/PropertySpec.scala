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
