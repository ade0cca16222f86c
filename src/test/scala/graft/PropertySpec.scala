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
    import org.apache.spark.sql.catalyst.expressions.Literal
    val strArr = Literal.create(null, ArrayType(StringType))
    val genSet = Gen.listOf(Gen.alphaNumStr.map(_.take(8))).map(_.toSet)
    check(Prop.forAll(genSet, genSet) { (a: Set[String], b: Set[String]) =>
      val expr = SortedIntersectCount(strArr, strArr)
      val toArr = (s: Set[String]) =>
        new GenericArrayData(s.toSeq.sorted.map(UTF8String.fromString(_): Any).toArray)
      val n = expr.nullSafeEval(toArr(a), toArr(b)).asInstanceOf[Int]
      n == a.intersect(b).size
    })
  }

  test("sorted-merge intersect count on 64-bit hash arrays == set intersection size") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val longArr = Literal.create(null, ArrayType(LongType))
    val genSet = Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue)).map(_.toSet)
    check(Prop.forAll(genSet, genSet) { (a: Set[Long], b: Set[Long]) =>
      val expr = SortedIntersectCount(longArr, longArr)
      val toArr = (s: Set[Long]) =>
        new GenericArrayData(s.toSeq.sorted.map(x => x: Any).toArray)
      val n = expr.nullSafeEval(toArr(a), toArr(b)).asInstanceOf[Int]
      n == a.intersect(b).size
    })
  }

  test("PQ with memorizing codebooks reconstructs the exact dot product (randomized)") {
    // when every distinct subvector is itself a codeword, PqEncode must
    // pick it exactly (L2 distance 0) and the ADC sum over the LUT must
    // equal the true dot product — the end-to-end algebra of
    // encode → lut → adc with quantization error forced to zero
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.functions.{PqEncode, PqKernel, PqLut}
    val dblArr = Literal.create(null, ArrayType(DoubleType))
    val intArr = Literal.create(null, ArrayType(IntegerType))
    val genVec = Gen.listOfN(8, Gen.choose(-5.0, 5.0)).map(_.toArray)
    check(Prop.forAll(Gen.nonEmptyListOf(genVec), genVec) { (corpus, q) =>
      val m = 4 // 8 dims → 4 subspaces of 2
      val subdim = 2
      // no per-subspace distinct: it could produce RAGGED books (rejected
      // by the uniform-ksub contract); duplicate codewords are fine — the
      // strict-< assignment picks the first (lowest-index) occurrence
      val books: Seq[Seq[Seq[Double]]] = (0 until m).map(j =>
        corpus.map(v => v.slice(j * subdim, (j + 1) * subdim).toSeq))
      val enc = PqEncode(dblArr, books)
      val lutE = PqLut(dblArr, books)
      val toArr = (v: Array[Double]) => new GenericArrayData(v.map(x => x: Any))
      val lut = lutE.nullSafeEval(toArr(q)).asInstanceOf[GenericArrayData]
      corpus.forall { v =>
        val codes = enc.nullSafeEval(toArr(v)).asInstanceOf[GenericArrayData]
        val adc = PqKernel.adc(lut, codes)
        val exact = v.zip(q).map { case (a, b) => a * b }.sum
        math.abs(adc - exact) <= 1e-9 * math.max(1.0, math.abs(exact))
      }
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

  test("asofJoinForward == per-left-row argmin over at-or-after right rows (randomized)") {
    import java.sql.Timestamp
    import graft.streaming.EventOps
    val sp = spark
    import sp.implicits._
    def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)
    val genSide = Gen.listOf(Gen.zip(Gen.choose(1L, 3L), Gen.choose(0L, 40L)))
    check(Prop.forAll(genSide, genSide) { (ls: List[(Long, Long)], rs: List[(Long, Long)]) =>
      if (ls.isEmpty) true else {
        val left = ls.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, ts(t)) }
        val right = rs.distinct.map { case (k, t) => (1000L + k * 100 + t, k, ts(t)) }
        val out = EventOps.asofJoinForward(
            left.toDF("event_id", "user_id", "ts"),
            right.toDF("event_id", "user_id", "ts"), "user_id", "ts")
          .collect()
          .map(r => r.getLong(0) -> Option(r.get(r.fieldIndex("next_event_id"))))
          .toMap
        val ref = left.map { case (id, k, t) =>
          val after = rs.distinct.filter { case (rk, rt) => rk == k && ts(rt).compareTo(t) >= 0 }
          id -> after.sortBy(_._2).headOption.map { case (rk, rt) => 1000L + rk * 100 + rt }
        }.toMap
        out == ref
      }
    }, minTests = 12)
  }

  test("interpolateLinear invariants: anchors exact, gaps bounded by neighbors, edges null (randomized)") {
    import java.sql.Timestamp
    import graft.streaming.EventOps
    val sp = spark
    import sp.implicits._
    def ts(h: Long) = new Timestamp(1704067200000L + h * 3600000L)
    val genCells = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(0L, 12L), Gen.choose(0, 10000)))
    check(Prop.forAll(genCells) { (cells: List[(Long, Int)]) =>
      // one value per present hour (cents grid keeps anchors exact)
      val present = cells.toMap
      val rows = present.toSeq.zipWithIndex.map { case ((h, c), i) =>
        (i.toLong, ts(h), "t", c / 100.0)
      }
      val out = EventOps.interpolateLinear(
          rows.toDF("event_id", "ts", "event_type", "value"))
        .collect()
        .map(r => r.getString(1).substring(11, 13).toLong ->
          Option(r.get(2)).map(_.asInstanceOf[Double]))
        .toMap
      val lo = present.keys.min
      val hi = present.keys.max
      (lo to hi).forall { h =>
        out(h) match {
          case Some(v) if present.contains(h) =>
            v == present(h) / 100.0 // anchor passes through exactly
          case Some(v) =>
            val pv = (h - 1 to lo by -1).collectFirst {
              case p if present.contains(p) => present(p) / 100.0 }.get
            val nv = (h + 1 to hi).collectFirst {
              case p if present.contains(p) => present(p) / 100.0 }.get
            v >= math.min(pv, nv) - 1e-4 && v <= math.max(pv, nv) + 1e-4
          case None => false // inside [lo, hi] both anchors exist
        }
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

  test("cohortRetention == brute-force cohort/offset counting (randomized)") {
    import java.sql.Timestamp
    import graft.streaming.EventOps
    val sp = spark
    import sp.implicits._
    def ts(day: Long, off: Long) = new Timestamp(1700000000000L + (day * 86400L + off) * 1000L)
    val genEvents = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 9L), Gen.choose(0L, 86399L)))
    check(Prop.forAll(genEvents) { (evs: List[(Long, Long, Long)]) =>
      val df = evs.map { case (u, d, s) => (u, ts(d, s)) }.toDF("user_id", "ts")
      val out = EventOps.cohortRetention(df, "user_id", "ts")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      // reference: the TRUE UTC epoch-day per event (the fixture base is
      // NOT midnight-aligned, so a generated "day" can span two UTC dates)
      val days = evs
        .map { case (u, d, s) => (u, (1700000000L + d * 86400L + s) / 86400L) }
        .distinct
      val first = days.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
      val ref = days
        .groupBy { case (u, day) => (first(u), day - first(u)) }
        .map { case ((c, off), us) =>
          (java.time.LocalDate.ofEpochDay(c).toString, off) -> us.length.toLong
        }
      out == ref
    }, minTests = 12)
  }

  test("knnJoin at exhaustive probe == brute-force top-k for every query (randomized)") {
    import graft.operators.Similarity
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 12 + rnd.nextInt(20)
      val dim = 8
      val vecs = (0L until n.toLong).map(i => (i, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
      val df = vecs.toDF("vec_id", "embedding")
      val k = 1 + rnd.nextInt(4)
      val out = Similarity.knnJoin(df, "vec_id", "embedding", k,
          nCentroids = 4, nProbe = 4, kmeansIters = 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      def cos(a: Seq[Float], b: Seq[Float]): Double = {
        val dot = a.lazyZip(b).map((x, y) => x.toDouble * y.toDouble).sum
        val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
        val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
        dot / (na * nb)
      }
      val ref = (for {
        (qid, qv) <- vecs
        ranked = vecs.filter(_._1 != qid)
          .map { case (nid, nv) => (nid, cos(qv, nv)) }
          .sortBy { case (nid, s) => (-s, nid) }
          .take(k).zipWithIndex
        ((nid, _), i) <- ranked
      } yield (qid, (i + 1).toLong, nid)).toSet
      assert(out == ref, s"n=$n k=$k: ${out.diff(ref)} / ${ref.diff(out)}")
    }
  }

  test("containmentPairs == brute-force containment on random token docs") {
    import graft.operators.Dedup
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    for (trial <- 1 to 3) {
      val n = 8 + rnd.nextInt(8)
      val docs = (0L until n.toLong).map { i =>
        val len = 4 + rnd.nextInt(12)
        (i, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "), s"b${i % 2}")
      }
      val df = docs.toDF("doc_id", "text", "block")
      val t = 0.6
      val out = Dedup.containmentPairs(df, "doc_id", "text", "block", n = 2, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def shingles(s: String): Set[String] =
        s.split(" ").sliding(2).map(_.mkString(" ")).toSet
      val ref = (for {
        (ia, ta, ba) <- docs
        (ib, tb, bb) <- docs
        if ia != ib && ba == bb
        sa = shingles(ta); sb = shingles(tb)
        if sa.nonEmpty
        c = BigDecimal(sa.intersect(sb).size.toDouble / sa.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if c >= t
      } yield (ia, ib)).toSet
      assert(out == ref, s"trial $trial: extra=${out.diff(ref)} missing=${ref.diff(out)}")
    }
  }

  test("snapshotDiff reconstructs the new snapshot from old + diff (randomized)") {
    import graft.operators.Joins
    val sp = spark
    import sp.implicits._
    // keys overlap across snapshots; values collide often to exercise all
    // of unchanged / changed / added / removed
    val genSnap = Gen.mapOf(Gen.zip(Gen.choose(1L, 12L), Gen.choose(0, 3)))
    check(Prop.forAll(genSnap, genSnap) { (o: Map[Long, Int], n: Map[Long, Int]) =>
      val oldDf = o.toSeq.toDF("k", "v")
      val newDf = n.toSeq.toDF("k", "v")
      val diff = Joins.snapshotDiff(oldDf, newDf, Seq("k"), Seq("v"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // statuses are exactly the set-theoretic classification…
      val expect =
        (n.keySet -- o.keySet).map(_ -> "added") ++
        (o.keySet -- n.keySet).map(_ -> "removed") ++
        (o.keySet & n.keySet).filter(k => o(k) != n(k)).map(_ -> "changed")
      // …and applying the diff to the old state reproduces the new state
      val rebuilt = (o -- diff.collect { case (k, "removed") => k }
        -- diff.collect { case (k, "changed") => k }) ++
        diff.collect { case (k, s) if s != "removed" => k -> n(k) }
      diff == expect.toMap && rebuilt == n
    }, minTests = 20)
  }

  test("skyline == brute-force dominance filter (randomized, any partitioning)") {
    import graft.operators.Selection
    val sp = spark
    import sp.implicits._
    val genPts = Gen.listOf(Gen.zip(Gen.choose(0, 6), Gen.choose(0, 6)))
    check(Prop.forAll(genPts, Gen.choose(1, 7)) { (ps: List[(Int, Int)], parts: Int) =>
      if (ps.isEmpty) true else {
        val rows = ps.zipWithIndex.map { case ((x, y), i) =>
          (i.toLong, x.toDouble, y.toDouble) }
        val got = Selection.skyline(
            rows.toDF("id", "x", "y").repartition(parts), "id", Seq("x", "y"))
          .collect().map(_.getLong(0)).toSet
        val dominates = (a: (Double, Double), b: (Double, Double)) =>
          a._1 >= b._1 && a._2 >= b._2 && (a._1 > b._1 || a._2 > b._2)
        val expect = rows.filter { case (_, x, y) =>
          !rows.exists { case (_, qx, qy) => dominates((qx, qy), (x, y)) }
        }.map(_._1).toSet
        got == expect
      }
    }, minTests = 15)
  }

  test("peakConcurrency == brute-force closed-interval sweep (randomized)") {
    import java.sql.Timestamp
    import graft.streaming.EventOps
    val sp = spark
    import sp.implicits._
    def ts(min: Long) = new Timestamp(1704067200000L + min * 60000L)
    val genEvents = Gen.nonEmptyListOf(
      Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 120L)))
    check(Prop.forAll(genEvents) { (es: List[(Long, Long)]) =>
      val rows = es.zipWithIndex.map { case ((u, m), i) => (i.toLong, ts(m), u) }
      val got = EventOps.peakConcurrency(rows.toDF("event_id", "ts", "user_id"))
        .collect().map(r => r.getLong(1)).max
      // brute force: evaluate concurrency at every interval endpoint
      // (all events land on one day by construction)
      val iv = es.groupBy(_._1).values.map(g =>
        (g.map(_._2).min, g.map(_._2).max)).toSeq
      val expect = iv.flatMap(i => Seq(i._1, i._2)).distinct.map(t =>
        iv.count { case (s, e) => s <= t && t <= e }).max.toLong
      got == expect
    }, minTests = 20)
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
