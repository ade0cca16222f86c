package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** PageRank checked against a driver-side reference power iteration — the
  * distributed join/agg rounds must reproduce the textbook recurrence
  * exactly (same rounding schedule), including dangling-mass redistribution
  * and multi-edge collapse. */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference implementation: dense power iteration on the driver with the
    * operator's exact float schedule (uniform init, per-round 10dp round,
    * final 6dp round). */
  private def referencePr(
      edges: Seq[(Long, Long)], iterations: Int, d: Double): Map[Long, Double] = {
    val es = edges.distinct
    val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size.toDouble
    val outd = es.groupBy(_._1).map { case (s, g) => s -> g.size.toDouble }
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iterations) {
      val dangling = nodes.filterNot(outd.contains).map(r).sum
      val contrib = es.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map(e => r(e._1) * (1.0 / outd(e._1))).sum
      }
      r = nodes.map { v =>
        val base = (1.0 - d) / n + d * (contrib.getOrElse(v, 0.0) +
          (if (nodes.exists(x => !outd.contains(x))) dangling / n else 0.0))
        v -> BigDecimal(base).setScale(10, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    }
    r.map { case (k, v) =>
      k -> BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }
  }

  private def run(edges: Seq[(Long, Long)], iterations: Int = 3): Map[Long, Double] =
    Graph.pageRank(edges.toDF("src", "dst"), iterations)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("matches the reference recurrence on a small directed graph") {
    // 1→2, 1→3, 2→3, 3→1: strongly connected, no danglers
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
    val got = run(edges)
    val want = referencePr(edges, 3, 0.85)
    assert(got.keySet == want.keySet)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-9, s"node $k: got ${got(k)}, want $v")
    // node 3 has two in-links from higher-rank sources — it must dominate
    assert(got(3L) > got(2L))
  }

  test("dangling mass is redistributed, total rank conserved") {
    // 4 is a pure sink (no out-edges): its rank must flow back uniformly
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 4L), (3L, 1L))
    val got = run(edges)
    val want = referencePr(edges, 3, 0.85)
    for ((k, v) <- want) assert(math.abs(got(k) - v) < 1e-9, s"node $k: got ${got(k)}, want $v")
    assert(math.abs(got.values.sum - 1.0) < 1e-4,
      s"mass not conserved: ${got.values.sum}")
  }

  test("multi-edges collapse to one link") {
    val single = run(Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)))
    val multi = run(Seq((1L, 2L), (1L, 2L), (1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)))
    assert(single == multi)
  }

  test("symmetrized graph: rank orders by degree") {
    // star: hub 1 linked both ways with 2,3,4 — hub must outrank leaves,
    // leaves tie exactly (identical in/out structure)
    val fwd = Seq((1L, 2L), (1L, 3L), (1L, 4L))
    val edges = fwd ++ fwd.map(_.swap)
    val got = run(edges)
    assert(got(1L) > got(2L))
    assert(got(2L) == got(3L) && got(3L) == got(4L))
  }

  test("triangle count on known graphs") {
    def count(edges: Seq[(Long, Long)]): Long =
      Graph.triangleCount(edges.toDF("src", "dst")).collect()(0).getLong(0)
    // K4 has C(4,3) = 4 triangles
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    assert(count(k4) == 4)
    // a 5-cycle has none
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))) == 0)
    // two triangles sharing an edge
    assert(count(Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))) == 2)
    // self-loops, duplicates and reversed orientations must not inflate
    assert(count(Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 1L), (1L, 1L))) == 1)
  }

  test("triangle count matches brute force on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }
    val got = Graph.triangleCount(edges.toDF("src", "dst")).collect()(0).getLong(0)
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val want = (for {
      a <- nodes; b <- nodes if a < b && adj(a)(b)
      c <- nodes if b < c && adj(a)(c) && adj(b)(c)
    } yield 1).size.toLong
    assert(got == want, s"got $got want $want")
  }

  private def core(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    Graph.kCore(edges.toDF("src", "dst"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("kCore peels a tail off a clique, keeps the clique") {
    // K4 on {1,2,3,4} plus a tail 4-5-6: peeling at k=2 removes 6 (deg 1),
    // then 5 (deg 1 after 6 is gone) — two dependent rounds — leaving K4
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    val edges = k4 ++ Seq((4L, 5L), (5L, 6L))
    val got2 = core(edges, 2)
    assert(got2 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // at k=3 the same core; at k=4 nothing survives (K4 max degree is 3)
    assert(core(edges, 3) == got2)
    assert(core(edges, 4) == Map.empty)
  }

  test("kCore keeps a cycle whole at k=2") {
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
    assert(core(cyc, 2) == (1L to 5L).map(_ -> 2L).toMap)
  }

  test("kCore ignores self-loops, duplicates and reversed orientations") {
    // only real undirected edge is 1-2 → both nodes peel at k=2
    assert(core(Seq((1L, 2L), (2L, 1L), (1L, 2L), (1L, 1L)), 2) == Map.empty)
  }

  test("kCore matches brute-force peeling on a seeded random graph") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(200)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter { case (a, b) => a != b }
    val k = 3
    val got = core(edges, k)
    // reference: iterate deletion on the driver
    var es = edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }.distinct
    var changed = true
    while (changed) {
      val deg = es.flatMap(e => Seq(e._1, e._2)).groupBy(identity).map { case (n, v) => n -> v.size }
      val bad = deg.filter(_._2 < k).keySet
      changed = bad.nonEmpty
      es = es.filter(e => !bad(e._1) && !bad(e._2))
    }
    val want = es.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (n, v) => n -> v.size.toLong }
    assert(got == want, s"got $got want $want")
    assert(got.values.forall(_ >= k))
  }

  private def bfs(edges: Seq[(Long, Long)], seeds: Seq[Long], maxHops: Int): Map[Long, Long] =
    Graph.hopDistances(edges.toDF("src", "dst"),
        seeds.toDF("id"), maxHops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hopDistances walks a path up to the bound, seeds at zero") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val sym = path ++ path.map(_.swap)
    assert(bfs(sym, Seq(1L), 2) == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // two sources: every node takes its MINIMUM distance
    assert(bfs(sym, Seq(1L, 5L), 2) ==
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 5L -> 0L, 4L -> 1L))
  }

  test("hopDistances follows edge direction and keeps isolated seeds") {
    // only 2→1 exists: seed 1 cannot expand, seed 99 is not in the graph
    assert(bfs(Seq((2L, 1L)), Seq(1L, 99L), 3) == Map(1L -> 0L, 99L -> 0L))
  }

  test("hopDistances stops early on an exhausted frontier") {
    // triangle fully reached at hop 1; rounds 2..5 must be no-ops
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L), (2L, 3L), (3L, 2L))
    assert(bfs(tri, Seq(1L), 5) == Map(1L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("hopDistances matches reference BFS on a seeded random graph") {
    val rnd = new scala.util.Random(5)
    val edges = Seq.fill(150)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    val seeds = Seq(0L, 1L, 2L)
    val maxHops = 3
    val got = bfs(edges, seeds, maxHops)
    val adj = edges.distinct.groupBy(_._1).map { case (s, g) => s -> g.map(_._2) }
    var want = seeds.map(_ -> 0L).toMap
    var frontier = seeds.toSet
    for (h <- 1L to maxHops) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Seq.empty)) -- want.keySet
      want = want ++ next.map(_ -> h)
      frontier = next
    }
    assert(got == want, s"got $got want $want")
  }

  private def lpa(edges: Seq[(Long, Long)], rounds: Int = 3): Map[Long, Long] =
    Graph.labelPropagation(edges.toDF("src", "dst"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labelPropagation: two cliques joined by a bridge keep their labels") {
    def clique(ids: Seq[Long]) = for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)) ++
      Seq((4L, 10L))
    val got = lpa(edges)
    // each clique floods to its min id; the bridge endpoints' neighbor
    // majorities stay inside their own cliques
    assert(Seq(1L, 2L, 3L, 4L).forall(got(_) == 1L), got.toString)
    assert(Seq(10L, 11L, 12L, 13L).forall(got(_) == 10L), got.toString)
  }

  test("labelPropagation matches a reference synchronous LPA") {
    val rnd = new scala.util.Random(3)
    val raw = Seq.fill(120)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val rounds = 3
    val got = lpa(raw, rounds)
    // reference: same semantics on the driver — undirected dedup'd edges,
    // neighbor votes + one self-vote, argmax by (count desc, label asc)
    val und = raw.map { case (a, b) => if (a < b) (a, b) else (b, a) }.distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (n, g) => n -> g.map(_._2) }
    var lbl = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      lbl = adj.map { case (n, ns) =>
        val votes = (ns.map(lbl) :+ lbl(n)).groupBy(identity)
          .map { case (l, v) => l -> v.size }
        n -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    assert(got == lbl, s"got $got want $lbl")
  }

  test("rejects bad parameters") {
    val df = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pageRank(df, iterations = 0))
    intercept[IllegalArgumentException](Graph.pageRank(df, damping = 1.0))
    intercept[IllegalArgumentException](Graph.kCore(df, k = 1))
    intercept[IllegalArgumentException](Graph.kCore(df, k = 2, maxRounds = 0))
    intercept[IllegalArgumentException](
      Graph.hopDistances(df, Seq(1L).toDF("id"), maxHops = 0))
    intercept[IllegalArgumentException](Graph.labelPropagation(df, rounds = 0))
  }

  test("jaccardLinks: square graph diagonals, path graph, edge exclusion") {
    import spark.implicits._
    // square 1-2-3-4-1: the two diagonals are the only 2-common-neighbor
    // non-edges, each with jaccard 2/(2+2-2) = 1.0
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val got = Graph.jaccardLinks(square, k = 10, minCommon = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSet == Set((1L, 3L, 2L, 1.0), (2L, 4L, 2L, 1.0)))
    // path 1-2-3: (1,3) shares only node 2 — below minCommon=2, but found
    // at minCommon=1 with jaccard 1/(1+1-1) = 1.0
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    assert(Graph.jaccardLinks(path, k = 10, minCommon = 2).count() == 0)
    val p1 = Graph.jaccardLinks(path, k = 10, minCommon = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(p1.toSeq == Seq((1L, 3L, 1.0)))
    // triangle 1-2-3: every 2-path closes — no candidate survives the
    // existing-edge exclusion
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(Graph.jaccardLinks(tri, k = 10, minCommon = 1).count() == 0)
    intercept[IllegalArgumentException](Graph.jaccardLinks(square, k = 0))
    intercept[IllegalArgumentException](Graph.jaccardLinks(square, minCommon = 0))
  }

  test("jaccardLinks top-k is a TakeOrdered, never a global sort") {
    import spark.implicits._
    val df = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val plan = Graph.jaccardLinks(df).queryExecution.executedPlan.toString()
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
    assert(!plan.contains("CartesianProduct"), plan.take(600))
  }

  test("jaccardLinks hub exclusion bounds wedge fan-out BEFORE the explode") {
    import spark.implicits._
    // star center 100 has degree 4; spokes 1-4 also pairwise chained so
    // some wedges survive without the hub. maxDegree=3 must drop ONLY the
    // wedges centered on the hub: (1,2) etc. keep their chain evidence
    val star = Seq((100L, 1L), (100L, 2L), (100L, 3L), (100L, 4L),
      (1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val unCapped = Graph.jaccardLinks(star, k = 100, minCommon = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val capped = Graph.jaccardLinks(star, k = 100, minCommon = 1, maxDegree = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // (1,3): common {2, 100} uncapped -> {2} capped (hub evidence ignored)
    assert(unCapped((1L, 3L)) == 2L && capped((1L, 3L)) == 1L)
    // (1,4): only common neighbor is the hub -> disappears when capped
    assert(unCapped.contains((1L, 4L)) && !capped.contains((1L, 4L)))
    // the fan-out bound is structural: the degree filter must sit BETWEEN
    // the neighbor-set aggregation and the generator, so an over-cap
    // center's pairs are never emitted at all
    val plan = Graph.jaccardLinks(star, maxDegree = 3)
      .queryExecution.optimizedPlan.toString()
    val genLine = plan.linesIterator.indexWhere(_.contains("Generate"))
    val filtLine = plan.linesIterator.indexWhere(l =>
      l.contains("Filter") && l.contains("size"))
    assert(genLine >= 0 && filtLine > genLine,
      s"size filter must be below Generate in the optimized plan:\n$plan")
  }

  test("adamicAdarLinks weights wedges 1/ln(center degree), hub cap drops hub evidence") {
    import spark.implicits._
    // square 1-2-3-4-1: each diagonal's two common neighbors have degree 2
    // → score = 2/ln(2)
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val exp = BigDecimal(2.0 / math.log(2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Graph.adamicAdarLinks(square, k = 10, minCommon = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSet == Set((1L, 3L, 2L, exp), (2L, 4L, 2L, exp)))
    // star hub 100 (degree 4) + chain 1-2-3-4: pair (1,3) sees the hub and
    // node 2 (degree 3). maxDegree=3 drops ONLY the hub's wedge: the score
    // collapses to 1/ln(3) with one common neighbor left
    val star = Seq((100L, 1L), (100L, 2L), (100L, 3L), (100L, 4L),
      (1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val full = Graph.adamicAdarLinks(star, k = 100, minCommon = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val expFull = BigDecimal(1.0 / math.log(4) + 1.0 / math.log(3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(full((1L, 3L)) == ((2L, expFull)))
    val capped = Graph.adamicAdarLinks(star, k = 100, minCommon = 1, maxDegree = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val exp3 = BigDecimal(1.0 / math.log(3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(capped((1L, 3L)) == ((1L, exp3)),
      s"hub-routed evidence must vanish under the cap: ${capped.get((1L, 3L))}")
    intercept[IllegalArgumentException](Graph.adamicAdarLinks(square, k = 0))
  }

  test("componentSizes histograms components, collapsing duplicate/reversed edges") {
    import spark.implicits._
    // path of 3 + isolated pair + a triangle → sizes {3:2, 2:1}
    val df = Seq((1L, 2L), (2L, 3L), (3L, 2L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("src", "dst")
    val got = Graph.componentSizes(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(3L -> 2L, 2L -> 1L), s"got $got")
  }

  test("clusteringCoefficient credits all three triangle vertices") {
    import spark.implicits._
    // triangle 1-2-3 with pendant 3-4 (edges deliberately duplicated and
    // reversed — canonicalization must collapse them)
    val df = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val got = Graph.clusteringCoefficient(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1L) == ((2L, 1L, 1.0)))
    assert(got(2L) == ((2L, 1L, 1.0)))
    assert(got(3L) == ((3L, 1L, 0.333333)))
    assert(got(4L) == ((1L, 0L, 0.0)))
    // bowtie: triangles 1-2-3 and 3-4-5 meet at node 3 (degree 4, 2
    // triangles → 2*2/(4*3))
    val bow = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (3L, 5L))
      .toDF("src", "dst")
    val b = Graph.clusteringCoefficient(bow).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(b(3L) == 0.333333 && b(1L) == 1.0 && b(5L) == 1.0)
  }

  test("degreeAssortativity: star is maximally disassortative (r = -1)") {
    // star K1,3: every edge pairs degree 3 with degree 1 → r = −1 exactly
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val r = Graph.degreeAssortativity(star).collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((4L, 3L, -1.0)))
    // two disjoint edges: all degrees equal → 0/0 → NaN (degenerate, documented)
    val pair = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    assert(Graph.degreeAssortativity(pair).collect().head.getDouble(2).isNaN)
  }

  test("hitsPathCounts: exact alternating-walk counts on a directed star+chain") {
    // 1→3, 2→3, 3→4: h1 = out-degree (1,1,1,0); a1(3) = h1(1)+h1(2) = 2,
    // a1(4) = h1(3) = 1; h2(1) = a1(3) = 2, h2(2) = 2, h2(3) = a1(4) = 1;
    // a2(3) = h2(1)+h2(2) = 4, a2(4) = h2(3) = 1
    val e = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.hitsPathCounts(e, iterations = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(
      1L -> ((2L, 0L)), 2L -> ((2L, 0L)),
      3L -> ((1L, 4L)), 4L -> ((0L, 1L))))
    // duplicate edges collapse; out-of-range iteration count is loud
    val dup = Seq((1L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(Graph.hitsPathCounts(dup, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(1L -> 1L, 3L -> 0L))
    intercept[IllegalArgumentException](Graph.hitsPathCounts(e, 9))
  }
}
