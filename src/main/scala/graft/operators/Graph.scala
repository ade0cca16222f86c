package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative link analysis over edge lists — the graph-signal leg of a
  * web-corpus curation pipeline (CommonCrawl-style host ranking feeding
  * quality filters), expressed as fixed-point join/aggregate rounds the
  * same way [[Dedup.connectedComponents]] runs star contraction.
  *
  * 100 TB shape: per iteration exactly ONE shuffle join (edges ⋈ ranks on
  * src) and ONE aggregation (contributions per dst) — the edge list, the
  * dominant relation, is hash-partitioned once up front and every round's
  * join reuses that layout, so iterating does not re-exchange the big
  * side. The rank vector is corpus-sized and is NEVER broadcast or
  * collected; the only driver-side values are two scalar counts (node
  * count, dangling-node count) and, when danglers exist, a per-round
  * 1-row mass aggregate that IS broadcast (a scalar, not the vector). */
object Graph {

  /** PageRank with `iterations` fixed power-iteration rounds at damping
    * factor `d`: rank'(v) = (1−d)/N + d·(Σ_{u→v} rank(u)/outdeg(u) +
    * dangling/N), ranks initialized uniform 1/N. Multi-edges are collapsed
    * (dropDuplicates) so a repeated link contributes once, matching the
    * usual web-graph formulation. Dangling mass (rank sitting on nodes
    * with no out-edges) is redistributed uniformly; when the graph has no
    * danglers — e.g. a symmetrized graph — the per-round mass aggregate is
    * skipped entirely (decided from one O(1) driver-side count).
    *
    * Fixed iterations rather than convergence detection: the engine-parity
    * contract (same numbers from any engine running the same rounds)
    * requires a deterministic round count, and ranks are ROUNDED to
    * `iterDp` decimals after every round so cross-engine float-sum
    * drift (order-dependent low bits) cannot compound across rounds.
    * Per-dst contribution sums at web scale hold ~10³ terms of magnitude
    * ≤ 1, so accumulated IEEE error is ~1e-13 — far inside a 1e-10 grid.
    *
    * Returns (node_id, pr) over every node appearing as src or dst,
    * pr rounded to 6 dp, summing to ~1 over the graph. */
  def pageRank(
      edges: DataFrame,
      iterations: Int = 3,
      damping: Double = 0.85,
      iterDp: Int = 10): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e = OpUtils.shared(
      edges.select(col("src"), col("dst")).dropDuplicates("src", "dst"))
    // per-edge transition weight 1/outdeg(src) rides the edge list so the
    // round loop never re-joins degrees; persisted — every round reads it
    val weighted = OpUtils.shared(
      e.groupBy(col("src")).agg(count(lit(1)).as("outd"))
        .join(e, "src")
        .select(col("src"), col("dst"), (lit(1.0) / col("outd")).as("w")))
    val nodes = OpUtils.shared(
      e.select(col("src").as("id"))
        .unionAll(e.select(col("dst").as("id")))
        .distinct())
    // both driver scalars — node count and dangling count — come out of ONE
    // aggregate job (a left join against the distinct-src set, counting the
    // unmatched rows), instead of one action each: at bench scale each
    // separate action is a fixed-latency barrier, and the join costs nothing
    // the anti-join below didn't already pay
    val cntRow = nodes
      .join(e.select(col("src").as("id")).distinct()
          .select(col("id"), lit(1).as("__pr_out")),
        Seq("id"), "left")
      .agg(count(lit(1)).as("n"),
        count(when(col("__pr_out").isNull, 1)).as("nd"))
      .collect()(0)
    val n = cntRow.getLong(0).toDouble
    val nDanglers = cntRow.getLong(1)
    // an empty edge list would otherwise silently produce 1/0 = Infinity
    // ranks; no graph is a caller error, not a degenerate result
    require(n > 0, "pageRank requires a non-empty edge list")
    // nodes with no out-edges, fixed for the whole run; only the dangler
    // branch ever reads (and then persists) the frame
    lazy val danglers = OpUtils.shared(
      nodes.join(e.select(col("src").as("id")).distinct(), Seq("id"), "left_anti"))

    var ranks = nodes.select(col("id"), lit(1.0 / n).as("r"))
    if (nDanglers == 0) {
      // no danglers → each round reads the previous ranks EXACTLY ONCE
      // (the contribution join; no mass aggregate), so the rounds compose
      // into one lazy chain: a single job runs all iterations' shuffles
      // back-to-back instead of paying one action + persist per round
      // (measured ~2× on the symmetrized bench graph). Lineage is
      // truncated every few rounds so a large iteration count cannot
      // inflate analysis; the common 3-iteration call never truncates.
      for (i <- 1 to iterations) {
        ranks = roundUpdate(
          nodes, weighted, ranks, danglers, nDanglers, n, damping, iterDp)
        if (i % 4 == 0 && i < iterations) ranks = OpUtils.roundCheckpoint(ranks)
      }
    } else {
      var prevPersisted: Option[DataFrame] = None
      for (_ <- 1 to iterations) {
        val withDangling = roundUpdate(
          nodes, weighted, ranks, danglers, nDanglers, n, damping, iterDp)
        // materialize each round once: the next round's join and its
        // dangling-mass aggregate both read it, and an unpersisted round
        // would re-run the whole chain back to the edge scan
        val next = withDangling.persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        prevPersisted.foreach(_.unpersist(blocking = false))
        prevPersisted = Some(next)
        ranks = next
      }
      // the final round's frame backs the returned ranks — hand it to the
      // pipeline cache registry instead of leaking it (CC does the same)
      prevPersisted.foreach(OpUtils.track)
    }
    ranks.select(col("id").as("node_id"), round(col("r"), 6).as("pr"))
  }

  /** Triangle count over an undirected edge list via DEGREE ORIENTATION —
    * the standard trick that makes the wedge join survive power-law
    * graphs. Edges are first canonicalized (self-loops dropped, both
    * orientations and multi-edges collapsed to one u<v pair), then each
    * edge is directed from its lower-(degree, id) endpoint to the higher:
    * every triangle is counted exactly once (at its lowest-ordered
    * vertex), and — the scale property — out-degree in the oriented graph
    * is O(√m), so the wedge fan-out generates Σ C(outdeg, 2) ≤ O(m^1.5)
    * candidates even when a raw hub's neighborhood (C(deg, 2) on the
    * unoriented graph) would explode. A web-corpus hub with 10⁶ links
    * contributes ~10¹² unoriented wedges but only its oriented out-fan
    * here. Wedges are emitted in-kernel from per-center adjacency arrays
    * (one edge-sized groupBy, no wedge self-join), and the closing join is
    * a shuffled HASH join sized to the measured wedge volume — see
    * [[triangleTriples]] for why sort-merge at a fixed partition count is
    * the scale failure mode here (r7's measured 18.8× wall at 10× edges,
    * from sorting the O(m^1.5) wedge stream: 13 GB spill; re-measured at
    * 3.2× wall with zero spill after the rewrite).
    *
    * Returns one row: (n_triangles). */
  def triangleCount(edges: DataFrame): DataFrame =
    triangleTriples(canonical(edges)).agg(count(lit(1)).as("n_triangles"))

  /** Canonical undirected edge list: self-loops dropped, both orientations
    * and multi-edges collapsed to one u<v pair. */
  /** Degree assortativity: the Pearson correlation of endpoint degrees
    * over the undirected edge list — positive means hubs link to hubs
    * (social cores), negative means hub-and-spoke (the structure that
    * makes [[jaccardLinks]]' degree caps necessary; this number says
    * WHICH regime the graph is in before those ops run). Each undirected
    * edge contributes both ordered pairs, so the moment sums are
    * symmetric; degrees are integers, every moment is an exact integer
    * sum, and floats enter only at the final r division — bit-identical
    * across engines and partitionings.
    *
    * Shape: degree table (one grouped count) joined onto each edge
    * endpoint, one 5-moment aggregation — two id equi-joins and two
    * exchanges total, nothing quadratic. Returns one row
    * (n_nodes, n_edges, assortativity rounded 6; pinned to NaN when
    * degenerate — fewer than 2 distinct degrees). */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val canon = canonical(edges)
    val deg = canon.select(col("u").as("id"))
      .unionAll(canon.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("__da_d"))
    val pairs = canon
      .join(deg.select(col("id").as("u"), col("__da_d").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("__da_d").as("dv")), "v")
    // both orientations: Σx = Σy and Σx² = Σy² by construction
    val m = pairs.select(col("du").as("x"), col("dv").as("y"))
      .unionAll(pairs.select(col("dv").as("x"), col("du").as("y")))
      .agg(
        count(lit(1)).as("m"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
    // ANSI sessions fault ANY zero divisor (doubles included), so the
    // all-degrees-equal degenerate case is pinned to NaN explicitly
    val den = col("m") * col("sxx") - col("sx") * col("sx")
    m.crossJoin(broadcast(deg.agg(count(lit(1)).as("n_nodes"))))
      .select(
        col("n_nodes"),
        expr("m div 2").as("n_edges"),
        round(
          when(den =!= 0,
            (col("m") * col("sxy") - col("sx") * col("sx")).cast("double") /
              den.cast("double"))
            .otherwise(lit(Double.NaN)), 6)
          .as("assortativity"))
  }

  /** HITS hubs/authorities as EXACT integer path counts: with the classic
    * all-ones start and NO per-round normalization, round r's scores are
    * h_r(u) = #(paths u→·→·… of the alternating walk) — integers, so the
    * two engines' float-sum ordering can never disagree (normalization
    * only rescales a round; rankings are identical to textbook HITS).
    * Round r: h_r(src) = Σ_dst a_{r-1}(dst); a_r(dst) = Σ_src h_r(src).
    * Iterations are capped small (counts grow ~(max degree)² per round;
    * 5 rounds on a 10⁶-degree graph would overflow 64 bits — loudly
    * rejected here, use normalized float HITS beyond that).
    *
    * Shape: pageRank's discipline — one equi-join + one grouped sum per
    * half-round over the persisted edge list, score vectors never
    * broadcast or collected, lineage truncated between rounds. Returns
    * (node_id, hub, auth) as longs. */
  def hitsPathCounts(edges: DataFrame, iterations: Int = 2): DataFrame = {
    require(iterations >= 1 && iterations <= 4,
      s"iterations must be in [1,4] (integer counts overflow past that), got $iterations")
    val e = OpUtils.shared(
      edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst")).dropDuplicates("src", "dst"))
    val nodes = OpUtils.shared(
      e.select(col("src").as("id"))
        .unionAll(e.select(col("dst").as("id")))
        .distinct())
    var auth = nodes.select(col("id"), lit(1L).as("a"))
    var hub: DataFrame = null
    for (i <- 1 to iterations) {
      hub = nodes.join(
          e.join(auth.withColumnRenamed("id", "dst"), "dst")
            .groupBy(col("src").as("id")).agg(sum(col("a")).as("__hs")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("__hs"), lit(0L)).as("h"))
      auth = nodes.join(
          e.join(hub.withColumnRenamed("id", "src"), "src")
            .groupBy(col("dst").as("id")).agg(sum(col("h")).as("__as")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("__as"), lit(0L)).as("a"))
      // the default 2 rounds compose into ONE lazy chain (the pageRank
      // no-dangler trick — each half-round reads its predecessor exactly
      // once); truncation only pays for itself past that
      if (i < iterations && iterations > 2) {
        hub = OpUtils.roundCheckpoint(hub)
        auth = OpUtils.roundCheckpoint(auth)
      }
    }
    hub.join(auth, "id")
      .select(col("id").as("node_id"), col("h").as("hub"), col("a").as("auth"))
  }

  private[graft] def canonical(edges: DataFrame): DataFrame =
    edges
      .filter(col("src") =!= col("dst"))
      .select(
        least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .dropDuplicates("u", "v")

  /** Every triangle of a canonical u<v edge list, exactly once, as a
    * (src, y, z) vertex triple — the degree-oriented wedge join behind
    * [[triangleCount]] (which counts the triples) and
    * [[clusteringCoefficient]] (which credits each vertex).
    *
    * The closing join is SIZED TO THE WEDGE STREAM, not to the session's
    * shuffle-partition default, and runs as a shuffled HASH join: the wedge
    * stream is O(m^1.5) — far larger than the edge list it joins against —
    * and a sort-merge join would SORT it (measured on the 10× bench graph:
    * 13.4 GB memory spill + 3 GB disk spill sorting ~175M wedges through 32
    * fixed partitions, an 18.8× wall at 10× edges). Instead the wedge
    * volume Σ C(outdeg,2) is computed from the oriented degree profile (one
    * edge-sized aggregation + a driver scalar), both closing-join inputs
    * are hash-repartitioned on the closing-edge key to
    * ceil(wedges / 4M rows) partitions (≥ defaultParallelism), and the
    * SHUFFLE_HASH hint builds the hash table on the EDGE side while the
    * wedge stream streams through unsorted — per-partition memory is then
    * bounded by |E|/P regardless of wedge volume. */
  private[graft] def triangleTriples(canon: DataFrame): DataFrame = {
    // both the orientation build and the closing semi-join read the edge
    // list; shared() is a no-op when the caller already persisted it
    val canonShared = OpUtils.shared(canon)
    val deg = degrees(canonShared)
    // orient low → high in (degree, id) order
    val oriented = canonShared
      .join(deg.select(col("id").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("d").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("src"), col("v").as("dst")))
          .otherwise(struct(col("v").as("src"), col("u").as("dst")))
          .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    // per-center adjacency: out-degree is O(√m) by orientation, so the
    // neighbor sets are bounded and the wedge fan-out happens IN-KERNEL
    // (pairCombinations) after one edge-sized groupBy — no wedge self-join
    val adj = OpUtils.shared(oriented.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("__tt_ns")))
    // wedge volume (a driver scalar off the persisted adjacency) sizes the
    // closing join's exchanges to the data they will actually carry
    val wedgeRows = adj
      .agg(coalesce(sum(size(col("__tt_ns")).cast("long") *
        (size(col("__tt_ns")) - 1)), lit(0L)))
      .collect()(0).getLong(0) / 2
    val spark = canon.sparkSession
    val parts = math.max(spark.sparkContext.defaultParallelism,
      (wedgeRows / 4000000L + 1).min(Int.MaxValue).toInt)
    // wedges (y, z) centered on src, y < z in id order. Each triangle is
    // counted exactly once AT ITS MINIMUM-(degree,id) VERTEX — that is the
    // orientation's job and it is done by the time the adjacency exists —
    // so the pair's own output order is free, and id order lets the
    // closing test run against the canonical u<v edge list directly.
    // LAZY pair generator: the wedge stream is ITERATED, not materialized
    // — a hub center's C(outdeg, 2) pairs never sit in one in-memory
    // array (and the LSH occupancy cap does not apply here; the wedge
    // volume is bounded by orientation, not by bucket sizing)
    import graft.functions.GraftFunctions.pairCombinationsStream
    val wedges = adj
      .select(col("src"), pairCombinationsStream(col("__tt_ns")).as(Seq("y", "z")))
    wedges.repartition(parts, col("y"), col("z"))
      .join(
        canonShared.select(col("u").as("__tt_cs"), col("v").as("__tt_cd"))
          .repartition(parts, col("__tt_cs"), col("__tt_cd"))
          .hint("SHUFFLE_HASH"),
        col("y") === col("__tt_cs") && col("z") === col("__tt_cd"), "left_semi")
  }

  /** Local clustering coefficient per node: 2·tri(v) / (deg(v)·(deg(v)−1))
    * — what fraction of a node's neighbor pairs are themselves connected,
    * the per-node texture behind [[triangleCount]]'s single global number
    * (a co-purchase graph with high coefficients is cliquey product
    * families; low ones are hub-and-spoke). Degree-1 and isolated-pair
    * nodes have no neighbor pairs; their coefficient is 0 by convention.
    *
    * 100 TB shape: the triangle triples come from the same degree-oriented
    * wedge join as [[triangleCount]] (Σ C(outdeg,2) ≤ O(m^1.5) candidates,
    * hub-safe by orientation); crediting vertices is one 3-way explode of
    * the triple stream plus a node-cardinality grouped count, left-joined
    * onto the degree table. Nothing exceeds the triple stream.
    *
    * Returns (node_id, degree, n_tri, coeff) over every non-isolated node,
    * coeff rounded 6 dp. */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    val canon = OpUtils.shared(canonical(edges))
    val perNode = triangleTriples(canon)
      .select(explode(array(col("src"), col("y"), col("z"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("__cc_t"))
    degrees(canon).join(perNode, Seq("id"), "left")
      .select(
        col("id").as("node_id"),
        col("d").cast("long").as("degree"),
        coalesce(col("__cc_t"), lit(0L)).as("n_tri"),
        round(when(col("d") >= 2,
            lit(2.0) * coalesce(col("__cc_t"), lit(0L)) /
              (col("d") * (col("d") - 1)))
          .otherwise(lit(0.0)), 6).as("coeff"))
  }

  /** Fixed-k CORE of an undirected graph — the unique maximal subgraph in
    * which every node has degree ≥ `k` — via the standard peeling fixpoint:
    * repeatedly delete nodes of degree < k (and their edges) until none
    * remain. The result is peel-order-independent, so any engine running
    * the same definition produces identical membership and degrees; the
    * oracle unrolls MORE rounds than convergence needs (extra rounds are
    * no-ops on a converged edge set) rather than guessing the exact depth.
    *
    * 100 TB shape: each round is ONE node-sized degree aggregation plus two
    * LEFT SEMI joins of the edge list against the surviving-node set — the
    * edge list (the dominant relation) is filtered in place, never
    * collected, and the survivor set is never broadcast by hint (AQE
    * upgrades the semi join to broadcast exactly when the survivor table's
    * measured size allows — late rounds on a peeled graph — and shuffles
    * when it doesn't — the corpus-sized early rounds). The driver sees one
    * scalar per round (the under-degree count, which is also the
    * convergence test), and each round's edge set is materialized once and
    * the previous round released, the [[pageRank]] discipline. Peeling
    * depth on real graphs is O(log n)-ish for fixed k; `maxRounds` turns a
    * pathological non-convergence into a loud error instead of an infinite
    * job chain.
    *
    * Returns (node_id, core_deg): members of the k-core with their degree
    * WITHIN the core (≥ k by construction). Empty when the whole graph
    * peels away — a legitimate result, not an error. */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 30): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k (k<=1 keeps every non-isolated node)")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val canon = edges
      .filter(col("src") =!= col("dst"))
      .select(
        least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .dropDuplicates("u", "v")
    // each round reads the current edge set in THREE plan branches (degree
    // agg + both semi-join survivor sets) — a plain persist would nest the
    // full prior plan 3× per round (3^rounds analysis blowup; observed as
    // a driver OOM at 5 rounds over the sf0.1 graph), so every round is
    // materialized AND plan-truncated via OpUtils.roundCheckpoint.
    //
    // Convergence is read off the PEEL ITSELF: deletion is monotone, so the
    // edge count is unchanged after a peel iff no endpoint was under-degree,
    // i.e. the set is the k-core. That folds the old separate
    // degree-histogram count action (a full aggregation job per round) into
    // the round's one materialization — counting a just-checkpointed leaf
    // costs a cached-partition scan, not a recompute — and the survivor
    // aggregate inside both semi joins is deduplicated by ReuseExchange.
    var cur = OpUtils.roundCheckpoint(canon)
    var curCount = cur.count()
    var rounds = 0
    var converged = curCount == 0L // an empty canonical edge list is its own k-core
    while (!converged) {
      val keep = degrees(cur).filter(col("d") >= k).select(col("id"))
      val next = OpUtils.roundCheckpoint(cur
        .join(keep.withColumnRenamed("id", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("id", "v"), Seq("v"), "left_semi"))
      val nextCount = next.count()
      if (nextCount == curCount) converged = true // no-op peel = fixpoint reached
      else {
        rounds += 1
        require(rounds <= maxRounds,
          s"k-core peeling did not converge within $maxRounds rounds " +
            s"($nextCount edges remain, still shrinking) — raise maxRounds or check the graph")
        cur = next
        curCount = nextCount
      }
    }
    degrees(cur).select(col("id").as("node_id"), col("d").cast("long").as("core_deg"))
  }

  /** Multi-source BFS: minimum hop distance from ANY seed node, expanded
    * for exactly `maxHops` frontier rounds (nodes further than `maxHops`
    * are absent from the result). The hop bound is part of the operator's
    * contract — it makes the result independent of traversal scheduling,
    * so any engine unrolling the same rounds lands on identical rows, and
    * it is what a crawl-frontier / contamination-radius query actually
    * wants ("everything within k links"), not full all-pairs reachability.
    *
    * 100 TB shape: per round ONE equi-join of the CURRENT FRONTIER (not
    * the full visited set) against the edge list, one distinct, and one
    * anti-join against the visited set to keep the frontier monotone
    * shrinking-or-expanding without revisits. The edge list is never
    * collected; the visited set is never broadcast by hint (AQE chooses —
    * early rounds it is tiny and broadcasts, late rounds it shuffles).
    * The driver sees one scalar per round (frontier size, which also
    * short-circuits exhausted graphs before the bound). Rounds are
    * `maxHops`, a query constant — the job chain is bounded by design.
    *
    * Returns (node_id, hops): every node reachable within `maxHops`,
    * seeds included at hops = 0, each node at its MINIMUM distance. */
  def hopDistances(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e = OpUtils.shared(
      edges.select(col("src"), col("dst")).dropDuplicates("src", "dst"))
    // every round reads BOTH the frontier and the accumulated visited set,
    // and the accumulator unions the prior round — plan-truncate each
    // round (see kCore: persist alone leaves an exponentially nesting
    // analysis tree across rounds). Leaving the accumulator as a lazy
    // union of truncated frontier leaves was measured in r16 and REGRESSED
    // (sf0.1 warm 3.34→5.05 s): the per-round anti-join against a compact
    // re-materialized visited set beats one against a many-partition union
    // of cached leaves, and the union copy it saves is tiny at every scale
    // (the visited set is node-sized, the joins are edge-sized).
    var dist = OpUtils.roundCheckpoint(
      seeds.select(col("id")).distinct()
        .select(col("id"), lit(0).cast("long").as("hops")))
    var frontier = dist
    var hop = 0L
    var exhausted = false
    while (hop < maxHops && !exhausted) {
      hop += 1
      val next = OpUtils.roundCheckpoint(frontier
        .join(e, frontier("id") === e("src"))
        .select(col("dst").as("id"))
        .distinct()
        .join(dist, Seq("id"), "left_anti")
        .select(col("id"), lit(hop).as("hops")))
      if (next.isEmpty) exhausted = true
      else {
        dist = OpUtils.roundCheckpoint(dist.unionAll(next))
        frontier = next
      }
    }
    dist.select(col("id").as("node_id"), col("hops"))
  }

  /** Community detection by LABEL PROPAGATION, the deterministic
    * fixed-round variant: labels start as node ids; each round every node
    * adopts the most frequent label among its neighbors PLUS its own
    * current label (one self-vote — stabilizes oscillating bipartite-ish
    * neighborhoods), ties broken toward the SMALLEST label. Fixed
    * `rounds` is the engine-parity contract (same rows from any engine
    * running the same rounds — asynchronous/randomized LPA variants are
    * not reproducible across engines by construction).
    *
    * 100 TB shape: per round ONE equi-join (edges ⋈ labels on dst) and
    * TWO aggregations — vote counts per (node, label), then the argmax as
    * `min(struct(-count, label))`, an AGGREGATE-ONLY idiom: no
    * row_number window funnels a hub's full vote list through one task,
    * and only one (count, label) pair per node survives the partial
    * aggregation. The label vector is never collected or hint-broadcast;
    * every round is plan-truncated ([[OpUtils.roundCheckpoint]] — labels
    * feed both the neighbor join and the self-vote union).
    *
    * Returns (node_id, community) over every node with at least one edge. */
  def labelPropagation(edges: DataFrame, rounds: Int = 3): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val canon = edges
      .filter(col("src") =!= col("dst"))
      .select(
        least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .dropDuplicates("u", "v")
    val e = OpUtils.shared(
      canon.select(col("u").as("src"), col("v").as("dst"))
        .unionAll(canon.select(col("v").as("src"), col("u").as("dst"))))
    // Each round IS eagerly checkpointed. The lazy alternative (truncate
    // every 2nd round, trust ReuseExchange to dedup the two consumer
    // branches) was measured in r16 and REGRESSED — sf0.1 warm 2.69→4.03 s,
    // 22→30 Spark jobs: AQE does not reuse the duplicated label subtree
    // across the join and self-vote union branches, so every skipped
    // checkpoint re-executes a full round. Per-round materialization is
    // also the shape that scales: duplicated round compute grows with the
    // corpus, the barrier latency does not.
    var labels = OpUtils.roundCheckpoint(
      e.select(col("src").as("id")).distinct()
        .select(col("id"), col("id").as("lbl")))
    for (_ <- 1 to rounds) {
      val neighborVotes = e
        .join(labels.select(col("id").as("dst"), col("lbl")), "dst")
        .select(col("src").as("id"), col("lbl"))
      labels = OpUtils.roundCheckpoint(
        neighborVotes.unionAll(labels)
          .groupBy(col("id"), col("lbl"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("id"))
          .agg(min(struct((-col("c")).as("nc"), col("lbl").as("l"))).as("m"))
          .select(col("id"), col("m.l").as("lbl")))
    }
    labels.select(col("id").as("node_id"), col("lbl").as("community"))
  }

  /** Undirected degree table (id, d) of a canonical u<v edge list. */
  private[graft] def degrees(e: DataFrame): DataFrame =
    e.select(col("u").as("id")).unionAll(e.select(col("v").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))

  /** Jaccard-coefficient link prediction: for every NON-edge pair with at
    * least `minCommon` shared neighbors, score
    * |N(u)∩N(v)| / |N(u)∪N(v)| and return the top `k` — the classic
    * "products bought together with the same neighbors but never together"
    * recommender signal over a co-occurrence graph.
    *
    * Shape: common-neighbor counts come from per-center wedge fan-out —
    * each node's sorted neighbor set expands through the in-kernel
    * [[graft.functions.GraftFunctions.pairCombinations]] (ordered pairs
    * emitted inside the expression, no positional self-join) and ONE
    * grouped count collapses wedges to (pair, n_common). The `minCommon`
    * filter prunes before any join; degrees attach by id equi-join (AQE
    * broadcasts the degree table while it fits); existing edges drop via
    * one more equi-join (pairs and edges share the u<v canonical order, so
    * one direction suffices); the top-k is a TakeOrdered over
    * 6-dp-rounded scores with (id_a, id_b) tie order.
    *
    * Per-center wedge cost is deg(v)², so ONE web-scale hub would emit its
    * full neighbor-pair square (a 10⁶-degree node ≈ 5·10¹¹ rows) before
    * any filter could prune — `maxDegree` excludes such centers BEFORE the
    * fan-out (the filter sits between the neighbor-set aggregation and the
    * explode, so the bound is on emission itself, plan-asserted). The
    * contract: common-neighbor EVIDENCE routed through nodes of degree >
    * maxDegree is ignored. That is the standard recommender treatment of
    * hubs — co-occurrence through a near-universal neighbor carries almost
    * no signal (the same observation Adamic–Adar formalizes by 1/log(deg)
    * weighting), and [[triangleCount]]'s degree orientation applies the
    * same discipline structurally. Total wedge volume is then ≤ maxDegree
    * × |E| by construction. Raise the cap only with a corresponding
    * executor-memory budget.
    *
    * `edges` must be (src, dst); direction and duplicates are normalized
    * here. Returns (id_a, id_b, n_common, jaccard), jaccard desc. */
  def jaccardLinks(
      edges: DataFrame, k: Int = 20, minCommon: Long = 2,
      maxDegree: Long = 1024): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minCommon >= 1, s"minCommon >= 1, got $minCommon")
    require(maxDegree >= 1, s"maxDegree must be >= 1, got $maxDegree")
    import graft.functions.GraftFunctions.pairCombinations
    val e = OpUtils.shared(edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct())
    val adj = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
    val deg = degrees(e)
    val wedges = adj
      .groupBy(col("u"))
      .agg(collect_set(col("v")).as("__jl_ns"))
      .filter(size(col("__jl_ns")) <= maxDegree) // hub exclusion pre-fan-out
      .select(explode(pairCombinations(array_sort(col("__jl_ns")))).as("p"))
      .select(col("p.id_a").as("a"), col("p.id_b").as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
    wedges
      .join(deg.select(col("id").as("a"), col("d").as("__jl_da")), "a")
      .join(deg.select(col("id").as("b"), col("d").as("__jl_db")), "b")
      .join(e.select(col("u").as("a"), col("v").as("b"), lit(true).as("__jl_e")),
        Seq("a", "b"), "left")
      .filter(col("__jl_e").isNull)
      .select(col("a").as("id_a"), col("b").as("id_b"), col("n_common"),
        round(col("n_common").cast("double") /
          (col("__jl_da") + col("__jl_db") - col("n_common")), 6).as("jaccard"))
      .orderBy(col("jaccard").desc, col("id_a"), col("id_b"))
      .limit(k)
  }

  /** Adamic–Adar link prediction: for every NON-edge pair with at least
    * `minCommon` shared neighbors, score Σ_{w ∈ N(u)∩N(v)} 1/ln(deg(w))
    * and return the top `k`. The same wedge machinery as [[jaccardLinks]]
    * but each wedge is WEIGHTED by how selective its center is — evidence
    * through a near-universal neighbor counts for almost nothing, which is
    * the formal version of the hub skepticism jaccardLinks enforces with
    * its cap. A degree-1 center emits no pairs, so 1/ln(1) never divides
    * by zero.
    *
    * 100 TB shape: identical to jaccardLinks — per-center neighbor sets
    * expand through the in-kernel pairCombinations AFTER the `maxDegree`
    * hub exclusion (bounding emission at ≤ maxDegree × |E| wedges), the
    * center's weight rides each emitted pair (its degree IS the neighbor-
    * set size, no join needed), and ONE grouped aggregation collapses
    * wedges to (pair, count, score). No degree join at all on this path;
    * the existing-edge anti filter and TakeOrdered top-k close it out.
    *
    * Returns (id_a, id_b, n_common, aa_score), score desc, 6 dp. */
  def adamicAdarLinks(
      edges: DataFrame, k: Int = 20, minCommon: Long = 2,
      maxDegree: Long = 1024): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minCommon >= 1, s"minCommon >= 1, got $minCommon")
    require(maxDegree >= 1, s"maxDegree must be >= 1, got $maxDegree")
    import graft.functions.GraftFunctions.pairCombinations
    val e = OpUtils.shared(edges
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct())
    val adj = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
    val wedges = adj
      .groupBy(col("u"))
      .agg(collect_set(col("v")).as("__aa_ns"))
      .filter(size(col("__aa_ns")) <= maxDegree) // hub exclusion pre-fan-out
      .select(
        explode(pairCombinations(array_sort(col("__aa_ns")))).as("p"),
        (lit(1.0) / log(size(col("__aa_ns")).cast("double"))).as("__aa_w"))
      .select(col("p.id_a").as("a"), col("p.id_b").as("b"), col("__aa_w"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_common"), sum(col("__aa_w")).as("__aa_s"))
      .filter(col("n_common") >= minCommon)
    wedges
      .join(e.select(col("u").as("a"), col("v").as("b"), lit(true).as("__aa_e")),
        Seq("a", "b"), "left")
      .filter(col("__aa_e").isNull)
      .select(col("a").as("id_a"), col("b").as("id_b"), col("n_common"),
        round(col("__aa_s"), 6).as("aa_score"))
      .orderBy(col("aa_score").desc, col("id_a"), col("id_b"))
      .limit(k)
  }

  /** One power-iteration round, unexecuted — split out so plan tests can
    * assert its shape (contribution join + aggregate; the only cross join
    * ever present is the 1-row dangling-mass scalar broadcast). */
  private[graft] def roundUpdate(
      nodes: DataFrame,
      weighted: DataFrame,
      ranks: DataFrame,
      danglers: DataFrame,
      nDanglers: Long,
      n: Double,
      damping: Double,
      iterDp: Int): DataFrame = {
    val teleport = (1.0 - damping) / n
    val contribs = weighted
      .join(ranks.withColumnRenamed("id", "src"), "src")
      .groupBy(col("dst").as("id"))
      .agg(sum(col("r") * col("w")).as("c"))
    if (nDanglers == 0)
      nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          round(lit(teleport) +
            lit(damping) * coalesce(col("c"), lit(0.0)), iterDp).as("r"))
    else {
      // 1-row frame: total rank mass stranded on danglers this round —
      // broadcast as a scalar onto every node's update
      val mass = ranks.join(danglers, Seq("id"), "left_semi")
        .agg(coalesce(sum(col("r")), lit(0.0)).as("dm"))
      nodes.join(contribs, Seq("id"), "left")
        .crossJoin(broadcast(mass))
        .select(col("id"),
          round(lit(teleport) + lit(damping) *
            (coalesce(col("c"), lit(0.0)) + col("dm") / lit(n)), iterDp).as("r"))
    }
  }

  /** Connected-component size histogram: (size, n_components) over the
    * undirected graph — the macro-structure readout ([[degreeDistribution]]
    * is the micro one): a healthy similarity graph is many small
    * components; one giant component is the mega-merge smell
    * [[Joins.resolveEntities]] guards against, visible here BEFORE any
    * entity-level damage.
    *
    * 100 TB shape: labels come from [[Dedup.connectedComponents]] — the
    * alternating-star algorithm, O(log diameter) rounds of id-only edge
    * rewiring — then two grouped counts, the second at component-count
    * cardinality. Isolated nodes (no edges) are out of scope; the input
    * is an edge list. */
  def componentSizes(edges: DataFrame): DataFrame = {
    val canon = canonical(edges)
    Dedup.connectedComponents(
        canon.select(col("u").as("id_a"), col("v").as("id_b")))
      .groupBy(col("comp")).agg(count(lit(1)).as("__cs_n"))
      .groupBy(col("__cs_n").as("size")).agg(count(lit(1)).as("n_components"))
  }

  /** Degree distribution: (degree, n_nodes) over the deduped edge list —
    * the first graph-health readout (a heavy tail here is what makes the
    * [[jaccardLinks]] maxDegree cap and [[triangleCount]]'s orientation
    * discipline NECESSARY; this op is how an operator sees that before
    * running them). Two grouped counts, the second at ≤ max-degree
    * cardinality; nothing above node cardinality ever shuffles. */
  def degreeDistribution(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst")).dropDuplicates("src", "dst")
      .groupBy(col("src")).agg(count(lit(1)).as("__deg"))
      .groupBy(col("__deg").as("degree"))
      .agg(count(lit(1)).as("n_nodes"))
}
