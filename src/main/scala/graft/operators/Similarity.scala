package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, StructField, StructType}

import graft.functions.GraftFunctions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k — the baseline. Queries are
  *    broadcast (they're the small side), the corpus streams through one
  *    codegen'd stage; no corpus shuffle at any scale.
  *  - [[ivfTopK]]: IVF-style pruning — corpus is bucketed by nearest
  *    centroid once; a query only scans its `nProbe` nearest buckets.
  *    At 100 TB this turns a full-corpus scan per query batch into a
  *    `nProbe/k` fraction, joined bucket-to-bucket.
  *
  * Both paths reduce with [[graft.functions.TopKByScore]], a bounded-heap
  * `TypedImperativeAggregate`: scored rows are folded into a k-slot heap
  * map-side (partial aggregation), so only k rows per query per partition
  * cross the exchange — vs `row_number().over(Window)` which shuffles ALL
  * |corpus|×|queries| scored rows to rank them.
  */
object Similarity {

  /** Fold scored rows to (query_id, rank, neighbor_id, sim): bounded-heap
    * partial top-k per partition, merge at reduce, explode ranks. Ties break
    * by the smaller neighbor id (same order as a `row_number` oracle). */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("query_id"))
      .agg(topKByScore(col("sim"), col("neighbor_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.neighbor_id").as("neighbor_id"),
        col("col.sim").as("sim"))

  /** Exact top-k neighbors by cosine for each query vector.
    * Returns (query_id, rank, neighbor_id, sim). `queries` must be small
    * enough to broadcast (it is hinted); ties broken by neighbor id. */
  def bruteForceTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int): DataFrame = {
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"))
    val scored = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosineSim(col("cv"), col("qv")))
    rankTopK(scored, k)
  }

  /** Centroid count for a corpus of `n` vectors: the classic IVF sizing
    * `nlist ≈ √n`, which keeps bucket size ≈ √n so the bucket-to-bucket
    * join in [[knnJoin]] does ~n^1.5·nProbe/nlist work instead of the
    * n²·nProbe/nlist a FIXED nlist degrades to as the corpus grows.
    * Floor of 16 (below that the index is pointless), cap of 2^17 — the
    * centroid set is broadcast to every task and its per-iteration mean
    * cells are assembled driver-side, so nlist·dim must stay comfortably
    * in one JVM (2^17 × dim=1024 doubles ≈ 1 GiB; beyond ~10^10 vectors
    * use a two-level coarse quantizer, which this layout composes with:
    * the bucket key simply becomes the second-level centroid id). */
  def ivfCentroidCount(n: Long): Int = {
    val root = math.ceil(math.sqrt(math.max(n, 1L).toDouble)).toLong
    math.max(16L, math.min(root, 1L << 17)).min(math.max(n, 1L)).toInt
  }

  /** Default probe width for an auto-sized index: the √nlist rule — recall
    * grows steeply in the first few probed buckets, and probing √nlist of
    * √n buckets touches ~n^0.25 of the corpus per query. */
  def ivfProbeCount(nCentroids: Int): Int =
    math.max(1, math.ceil(math.sqrt(nCentroids.toDouble)).toInt)

  /** Distributed Lloyd iterations refining an initial centroid set: assign
    * every vector to its nearest centroid (one narrow pass with the fused
    * [[graft.functions.NearestCentroids]] kernel), then recompute each
    * centroid as the element-wise mean of its bucket — one partial-agg
    * shuffle of (bucket, pos) per iteration, never the vectors themselves
    * more than once. Buckets that lose all members keep their previous
    * centroid. Deterministic given the seed-deterministic init. */
  def trainCentroids(
      corpus: DataFrame, vecCol: String,
      init: Seq[Seq[Double]], iterations: Int): Seq[Seq[Double]] = {
    var cents = init
    val dim = init.headOption.map(_.length).getOrElse(0)
    (0 until iterations).foreach { _ =>
      // one partial-agg shuffle of (bucket, pos) per iteration; the final
      // assembly of nCentroids × dim mean cells into centroid vectors is
      // driver-side (it's a constant-size result), NOT a second shuffle +
      // collect_list stage
      val cells = corpus
        .select(
          nearestCentroids(col(vecCol), cents, 1).getItem(0).as("bucket"),
          posexplode(col(vecCol)))
        .groupBy(col("bucket"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .collect()
      val means = Array.tabulate(cents.length)(i => cents(i).toArray)
      val seen = new Array[Boolean](cents.length)
      cells.foreach { r =>
        val b = r.getInt(0)
        if (b >= 0 && b < means.length) {
          if (!seen(b)) { means(b) = new Array[Double](dim); seen(b) = true }
          val p = r.getInt(1)
          if (p < dim) means(b)(p) = r.getDouble(2)
        }
      }
      cents = means.map(_.toSeq).toSeq
    }
    cents
  }

  /** Per-group MEAN EMBEDDING (centroid), one output row per (group,
    * dimension) — the class-prototype / topic-centroid summary that feeds
    * nearest-centroid classification, drift monitoring, and cluster
    * labeling. Elements are widened float→double BEFORE averaging (exact)
    * and the mean is rounded to 4 dp for cross-engine float parity.
    *
    * 100 TB shape: posexplode + partial/final aggregate — each partition
    * map-side combines to at most (#groups × dims) cells before the ONE
    * exchange, so the shuffle carries groups×dims×partitions rows, never
    * the corpus. The flat (group, dim) layout keeps the result joinable
    * and oracle-comparable without array-equality semantics.
    *
    * Returns (groupCol, dim, n, mean_v), dims 0-based. */
  def meanEmbeddings(df: DataFrame, groupCol: String, vecCol: String): DataFrame =
    df.select(col(groupCol), posexplode(col(vecCol)).as(Seq("dim", "v")))
      .groupBy(col(groupCol), col("dim").cast("long").as("dim"))
      .agg(
        count(lit(1)).cast("long").as("n"),
        round(avg(col("v").cast("double")), 4).as("mean_v"))

  /** Symmetric int8 quantization of an embedding column: per-vector scale
    * `max|x|/127`, codes `floor(x·127/max|x|)`. The 4× memory cut (and the
    * SIMD-friendly integer dot product) is the standard compression step
    * before ANN at the 10⁹-vector scale; the float vectors are then only
    * touched to rerank final candidates. Narrow map-only pass. `floor` (not
    * `round`) keeps the code a pure IEEE-deterministic function — identical
    * on every engine/executor. Returns (idCol, scale, codes). */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(
        col(idCol),
        transform(col(vecCol), x => x.cast("double")).as("e"))
      .withColumn("mx", array_max(transform(col("e"), x => abs(x))))
      .select(
        col(idCol),
        (col("mx") / 127.0).as("scale"),
        when(col("mx") === 0, transform(col("e"), _ => lit(0L)))
          // clamp to −127: for x = −mx the two-rounding chain
          // fl(fl(x·127)/mx) can land one ulp below −127, and floor would
          // emit −128 — outside the symmetric range the contract promises
          .otherwise(transform(col("e"),
            x => greatest(floor(x * lit(127.0) / col("mx")).cast("long"), lit(-127L))))
          .as("codes"))

  /** IVF (inverted-file) approximate top-k: corpus vectors are assigned to
    * their nearest of `nCentroids` centroids; each query probes its
    * `nProbe` nearest centroid buckets only. Centroids start as a
    * deterministic hash-ordered sample of the corpus and are refined with
    * `kmeansIters` distributed Lloyd iterations ([[trainCentroids]]) over a
    * bounded training sample. `nCentroids <= 0` (the default) sizes the
    * index to the corpus — `nlist ≈ √n` — so bucket size stays ≈ √n as the
    * corpus grows instead of n/16; `nProbe <= 0` probes √nlist buckets.
    * With `nProbe >= nCentroids` every bucket is probed and the result is
    * EXACTLY the brute-force answer regardless of centroid quality (each
    * corpus vector lives in one bucket) — which is how the correctness
    * gate oracles this operator; centroid quality only affects recall at
    * nProbe < nCentroids. */
  /** Build the IVF index once: projected+persisted (id, v) corpus frame,
    * trained centroid set, and the bucket-assigned corpus. One persisted
    * frame feeds the init sample, every Lloyd iteration, and the final
    * bucket assignment — the parquet scan and column decode run once, not
    * 3 + kmeansIters times. Shared by [[ivfTopK]] and [[knnJoin]].
    *
    * `nCentroids <= 0` sizes the index to the corpus ([[ivfCentroidCount]],
    * count taken from `corpusSizeHint` or a count of the already-persisted
    * frame). Lloyd training runs over a deterministic hash sample of
    * ~[[trainPointsPerCentroid]] vectors per centroid (the standard k-means
    * training budget), NOT the full corpus — training cost is then
    * O(sample·nlist·dim) per iteration independent of corpus size, while
    * the one full-corpus pass left is the final bucket assignment. */
  private def buildIvfIndex(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, kmeansIters: Int,
      corpusSizeHint: Option[Long]): (DataFrame, Seq[Seq[Double]], DataFrame, Int) = {
    val vecs = OpUtils.shared(corpus.select(col(idCol).as("id"), col(vecCol).as("v")))
    val planKey = vecs.queryExecution.analyzed.canonicalized
    val n = corpusSizeHint.getOrElse(
      countCache.computeIfAbsent(planKey, _ => vecs.count()).longValue())
    val nlist = if (nCentroids > 0) nCentroids else ivfCentroidCount(n)
    val cents = centroidCache.computeIfAbsent((planKey, nlist, kmeansIters), { _ =>
      // deterministic hash-threshold sample (narrow, no shuffle, no global
      // limit funnel): keep ids whose hash falls under sampleTarget/n of the
      // 64-bit space; every run and every retry selects the same rows
      val sampleTarget = trainPointsPerCentroid.toLong * nlist
      val train =
        if (n <= sampleTarget) vecs
        else vecs.filter(
          abs(xxhash64(col("id"))) <= (sampleTarget.toDouble / n * Long.MaxValue).toLong)
      val dim = vecs.select(size(col("v"))).head(1).headOption.map(_.getInt(0)).getOrElse(0)
      if (math.min(n, sampleTarget) * math.max(dim, 1) <= localTrainBudgetDoubles) {
        // small-sample fast path: ONE narrow collect of (hash, v), then the
        // init pick (hash-ordered prefix, same rule as the distributed
        // orderBy/limit) and every Lloyd iteration run driver-side
        val sample = train
          .select(xxhash64(col("id")).as("h"), col("v"))
          .collect()
          .sortBy(_.getLong(0))
          .map(r => r.getSeq[Any](1).map(x => x.asInstanceOf[Number].doubleValue()).toArray)
        localLloyd(sample, sample.take(nlist).map(_.toSeq).toSeq, kmeansIters)
      } else {
        val init: Seq[Seq[Double]] = train
          .orderBy(xxhash64(col("id")))
          .limit(nlist)
          .collect()
          .map(r => r.getSeq[Any](1).map(x => x.asInstanceOf[Number].doubleValue()).toSeq)
          .toSeq
        trainCentroids(train, "v", init, kmeansIters)
      }
    })
    val bucketed = vecs.select(
      col("id").as("neighbor_id"), col("v").as("cv"),
      nearestCentroids(col("v"), cents, 1).getItem(0).as("bucket"))
    (vecs, cents, bucketed, cents.length)
  }

  /** k-means training budget per centroid (faiss uses 256 by default). */
  private val trainPointsPerCentroid = 256

  /** Size ceiling (in doubles) under which Lloyd training runs driver-side
    * on the collected sample instead of as Spark jobs. The sample is already
    * bounded to `trainPointsPerCentroid·nlist` vectors; when it also fits in
    * ~16 MB the per-iteration job overhead (analysis + scheduling of an
    * assign/avg round) dwarfs the arithmetic, so one narrow collect plus
    * local iterations replaces `1 + kmeansIters` distributed rounds. Past
    * the budget (large nlist·dim) the distributed path takes over — the
    * local fast path never changes WHAT is computed, only where. */
  private val localTrainBudgetDoubles = 2L * 1024 * 1024

  /** Driver-side Lloyd over a collected sample — the same assignment rule
    * as [[graft.functions.NearestCentroids]] (max cosine, lowest index on
    * ties, zero-norm sims pinned to -2) and the same mean/empty-bucket
    * rules as [[trainCentroids]], so the two training paths are
    * interchangeable up to floating-point summation order. */
  private def localLloyd(
      sample: Array[Array[Double]],
      init: Seq[Seq[Double]], iterations: Int): Seq[Seq[Double]] = {
    var cents = init.map(_.toArray).toArray
    val vecNorms = sample.map(v => math.sqrt(v.map(x => x * x).sum))
    (0 until iterations).foreach { _ =>
      val centNorms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
      // per-(bucket, pos) sums/counts, mirroring the distributed
      // avg-over-posexplode: a position only averages over vectors that
      // actually have it, and a memberless bucket keeps its old centroid
      val sums = cents.map(c => new Array[Double](c.length))
      val counts = cents.map(c => new Array[Long](c.length))
      var i = 0
      while (i < sample.length) {
        val v = sample(i)
        var best = 0
        var bestSim = Double.NegativeInfinity
        var c = 0
        while (c < cents.length) {
          var dot = 0.0
          val m = math.min(v.length, cents(c).length)
          var j = 0
          while (j < m) { dot += v(j) * cents(c)(j); j += 1 }
          val sim =
            if (vecNorms(i) == 0.0 || centNorms(c) == 0.0) -2.0
            else dot / (vecNorms(i) * centNorms(c))
          if (sim > bestSim) { bestSim = sim; best = c }
          c += 1
        }
        val bs = sums(best); val bc = counts(best)
        val m = math.min(v.length, bs.length)
        var j = 0
        while (j < m) { bs(j) += v(j); bc(j) += 1; j += 1 }
        i += 1
      }
      cents = Array.tabulate(cents.length) { c =>
        if (counts(c).forall(_ == 0L)) cents(c)
        else Array.tabulate(cents(c).length)(j =>
          if (counts(c)(j) == 0L) 0.0 else sums(c)(j) / counts(c)(j))
      }
    }
    cents.map(_.toSeq).toSeq
  }

  /** Session-scoped memo of trained centroid sets, keyed on the canonical
    * analyzed plan of the (id, vec) projection plus the index parameters:
    * a pipeline that builds an IVF index and then runs several query
    * batches (or both [[ivfTopK]] and [[knnJoin]]) trains ONCE. Entries
    * are released by [[PipelineCache.clear]] alongside the persisted
    * frames; a source whose files change under an identical plan must
    * clear between runs (same contract as the persisted corpus itself). */
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[(LogicalPlan, Int, Int), Seq[Seq[Double]]]()
  private val countCache =
    new java.util.concurrent.ConcurrentHashMap[LogicalPlan, java.lang.Long]()
  private val pqCache = new java.util.concurrent.ConcurrentHashMap[
    (LogicalPlan, Int, Int, Int), Seq[Seq[Seq[Double]]]]()

  private[operators] def clearIndexCache(): Unit = {
    centroidCache.clear()
    countCache.clear()
    pqCache.clear()
  }

  /** Product-quantization codebooks: `m` subspaces × `ksub` centroids each,
    * trained driver-side with L2 Lloyd over a bounded deterministic sample
    * (hash-ordered prefix, ~[[trainPointsPerCentroid]]·ksub vectors — the
    * faiss training budget; training cost is independent of corpus size).
    * L2 — not cosine — because a code must RECONSTRUCT its subvector: the
    * ADC approximation dot(q,v) ≈ Σⱼ dot(qⱼ, book(j)(codeⱼ)) is tight
    * exactly when each codeword is the least-squares stand-in for its
    * members. Empty clusters keep their previous centroid; assignment
    * ties go to the lowest index — deterministic across runs. */
  private def trainPqCodebooks(
      vecs: DataFrame, m: Int, ksub: Int, iterations: Int): Seq[Seq[Seq[Double]]] = {
    val sampleTarget = trainPointsPerCentroid * ksub
    // deterministic hash-threshold sample + driver-side sort, the same
    // narrow no-shuffle shape as buildIvfIndex — a global orderBy+limit
    // would plan a full-corpus TakeOrdered funnel for the same prefix
    val planKey = vecs.queryExecution.analyzed.canonicalized
    val n = countCache.computeIfAbsent(planKey, _ => vecs.count()).longValue()
    val train =
      if (n <= sampleTarget) vecs
      else vecs.filter(
        abs(xxhash64(col("id"))) <= (sampleTarget.toDouble / n * Long.MaxValue).toLong)
    // hard driver-memory cap as a safety valve: the hash threshold is sized
    // from a CACHED corpus count, so a corpus that grew under an identical
    // plan would admit proportionally more rows — the limit bounds the
    // collect at 4× the budget regardless (only the pathological stale-count
    // case ever truncates, and then nondeterministically; normal operation
    // collects every threshold-passing row)
    val sample = train
      .select(xxhash64(col("id")).as("h"), col("v"))
      .limit(4 * sampleTarget)
      .collect()
      .sortBy(_.getLong(0))
      .map(r => r.getSeq[Any](1).map(x => x.asInstanceOf[Number].doubleValue()).toArray)
    val dim = sample.headOption.map(_.length).getOrElse(0)
    require(m > 0 && dim % m == 0, s"vector dim $dim must divide into m=$m subspaces")
    val subdim = dim / m
    (0 until m).map { j =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * subdim, (j + 1) * subdim))
      var cents = sub.take(ksub).map(_.clone)
      (0 until iterations).foreach { _ =>
        val sums = cents.map(_ => new Array[Double](subdim))
        val counts = new Array[Long](cents.length)
        sub.foreach { v =>
          var best = 0
          var bestD = Double.MaxValue
          var c = 0
          while (c < cents.length) {
            var d = 0.0
            var i = 0
            while (i < subdim) { val t = v(i) - cents(c)(i); d += t * t; i += 1 }
            if (d < bestD) { bestD = d; best = c } // strict <: ties keep lowest
            c += 1
          }
          var i = 0
          while (i < subdim) { sums(best)(i) += v(i); i += 1 }
          counts(best) += 1
        }
        cents = Array.tabulate(cents.length)(c =>
          if (counts(c) == 0L) cents(c)
          else Array.tabulate(subdim)(i => sums(c)(i) / counts(c)))
      }
      cents.map(_.toSeq).toSeq
    }
  }

  /** Exact L2 vector norm as a column (built-ins; runs once per row at
    * encode/query time, off the per-pair hot path). */
  private def vecNorm(c: Column): Column =
    sqrt(aggregate(transform(c, x => x.cast("double") * x.cast("double")),
      lit(0.0), (a, x) => a + x))

  /** IVF-PQ approximate top-k: IVF pruning ([[ivfTopK]]'s bucket layout)
    * plus product-quantized candidate scoring — the memory path for a
    * 10⁹-vector index. Corpus vectors are encoded ONCE to `m` codebook
    * indices + an exact stored norm (≈ m bytes + 8 vs dim·4 — the float
    * vectors leave RAM); each query computes one ADC lookup table and
    * scores candidates with m array reads per pair instead of a dim-length
    * loop; the per-query top `k·refineFactor` shortlist is then re-ranked
    * EXACTLY, joining the shortlist (not the corpus) back to the float
    * vectors by id. Scored rows reduce through the same bounded-heap
    * aggregate as every ANN path — only the shortlist crosses the exchange.
    *
    * `refineFactor <= 0` keeps EVERY scored candidate (no shortlist heap
    * at all — the ADC scores gate rows without truncating): combined with
    * `nProbe >= nlist` (exhaustive-through-buckets) the exact re-rank then
    * returns EXACTLY the brute-force answer at ANY corpus size while still
    * exercising encode → LUT → ADC → re-rank — the correctness-gate
    * configuration, the same trick as ann_ivf. Production sets
    * nProbe ≪ nlist, refineFactor ~2–8.
    * Returns (query_id, rank, neighbor_id, sim). */
  def ivfPqTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, m: Int = 8, ksub: Int = 256, refineFactor: Int = 4,
      nCentroids: Int = 0, nProbe: Int = 0,
      kmeansIters: Int = 2, corpusSizeHint: Option[Long] = None): DataFrame = {
    val nlist = resolveNlist(corpus, idCol, vecCol, nCentroids, corpusSizeHint)
    val (vecs, cents, bucketed, _) =
      buildIvfIndex(corpus, idCol, vecCol, nlist, kmeansIters, corpusSizeHint)
    val planKey = vecs.queryExecution.analyzed.canonicalized
    val books = pqCache.computeIfAbsent((planKey, m, ksub, kmeansIters),
      _ => trainPqCodebooks(vecs, m, ksub, math.max(kmeansIters, 1)))
    // the PQ image of the corpus: codes + exact norm, float vectors dropped
    val encoded = bucketed.select(
      col("neighbor_id"), col("bucket"),
      pqEncode(col("cv"), books).as("codes"), vecNorm(col("cv")).as("vn"))
    // two small broadcasts, deliberately split: the exploded probe relation
    // carries ONLY (query_id, bucket) — broadcasting the LUT inside it
    // would duplicate each ~m·ksub-double table nProbe times — and the
    // one-row-per-query LUT relation joins back after the bucket match
    val qRows = OpUtils.shared(
      queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv")))
    val probedKeys = qRows.select(
      col("query_id"),
      explode(nearestCentroids(col("qv"), cents, resolveProbe(nProbe, nlist))).as("bucket"))
    val qMeta = qRows.select(
      col("query_id"), pqLut(col("qv"), books).as("lut"), vecNorm(col("qv")).as("qn"))
    val approx = encoded.join(broadcast(probedKeys), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .join(broadcast(qMeta), Seq("query_id"))
      // zero-norm sims pinned to -2, same convention as the cosine kernel
      .withColumn("asim", when(col("qn") * col("vn") === 0, lit(-2.0))
        .otherwise(pqAdc(col("lut"), col("codes")) / (col("qn") * col("vn"))))
    val shortlist =
      if (refineFactor <= 0)
        // keep-all (the oracle configuration): no heap — TopKBuffer
        // preallocates its k slots, so a "huge k" stand-in would either cap
        // silently or OOM. The ADC score still gates every row through a
        // non-foldable predicate (asim is nullable to the planner), so the
        // encode → LUT → ADC path genuinely executes rather than being
        // pruned as dead columns.
        approx.filter(col("asim").isNotNull)
          .select(col("query_id"), col("neighbor_id"))
      else approx
        .groupBy(col("query_id"))
        .agg(topKByScore(col("asim"), col("neighbor_id"), math.max(k, k * refineFactor)).as("tk"))
        .select(col("query_id"), explode(col("tk")).as("cand"))
        .select(col("query_id"), col("cand.neighbor_id").as("neighbor_id"))
    // exact re-rank: the shortlist — not the corpus — joins back to the
    // float vectors (shuffle join by id; the index side is never broadcast)
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"))
    val rescored = shortlist
      .join(vecs.select(col("id").as("neighbor_id"), col("v").as("cv")), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("sim", cosineSim(col("cv"), col("qv")))
    rankTopK(rescored, k)
  }

  /** Persist an IVF index for cross-session / cross-shard reuse — the ANN
    * analog of [[Dedup.saveMinhashIndex]], for the "build the index over
    * the accumulated corpus once, query it per incoming shard" pattern.
    *
    * Layout: `centroids/` (centroid_id, cvec — nlist rows, driver-sized),
    * `buckets/` — the assigned corpus written PARTITIONED BY BUCKET, so a
    * query batch that probes `nProbe` of `nlist` buckets reads exactly
    * those directories: with the probe relation broadcast, Spark's dynamic
    * partition pruning pushes the probed bucket set into the file scan
    * (plan-asserted in the spec) and the unprobed ~(1 − nProbe/nlist) of
    * the corpus is never opened. A params file pins nlist — querying a dir
    * with mismatched parameters is impossible by construction. */
  def saveIvfIndex(
      corpus: DataFrame, idCol: String, vecCol: String, dir: String,
      nCentroids: Int = 0, kmeansIters: Int = 2,
      corpusSizeHint: Option[Long] = None): Unit = {
    val spark = corpus.sparkSession
    val nlist = resolveNlist(corpus, idCol, vecCol, nCentroids, corpusSizeHint)
    val (_, cents, bucketed, _) =
      buildIvfIndex(corpus, idCol, vecCol, nlist, kmeansIters, corpusSizeHint)
    val centRows = cents.zipWithIndex.map { case (c, i) => Row(i, c) }
    spark.createDataFrame(
        spark.sparkContext.parallelize(centRows.toSeq, 1),
        StructType(Seq(
          StructField("centroid_id", IntegerType, nullable = false),
          StructField("cvec", ArrayType(DoubleType), nullable = false))))
      .write.mode("overwrite").parquet(s"$dir/centroids")
    bucketed.select(col("neighbor_id"), col("cv"), col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/buckets")
    graft.sources.FsUtil.writeString(spark, s"$dir/params",
      s"nlist=${cents.length}\nmetric=cosine\n")
  }

  /** Top-k over a [[saveIvfIndex]] dir: centroids load driver-side (nlist
    * rows — the same footprint the in-memory cache holds), queries assign
    * to their `nProbe` nearest buckets, and the bucket equi-join runs
    * against the partitioned corpus with the probe side broadcast — scan
    * pruning does the rest. `nProbe >= nlist` probes every bucket (the
    * exhaustive configuration: results exactly match brute force). */
  /** Load a [[saveIvfIndex]] dir: (centroids, nlist, bucketed corpus).
    * Centroids collect driver-side (nlist rows — the footprint the
    * in-memory cache holds); the corpus stays a lazy partitioned scan.
    * Fails loudly on a dir without the params file. */
  def loadIvfIndex(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): (Seq[Seq[Double]], Int, DataFrame) = {
    val paramsPath = s"$dir/params"
    if (!graft.sources.FsUtil.exists(spark, paramsPath))
      throw new IllegalArgumentException(
        s"$dir has no params file — not a saveIvfIndex dir")
    val nlist = graft.sources.FsUtil.readString(spark, paramsPath)
      .linesIterator.collectFirst { case l if l.startsWith("nlist=") =>
        l.stripPrefix("nlist=").trim.toInt }
      .getOrElse(throw new IllegalArgumentException(s"$paramsPath carries no nlist"))
    val cents: Seq[Seq[Double]] = spark.read.parquet(s"$dir/centroids")
      .orderBy(col("centroid_id"))
      .collect()
      .map(r => r.getSeq[Double](1))
      .toSeq
    require(cents.length == nlist,
      s"index dir $dir is inconsistent: params nlist=$nlist but ${cents.length} centroids")
    (cents, nlist, spark.read.parquet(s"$dir/buckets"))
  }

  /** Incremental ingest into a [[saveIvfIndex]] dir: assign the shard's
    * vectors to the PINNED saved centroids (no retraining — params file
    * and `centroids/` untouched, so concurrent readers keep one
    * consistent index geometry) and append them bucket-partitioned under
    * `buckets/`. The ANN mirror of the minhash `dedup_incremental` path:
    * cost is shard_size × nlist assignment work plus a shard-sized
    * partitioned write — the existing index is never read, rewritten or
    * rescanned, so ingesting a day's vectors into a 10⁹-vector index
    * costs the day, not the index. Recall on appended vectors holds while
    * the corpus distribution matches the training corpus; monitor with
    * [[embedDrift]] and rebuild when the assignment histogram skews. */
  def appendToIvfIndex(
      shard: DataFrame, idCol: String, vecCol: String, dir: String): Unit = {
    val spark = shard.sparkSession
    val (cents, _, _) = loadIvfIndex(spark, dir)
    shard.select(
        col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        nearestCentroids(col(vecCol), cents, 1).getItem(0).as("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(s"$dir/buckets")
  }

  def ivfTopKAgainstSavedIndex(
      spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      dir: String, k: Int, nProbe: Int = 0): DataFrame = {
    val (cents, nlist, bucketed) = loadIvfIndex(spark, dir)
    val probed = queries.select(
      col(qIdCol).as("query_id"), col(qVecCol).as("qv"),
      explode(nearestCentroids(col(qVecCol), cents, resolveProbe(nProbe, nlist))).as("bucket"))
    val scored = bucketed.join(broadcast(probed), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosineSim(col("cv"), col("qv")))
    rankTopK(scored, k)
  }

  /** `nProbe <= 0` → the [[ivfProbeCount]] default; values ≥ nlist clamp to
    * probing every bucket — the exhaustive configuration whose result is
    * exactly brute force. */
  private def resolveProbe(nProbe: Int, nlist: Int): Int =
    if (nProbe <= 0) math.min(ivfProbeCount(nlist), nlist)
    else math.min(nProbe, nlist)

  /** `nProbe == Int.MaxValue` is the EXPLICIT brute-force request: the
    * caller wants the exhaustive answer and does not care about the index,
    * so the operators skip training and the bucket machinery entirely and
    * take the brute-force plan (by contract the identical result). Any
    * other `nProbe ≥ nlist` still runs exhaustively but THROUGH the bucket
    * machinery — deliberately, so the correctness gate (and any caller
    * validating an index) can exercise assignment/probing/bucket-join with
    * an exactly-known expected result instead of silently testing the
    * brute-force branch against itself. */
  private def bruteForceRequested(nProbe: Int): Boolean = nProbe == Int.MaxValue

  /** Resolve the (possibly auto-sized) centroid count without training:
    * shares the persisted (id, v) projection and the memoized corpus count
    * with [[buildIvfIndex]], so probing this first costs nothing extra. */
  private def resolveNlist(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int, corpusSizeHint: Option[Long]): Int =
    if (nCentroids > 0) nCentroids
    else {
      val vecs = OpUtils.shared(corpus.select(col(idCol).as("id"), col(vecCol).as("v")))
      val planKey = vecs.queryExecution.analyzed.canonicalized
      val n = corpusSizeHint.getOrElse(
        countCache.computeIfAbsent(planKey, _ => vecs.count()).longValue())
      ivfCentroidCount(n)
    }

  def ivfTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, nCentroids: Int = 0, nProbe: Int = 0,
      kmeansIters: Int = 2, corpusSizeHint: Option[Long] = None): DataFrame = {
    if (bruteForceRequested(nProbe))
      // explicit brute-force request: skip even the corpus count — the
      // index would be built only to be ignored
      bruteForceTopK(corpus, idCol, vecCol, queries, qIdCol, qVecCol, k)
    else {
      val nlist = resolveNlist(corpus, idCol, vecCol, nCentroids, corpusSizeHint)
      val (_, cents, bucketed, _) =
        buildIvfIndex(corpus, idCol, vecCol, nlist, kmeansIters, corpusSizeHint)
      val probed = queries.select(
        col(qIdCol).as("query_id"), col(qVecCol).as("qv"),
        explode(nearestCentroids(col(qVecCol), cents, resolveProbe(nProbe, nlist))).as("bucket"))
      val scored = bucketed.join(broadcast(probed), Seq("bucket"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("sim", cosineSim(col("cv"), col("qv")))
      rankTopK(scored, k)
    }
  }

  /** Metadata-filtered ANN: exact-or-IVF top-k among only the corpus
    * vectors satisfying `pred` — "nearest English docs", "nearest vectors
    * from this crawl snapshot". PRE-filter semantics: the predicate is
    * applied BEFORE any distance work, so the result is the true top-k of
    * the passing subset. (Post-filtering a plain top-k silently
    * under-returns whenever a query's unfiltered neighborhood is dominated
    * by non-matching vectors — the classic filtered-search bug.)
    *
    * 100 TB shape: the centroid index is trained ONCE on the FULL corpus
    * (memoized across calls) and shared by every filter; the per-filter
    * work is a map-only bucket assignment riding the FILTERED scan — the
    * predicate pushes down into the parquet read (plan-asserted), and no
    * id semi-join or per-filter training happens. Probing, bucket join and
    * the bounded-heap top-k reduce are identical to [[ivfTopK]].
    * `nProbe >= nlist` probes every bucket, making the result exactly the
    * brute force over the filtered subset (the oracle configuration);
    * `nProbe == Int.MaxValue` requests the brute-force plan outright. */
  def ivfTopKFiltered(
      corpus: DataFrame, idCol: String, vecCol: String, pred: Column,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, nCentroids: Int = 0, nProbe: Int = 0,
      kmeansIters: Int = 2, corpusSizeHint: Option[Long] = None): DataFrame = {
    if (bruteForceRequested(nProbe))
      bruteForceTopK(corpus.filter(pred), idCol, vecCol, queries, qIdCol, qVecCol, k)
    else {
      val nlist = resolveNlist(corpus, idCol, vecCol, nCentroids, corpusSizeHint)
      val (_, cents, _, _) =
        buildIvfIndex(corpus, idCol, vecCol, nlist, kmeansIters, corpusSizeHint)
      // per-filter bucketing: narrow map over the filtered scan against the
      // broadcast centroid literals — the shared index's training cost is
      // NOT re-paid per filter
      val bucketedF = corpus.filter(pred).select(
        col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
        nearestCentroids(col(vecCol), cents, 1).getItem(0).as("bucket"))
      val probed = queries.select(
        col(qIdCol).as("query_id"), col(qVecCol).as("qv"),
        explode(nearestCentroids(col(qVecCol), cents, resolveProbe(nProbe, nlist)))
          .as("bucket"))
      val scored = bucketedF.join(broadcast(probed), Seq("bucket"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("sim", cosineSim(col("cv"), col("qv")))
      rankTopK(scored, k)
    }
  }

  /** Radius (range) search: every corpus vector within cosine `threshold`
    * of each query vector — the retrieval primitive for "all sufficiently
    * similar" questions (near-duplicate audit around a probe set, recall
    * measurement, contamination lookups), where top-k's fixed cutoff is the
    * wrong contract. Same IVF pruning as [[ivfTopK]]: queries probe their
    * `nProbe` nearest centroid buckets and only those buckets' vectors are
    * scored, so per-query work is ~nProbe/nlist of the corpus. With
    * `nProbe >= nlist` every bucket is probed and the result is EXACTLY the
    * exhaustive answer (each corpus vector lives in one bucket — no
    * dedup needed), which is how the correctness gate oracles it;
    * `nProbe == Int.MaxValue` skips the index entirely (explicit
    * brute-force request, broadcast cross-score). Unlike top-k there is no
    * per-query rank state — the result is a pure filter over the scored
    * stream, so the reduce side is hit-sized. Returns
    * (query_id, neighbor_id, sim rounded to 6dp), sim ≥ threshold. */
  def rangeSearch(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      threshold: Double, nCentroids: Int = 0, nProbe: Int = 0,
      kmeansIters: Int = 2, corpusSizeHint: Option[Long] = None): DataFrame = {
    val out = (scored: DataFrame) => scored
      .withColumn("sim", round(cosineSim(col("cv"), col("qv")), 6))
      .filter(col("sim") >= threshold)
      .select(col("query_id"), col("neighbor_id"), col("sim"))
    if (bruteForceRequested(nProbe)) {
      val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"))
      out(corpus
        .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
        .crossJoin(broadcast(q))
        .filter(col("neighbor_id") =!= col("query_id")))
    } else {
      val nlist = resolveNlist(corpus, idCol, vecCol, nCentroids, corpusSizeHint)
      val (_, cents, bucketed, _) =
        buildIvfIndex(corpus, idCol, vecCol, nlist, kmeansIters, corpusSizeHint)
      val probed = queries.select(
        col(qIdCol).as("query_id"), col(qVecCol).as("qv"),
        explode(nearestCentroids(col(qVecCol), cents, resolveProbe(nProbe, nlist))).as("bucket"))
      out(bucketed.join(broadcast(probed), Seq("bucket"))
        .filter(col("neighbor_id") =!= col("query_id")))
    }
  }

  /** All-pairs kNN self-join: every corpus vector's top-k cosine neighbors
    * — the primitive under embedding-cluster dedup, semantic-neighborhood
    * mining, and retrieval-index validation. Same IVF pruning as
    * [[ivfTopK]], but the probe side is the corpus itself, so the
    * bucket-to-bucket join SHUFFLES on the centroid bucket key instead of
    * broadcasting (both sides are corpus-sized).
    *
    * Scale contract, by configuration — the two paths scale differently
    * and must not be read against each other's bound:
    *   - `nProbe == Int.MaxValue` (the EXPLICIT brute-force request, and
    *     the correctness-oracle/bench configuration): the exact all-pairs
    *     answer. Its honest cost is PAIR VOLUME — n(n-1) cosine kernels —
    *     so wall grows ~quadratically with the corpus BY REQUEST; at 10×
    *     data expect ~10–100× wall depending on where fixed costs stop
    *     dominating. Never deploy this configuration at scale; it exists
    *     so the oracle can check exactness and the heap top-k reduce.
    *   - production (`nProbe ≪ nlist`, the default √nlist): per-bucket
    *     work is Σ_b occ_b·probes_b ≈ n·nProbe·(n/nlist) — ~n^1.5 at the
    *     default nlist ≈ √n sizing, sub-quadratic because only probed
    *     buckets are scored. On CLUSTERED corpora (near-duplicate heavy —
    *     the realistic 100 TB shape) tight clusters pack single buckets
    *     past the balanced n/nlist occupancy; the occupancy-driven
    *     salt-split below keeps that skew off the critical path (work
    *     unchanged, stragglers split), and [[ivfBucketOccupancy]] is the
    *     diagnostic to watch.
    * Returns (query_id, rank, neighbor_id, sim). */
  def knnJoin(
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, nCentroids: Int = 0, nProbe: Int = 0,
      kmeansIters: Int = 2, corpusSizeHint: Option[Long] = None): DataFrame = {
    if (bruteForceRequested(nProbe)) {
      // explicit brute-force request ⇒ every query meets every corpus
      // vector: the bucket explode/join would reproduce the full cross
      // product while duplicating each query row nlist times, so score the
      // pairs directly and skip training. The honest cost of EXACT
      // all-pairs kNN is quadratic at any scale; production sets
      // nProbe ≪ nlist and takes the IVF path below. (No broadcast hint:
      // Spark broadcasts a small corpus by its stats; two huge sides fall
      // back to a partitioned cartesian, which is the correct plan for
      // what was asked.)
      val vecs = OpUtils.shared(corpus.select(col(idCol).as("id"), col(vecCol).as("v")))
      val scored = vecs.select(col("id").as("neighbor_id"), col("v").as("cv"))
        .crossJoin(vecs.select(col("id").as("query_id"), col("v").as("qv")))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("sim", cosineSim(col("cv"), col("qv")))
      rankTopK(scored, k)
    } else {
      val nlist = resolveNlist(corpus, idCol, vecCol, nCentroids, corpusSizeHint)
      val (vecs, cents, bucketed, _) =
        buildIvfIndex(corpus, idCol, vecCol, nlist, kmeansIters, corpusSizeHint)
      val probed = vecs.select(
        col("id").as("query_id"), col("v").as("qv"),
        explode(nearestCentroids(col("v"), cents, resolveProbe(nProbe, nlist))).as("bucket"))
      // CLUSTERED corpora (near-duplicate heavy — the realistic production
      // shape) pack IVF buckets: k-means puts more centroids in dense
      // regions, but a tight near-dup cluster is inseparable and lands in
      // ONE bucket however many centroids surround it. Since this join
      // SHUFFLES on the bucket key, one packed bucket's |b|·probes_b pair
      // work would execute as a single straggler task. Measure occupancy
      // (an nlist-bounded aggregate — the one driver collect here, ≤2^17
      // rows by construction) and SALT-SPLIT hot buckets: neighbors hash
      // into ceil(occ/target) sub-buckets, probes replicate across them
      // (the [[Joins.saltedJoin]] skew discipline applied per-bucket).
      // Pair VOLUME is unchanged — salting restores parallelism, and the
      // balanced-bucket common case skips it entirely (zero plan change).
      val occ = ivfBucketOccupancy(bucketed)
      val avgOcc = math.max(1L, occ.map(_._2).sum / math.max(1, occ.length))
      val target = math.max(256L, 4L * avgOcc)
      val scored = (if (occ.forall(_._2 <= target)) bucketed.join(probed, Seq("bucket"))
      else {
        val spark = corpus.sparkSession
        import spark.implicits._
        val saltsDf = broadcast(occ.toSeq
          .map { case (b, c) => (b, math.min(256L, (c + target - 1) / target).toInt) }
          .toDF("bucket", "__nsalt"))
        // LEFT join + coalesce(1): the salt map is a collected SNAPSHOT of
        // the assignment — if a nondeterministic upstream re-evaluates
        // into a bucket the snapshot never saw, that bucket must still
        // score (unsalted), never silently drop its neighbors
        val saltedN = bucketed.join(saltsDf, Seq("bucket"), "left")
          .withColumn("__n", coalesce(col("__nsalt"), lit(1)))
          .withColumn("__salt",
            pmod(xxhash64(col("neighbor_id")), col("__n").cast("long")).cast("int"))
          .drop("__nsalt", "__n")
        val saltedP = probed.join(saltsDf, Seq("bucket"), "left")
          .withColumn("__n", coalesce(col("__nsalt"), lit(1)))
          .withColumn("__salt", explode(sequence(lit(0), col("__n") - 1)))
          .drop("__nsalt", "__n")
        saltedN.join(saltedP, Seq("bucket", "__salt")).drop("__salt")
      })
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("sim", cosineSim(col("cv"), col("qv")))
      rankTopK(scored, k)
    }
  }

  /** The corpus's IVF bucket assignment (neighbor_id, bucket) under the
    * auto-sized (or `nCentroids`-pinned) index — the input to
    * [[ivfBucketOccupancy]]. Training is memoized per canonical plan, so
    * inspecting occupancy after a [[knnJoin]] on the same corpus costs one
    * assignment pass, never a second training run. */
  def ivfAssignments(
      corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int = 0, kmeansIters: Int = 2,
      corpusSizeHint: Option[Long] = None): DataFrame = {
    val nlist = resolveNlist(corpus, idCol, vecCol, nCentroids, corpusSizeHint)
    val (_, _, bucketed, _) =
      buildIvfIndex(corpus, idCol, vecCol, nlist, kmeansIters, corpusSizeHint)
    bucketed.select(col("neighbor_id"), col("bucket"))
  }

  /** Per-bucket occupancy of an IVF assignment — (bucket, count), one
    * partial-agg exchange over id-only rows, result bounded by nlist
    * (≤ 2^17). The skew diagnostic behind [[knnJoin]]'s hot-bucket
    * salt-split, and the number to look at when a clustered corpus's
    * probe walls drift: max/avg occupancy IS the packing factor. */
  def ivfBucketOccupancy(bucketed: DataFrame): Array[(Int, Long)] =
    bucketed.groupBy(col("bucket")).agg(count(lit(1)).as("__occ"))
      .collect()
      .map(r => r.getAs[Number]("bucket").intValue() -> r.getLong(r.fieldIndex("__occ")))

  /** Maximal-marginal-relevance diversified top-k: from the `pool` most
    * relevant candidates, greedily select `k` maximizing
    * λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s) — the retrieval-layer
    * answer to "the top 10 are 10 copies of the same document" that pure
    * similarity ranking (and every ANN variant above) cannot give.
    * Ties break toward the smaller id at every step, so the selection is
    * fully deterministic.
    *
    * 100 TB shape: candidate generation is the DISTRIBUTED part — one
    * broadcast-query scan + TakeOrdered pool cut, exactly [[bruteForceTopK]]'s
    * cost (swap in the IVF probe path for big corpora; the rerank is
    * source-agnostic). The pool×pool similarity matrix is computed IN the
    * cluster by the same cosine kernel and only its SCALARS (≤ pool²
    * doubles) ever reach the driver — vectors never leave executors. The
    * greedy itself is inherently sequential (each pick conditions on the
    * previous), k·pool² flops on ≤1024 candidates — microseconds, and
    * loudly capped (the [[lloydCentroids]] driver-budget discipline).
    *
    * Returns (rank, vec_id, rel) with rel rounded to 6 dp. */
  def mmrDiversifiedTopK(
      emb: DataFrame, idCol: String, vecCol: String, queryId: Long,
      k: Int = 10, pool: Int = 30, lambda: Double = 0.7): DataFrame = {
    require(k >= 1 && pool >= k, s"need pool >= k >= 1, got k=$k pool=$pool")
    require(pool <= 1024,
      s"MMR pool is a driver-side greedy: capped at 1024 candidates, got $pool")
    require(lambda >= 0 && lambda <= 1, s"lambda in [0,1], got $lambda")
    val spark = emb.sparkSession
    import spark.implicits._
    val q = emb.filter(col(idCol) === queryId).select(col(vecCol).as("qv"))
    // shared: the pool feeds the pair matrix (both sides) and the rel
    // collect — unpersisted, the distributed candidate scan (the expensive
    // part) would re-run once per reference
    val cands = OpUtils.shared(emb.filter(col(idCol) =!= queryId)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .crossJoin(broadcast(q))
      .withColumn("rel", cosineSim(col("v"), col("qv")))
      .orderBy(col("rel").desc, col("id"))
      .limit(pool)
      .select(col("id"), col("rel"), col("v")))
    val sims = cands.select(col("id").as("ia"), col("v").as("va"))
      .crossJoin(broadcast(cands.select(col("id").as("ib"), col("v").as("vb"))))
      .filter(col("ia") =!= col("ib"))
      .select(col("ia"), col("ib"), cosineSim(col("va"), col("vb")).as("s"))
    val rel = cands.select(col("id"), col("rel")).as[(Long, Double)]
      .collect().toMap
    val sim = sims.as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => (a, b) -> s }.toMap
    val ids = rel.keys.toSeq.sorted
    val selected = scala.collection.mutable.ArrayBuffer[Long]()
    while (selected.size < math.min(k, ids.size)) {
      val pick = ids.filterNot(selected.contains).minBy { c =>
        val score =
          if (selected.isEmpty) rel(c)
          else lambda * rel(c) -
            (1 - lambda) * selected.map(s => sim((c, s))).max
        (-score, c)
      }
      selected += pick
    }
    selected.toSeq.zipWithIndex
      .map { case (id, i) =>
        (i + 1L, id, BigDecimal(rel(id))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .toDF("rank", "vec_id", "rel")
  }

  /** Population covariance matrix of the embedding column, upper triangle
    * as (i, j, cov) cells with 0-based dimension indices — the input to
    * PCA/whitening and the first thing to look at when an embedding
    * column's dimensions collapse (a near-zero diagonal cell is a dead
    * dimension; a large off-diagonal block is redundancy PQ would exploit).
    *
    * 100 TB shape: each vector expands to its d(d+1)/2 upper-triangle
    * products INSIDE one codegen'd lambda (no self-join of an exploded
    * (row, dim) table — that join would shuffle |rows|·d), and the partial
    * aggregation folds them map-side, so only the d(d+1)/2 cell partials
    * cross the exchange per task. Per-vector CPU is O(d²) — inherent to
    * covariance; for d in the thousands, batch the triangle into a custom
    * block Aggregator, same exchange shape. Cells rounded 6 dp. */
  def covarianceMatrix(df0: DataFrame, vecCol: String): DataFrame = {
    // the triangle expansion is O(d²) CPU per VECTOR — a small corpus
    // arriving as one file split would serialize all of it on one task
    // (profiled: embed_pca's covariance stage ran 4.6 s single-task at
    // sf0.1); widen spreads the rows before the per-row work, and the
    // partial aggregation still folds map-side so the exchange carries
    // only d(d+1)/2 cell partials per task
    val df = OpUtils.widen(df0)
    val pairs = df.select(explode(expr(
        s"""flatten(transform(sequence(0, size($vecCol) - 1), i ->
           |  transform(sequence(i, size($vecCol) - 1), j -> struct(
           |    i AS i, j AS j,
           |    CAST(element_at($vecCol, i + 1) AS DOUBLE) *
           |    CAST(element_at($vecCol, j + 1) AS DOUBLE) AS xy))))""".stripMargin)).as("p"))
      .select(col("p.i").cast("long").as("i"), col("p.j").cast("long").as("j"),
        col("p.xy"))
      .groupBy(col("i"), col("j")).agg(avg(col("xy")).as("__cm_exy"))
    val means = df
      .select(posexplode(col(vecCol)).as(Seq("__cm_d", "__cm_x")))
      .groupBy(col("__cm_d").cast("long").as("__cm_d"))
      .agg(avg(col("__cm_x").cast("double")).as("__cm_m"))
    val cov = round(col("__cm_exy") - col("__cm_mi") * col("__cm_mj"), 6)
    pairs
      .join(means.select(col("__cm_d").as("i"), col("__cm_m").as("__cm_mi")), "i")
      .join(means.select(col("__cm_d").as("j"), col("__cm_m").as("__cm_mj")), "j")
      // a cell rounding to -0.0 must not hash differently from 0.0 across
      // engines; pin the zero sign (−0.0 == 0.0, so the CASE catches both)
      .select(col("i"), col("j"),
        when(cov === 0.0, lit(0.0)).otherwise(cov).as("cov"))
  }

  /** Collect the [[covarianceMatrix]] cells into a symmetric driver-side
    * d×d array, cells SORTED by (i, j) before assembly so every derived
    * scalar (trace, Frobenius, the eigensolve itself) sums in a fixed
    * order — deterministic run to run regardless of collect order. */
  private def covToMatrix(df: DataFrame, vecCol: String): Array[Array[Double]] = {
    val cells = covarianceMatrix(df, vecCol).collect()
      .map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2)))
      .sortBy(c => (c._1, c._2))
    require(cells.nonEmpty, "PCA requires a non-empty embedding column")
    val d = cells.map(_._1).max + 1
    require(d <= 1024,
      s"PCA collects the d x d covariance to the driver; d=$d exceeds 1024")
    val a = Array.ofDim[Double](d, d)
    cells.foreach { case (i, j, c) => a(i)(j) = c; a(j)(i) = c }
    a
  }

  /** Power iteration with deflation on a (mutated) symmetric matrix:
    * top-`k` (λ, v) pairs, deterministic from an all-ones start vector.
    * `iters` must be sized for the spectral gap — near-isotropic spectra
    * (random embeddings: λ₂/λ₁ ≈ 0.99) need thousands of iterations, and
    * each costs only O(d²) driver flops, so the default errs high; the
    * loop exits early once the residual ‖Av − λv‖∞ hits machine noise
    * (an exact, deterministic test on deterministic arithmetic). */
  private def eigenSolve(
      a: Array[Array[Double]], k: Int, iters: Int): Seq[(Double, Array[Double])] = {
    val d = a.length
    (0 until math.min(k, d)).map { _ =>
      var v = Array.fill(d)(1.0 / math.sqrt(d))
      var lambda = 0.0
      var it = 0
      var converged = false
      while (it < iters && !converged) {
        val av = Array.tabulate(d)(i =>
          (0 until d).map(j => a(i)(j) * v(j)).sum)
        val norm = math.sqrt(av.map(x => x * x).sum)
        if (norm > 0) v = av.map(_ / norm)
        val av2 = Array.tabulate(d)(i =>
          (0 until d).map(j => a(i)(j) * v(j)).sum)
        lambda = (0 until d).map(i => v(i) * av2(i)).sum
        converged = (0 until d).forall(i => math.abs(av2(i) - lambda * v(i)) <= 1e-14)
        it += 1
      }
      // deflate: remove the found component so the next iteration
      // converges to the next eigenpair
      for (i <- 0 until d; j <- 0 until d) a(i)(j) -= lambda * v(i) * v(j)
      (lambda, v)
    }
  }

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Top-`k` PCA eigenpairs of the embedding covariance: (component,
    * eigenvalue, explained_var). The heavy lifting — the covariance — is
    * the distributed [[covarianceMatrix]] aggregation; the eigensolve runs
    * driver-side on the collected d×d matrix (d ≤ 1024 enforced: ~8 MB of
    * doubles — the same deliberate driver-scalar budget as the IVF Lloyd
    * trainer) by power iteration with deflation, deterministic from an
    * all-ones start vector. Covariance cells are pre-rounded to 6 dp, so
    * the eigensolve consumes engine-stable inputs. Eigenvalues of a PSD
    * matrix, rounded 6 dp; explained_var = λ / trace. */
  def pcaEigen(df: DataFrame, vecCol: String, k: Int = 2, iters: Int = 5000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val a = covToMatrix(df, vecCol)
    val d = a.length
    val trace = (0 until d).map(i => a(i)(i)).sum
    val comps = eigenSolve(a, k, iters).zipWithIndex.map { case ((lambda, _), c) =>
      (c.toLong, r6(lambda), r6(if (trace > 0) lambda / trace else 0.0))
    }
    import df.sparkSession.implicits._
    comps.toDF("component", "eigenvalue", "explained_var")
  }

  /** [[pcaEigen]] with its correctness surfaced as SQL-CHECKABLE
    * invariants — the eigensolve is driver-side and engine-private, so a
    * SQL oracle cannot reproduce λ directly; what it CAN do is (a)
    * recompute the two matrix scalars that pin the input — trace and
    * Frobenius norm of the 6dp-rounded covariance cells (the cells
    * themselves are independently hash-matched by embed_covariance) — and
    * (b) assert the decomposition's defining properties, which this query
    * verifies IN-QUERY against the UNdeflated matrix and emits as
    * booleans:
    *   residual_ok — ‖A·v − λ·v‖∞ ≤ tol (v is an eigenvector of A)
    *   orth_ok     — max |v·v_prev| ≤ tol (deflated components stay
    *                 orthogonal)
    *   rayleigh_ok — |vᵀAv − λ| ≤ tol on the ORIGINAL matrix (λ really is
    *                 this vector's Rayleigh quotient of A, not of some
    *                 deflation artifact)
    *   ordered_ok  — λ_c ≤ λ_{c−1} and 0 ≤ Σλ ≤ trace + tol (a PSD
    *                 spectrum, in order, not exceeding total variance)
    * A broken eigensolve (wrong deflation, unconverged iteration, sign
    * bug) flips a boolean and fails the hash gate. Default tol 1e-6:
    * converged power iteration leaves residuals at ~1e-14 (measured across
    * SFs — see SimilaritySpec), so the margin is ~10⁸ while any real
    * defect lands orders of magnitude above it. Returns one row per
    * component: (component, residual_ok, orth_ok, rayleigh_ok,
    * ordered_ok, trace r6, frob_norm r6). */
  def pcaEigenChecked(
      df: DataFrame, vecCol: String, k: Int = 2, iters: Int = 5000,
      tol: Double = 1e-6): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val a0 = covToMatrix(df, vecCol)
    val d = a0.length
    val a = a0.map(_.clone())
    val trace = (0 until d).map(i => a0(i)(i)).sum
    val frob = math.sqrt(
      (0 until d).flatMap(i => (0 until d).map(j => a0(i)(j) * a0(i)(j))).sum)
    val comps = eigenSolve(a, k, iters)
    val rows = comps.zipWithIndex.map { case ((lambda, v), c) =>
      val av = Array.tabulate(d)(i => (0 until d).map(j => a0(i)(j) * v(j)).sum)
      val residual = (0 until d).map(i => math.abs(av(i) - lambda * v(i))).max
      val rayleigh = (0 until d).map(i => v(i) * av(i)).sum
      val orth = (0 until c).map(p =>
        math.abs((0 until d).map(i => v(i) * comps(p)._2(i)).sum))
        .foldLeft(0.0)(math.max)
      val cum = comps.take(c + 1).map(_._1).sum
      (c.toLong,
        residual <= tol,
        orth <= tol,
        math.abs(rayleigh - lambda) <= tol,
        (c == 0 || lambda <= comps(c - 1)._1 + tol) &&
          lambda >= -tol && cum <= trace + tol,
        r6(trace), r6(frob))
    }
    import df.sparkSession.implicits._
    rows.toDF("component", "residual_ok", "orth_ok", "rayleigh_ok",
      "ordered_ok", "trace", "frob_norm")
  }

  /** Recall@k of the IVF index against the exact brute-force answer, over
    * a query batch — the eval harness that tells you what an `nProbe`
    * setting actually costs in answer quality before you dial it down in
    * production. Per query: |approx ∩ exact| / |exact| (|exact| < k when
    * the corpus is small); one summary row (n_queries, k, mean_recall).
    *
    * 100 TB shape: both arms are the library's own scale paths (brute =
    * one streamed corpus scan with bounded-heap top-k; IVF = bucket-join);
    * the intersection is an equi-join of two (queries × k)-row frames —
    * noise next to the searches. Run it on a SAMPLED query batch, not the
    * corpus. */
  def recallEval(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, nProbe: Int = 1): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val exact = bruteForceTopK(corpus, idCol, vecCol, queries, qIdCol, qVecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    val approx = ivfTopK(corpus, idCol, vecCol, queries, qIdCol, qVecCol, k,
        nProbe = nProbe)
      .select(col("query_id"), col("neighbor_id"))
    recallSummary(exact, approx, k)
  }

  /** Mean recall@k of `approx` against `exact` (both (query_id,
    * neighbor_id) frames): |approx ∩ exact| / |exact| per query, averaged.
    * One row (n_queries, k, mean_recall rounded 4). */
  private def recallSummary(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("__re_hit"))
    exact.groupBy(col("query_id")).agg(count(lit(1)).as("__re_n"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("__re_hit"), lit(0L)).cast("double") / col("__re_n"))
          .as("__re_r"))
      .agg(
        count(lit(1)).as("n_queries"),
        lit(k).cast("long").as("k"),
        round(avg(col("__re_r")), 4).as("mean_recall"))
  }

  /** Per-group mean-embedding centroids, rounded 4 dp and ordered by
    * group key — DETERMINISTIC, engine-portable pinned centroids (the
    * [[meanEmbeddings]] cells, which the correctness gate hash-matches on
    * their own, assembled driver-side: #groups × dim scalars). The pinning
    * input for [[recallEvalPinned]]: any engine reading the same table
    * derives the identical centroid set. */
  def labelCentroids(df: DataFrame, labelCol: String, vecCol: String): Seq[Seq[Double]] = {
    val cells = meanEmbeddings(df, labelCol, vecCol)
      .select(col(labelCol).cast("long"), col("dim"), col("mean_v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    require(cells.nonEmpty, "labelCentroids requires a non-empty embedding column")
    cells.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, cs) => cs.sortBy(_._2).map(_._3).toSeq }
  }

  /** [[recallEval]] with CALLER-PINNED centroids instead of the
    * engine-trained ones: the quality eval for a FIXED index (the saved /
    * shared-index deployment pattern), and — because the pinned centroids
    * can be derived from the data by any engine (see [[labelCentroids]])
    * — the configuration whose recall number is externally reproducible:
    * assignment (nearest centroid, ties to the lowest centroid index),
    * probing, both search arms, and the recall arithmetic are all
    * deterministic functions of the input tables. Same scale shape as
    * [[recallEval]]: brute arm streams the corpus once with bounded-heap
    * top-k, IVF arm is a map-only assignment + broadcast-probe bucket
    * join. Returns one row (n_queries, k, mean_recall rounded 4). */
  def recallEvalPinned(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      centroids: Seq[Seq[Double]], k: Int, nProbe: Int = 1): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nProbe >= 1, s"nProbe must be >= 1, got $nProbe")
    require(centroids.nonEmpty, "recallEvalPinned requires centroids")
    val exact = bruteForceTopK(corpus, idCol, vecCol, queries, qIdCol, qVecCol, k)
      .select(col("query_id"), col("neighbor_id"))
    val bucketed = corpus.select(
      col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      nearestCentroids(col(vecCol), centroids, 1).getItem(0).as("bucket"))
    val probed = queries.select(
      col(qIdCol).as("query_id"), col(qVecCol).as("qv"),
      explode(nearestCentroids(col(qVecCol), centroids,
        math.min(nProbe, centroids.length))).as("bucket"))
    val approx = rankTopK(
        bucketed.join(broadcast(probed), Seq("bucket"))
          .filter(col("neighbor_id") =!= col("query_id"))
          .withColumn("sim", cosineSim(col("cv"), col("qv"))), k)
      .select(col("query_id"), col("neighbor_id"))
    recallSummary(exact, approx, k)
  }

  /** Per-label centroid-distance outliers: for every label, the `k`
    * vectors FARTHEST (lowest cosine) from their own label's mean vector —
    * the mislabeled/contaminated-example screen run before training on a
    * labeled embedding corpus. Centroid cells are rounded to 4 dp before
    * the similarity pass so both engines (and any two runs, regardless of
    * partial-agg addition order) score against identical centroids.
    *
    * 100 TB shape: centroids are one (label, dim)-cell partial aggregation
    * (the embed_centroids plan) re-assembled into label-cardinality rows
    * and BROADCAST back onto the corpus; scoring is map-only; the cut is
    * the bounded-heap top-k aggregate — k rows per label per partition
    * cross the exchange, never a per-label window over the corpus.
    * Returns (label, rank, vec_id), rank 1 = farthest; ties by vec_id. */
  def centroidOutliers(
      df: DataFrame, idCol: String, vecCol: String, labelCol: String,
      k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val vecs = df.select(
      col(idCol).cast("long").as("vec_id"),
      col(labelCol).as("label"),
      col(vecCol).cast("array<double>").as("__v"))
    val cells = vecs
      .select(col("label"), posexplode(col("__v")).as(Seq("dim", "v")))
    val centroids = cells
      .groupBy(col("label"), col("dim"))
      .agg(round(avg(col("v")), 4).as("c"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(dim, c))), x -> x.c)")
        .as("__cv"))
    vecs.join(broadcast(centroids), "label")
      .withColumn("__sim", cosineSim(col("__v"), col("__cv")))
      .groupBy(col("label"))
      .agg(topKByScore(negate(col("__sim")), col("vec_id"), k).as("tk"))
      .select(col("label"), posexplode(col("tk")))
      .select(col("label"), (col("pos") + 1).cast("long").as("rank"),
        col("col.neighbor_id").as("vec_id"))
  }

  /** Contrastive hard-negative mining: for each query document, the top
    * `k` embedding neighbors that are NOT lexical near-duplicates
    * (word-shingle Jaccard < `maxJaccard`) — semantically close, textually
    * distinct, exactly the negatives a contrastive encoder trains on
    * (near-dups would be false negatives and poison the loss). The
    * composition is ANN candidate generation at `pool` depth followed by
    * the dedup verify kernel as a FILTER, inverted: dedup keeps high
    * Jaccard, mining keeps low.
    *
    * Shape: the cosine pool comes from [[bruteForceTopK]]'s bounded-heap
    * reduce (swap in the IVF path for corpus scale); shingle sets join
    * back once per side as sorted 64-bit hashes; the final per-query
    * re-rank windows over ≤ `pool` rows per query, never the corpus.
    * `docs` must share the embedding id space. Returns
    * (query_id, rank, neighbor_id, jaccard rounded 6). */
  def hardNegatives(
      emb: DataFrame, embIdCol: String, vecCol: String,
      docs: DataFrame, docIdCol: String, textCol: String,
      queries: DataFrame, k: Int = 3, pool: Int = 10,
      maxJaccard: Double = 0.5): DataFrame = {
    require(k >= 1 && pool >= k, s"need pool >= k >= 1, got pool=$pool k=$k")
    val cands = bruteForceTopK(emb, embIdCol, vecCol,
      queries, embIdCol, vecCol, pool)
    val sets = OpUtils.shared(OpUtils.widen(docs)
      .select(col(docIdCol).cast("long").as("id"),
        Dedup.wordShingles(col(textCol), 3).as("__hn_sh"))
      .filter(size(col("__hn_sh")) > 0)
      .select(col("id"), Dedup.hashedSet(col("__hn_sh")).as("__hn_h"),
        size(col("__hn_sh")).as("__hn_n")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rank"))
    cands
      .join(sets.select(col("id").as("query_id"), col("__hn_h").as("__hn_ha"),
        col("__hn_n").as("__hn_na")), "query_id")
      .join(sets.select(col("id").as("neighbor_id"), col("__hn_h").as("__hn_hb"),
        col("__hn_n").as("__hn_nb")), "neighbor_id")
      .withColumn("__hn_i",
        sortedIntersectCount(col("__hn_ha"), col("__hn_hb")).cast("double"))
      .withColumn("jaccard",
        col("__hn_i") / (col("__hn_na") + col("__hn_nb") - col("__hn_i")))
      .filter(col("jaccard") < maxJaccard)
      .withColumn("__hn_r", row_number().over(w))
      .filter(col("__hn_r") <= k)
      .select(col("query_id"), col("__hn_r").cast("long").as("rank"),
        col("neighbor_id"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Embedding drift between two corpus slices: per label, the cosine
    * between the slice-A and slice-B mean vectors — the "did this week's
    * embeddings move?" monitor run between ingestion snapshots (a drop
    * below ~0.99 on a stable class flags an encoder change, a data-mix
    * shift, or a poisoned slice). `sliceA` is a boolean column splitting
    * the rows; both slices' centroids are rounded to 4 dp cell-wise, and
    * the cosine is assembled from a (label, dim) cell join — explicit
    * Σ ca·cb / (√Σca² · √Σcb²), no vector kernel — so the reported value
    * is reproducible across engines and runs.
    *
    * Shape: one cell expansion → (label, slice, dim) partial aggregate →
    * label-cardinality cell join + one grouped reduction. Returns
    * (label, n_a, n_b, drift_cos rounded 6); labels present in only one
    * slice drop out (no centroid to compare). */
  def centroidDrift(
      df: DataFrame, vecCol: String, labelCol: String,
      sliceA: Column): DataFrame = {
    val vecs = df.select(col(labelCol).as("label"), sliceA.as("__in_a"),
      col(vecCol).cast("array<double>").as("__v"))
    val counts = vecs.groupBy(col("label"))
      .agg(
        count(when(col("__in_a"), 1)).as("n_a"),
        count(when(!col("__in_a"), 1)).as("n_b"))
    val cent = vecs
      .select(col("label"), col("__in_a"), posexplode(col("__v")).as(Seq("dim", "v")))
      .groupBy(col("label"), col("__in_a"), col("dim"))
      .agg(round(avg(col("v")), 4).as("c"))
    val a = cent.filter(col("__in_a")).select(col("label"), col("dim"), col("c").as("ca"))
    val b = cent.filter(!col("__in_a")).select(col("label"), col("dim"), col("c").as("cb"))
    a.join(b, Seq("label", "dim"))
      .groupBy(col("label"))
      .agg(
        sum(col("ca") * col("cb")).as("__dot"),
        sum(col("ca") * col("ca")).as("__na"),
        sum(col("cb") * col("cb")).as("__nb"))
      .join(counts, "label")
      .select(col("label"), col("n_a"), col("n_b"),
        round(col("__dot") / (sqrt(col("__na")) * sqrt(col("__nb"))), 6)
          .as("drift_cos"))
  }

  /** Reciprocal-rank fusion: merge N independent rankings of the same id
    * space into one list ordered by `sum over lists of 1/(c + rank)` —
    * the standard way to combine lexical (BM25) and vector retrieval
    * without score calibration, since RRF consumes only RANKS and is
    * immune to the lists' incomparable score scales. An id absent from a
    * list contributes 0 for it; `c = 60` is the canonical damping
    * constant.
    *
    * Each input is (id, rank) with rank 1-based and ids unique per list.
    * The fuse is a union + one grouped sum over (sum of list lengths)
    * rows — retrieval lists are top-k-sized, so this is driver-trivial
    * math kept distributed only to stay in-plan with upstream retrieval;
    * ordering ties break by id. Returns top `k` (id, rrf_score rounded
    * to 6 dp). */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 10, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    require(k >= 1, s"k must be >= 1, got $k")
    val parts = rankings.map(r => r.select(
      col(r.columns.head).cast("long").as("id"),
      (lit(1.0) / (lit(c.toDouble) + col(r.columns(1)).cast("double")))
        .as("__rrf")))
    parts.reduce(_ unionAll _)
      .groupBy(col("id"))
      .agg(sum(col("__rrf")).as("__score"))
      .orderBy(col("__score").desc, col("id"))
      .limit(k)
      .select(col("id"), round(col("__score"), 6).as("rrf_score"))
  }
}
