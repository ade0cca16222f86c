package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.functions.GraftFunctions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All near-dup variants follow the same scale-safe shape: per-document
  * signature (narrow, one pass) → candidate generation via an equi-join on
  * LSH bucket keys carrying ONLY ids (never an N² crossJoin, and never
  * shuffling the heavy shingle/vector payloads once per band) → exact
  * verification on the deduplicated candidate pairs, with the payloads
  * joined back exactly once per side.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest id per group.
    * Map-side partial aggregation makes this one narrow shuffle. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n"))

  import OpUtils.{shared, widen}

  /** Distinct word n-gram shingles of a text column, SORTED ascending.
    * Sorted output is a set invariant the verification kernel exploits:
    * `sorted_intersect_count` merges two pre-sorted sets in O(|a|+|b|) with
    * zero per-pair allocation, vs `array_intersect` hashing one side per
    * pair. Docs with fewer than n words yield an empty array.
    *
    * Delegates to the fused [[graft.functions.WordShingles]] expression —
    * one eval per document. The equivalent built-in chain
    * (`split → sequence → transform(slice+concat_ws) → array_distinct →
    * array_sort`, kept as the cross-check in ExpressionSpec) runs its
    * higher-order functions interpreted and was the profiled hot spot of
    * every near-dup signature stage. */
  def wordShingles(textCol: Column, n: Int): Column =
    wordShinglesExpr(textCol, n)

  /** LSH bucket table → deduplicated candidate id pairs.
    *
    * `buckets` has an `id` column plus `keyCols` bucket keys. One exchange:
    * group by bucket key, collect the (occupancy-bounded) id list, explode
    * its pair combinations ([[graft.functions.PairCombinations]]), dedup
    * across buckets. The alternative — a bucket self-join — shuffles the
    * bucket table twice and hashes it again for the join; at 10⁹ docs ×
    * 64 bands that is the dominant wire cost of LSH dedup. */
  private def bucketPairs(buckets: DataFrame, keyCols: Seq[String]): DataFrame =
    buckets
      .groupBy(keyCols.map(col): _*)
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(pairCombinations(col("ids"))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .dropDuplicates("id_a", "id_b")

  /** Exact-Jaccard verification of candidate pairs.
    *
    * `cands` = (id_a, id_b) candidate pairs, `sets` = (id, sh) SORTED
    * shingle sets. Joins each side's set back once (two hash joins on ids —
    * cheap keys, not band-multiplied payloads), applies the size-ratio bound
    * (J(a,b) ≥ t ⇒ min|s| ≥ t·max|s|) to skip hopeless intersections, then
    * computes the intersection ONCE per surviving pair with the sorted-merge
    * kernel — the pairwise hot path of every near-dup variant. */
  private def verifyJaccard(cands: DataFrame, sets: DataFrame, threshold: Double): DataFrame = {
    val a = sets.select(col("id").as("id_a"), col("sh").as("sh_a"), size(col("sh")).as("sa"))
    val b = sets.select(col("id").as("id_b"), col("sh").as("sh_b"), size(col("sh")).as("sb"))
    cands.join(a, "id_a").join(b, "id_b")
      .filter(least(col("sa"), col("sb")) >= lit(threshold) * greatest(col("sa"), col("sb")))
      .withColumn("inter", sortedIntersectCount(col("sh_a"), col("sh_b")))
      .withColumn("jac", col("inter").cast("double") / (col("sa") + col("sb") - col("inter")))
      .filter(col("jac") >= threshold)
  }

  /** MinHash + LSH near-duplicate pairs.
    *
    * shingle(n words) → minhash signature (`numHashes` slots) → `bands`
    * bands of `numHashes/bands` rows hashed to a bucket key → self-join on
    * (band, bucket) ids only → exact Jaccard verification at `threshold`.
    *
    * With numHashes=256, bands=64 (4 rows/band), a pair at Jaccard 0.8 is
    * missed with probability (1 - 0.8^4)^64 ≈ 4e-15 — effectively exact at
    * the verification threshold, while only bucket-colliding pairs are ever
    * compared. Returns (id_a, id_b) with id_a < id_b.
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 256,
      bands: Int = 64,
      threshold: Double = 0.8): DataFrame = {
    val sets = shared(widen(df)
      .select(col(idCol).as("id"), wordShingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0))
    // one row per (doc, band): signature + per-band bucket keys in ONE fused
    // eval (MinHashBandKeys) instead of a bands-wide slice/hash expression tree
    val buckets = sets.select(
      col("id"),
      posexplode(minhashBandKeys(col("sh"), numHashes, bands)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    val cands = bucketPairs(buckets, Seq("band", "bucket"))
    // the verified pair list is tiny and is consumed by multiple downstream
    // plans (cluster resolution unions it twice; other queries reuse the
    // same lineage via the cache manager) — persist the RESULT, so the
    // candidate+verify pipeline runs once per corpus, not once per consumer
    shared(verifyJaccard(cands, sets, threshold).select("id_a", "id_b"))
  }

  /** SimHash near-duplicate pairs: 64-bit simhash over word shingles, banded
    * into `maxHamming + 1` bit-range keys (a pair within Hamming distance
    * `maxHamming` has all its differing bits spread over at most `maxHamming`
    * bands, so by pigeonhole at least one band matches exactly — exact
    * recall, no probabilistic misses), verified by exact Hamming distance.
    *
    * Scale bound: candidate pairs grow as Σ_buckets n_b², i.e. ~n²/2^w per
    * band for band width w = 64/(maxHamming+1) under uniform hashing. The
    * default (4 bands × 16 bits) caps bucket space at 2^16 per band — fine
    * to ~10⁷ docs; at ≥10⁸ docs lower `maxHamming` (fewer, wider bands:
    * maxHamming=1 → 2 bands × 32 bits → n²/2^32) or pre-block the corpus
    * (e.g. by language or length bucket) before banding. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 64)")
    val nBands = maxHamming + 1
    // distribute the 64 bits over the bands as evenly as possible
    val widths = Array.tabulate(nBands)(b => 64 / nBands + (if (b < 64 % nBands) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val sig = shared(widen(df)
      .select(col(idCol).as("id"), wordShingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), simhash64(col("sh")).as("sim")))
    val banded = sig.select(
      col("id"),
      posexplode(array((0 until nBands).map { b =>
        val mask = if (widths(b) == 64) -1L else (1L << widths(b)) - 1
        shiftrightunsigned(col("sim"), offsets(b)).bitwiseAND(lit(mask))
      }: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    // candidates once per unique pair, then the signatures join back (two
    // cheap id-keyed joins against the persisted sig) for the Hamming check —
    // vs carrying both sigs through the band self-join and hamming-filtering
    // every band collision
    bucketPairs(banded, Seq("band", "bucket"))
      .join(sig.select(col("id").as("id_a"), col("sim").as("sim_a")), "id_a")
      .join(sig.select(col("id").as("id_b"), col("sim").as("sim_b")), "id_b")
      .select(
        col("id_a"), col("id_b"),
        hamming64(col("sim_a"), col("sim_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
  }

  /** Exact n-gram Jaccard dedup within a blocking key (e.g. source/domain),
    * with PREFIX-FILTERED candidate generation (AllPairs/PPJoin): under a
    * global shingle order (rarest-first by document frequency), any pair
    * with J(x,y) ≥ t must share a shingle within each side's first
    * |x| − ⌈t·|x|⌉ + 1 shingles — so candidates come from an equi-join on
    * (block, prefix-shingle), not an O(block²) id cross-join. Exact: no
    * LSH misses; the verify step computes true Jaccard. Scales with the
    * document frequency of RARE shingles (the prefix is exactly the rare
    * end of each document), not with block size squared.
    * Returns (id_a, id_b, jac rounded to 6dp). */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      n: Int = 2,
      threshold: Double = 0.5): DataFrame = {
    val sets = shared(widen(df).select(
      col(blockCol).as("block"),
      col(idCol).as("id"),
      wordShingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0))
    val toks = sets.select(col("block"), col("id"), explode(col("sh")).as("tok"))
    // global document frequency per shingle → the global shingle order
    // (df asc, shingle asc); one narrow groupBy with map-side combine
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("dfreq"))
    // each doc's shingles rarest-first; keep the prefix-filter prefix
    val prefixes = toks.join(dfreq, "tok")
      .groupBy(col("block"), col("id"))
      .agg(array_sort(collect_list(struct(col("dfreq"), col("tok")))).as("ord"))
      .select(
        col("block"), col("id"),
        expr(s"slice(transform(ord, s -> s.tok), 1, " +
             s"cast(size(ord) - ceil($threshold * size(ord)) + 1 as int))").as("pfx"))
    val pe = prefixes.select(col("block"), col("id"), explode(col("pfx")).as("tok"))
    val cands = bucketPairs(pe, Seq("block", "tok"))
    verifyJaccard(cands, sets.select("id", "sh"), threshold)
      .select(col("id_a"), col("id_b"), round(col("jac"), 6).as("jac"))
  }

  /** Connected components over a duplicate-pair graph: assigns every node
    * the minimum id reachable from it, i.e. the canonical "keeper" of its
    * duplicate cluster — the step that turns pairwise near-dup hits into a
    * deduplicated corpus. Returns (id, component).
    *
    * Implementation is iterative min-label propagation: each round every
    * node adopts the smallest label among itself and its neighbors,
    * converging in O(diameter) rounds (duplicate clusters are near-cliques,
    * so usually 2–3). Each round is one shuffle on node id over the edge
    * list — the standard large-scale CC shape (GraphX/connected-components
    * papers); no driver-side graph state beyond the convergence counter. */
  def connectedComponents(pairs: DataFrame, maxIterations: Int = 20): DataFrame = {
    // undirected edge list, both directions, plus self-loops so isolated
    // endpoints keep their own label
    // persist the PAIR LIST, not just the edge union: edges reference the
    // pairs lineage twice (both directions), so an un-persisted candidate
    // pipeline would run end-to-end once per union branch
    val p = shared(pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
    val edges = p.unionAll(p.select(col("dst").as("src"), col("src").as("dst")))
    // init fuses the first propagation round into the node-list aggregation:
    // label(v) = min(v, neighbors(v)) — the same shuffle a plain `distinct`
    // would cost, but cliques (the common dup-cluster shape) are already
    // converged after it, so the loop below only pays the detection round
    var labels = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("src"), col("src").as("dst")))
      .groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("comp"))
    var prevPersisted: Option[DataFrame] = None
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      // one round = ONE shuffle join + ONE aggregation: neighbor labels
      // (edges ⋈ labels) union'd with each node's own label, min per node.
      // The own row is tagged so the same aggregation also recovers the
      // previous label — the convergence check is then a filter over the
      // persisted frame, with no second join against the old labels.
      val neighborLabels = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(col("src").as("id"), col("comp"), lit(false).as("own"))
      val next = labels.select(col("id"), col("comp"), lit(true).as("own"))
        .unionAll(neighborLabels)
        .groupBy(col("id"))
        .agg(
          min(col("comp")).as("comp"),
          min(when(col("own"), col("comp"))).as("prev"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = next.filter(col("comp") < col("prev")).count()
      prevPersisted.foreach(_.unpersist(blocking = false)) // next is materialized
      prevPersisted = Some(next)
      labels = next.select(col("id"), col("comp"))
      converged = changed == 0
      iter += 1
    }
    // a partial result would silently keep multiple "keepers" per cluster —
    // fail loudly instead (duplicate clusters converge in 2-3 rounds;
    // hitting the cap means a pathological chain or a far-too-low setting)
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIterations iterations — " +
          "labels are partial; raise maxIterations for long drift chains")
    labels
  }

  /** Per-document duplicated-substring coverage: the fraction of a
    * document's distinct word n-grams that occur in at least one OTHER
    * document — the detection half of exact-substring dedup ("Deduplicating
    * Training Data Makes Language Models Better", Lee et al. 2021), scoped
    * to fixed-length n-grams so it runs as two grouped aggregations instead
    * of a suffix array. High coverage flags boilerplate and templated spam
    * that pairwise whole-doc dedup misses. Returns (id, n_grams, dup_frac).
    *
    * Shape: explode distinct shingles → document frequency per shingle
    * (one partial-agg shuffle over the shingle stream) → join back → per-doc
    * ratio. The shingle-frequency table is vocabulary-sized; nothing is
    * pairwise. */
  def duplicatedNgramCoverage(
      df: DataFrame, idCol: String, textCol: String, n: Int = 5): DataFrame = {
    val e = shared(widen(df)
      .select(col(idCol).as("id"), explode(wordShingles(col(textCol), n)).as("g")))
    val dfreq = e.groupBy(col("g")).agg(count(lit(1)).as("dfreq"))
    e.join(dfreq, "g")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_grams"),
        round(sum(when(col("dfreq") > 1, 1).otherwise(0)).cast("double") / count(lit(1)), 6)
          .as("dup_frac"))
      .select(col("id").as(idCol), col("n_grams"), col("dup_frac"))
  }

  /** Embedding near-duplicate pairs via random-hyperplane (sign) LSH:
    * `tables` independent `bitsPerTable`-bit sign sketches; bucket-join on
    * each sketch (ids only); exact cosine verification at `threshold`.
    *
    * With cos θ ≥ 0.95 (θ ≤ 18.2°), P(bit match) = 1 − θ/π ≈ 0.899;
    * P(miss in all of 32 8-bit tables) = (1 − 0.899^8)^32 ≈ 2e-9. The
    * hyperplanes are a fixed seeded pseudo-random matrix — deterministic
    * across runs and executors.
    *
    * Scale bound: each table contributes ~n²/2^bitsPerTable candidate
    * pairs for weakly-correlated vectors, so `bitsPerTable` must grow with
    * the corpus: size it ≳ log2(n) − 10 to keep expected bucket occupancy
    * ~O(1k) (e.g. 8 bits to ~10⁶ docs, 16 bits at 10⁸ — recall at a given
    * threshold is then retuned via `tables`: miss = (1 − p^bits)^tables). */
  def embeddingPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double = 0.95,
      tables: Int = 32,
      bitsPerTable: Int = 8): DataFrame = {
    val vecs = shared(widen(df).select(col(idCol).as("id"), col(vecCol).as("v")))
    val sk = vecs.select(col("id"),
      posexplode(signSketch(col("v"), dim, tables, bitsPerTable)))
      .withColumnRenamed("pos", "tbl")
      .withColumnRenamed("col", "bucket")
    bucketPairs(sk, Seq("tbl", "bucket"))
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .filter(cosineSim(col("v_a"), col("v_b")) >= threshold)
      .select("id_a", "id_b")
  }
}
