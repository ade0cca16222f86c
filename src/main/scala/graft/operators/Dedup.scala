package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window => W}
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
  private[graft] def bucketPairs(buckets: DataFrame, keyCols: Seq[String]): DataFrame =
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
  private def verifyJaccard(cands: DataFrame, sets: DataFrame, threshold: Double): DataFrame =
    verifyJaccard(cands, sets, sets, threshold)

  /** Two-set-table variant for bipartite candidates: `id_a` resolves in
    * `setsA`, `id_b` in `setsB` (the two corpora of a cross-LSH join may
    * use overlapping id spaces, so one union'd set table would be
    * ambiguous). */
  private def verifyJaccard(
      cands: DataFrame, setsA: DataFrame, setsB: DataFrame, threshold: Double): DataFrame = {
    val a = setsA.select(
      col("id").as("id_a"), hashedSet(col("sh")).as("sh_a"), size(col("sh")).as("sa"))
    val b = setsB.select(
      col("id").as("id_b"), hashedSet(col("sh")).as("sh_b"), size(col("sh")).as("sb"))
    cands.join(a, "id_a").join(b, "id_b")
      .filter(least(col("sa"), col("sb")) >= lit(threshold) * greatest(col("sa"), col("sb")))
      .withColumn("inter", sortedIntersectCount(col("sh_a"), col("sh_b")))
      .withColumn("jac", col("inter").cast("double") / (col("sa") + col("sb") - col("inter")))
      .filter(col("jac") >= threshold)
  }

  /** Two-tier near-dup pairs: embedding LSH proposes (semantic recall —
    * catches paraphrases lexical shingles miss), exact text Jaccard
    * confirms (lexical precision — kills the "same topic, different
    * document" false positives a pure-cosine cut ships). The composition
    * is the production multimodal dedup shape: tier 1 never scans pairs
    * (sign-LSH buckets), tier 2 pays the sorted-merge intersection only on
    * tier-1 survivors. `vecs` and `docs` must share an id space (the
    * embedding of doc k carries id k).
    *
    * Returns (id_a, id_b, jaccard) for pairs passing BOTH thresholds. */
  def twoTierPairs(
      vecs: DataFrame, vecIdCol: String, vecCol: String, dim: Int,
      docs: DataFrame, docIdCol: String, textCol: String,
      cosThreshold: Double = 0.95, jaccardThreshold: Double = 0.5,
      shingleSize: Int = 3): DataFrame = {
    val cands = embeddingPairs(vecs, vecIdCol, vecCol, dim, cosThreshold)
    val sets = widen(docs)
      .select(col(docIdCol).as("id"),
        wordShingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
    verifyJaccard(cands, sets, jaccardThreshold)
      .select(col("id_a"), col("id_b"), round(col("jac"), 6).as("jaccard"))
  }

  /** 64-bit hash image of a shingle SET, sorted — what the verification
    * joins carry and merge instead of the string arrays: hashing is one
    * narrow pass per DOCUMENT (not per pair), the per-pair payload drops
    * ~4× (8-byte elements vs UTF8 strings + offsets), and the merge kernel
    * compares fixed-width longs. Distinct inputs stay distinct modulo
    * xxhash64 collisions, which inflate one pair's intersection with
    * probability ~|a|·|b|/2⁶⁴ — immaterial against the exactness the
    * verify step promises. */
  private[graft] def hashedSet(sh: Column): Column =
    array_sort(transform(sh, x => xxhash64(x)))

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

  /** Precomputed MinHash-LSH index of a STATIC corpus, for checking other
    * data against it repeatedly (the static side of streaming ingest dedup,
    * or one side of a bipartite batch check). Returns two persisted frames:
    * `sets` = (id, sh) sorted shingle sets, and `buckets` =
    * (band, bucket, id) id-only band keys — the payload is deliberately NOT
    * duplicated into the band rows, so index memory is |corpus| sets plus
    * `bands` skinny id rows per doc, and a probe joins buckets first (cheap
    * keys) and sets exactly once per surviving candidate. */
  def minhashIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 256,
      bands: Int = 64): (DataFrame, DataFrame) = {
    val sets = shared(widen(df)
      .select(col(idCol).as("id"), wordShingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0))
    val buckets = shared(sets
      .select(col("id"), posexplode(minhashBandKeys(col("sh"), numHashes, bands)))
      .select(col("pos").as("band"), col("col").as("bucket"), col("id")))
    (sets, buckets)
  }

  /** Persist a MinHash LSH index as two parquet tables under `dir` —
    * `sets` (id, shl: sorted 64-bit hashed shingle set, s: set size) and
    * `buckets` (band, bucket, id). This is the cross-run artifact a
    * continuously-ingesting pipeline maintains: build once over the
    * accumulated corpus, then dedup each incoming shard against it with
    * [[dedupAgainstIndex]] — no re-shingling of history, and the shard run
    * reads only the index tables. The sets table stores the 64-bit hash
    * image (what verification merges), not the string shingles: ~4× smaller
    * on disk, and the verify join loads fixed-width longs.
    *
    * Scale shape: both tables are written once per index refresh; the
    * buckets table is the large one (|corpus| × bands rows of three narrow
    * columns) and partitions on read like any parquet source. */
  def saveMinhashIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      shingleSize: Int = 3,
      numHashes: Int = 256,
      bands: Int = 64): Unit = {
    val (sets, buckets) = minhashIndex(df, idCol, textCol, shingleSize, numHashes, bands)
    sets
      .select(col("id"), hashedSet(col("sh")).as("shl"), size(col("sh")).as("s"))
      .write.mode("overwrite").parquet(s"$dir/sets")
    buckets.write.mode("overwrite").parquet(s"$dir/buckets")
    // the parameters are PART of the index: band keys computed with
    // different shingle/hash/band settings share no buckets, so a
    // mismatched query would silently report "no duplicates" — the params
    // file makes the dir self-describing (dedupAgainstSavedIndex reads it)
    graft.sources.FsUtil.writeString(df.sparkSession, s"$dir/params",
      s"shingleSize=$shingleSize\nnumHashes=$numHashes\nbands=$bands\n")
  }

  /** Load a saved index: (sets(id, shl, s), buckets(band, bucket, id)). */
  def loadMinhashIndex(
      spark: org.apache.spark.sql.SparkSession, dir: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$dir/sets"), spark.read.parquet(s"$dir/buckets"))

  /** The parameters a saved index was built with. Fails loudly on a dir
    * without a params file — querying with guessed parameters would
    * silently return no hits. */
  def loadMinhashIndexParams(
      spark: org.apache.spark.sql.SparkSession, dir: String): Map[String, Int] = {
    val path = s"$dir/params"
    if (!graft.sources.FsUtil.exists(spark, path))
      throw new IllegalArgumentException(
        s"$dir has no params file — not a saveMinhashIndex dir (or written by an older build); " +
          "re-save the index or call dedupAgainstIndex with the original parameters")
    graft.sources.FsUtil.readString(spark, path)
      .linesIterator.filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); k.trim -> v.trim.toInt }
      .toMap
  }

  /** [[dedupAgainstIndex]] over a [[saveMinhashIndex]] dir: reads the
    * params file and queries with EXACTLY the parameters the index was
    * built with — a silent mismatch is impossible on this path. */
  def dedupAgainstSavedIndex(
      spark: org.apache.spark.sql.SparkSession,
      shard: DataFrame,
      idCol: String,
      textCol: String,
      dir: String,
      threshold: Double = 0.8): DataFrame = {
    val p = loadMinhashIndexParams(spark, dir)
    val (sets, buckets) = loadMinhashIndex(spark, dir)
    dedupAgainstIndex(shard, idCol, textCol, sets, buckets,
      p("shingleSize"), p("numHashes"), p("bands"), threshold)
  }

  /** Near-duplicate hits of an incoming shard against a SAVED index
    * ([[saveMinhashIndex]]'s tables): returns (id, ref_id, jac) — one row
    * per (shard doc, indexed doc) pair at exact Jaccard ≥ `threshold`
    * (jac rounded to 6 dp). The batch analog of
    * [[graft.streaming.CorpusStream.nearDupHitsStreaming]], for the daily
    * ingest pattern where history is too large to re-process per shard.
    *
    * Scale shape: the shard is shingled once (narrow); candidates come from
    * ONE equi-join of the shard's id-only (band, bucket) rows against the
    * index buckets; pairs are deduplicated BEFORE verification, and the two
    * set tables join back once each — the indexed corpus is never
    * broadcast, never re-shingled, and only its bucket-colliding rows are
    * touched. `shingleSize`/`numHashes`/`bands` must match the values the
    * index was built with. */
  def dedupAgainstIndex(
      shard: DataFrame,
      idCol: String,
      textCol: String,
      indexSets: DataFrame,
      indexBuckets: DataFrame,
      shingleSize: Int = 3,
      numHashes: Int = 256,
      bands: Int = 64,
      threshold: Double = 0.8): DataFrame = {
    val sets = shared(widen(shard)
      .select(col(idCol).as("id"), wordShingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0))
    val cands = sets
      .select(col("id"), posexplode(minhashBandKeys(col("sh"), numHashes, bands)))
      .select(col("id"), col("pos").as("band"), col("col").as("bucket"))
      .join(indexBuckets.withColumnRenamed("id", "ref_id"), Seq("band", "bucket"))
      .select(col("id"), col("ref_id"))
      .dropDuplicates("id", "ref_id")
    val a = sets.select(col("id"), hashedSet(col("sh")).as("shl"), size(col("sh")).as("sa"))
    val b = indexSets.select(col("id").as("ref_id"), col("shl").as("ref_shl"), col("s").as("sb"))
    cands.join(a, "id").join(b, "ref_id")
      .filter(least(col("sa"), col("sb")) >= lit(threshold) * greatest(col("sa"), col("sb")))
      .withColumn("inter", sortedIntersectCount(col("shl"), col("ref_shl")))
      .withColumn("jac", col("inter").cast("double") / (col("sa") + col("sb") - col("inter")))
      .filter(col("jac") >= threshold)
      .select(col("id"), col("ref_id"), round(col("jac"), 6).as("jac"))
  }

  /** Bipartite MinHash + LSH near-duplicate pairs BETWEEN two corpora —
    * the candidate generator for near-dup-level decontamination (a training
    * corpus vs an eval/benchmark corpus): only cross-side pairs are ever
    * emitted or verified, so two corpora that are each internally
    * duplicate-heavy cost |bucket_left|·|bucket_right| per bucket, not
    * occupancy².
    *
    * Same scale shape as [[minhashPairs]]: per-doc signatures narrow, ONE
    * exchange of id-only (band, bucket) rows for candidate generation
    * (grouped aggregation + [[graft.functions.CrossPairCombinations]], not
    * a bucket-table join), exact Jaccard verification with each side's
    * shingle sets joined back once. Neither corpus is ever broadcast —
    * unlike the gram-set approach ([[Curation.decontaminate]]) this stays
    * viable when the eval side is itself too large for a broadcast set.
    * Returns (id_a from `left`, id_b from `right`); id spaces of the two
    * corpora may overlap freely. */
  def crossMinhashPairs(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 256,
      bands: Int = 64,
      threshold: Double = 0.8): DataFrame = {
    def sets(df: DataFrame): DataFrame = shared(widen(df)
      .select(col(idCol).as("id"), wordShingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0))
    def buckets(s: DataFrame, isLeft: Boolean): DataFrame = s
      .select(col("id"), posexplode(minhashBandKeys(col("sh"), numHashes, bands)))
      .select(lit(isLeft).as("is_left"), col("id"), col("pos").as("band"), col("col").as("bucket"))
    val ls = sets(left)
    val rs = sets(right)
    val cands = buckets(ls, isLeft = true).unionAll(buckets(rs, isLeft = false))
      .groupBy(col("band"), col("bucket"))
      .agg(
        collect_list(when(col("is_left"), col("id"))).as("la"),
        collect_list(when(!col("is_left"), col("id"))).as("ra"))
      .filter(size(col("la")) > 0 && size(col("ra")) > 0)
      .select(explode(crossPairCombinations(col("la"), col("ra"))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    shared(verifyJaccard(cands, ls, rs, threshold).select("id_a", "id_b"))
  }

  /** SimHash near-duplicate pairs: 64-bit simhash over word shingles, banded
    * by a pigeonhole block scheme sized to the corpus, verified by exact
    * Hamming distance.
    *
    * Banding: the 64 bits are cut into `b` blocks; a pair within Hamming
    * distance `maxHamming` differs in at most `maxHamming` blocks, so it
    * agrees exactly on SOME `b - maxHamming` of them — every such block
    * subset becomes one bucket key (exact recall, no probabilistic misses,
    * for ANY valid `b`). `b = maxHamming + 1` (single-block keys) is the
    * classic scheme but caps key width at `64/(maxHamming+1)` bits: with
    * the default maxHamming=3 that is 16 bits — candidate pairs ~n²/2^16,
    * quadratic blowup beyond ~10⁷ docs. [[simhashBlockCount]] therefore
    * grows `b` with the corpus: wider multi-block keys (e.g. b=6 → 20 keys
    * of 32 bits, b=8 → 56 keys of 40 bits) trade a few more bucket rows per
    * doc for exponentially fewer collisions. The corpus size comes from
    * `corpusSizeHint`, or is counted off the (about-to-be-materialized)
    * signature relation when absent. Verification output is independent of
    * the banding, so results are byte-identical across sizes. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      maxHamming: Int = 3,
      corpusSizeHint: Option[Long] = None): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 64)")
    val sig = simhashSignatures(df, idCol, textCol, shingleSize)
    val n = corpusSizeHint.getOrElse(sig.count())
    val banded = simhashBuckets(sig, maxHamming, n)
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

  /** Persisted (id, sim) 64-bit simhash signatures over word shingles. */
  private[graft] def simhashSignatures(
      df: DataFrame, idCol: String, textCol: String, shingleSize: Int): DataFrame =
    shared(widen(df)
      .select(col(idCol).as("id"), wordShingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("id"), simhash64(col("sh")).as("sim")))

  /** (id, band, bucket) LSH bucket rows for a signature relation, banding
    * sized by [[simhashBlockCount]] for a corpus of `n` docs. */
  private[graft] def simhashBuckets(sig: DataFrame, maxHamming: Int, n: Long): DataFrame = {
    val nBlocks = simhashBlockCount(maxHamming, n)
    // distribute the 64 bits over the blocks as evenly as possible
    val widths = Array.tabulate(nBlocks)(i => 64 / nBlocks + (if (i < 64 % nBlocks) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    def block(i: Int): Column = {
      val mask = if (widths(i) == 64) -1L else (1L << widths(i)) - 1
      shiftrightunsigned(col("sim"), offsets(i)).bitwiseAND(lit(mask))
    }
    // one bucket key per (b - maxHamming)-block subset: blocks concatenated
    // into a long (total key width ≤ 64 - maxHamming*floor(64/b) < 64 bits)
    val subsets = (0 until nBlocks).combinations(nBlocks - maxHamming).toSeq
    val keys = subsets.map(s =>
      s.foldLeft(lit(0L)) { (acc, i) => shiftleft(acc, widths(i)).bitwiseOR(block(i)) })
    sig.select(col("id"), posexplode(array(keys: _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
  }

  /** Smallest block count whose key width keeps expected bucket collisions
    * sub-quadratic for a corpus of `n` docs: key width (conservatively
    * `floor(64/b) · (b-k)` bits) must cover `log2(n) + log2(#subsets) + 4`.
    * Capped where the per-doc key count C(b, b-k) passes 128 — at that
    * point (≳10⁹ docs for k=3) pre-block the corpus (language/length)
    * before banding instead. */
  private[graft] def simhashBlockCount(maxHamming: Int, n: Long): Int = {
    val k = maxHamming
    if (k == 0) return 1 // exact-signature match: one 64-bit key
    val need = math.log(math.max(n, 2L).toDouble) / math.log(2.0)
    def subsets(b: Int): Double =
      (1 to k).map(i => (b - k + i).toDouble / i).product // C(b, k) = C(b, b-k)
    def width(b: Int): Int = (64 / b) * (b - k)
    // hard-bounded at 64 blocks (1-bit blocks) besides the key-count cap
    val candidates = (k + 1 to 64)
      .takeWhile(b => b == k + 1 || subsets(b) <= 128.0)
    candidates
      .find(b => width(b) >= need + math.log(subsets(b)) / math.log(2.0) + 4)
      .getOrElse(candidates.last)
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
  /** Shared front half of the prefix-filtered detectors: blocked sorted
    * shingle sets, each doc's FULL shingle list in the global rarest-first
    * order (df asc, shingle asc), and the prefix-filter prefix of that
    * list. `prefixKeep` is the number of prefix shingles as a function of
    * set size — Jaccard and containment use the same |s| − ⌈t·|s|⌉ + 1
    * bound, so both detectors share this table and any fix to the prefix
    * math lands in one place. The ordered list is what makes POSITIONAL
    * pruning possible downstream: a shingle's index in it upper-bounds how
    * much overlap can still follow. Returns
    * (sets = (block, id, sh), ordered = (block, id, sz, ord),
    *  prefixes = (block, id, sz, pfx) — a narrow slice of `ordered`). */
  private def prefixTable(
      df: DataFrame, idCol: String, textCol: String, blockCol: String,
      n: Int, threshold: Double): (DataFrame, DataFrame, DataFrame) = {
    val sets = shared(widen(df).select(
      col(blockCol).as("block"),
      col(idCol).as("id"),
      wordShingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0))
    val toks = sets.select(col("block"), col("id"), explode(col("sh")).as("tok"))
    // global document frequency per shingle → the global shingle order
    // (df asc, shingle asc); one narrow groupBy with map-side combine
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("dfreq"))
    // each doc's shingles rarest-first
    val ordered = shared(toks.join(dfreq, "tok")
      .groupBy(col("block"), col("id"))
      .agg(array_sort(collect_list(struct(col("dfreq"), col("tok")))).as("ordS"))
      .select(
        col("block"), col("id"), size(col("ordS")).as("sz"),
        expr("transform(ordS, s -> s.tok)").as("ord")))
    val prefixes = ordered.select(
      col("block"), col("id"), col("sz"),
      expr(s"slice(ord, 1, cast(sz - ceil($threshold * sz) + 1 as int))").as("pfx"))
    (sets, ordered, prefixes)
  }

  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      n: Int = 2,
      threshold: Double = 0.5): DataFrame = {
    val (sets, _, prefixes) = prefixTable(df, idCol, textCol, blockCol, n, threshold)
    val pe = prefixes.select(
      col("block"), col("id"), col("sz"), explode(col("pfx")).as("tok"))
    // candidate generation applies the AllPairs LENGTH filter in-kernel:
    // the set size rides with the id into the bucket rows, and a pair whose
    // sizes cannot reach `threshold` is pruned BEFORE it crosses the
    // exchange or joins its shingle payloads back
    val cands = pe
      .groupBy(col("block"), col("tok"))
      .agg(collect_list(struct(col("sz"), col("id"))).as("entries"))
      .filter(size(col("entries")) > 1)
      .select(explode(sizeFilteredPairCombinations(col("entries"), threshold)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    verifyJaccard(cands, sets.select("id", "sh"), threshold)
      .select(col("id_a"), col("id_b"), round(col("jac"), 6).as("jac"))
  }

  /** ASYMMETRIC containment pairs: documents whose shingle set is
    * substantially CONTAINED in another document's (|A∩B| / |A| ≥
    * `threshold`, A the smaller side) — quotes, excerpts and subsumed
    * revisions that symmetric Jaccard misses (a 50-shingle doc fully
    * inside a 500-shingle doc has J ≈ 0.1 but containment 1.0).
    *
    * Candidate generation is the one-sided prefix filter: under the global
    * rarest-first shingle order, C(A,·) ≥ t forces a match within A's
    * first |A| − ⌈t·|A|⌉ + 1 shingles — so the CONTAINED side emits only
    * that prefix, while the containing side must be findable by any
    * shingle (it cannot know which of its shingles is rare for A) and
    * emits all of them. The candidate join is (block, shingle) equi —
    * volume tracks rare-shingle document frequency times prefix size,
    * never block². Joined rows then pass the PPJoin POSITIONAL bound
    * before anything crosses the dedup exchange: at a match seen at index
    * posA of A's order and posB of B's, the containment overlap can reach
    * at most 1 + min(|A|−posA, |B|−posB) — on dense vocabularies (where
    * every shingle is common and the prefix filter alone is weak) this is
    * what keeps the candidate set near the true-pair set. Verification
    * computes true containment once per deduplicated pair with the
    * sorted-merge kernel. Returns
    * (id_small, id_big, containment rounded to 6dp), id_small ≠ id_big;
    * both directions are checked (a ⊆ b and b ⊆ a emit separately). */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      n: Int = 2,
      threshold: Double = 0.8): DataFrame = {
    val (sets, ordered, prefixes) = prefixTable(df, idCol, textCol, blockCol, n, threshold)
    val pe = prefixes.select(
        col("block"), col("id").as("id_small"), col("sz").as("pa"),
        posexplode(col("pfx")).as(Seq("pos_a", "tok")))
    val full = ordered.select(
        col("block"), col("id").as("id_big"), col("sz").as("pb"),
        posexplode(col("ord")).as(Seq("pos_b", "tok")))
    // contained-side prefixes meet the containing side's FULL token stream
    // (both in the global rarest-first order); the id pair is ordered
    // (small = the candidate contained doc). Sizes AND positions ride with
    // the ids: the containment length bound (|B| ≥ t·|A|) and the PPJoin
    // positional bound both prune BEFORE the dedup exchange and the
    // payload join-back. Positional soundness: at a true pair's FIRST
    // matching shingle, every matched element still lies at-or-after the
    // match on both sides, so C ≤ 1 + min(|A|−posA, |B|−posB); a row
    // failing that can be dropped because the first-match row of any true
    // pair always passes, and dropDuplicates keeps a pair if ANY of its
    // rows survives. (posexplode is 0-based: |A|−posA−1 remain after the
    // match.) The epsilon guards the t·|A| float boundary — pruning may
    // only ever be LESS aggressive than the exact verify.
    val cands = pe
      .join(full, Seq("block", "tok"))
      .filter(col("id_small") =!= col("id_big") &&
        col("pb") >= lit(threshold) * col("pa") &&
        (lit(1) + least(col("pa") - col("pos_a") - 1, col("pb") - col("pos_b") - 1)) >=
          lit(threshold) * col("pa") - lit(1e-9))
      .select("id_small", "id_big")
      .dropDuplicates("id_small", "id_big")
    val a = sets.select(
      col("id").as("id_small"), hashedSet(col("sh")).as("sh_a"), size(col("sh")).as("sa"))
    val b = sets.select(col("id").as("id_big"), hashedSet(col("sh")).as("sh_b"))
    // the |B| ≥ t·|A| length bound was already applied pre-exchange above
    cands.join(a, "id_small").join(b, "id_big")
      .withColumn("inter", sortedIntersectCount(col("sh_a"), col("sh_b")))
      .withColumn("containment", round(col("inter").cast("double") / col("sa"), 6))
      .filter(col("containment") >= threshold)
      .select(col("id_small"), col("id_big"), col("containment"))
  }

  /** Connected components over a duplicate-pair graph: assigns every node
    * the minimum id reachable from it, i.e. the canonical "keeper" of its
    * duplicate cluster — the step that turns pairwise near-dup hits into a
    * deduplicated corpus. Returns (id, component).
    *
    * Implementation is the alternating large-star/small-star algorithm
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14): each round rewires every node's strictly-larger neighbors
    * (large-star) and then its smaller neighbors (small-star) to the local
    * minimum, contracting the graph toward one star per component whose
    * center is the component minimum. Convergence is O(log diameter)
    * rounds — min-LABEL propagation is O(diameter), which on
    * chained-similarity graphs (entity resolution over near-keys, long
    * drift chains) makes round count unbounded in corpus size. Each round
    * is two window passes + dedup over the edge list only (ids, no
    * payloads); no driver-side graph state beyond the convergence stats. */
  def connectedComponents(pairs: DataFrame, maxIterations: Int = 20): DataFrame =
    connectedComponentsWithRounds(pairs, maxIterations)._1

  /** [[connectedComponents]] plus the number of rounds run — the scale
    * probe asserts round count grows ~log(diameter) on a planted chain
    * graph and stays flat on clique-shaped duplicate clusters.
    *
    * `localEdgeCutoff`: the small-graph hybrid cutover (the
    * GraphX/GraphFrames discipline). A distinct-edge count at or below the
    * cutoff is labeled by DRIVER union-find instead of the round loop: the
    * edge list is already materialized and counted for the loop's own
    * convergence fingerprint, a cutoff-bounded collect is two longs per
    * edge, and union-by-min-root with path compression produces the
    * IDENTICAL min-reachable-id labels with zero distributed rounds —
    * where each star round costs two window exchanges, a distinct, an
    * eager checkpoint and a fingerprint action regardless of how little
    * data flows through them (profiled: ~42 jobs / ~11 s per run on a
    * 20 k-edge ER graph, all fixed per-round latency; this is per-round
    * BARRIER cost, which a cluster pays the same way). Above the cutoff —
    * the 100 TB regime, where the edge list must never visit the driver —
    * the log-round loop runs unchanged. -1 (default) reads
    * `spark.graft.cc.localEdgeCutoff` (default 1,000,000 edges ≈ 80 MB of
    * bounded driver transients: specialized tuples + primitive id/parent
    * arrays); 0 disables the fast path (the probes pin 0 so round scaling
    * stays measured). Non-integral id types, and src/dst of differing
    * widths, always take the loop (the collect path reads ids as longs
    * and labels back as the single shared type). */
  private[graft] def connectedComponentsWithRounds(
      pairs: DataFrame, maxIterations: Int = 20,
      localEdgeCutoff: Int = -1): (DataFrame, Int) = {
    // persist the PAIR LIST, not just derived frames: the node list and the
    // initial edge orientation both reference the pairs lineage, so an
    // un-persisted candidate pipeline would run end-to-end per branch
    val p = shared(pairs.select(col("id_a").as("src"), col("id_b").as("dst")))
    // every endpoint keeps a label even if its only pair is a self-pair
    val nodes = p.select(col("src").as("id"))
      .unionAll(p.select(col("dst").as("id"))).distinct()
    // canonical orientation big→small; self-pairs carry no connectivity
    var edges = p.filter(col("src") =!= col("dst"))
      .select(
        greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .distinct()
    // large-star(u): rewire every neighbor v > u to min(N(u) ∪ {u}). The
    // min is a partition-wide window over the symmetric edge list — one
    // exchange on the center id, no join back. Orientation (src > dst) is
    // preserved: the emitted (v, m) has m ≤ u < v.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      sym.withColumn("m",
          least(min(col("dst")).over(W.partitionBy(col("src"))), col("src")))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .distinct()
    }
    // small-star(u): over the oriented list every dst < src, so the local
    // min is min(dst); relink the center and every non-min neighbor to it
    def smallStar(e: DataFrame): DataFrame = {
      val withMin = e.withColumn("m", min(col("dst")).over(W.partitionBy(col("src"))))
      withMin.filter(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .unionAll(withMin.select(col("src"), col("m").as("dst")))
        .distinct()
    }
    // fixed-point detection: the edge SET is stable under both stars at
    // convergence (the paper's star-graph invariant), so compare per-round
    // (count, hash-sum) fingerprints — one cheap aggregate over the frame
    // the round already materialized, no exceptAll anti-join
    def fingerprint(e: DataFrame): (Long, String, String) = {
      // hash sums accumulate in decimal(38,0) — a long sum overflows under
      // ANSI mode after a handful of large 64-bit hashes
      val r = e.agg(
        count(lit(1)),
        coalesce(sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")), lit(0L)),
        coalesce(sum(xxhash64(col("dst"), col("src")).cast("decimal(38,0)")), lit(0L))).collect()(0)
      (r.getLong(0), r.get(1).toString, r.get(2).toString)
    }
    // each round references the prior round's frame in FOUR branches (the
    // symmetric union + the two star rewires), so a persist-only loop grows
    // the LOGICAL plan ~4^rounds — persisted data short-circuits execution
    // but not analysis, and at log-round depth the tree alone OOMs the
    // driver. roundCheckpoint (eager localCheckpoint) truncates each round
    // to a LogicalRDD leaf — the same GraphX-Pregel discipline pageRank and
    // kCore already use.
    edges = OpUtils.roundCheckpoint(edges)
    var prevFp = fingerprint(edges)
    // small-graph hybrid (see scaladoc): the fingerprint above already
    // counted the distinct edges; at-or-below the cutoff, label on the
    // driver and skip the round loop entirely
    val idType = p.schema("src").dataType
    // both endpoints must share one integral type: mixed widths would
    // union-widen `nodes` while the fast path casts labels back to the
    // src type — a silent schema divergence from the loop path (and a
    // potential ANSI cast overflow), so such inputs take the loop
    val integralIds = Seq("tinyint", "smallint", "int", "bigint")
      .contains(idType.simpleString) && p.schema("dst").dataType == idType
    val cutoff =
      if (localEdgeCutoff >= 0) localEdgeCutoff
      else pairs.sparkSession.conf
        .get("spark.graft.cc.localEdgeCutoff", "1000000").toInt
    if (integralIds && cutoff > 0 && prevFp._1 <= cutoff) {
      val spark = pairs.sparkSession
      import spark.implicits._
      // primitive collect: Dataset[(Long, Long)] materializes SPECIALIZED
      // tuples (two primitive fields each, no GenericRow boxing); ids are
      // then index-compressed through one sorted array so union-find runs
      // over int indices and primitive arrays. Driver transient at the
      // 1M-edge cutoff: ~32 MB tuples + ~48 MB id/parent arrays — bounded
      // and far below the boxed-HashMap shape this replaced.
      val arr = edges
        .select(col("src").cast("long"), col("dst").cast("long"))
        .as[(Long, Long)]
        .collect() // bounded: <= cutoff rows of two longs
      val nE = arr.length
      val all = new Array[Long](2 * nE)
      var i = 0
      while (i < nE) { all(2 * i) = arr(i)._1; all(2 * i + 1) = arr(i)._2; i += 1 }
      java.util.Arrays.sort(all)
      var m = 0 // unique in place; sorted order means index order == id order
      i = 0
      while (i < all.length) {
        if (m == 0 || all(m - 1) != all(i)) { all(m) = all(i); m += 1 }
        i += 1
      }
      val ids = java.util.Arrays.copyOf(all, m)
      def idx(x: Long): Int = java.util.Arrays.binarySearch(ids, x)
      val parent = Array.tabulate(m)(identity)
      def find(x0: Int): Int = {
        var r = x0
        while (parent(r) != r) r = parent(r)
        var y = x0 // path compression
        while (y != r) { val py = parent(y); parent(y) = r; y = py }
        r
      }
      // union by MIN root: a tree's root is always the minimum of its
      // members (induction over unions), and ids are index-compressed in
      // SORTED order, so min index == min id and find(x) IS the label
      i = 0
      while (i < nE) {
        val ra = find(idx(arr(i)._1)); val rb = find(idx(arr(i)._2))
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
        i += 1
      }
      // emit only non-root members — root and isolated/self-paired nodes
      // label themselves through the coalesce
      val nonRoot = Array.newBuilder[(Long, Long)]
      i = 0
      while (i < m) {
        val r = find(i)
        if (r != i) nonRoot += ((ids(i), ids(r)))
        i += 1
      }
      val lbl = nonRoot.result().toSeq.toDF("id", "__cc_c")
        .select(col("id").cast(idType).as("id"), col("__cc_c").cast(idType).as("__cc_c"))
      val labels = nodes.join(broadcast(lbl), Seq("id"), "left")
        .select(col("id"), coalesce(col("__cc_c"), col("id")).as("comp"))
      return (labels, 0)
    }
    var converged = false
    var iter = 0
    while (!converged && iter < maxIterations) {
      val next = OpUtils.roundCheckpoint(smallStar(largeStar(edges)))
      val fp = fingerprint(next)
      edges = next
      converged = fp == prevFp
      prevFp = fp
      iter += 1
    }
    // a partial result would silently keep multiple "keepers" per cluster —
    // fail loudly instead (clique-shaped dup clusters converge in 2-3
    // rounds and even diameter-d chains in O(log d); hitting the cap means
    // a far-too-low setting)
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIterations iterations — " +
          "labels are partial; raise maxIterations for long drift chains")
    // at the fixed point the graph is a disjoint union of stars centered on
    // each component's minimum: non-centers read their label off their star
    // edge; centers and isolated nodes label themselves
    val labels = nodes
      .join(edges.groupBy(col("src").as("id")).agg(min(col("dst")).as("c")), Seq("id"), "left")
      .select(col("id"), coalesce(col("c"), col("id")).as("comp"))
    (labels, iter)
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
    * pairwise. The gram key is xxhash64'd BEFORE the frequency exchange —
    * an 8-byte key instead of an ~n-word string cuts both the groupBy and
    * the join payload ~4×, the same trick the minhash verify path uses; a
    * 64-bit collision (odds ~|vocab|²/2⁶⁵) merges two grams' counts, which
    * can only nudge dup_frac upward by one gram — acceptable for a
    * coverage STATISTIC, whereas the dedup cut lists stay exact-verified. */
  def duplicatedNgramCoverage(
      df: DataFrame, idCol: String, textCol: String, n: Int = 5): DataFrame = {
    val e = shared(widen(df)
      .select(col(idCol).as("id"), explode(wordShingles(col(textCol), n)).as("g0"))
      .select(col("id"), xxhash64(col("g0")).as("g")))
    val dfreq = e.groupBy(col("g")).agg(count(lit(1)).as("dfreq"))
    e.join(dfreq, "g")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_grams"),
        round(sum(when(col("dfreq") > 1, 1).otherwise(0)).cast("double") / count(lit(1)), 6)
          .as("dup_frac"))
      .select(col("id").as(idCol), col("n_grams"), col("dup_frac"))
  }

  /** Substring-level dedup TRANSFORM: rewrite each document with every
    * token covered by a cross-document duplicated `n`-gram removed — the
    * Lee-et-al-style "deduplicate the substring, keep the document" pass
    * at n-gram granularity, where [[duplicatedNgramCoverage]] only
    * REPORTS the overlap. A token is covered when ANY n-gram containing
    * it (the ones starting up to n−1 positions before it) occurs in ≥ 2
    * distinct documents.
    *
    * Shape: the gram stream travels as xxhash64 longs; the duplicated
    * set is one grouped distinct-doc count filtered to df ≥ 2 and joined
    * back at dup-gram cardinality; coverage spreads from the flagged
    * START positions by one per-document window max over ROWS n−1
    * PRECEDING (partitioned by doc — never a global sort); the rewrite
    * is one per-doc aggregation that reassembles surviving tokens in
    * position order. Returns (idCol, n_tokens, n_kept, text_stripped —
    * '' when everything was duplicated). */
  def stripDuplicatedNgrams(
      df: DataFrame, idCol: String, textCol: String, n: Int = 5): DataFrame = {
    require(n >= 2, s"n must be >= 2, got $n")
    val base = shared(widen(df).select(
      col(idCol).as("__sd_id"), split(col(textCol), " ").as("__sd_tk")))
    // sequence(0, size-n) DESCENDS when size < n — short docs must be
    // filtered before the expansion, not papered over inside it
    val grams = base.filter(size(col("__sd_tk")) >= n)
      .select(col("__sd_id"),
        posexplode(expr(s"transform(sequence(0, size(__sd_tk) - $n), " +
          s"i -> concat_ws(' ', slice(__sd_tk, i + 1, $n)))"))
          .as(Seq("gpos", "g0")))
      .select(col("__sd_id"), col("gpos"), xxhash64(col("g0")).as("g"))
    val dup = grams.groupBy(col("g"))
      .agg(countDistinct(col("__sd_id")).as("__sd_d"))
      .filter(col("__sd_d") >= 2)
      .select(col("g"))
    val dupStarts = grams.join(dup, "g")
      .select(col("__sd_id"), col("gpos"), lit(1).as("__sd_f"))
    val toks = base.select(col("__sd_id"),
      posexplode(col("__sd_tk")).as(Seq("pos", "tok")))
    val w = W.partitionBy(col("__sd_id")).orderBy(col("pos"))
      .rowsBetween(-(n - 1), W.currentRow)
    toks
      .join(dupStarts.withColumnRenamed("gpos", "pos"), Seq("__sd_id", "pos"), "left")
      .withColumn("__sd_cov", max(col("__sd_f")).over(w))
      .groupBy(col("__sd_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("__sd_cov").isNull, 1)).as("n_kept"),
        array_join(expr("transform(array_sort(collect_list(" +
          "CASE WHEN __sd_cov IS NULL THEN struct(pos, tok) END)), x -> x.tok)"),
          " ").as("text_stripped"))
      .select(col("__sd_id").as(idCol), col("n_tokens"), col("n_kept"),
        col("text_stripped"))
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
    * Scale bound: each table contributes ~n²/2^bits candidate pairs for
    * weakly-correlated vectors — a FIXED bit width is quadratic in the
    * corpus. [[embedSketchSize]] therefore grows the width with the corpus
    * (bits ≈ log2 n, the classic LSH sizing that keeps far-pair collisions
    * ~O(n) per table) and re-derives the table count to preserve the miss
    * probability the caller's (tables, bitsPerTable) configuration implies
    * at `threshold` — table count grows only ~n^0.15, the LSH exponent for
    * this p₁. `corpusSizeHint` overrides the count of the
    * (about-to-be-materialized) vector relation. At small n the caller's
    * exact configuration is used unchanged. */
  def embeddingPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double = 0.95,
      tables: Int = 32,
      bitsPerTable: Int = 8,
      corpusSizeHint: Option[Long] = None): DataFrame =
    scoredEmbeddingPairs(df, idCol, vecCol, dim, threshold, tables,
      bitsPerTable, corpusSizeHint).select("id_a", "id_b")

  /** [[embeddingPairs]] keeping the verified cosine — shared by the plain
    * pair cut and [[embeddingThresholdSweep]]. Returns (id_a, id_b, cos). */
  private def scoredEmbeddingPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      tables: Int,
      bitsPerTable: Int,
      corpusSizeHint: Option[Long]): DataFrame = {
    val vecs = shared(widen(df).select(col(idCol).as("id"), col(vecCol).as("v")))
    val n = corpusSizeHint.getOrElse(vecs.count())
    val (bits, tbls) = embedSketchSize(n, threshold, tables, bitsPerTable)
    val sk = embedBuckets(vecs, dim, tbls, bits)
    bucketPairs(sk, Seq("tbl", "bucket"))
      .join(vecs.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(vecs.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .withColumn("cos", cosineSim(col("v_a"), col("v_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }

  /** Threshold calibration sweep: pair counts at each candidate cosine
    * threshold, from ONE LSH candidate pass sized for the LOOSEST
    * threshold — the eval an operator runs before committing a dedup cut
    * ("how many more pairs does 0.95 pull in than 0.99?"). Every
    * threshold's count reads the same verified (pair, cos) stream; tighter
    * thresholds are conditional sums, not re-searches. The recall
    * guarantee is the one [[embeddingPairs]] gives at min(thresholds);
    * tighter bins inherit it (sign-LSH collision probability rises with
    * cosine). Returns (threshold, n_pairs). */
  def embeddingThresholdSweep(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      thresholds: Seq[Double],
      tables: Int = 32,
      bitsPerTable: Int = 8,
      corpusSizeHint: Option[Long] = None): DataFrame = {
    require(thresholds.nonEmpty, "embeddingThresholdSweep requires thresholds")
    val scored = scoredEmbeddingPairs(df, idCol, vecCol, dim, thresholds.min,
      tables, bitsPerTable, corpusSizeHint)
    scored
      .select(explode(array(thresholds.map(lit): _*)).as("threshold"), col("cos"))
      .groupBy(col("threshold"))
      .agg(sum(when(col("cos") >= col("threshold"), 1L).otherwise(0L)).as("n_pairs"))
  }

  /** Corpus-sized sign-sketch shape: widen the per-table bit count to
    * ~log2(n) − 2 (bounding far-pair collisions per table at ~O(n)), then
    * re-derive the table count so the pair-miss probability stays at what
    * the caller's (tables, bits) configuration implies for `threshold`:
    * miss = (1 − p₁^bits)^tables with p₁ = 1 − θ/π. Returns the caller's
    * exact configuration when the corpus is small enough for it. Bits cap
    * at 28 (Int bucket keys) and tables at 512 — past that (~10¹⁰ docs)
    * pre-block the corpus or use [[Similarity]]'s IVF path. */
  private[graft] def embedSketchSize(
      n: Long, threshold: Double, tables: Int, bitsPerTable: Int): (Int, Int) = {
    val log2n = math.log(math.max(n, 2L).toDouble) / math.log(2.0)
    val bits = math.min(28, math.max(bitsPerTable, math.ceil(log2n).toInt - 2))
    if (bits == bitsPerTable) (bitsPerTable, tables)
    else {
      val p1 = 1.0 - math.acos(math.min(math.max(threshold, 0.0), 1.0)) / math.Pi
      // ln(miss) implied by the caller's config, carried to the wider keys
      val lnMiss = tables * math.log1p(-math.pow(p1, bitsPerTable))
      val t = math.ceil(lnMiss / math.log1p(-math.pow(p1, bits))).toInt
      (bits, math.min(512, math.max(t, tables)))
    }
  }

  /** (id, tbl, bucket) sign-sketch LSH bucket rows for a (id, v) relation. */
  private[graft] def embedBuckets(
      vecs: DataFrame, dim: Int, tables: Int, bitsPerTable: Int): DataFrame =
    vecs.select(col("id"),
      posexplode(signSketch(col("v"), dim, tables, bitsPerTable)))
      .withColumnRenamed("pos", "tbl")
      .withColumnRenamed("col", "bucket")
}
