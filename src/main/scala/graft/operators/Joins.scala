package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-shape utilities for skew that the planner cannot fix declaratively.
  *
  * AQE's skew-join handling splits oversized SORT-MERGE partitions at
  * runtime and is the first tool to reach for; explicit salting remains the
  * lever when a single join key is hot enough that even a split partition
  * re-skews (every split still holds only that key), when the join must be
  * shuffled-hash, or when a deterministic layout is required across runs. */
object Joins {

  /** Market-basket co-occurrence with lift: for item pairs appearing
    * together in at least `minPairs` baskets, support and lift
    * = P(a,b) / (P(a)·P(b)) — the association-rule screen ("parts bought
    * together") that a groupBy alone can't express because the unit of
    * co-occurrence is the BASKET, not the row. Top-`k` by lift,
    * ties (lift, id_a, id_b) so the cut is deterministic.
    *
    * 100 TB shape: the pair fan-out is C(basket, 2) per basket — bounded
    * by the BASKET size (single-digit for order data), never by item
    * popularity, because pairs are emitted from each basket's collected
    * item set via the [[graft.functions.GraftFunctions.pairCombinations]]
    * kernel (one grouped collect, pairs explode in-task — the LSH
    * candidate discipline, not an items×items self-join whose hot item
    * squares). Item marginals ride a second small aggregation of the SAME
    * deduped (basket, item) table, joined back at pair-table cardinality;
    * the basket total is a one-row broadcast. Oversized baskets would
    * square — cap upstream if a pathological source emits thousand-item
    * baskets (the jaccardLinks maxDegree lesson).
    *
    * Returns (id_a, id_b, n_ab, lift) with lift rounded to 6 dp. */
  def basketLift(
      df: DataFrame, basketCol: String, itemCol: String,
      minPairs: Long = 5, k: Int = 20): DataFrame = {
    import graft.functions.GraftFunctions.pairCombinations
    val items = OpUtils.shared(
      df.select(col(basketCol).as("__bk"), col(itemCol).cast("long").as("__it"))
        .dropDuplicates("__bk", "__it"))
    val nBaskets = items.agg(countDistinct(col("__bk")).as("__n"))
    val marginals = items.groupBy(col("__it")).agg(count(lit(1)).as("__m"))
    val pairs = items
      .groupBy(col("__bk"))
      .agg(sort_array(collect_list(col("__it"))).as("__is"))
      .select(explode(pairCombinations(col("__is"))).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairs)
    pairs
      .join(marginals.select(col("__it").as("id_a"), col("__m").as("__ma")), "id_a")
      .join(marginals.select(col("__it").as("id_b"), col("__m").as("__mb")), "id_b")
      .crossJoin(broadcast(nBaskets))
      // rank on the RAW lift (integer numerator over integer product, one
      // division — identical double in any engine); ranking on the rounded
      // value would let a one-ulp cross-engine round() tie-break reorder
      // the top-k boundary. Round for display only.
      .withColumn("__lift",
        col("n_ab") * col("__n") / (col("__ma") * col("__mb")).cast("double"))
      .orderBy(col("__lift").desc, col("id_a"), col("id_b"))
      .limit(k)
      .select(col("id_a"), col("id_b"), col("n_ab"),
        round(col("__lift"), 6).as("lift"))
  }

  /** Skew-safe equi-join on `key`: the big (skewed) side fans its rows out
    * across `salts` sub-keys, the small side is replicated `salts`× — a hot
    * key's rows then land on `salts` reducers instead of one. Replication
    * multiplies the SMALL side only (salts × |small| rows through the
    * exchange), so size `salts` to the observed hot-key multiplicity, not
    * higher. The salt is a pure hash of the big row's CONTENT — a retried
    * task recomputes identical salts, so no row can double-deliver to one
    * reducer and vanish from another the way a per-execution random salt
    * can. (Byte-identical duplicate rows share a salt; the spread comes
    * from the non-key columns, which is what distinguishes a hot key's
    * rows in the first place.) Supported `joinType`: inner / left
    * (replication breaks right/full semantics — an unmatched small-side
    * row would appear `salts` times). */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val jt = joinType.toLowerCase.replace("_", "")
    require(Seq("inner", "left", "leftouter").contains(jt),
      s"saltedJoin supports inner/left joins, got $joinType")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin reserves the __salt column")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salts.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Entity-resolution fuzzy self-pairs: all (id_a, id_b, dist) with
    * `levenshtein(str_a, str_b) <= 1` — the record-matching primitive for
    * near-identical identifiers (names, SKUs, URLs differing by one typo).
    *
    * Blocking is the FastSS deletion neighborhood: each string emits
    * itself plus its |s| single-deletion variants, and ANY pair at edit
    * distance ≤ 1 provably shares a variant (equal strings share the
    * string; a substitution pair shares the deletion at the differing
    * position; an insertion/deletion pair shares the shorter string). The
    * naive alternative — a length-blocked cross join — is |block|²; here
    * candidates come from an id-only equi-join on the variant key
    * (the LSH bucket machinery reused verbatim), and each candidate pair
    * is verified ONCE with the codegen'd levenshtein kernel.
    *
    * Scale shape: |s|+1 narrow rows per record into one grouped exchange;
    * variant-bucket occupancy is bounded by the alphabet at the deleted
    * position (not the corpus), so pair explosion is structurally capped
    * the way LSH bands are. Identical strings (dist 0) are included —
    * that IS the exact-duplicate signal. Returns (id_a, id_b, dist),
    * id_a < id_b.
    *
    * `blockCols`: optional hard blocking keys — only records agreeing on
    * every block column can pair. Encodes the domain knowledge that true
    * duplicates share stable attributes (region, segment, account type);
    * without it, systematically near-keyed corpora (sequential ids, SKU
    * families) produce edit-distance-1 pairs between RECORDS THAT ARE NOT
    * THE SAME ENTITY, and transitive clustering then chains them into one
    * mega-merge. The block key rides the variant equi-join, so blocking
    * costs nothing extra. */
  def fuzzyPairs(
      df: DataFrame, idCol: String, strCol: String,
      blockCols: Seq[String] = Nil): DataFrame = {
    val rows = OpUtils.shared(OpUtils.widen(df)
      .select((col(idCol).cast("long").as("id") +: col(strCol).as("s") +:
        blockCols.map(c => col(c).as(s"__bk_$c"))): _*))
    val bk = blockCols.map(c => s"__bk_$c")
    val variants = rows
      .select((col("id") +: explode(concat(
        array(col("s")),
        expr("transform(sequence(0, length(s) - 1), " +
          "i -> concat(substring(s, 1, i), substring(s, i + 2, length(s))))")))
        .as("v") +: bk.map(col)): _*)
      .distinct() // "aa" deletes to "a" twice — one bucket entry per (id, variant)
    val cands = Dedup.bucketPairs(variants, "v" +: bk)
    val a = rows.select(col("id").as("id_a"), col("s").as("__fz_sa"))
    val b = rows.select(col("id").as("id_b"), col("s").as("__fz_sb"))
    cands.join(a, "id_a").join(b, "id_b")
      .withColumn("dist", levenshtein(col("__fz_sa"), col("__fz_sb")).cast("long"))
      .filter(col("dist") <= 1)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** Set-similarity self-join on character trigrams: all pairs with
    * Jaccard(grams(a), grams(b)) >= `tau`, exactly. Catches the fuzzy
    * matches [[fuzzyPairs]]' edit-distance-1 net misses — transposed
    * words, multi-char typos, re-ordered name parts — at the cost of a
    * coarser similarity notion.
    *
    * Candidate generation is MULTI-GRAM PREFIX FILTERING (the
    * SSJoin/PPJoin discipline, keyed on K-gram subsets rather than single
    * grams): order every record's distinct grams by global rarity
    * (document frequency, gram-hash tiebreak — one vocab-sized count
    * table, re-joined at gram cardinality) and emit every K-subset of
    * the record's `n - ceil(tau*n) + K` rarest grams as block keys,
    * where the corpus-global arity K (<= 3, chosen from two collected
    * stats — see the candidate-stage scaladoc) never exceeds the overlap
    * a valid pair must have. Any pair at Jaccard >= tau provably shares
    * its K rarest COMMON grams as a key within both extended prefixes,
    * so recall is exact; bucket occupancy follows the JOINT rarity of K
    * grams, not corpus size — single-gram buckets square on corpora
    * whose gram space is small (digit-heavy identifiers: the probe
    * suite measured ~n^1.5 candidate growth under plain K=1 prefix
    * filtering, and candidate ≈ verified-pair count under K=3). A
    * size-ratio guard (tau*na <= nb <= na/tau) prunes
    * length-incompatible pairs in the same join, and POSITIONAL
    * filtering (the PPJoin refinement) prunes by WHERE the shared key
    * sits: a key whose last gram matches at 0-indexed rarity slots
    * (pa, pb) caps the achievable overlap at min(na-pa, nb-pb) + K-1 —
    * for a valid pair's witness key every other common gram lies after
    * the key's last slot on both sides — while Jaccard >= tau needs
    * overlap >= tau/(1+tau)·(na+nb), so rows whose cap falls short are
    * dropped before the candidate distinct. Each surviving candidate is
    * verified ONCE: grams
    * travel as xxhash64 longs (value-sorted arrays, the 64-bit
    * sorted-merge discipline) through two id equi-joins, intersection by
    * the O(|a|+|b|) `sorted_intersect_count` kernel.
    *
    * Returns (id_a, id_b, jaccard rounded to 6 dp), id_a < id_b; rows
    * shorter than 3 chars have no trigram and drop out. */
  def trigramSimilarityJoin(
      df: DataFrame, idCol: String, strCol: String, tau: Double): DataFrame = {
    val (cands, sets) = trigramCandidateStage(df, idCol, strCol, tau)
    import graft.functions.GraftFunctions.sortedIntersectCount
    cands
      .join(sets.select(col("id").as("id_a"), col("__gsort").as("__ga"),
        col("__n").as("__na")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("__gsort").as("__gb"),
        col("__n").as("__nb")), "id_b")
      .withColumn("__i",
        sortedIntersectCount(col("__ga"), col("__gb")).cast("double"))
      .withColumn("jaccard",
        col("__i") / (col("__na") + col("__nb") - col("__i")))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** The PPJoin CANDIDATE set [[trigramSimilarityJoin]] verifies —
    * (id_a, id_b) pairs surviving the rarity-ordered prefix filter, the
    * length filter, and the positional overlap-cap filter, before the
    * sorted-merge Jaccard verify. The
    * scale diagnostic: the join's wall tracks THIS volume (each
    * candidate pays one merge of two gram arrays), so recording it
    * beside the verified-pair count separates "candidate blowup" (a
    * blocking problem) from "pair-rich data" (a corpus property). */
  def trigramCandidatePairs(
      df: DataFrame, idCol: String, strCol: String, tau: Double): DataFrame =
    trigramCandidateStage(df, idCol, strCol, tau)._1

  /** Emission cap for the multi-gram prefix arity: arity k is only used
    * when every record's K-subset count C(ua+k, k) stays under this, so
    * loose thresholds / long records degrade to the plain k=1 prefix
    * instead of exploding the blocking exchange. */
  private val MaxPrefixEmissions = 64L

  /** Shared candidate stage: (candidate pairs, per-id gram sets).
    *
    * Blocking key arity K is chosen PER CORPUS from two collected longs
    * (min set size, max unshared-gram budget): any pair at Jaccard >= tau
    * has overlap o >= ceil(tau·max(na,nb)) >= ceil(tau·n_min), so for
    * K <= ceil(tau·n_min) its K rarest COMMON grams exist, and the j-th
    * of them sits at 0-indexed rarity slot <= ua + j - 1 on each side
    * (at most ua = n - ceil(tau·n) unshared grams precede it) — i.e.
    * inside the EXTENDED prefix of ua + K slots. Each record therefore
    * emits every K-subset of its extended prefix (grams in global rarity
    * order, key = xxhash64 of the tuple) and recall is exact; bucket
    * occupancy falls with the JOINT rarity of K grams, which is what
    * keeps candidate growth ~linear on corpora whose single-gram space
    * is too small to spread (the probed 32×-at-10× failure mode — digit
    * trigrams). K degrades to 1 (the classic PPJoin prefix) when short
    * sets or the emission cap demand it; K=1 emission is the plain
    * posexploded prefix. */
  private def trigramCandidateStage(
      df: DataFrame, idCol: String, strCol: String, tau: Double)
      : (DataFrame, DataFrame) = {
    require(tau > 0.0 && tau < 1.0, s"tau must be in (0,1), got $tau")
    val rows = OpUtils.widen(df)
      .select(col(idCol).cast("long").as("id"), col(strCol).as("s"))
      .filter(length(col("s")) >= 3)
    val grams = OpUtils.shared(rows
      .select(col("id"), explode(expr(
        "array_distinct(transform(sequence(1, length(s) - 2), " +
          "i -> substring(s, i, 3)))")).as("g"))
      .select(col("id"), xxhash64(col("g")).as("g")))
    // two corpus stats pick the blocking arity — a bounded driver collect
    // (one row of two longs), same discipline as the ANN nlist snapshot
    val statsRow = grams.groupBy(col("id")).agg(count(lit(1)).as("__n"))
      .agg(min(col("__n")).as("__mn"),
        max(col("__n") - ceil(lit(tau) * col("__n"))).as("__ua"))
      .collect()(0)
    val arity: Int =
      if (statsRow.isNullAt(0)) 1
      else {
        val nMin = statsRow.getLong(0)
        val uaMax = statsRow.getLong(1)
        def comb(m: Long, k: Int): Long =
          k match { case 2 => m * (m - 1) / 2; case 3 => m * (m - 1) * (m - 2) / 6 }
        (3 to 2 by -1).find(k => k <= math.ceil(tau * nMin).toLong &&
          comb(uaMax + k, k) <= MaxPrefixEmissions).getOrElse(1)
      }
    val dfreq = grams.groupBy(col("g")).agg(count(lit(1)).as("__df"))
    val sets = OpUtils.shared(grams.join(dfreq, "g")
      .groupBy(col("id"))
      .agg(expr("transform(array_sort(collect_list(struct(__df, g))), x -> x.g)")
        .as("__rare"))
      .select(
        col("id"),
        array_sort(col("__rare")).as("__gsort"),
        size(col("__rare")).as("__n"),
        slice(col("__rare"), lit(1),
          (size(col("__rare")) - ceil(lit(tau) * size(col("__rare"))) + lit(arity))
            .cast("int")).as("__prefix")))
    // Emission: (key, 0-indexed rarity slot of the key's LAST gram). For
    // K=1 that is the plain posexploded prefix; for K>=2, all K-subsets
    // of the extended prefix in rarity order (subsets of a shared total
    // order list, so equal gram tuples align across records).
    val keyCombos = arity match {
      case 2 =>
        "flatten(transform(sequence(1, size(__prefix) - 1), i -> " +
          "transform(sequence(i + 1, size(__prefix)), j -> " +
          "struct(xxhash64(element_at(__prefix, i), element_at(__prefix, j)) " +
          "AS g, j - 1 AS p))))"
      case 3 =>
        "flatten(flatten(transform(sequence(1, size(__prefix) - 2), i -> " +
          "transform(sequence(i + 1, size(__prefix) - 1), j -> " +
          "transform(sequence(j + 1, size(__prefix)), l -> " +
          "struct(xxhash64(element_at(__prefix, i), element_at(__prefix, j), " +
          "element_at(__prefix, l)) AS g, l - 1 AS p))))))"
      case _ => null
    }
    val pref =
      if (arity == 1) sets.select(col("id"), col("__n"),
        posexplode(col("__prefix")).as(Seq("__p", "g")))
      else sets.select(col("id"), col("__n"), explode(expr(keyCombos)).as("__e"))
        .select(col("id"), col("__n"), col("__e.p").as("__p"), col("__e.g").as("g"))
    // Positional filter (PPJoin): for the witness key — a valid pair's K
    // rarest common grams — every OTHER common gram sits strictly after
    // the key's last slot on both sides, so overlap <= K + min(na-1-pa,
    // nb-1-pb) = min(na-pa, nb-pb) + K-1, which must reach the Jaccard
    // requirement tau/(1+tau)·(na+nb). Comparing against the REAL value
    // (minus one ulp-scale epsilon) rather than its ceil keeps the test
    // exactly as permissive as the integer inequality while immune to
    // ceil() flipping on floating-point dust at exact integers.
    val cands = pref.select(col("g"), col("id").as("id_a"),
        col("__n").as("__na"), col("__p").as("__pa"))
      .join(pref.select(col("g"), col("id").as("id_b"),
        col("__n").as("__nb"), col("__p").as("__pb")), "g")
      .filter(col("id_a") < col("id_b") &&
        col("__nb") * lit(tau) <= col("__na") &&
        col("__na") * lit(tau) <= col("__nb") &&
        least(col("__na") - col("__pa"), col("__nb") - col("__pb")) +
          lit(arity - 1) + lit(1e-9) >=
          lit(tau / (1.0 + tau)) * (col("__na") + col("__nb")))
      .select(col("id_a"), col("id_b")).distinct()
    (cands, sets)
  }

  /** Pair-completeness eval of [[fuzzyPairs]]' deletion-variant blocking
    * against exhaustive ground truth — the ER counterpart of
    * [[Similarity.recallEval]]: before trusting a blocking scheme at
    * corpus scale, measure what it misses on a sample. Ground truth is
    * the full levenshtein ≤ 1 pair space of the SAMPLE (O(n²) by
    * construction — run this on thousands of records, never the corpus;
    * the blocking under test is the thing that scales). For the deletion
    * neighborhood the answer is provably 1.0 — this eval is the runtime
    * witness of that proof, and a regression in the variant generation
    * shows up here as completeness < 1 before it silently under-merges
    * entities in production.
    *
    * Returns one row: (n_true_pairs, n_found, pair_completeness). */
  def blockingRecallEval(
      df: DataFrame, idCol: String, strCol: String,
      blockCols: Seq[String] = Nil): DataFrame = {
    val rows = OpUtils.widen(df)
      .select(col(idCol).cast("long").as("id"), col(strCol).as("s"))
    val a = rows.select(col("id").as("id_a"), col("s").as("__br_sa"))
    val b = rows.select(col("id").as("id_b"), col("s").as("__br_sb"))
    val truth = a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .filter(levenshtein(col("__br_sa"), col("__br_sb")) <= 1)
      .select(col("id_a"), col("id_b"))
    val blocked = fuzzyPairs(df, idCol, strCol, blockCols)
      .select(col("id_a"), col("id_b"), lit(1L).as("__br_hit"))
    truth.join(blocked, Seq("id_a", "id_b"), "left")
      .agg(
        count(lit(1)).as("n_true_pairs"),
        sum(coalesce(col("__br_hit"), lit(0L))).cast("long").as("n_found"),
        round(sum(coalesce(col("__br_hit"), lit(0L))).cast("double") /
          count(lit(1)), 6).as("pair_completeness"))
  }

  /** Entity resolution end to end: [[fuzzyPairs]] candidates → connected
    * components → one golden record per multi-record entity. The canonical
    * id is the cluster's minimum member id — which is exactly the
    * component label [[graft.operators.Dedup.connectedComponents]]
    * produces, so the canonical attribute lookup is a plain id equi-join,
    * no argmin aggregation. Singleton records (no fuzzy match) resolve to
    * themselves and are omitted: the output is the merge-candidate list a
    * steward reviews, not a full re-keying.
    *
    * 100 TB shape: pair generation is the deletion-variant-bounded
    * [[fuzzyPairs]] (no cross join), clustering is the log-round
    * star-contraction CC (round count ~log(diameter), probe-asserted), and
    * the golden-record assembly is ONE grouped aggregation over the
    * (id, comp) label table plus ONE id equi-join for the canonical name
    * (AQE picks broadcast while the cluster list is small). Member lists
    * live inside their row (`sort_array`, cluster-sized) — never a
    * per-cluster window. Returns
    * (entity_id, n_members, member_ids comma-joined asc, canonical_name).
    *
    * `maxClusterSize` guards against degenerate mega-merges: transitive
    * closure over a weak match key (edit distance on near-sequential
    * identifiers) can chain an entire table into ONE entity — an answer
    * that is formally a connected component but semantically useless, and
    * whose member list is a table-sized row. Resolution fails loudly past
    * the cap with the sizes it saw; the fix is stronger blocking
    * (`blockCols`) or a stricter match predicate, not a bigger cap. */
  def resolveEntities(
      df: DataFrame, idCol: String, strCol: String,
      blockCols: Seq[String] = Nil, maxClusterSize: Int = 1000): DataFrame = {
    val names = df.select(col(idCol).cast("long").as("id"), col(strCol).as("__er_nm"))
    val comp = Dedup.connectedComponents(fuzzyPairs(df, idCol, strCol, blockCols))
    val clusters = OpUtils.shared(comp
      .groupBy(col("comp").as("entity_id"))
      .agg(
        count(lit(1)).as("n_members"),
        array_join(sort_array(collect_list(col("id"))), ",").as("member_ids"))
      .filter(col("n_members") >= 2))
    val biggest = clusters.agg(coalesce(max(col("n_members")), lit(0L)))
      .collect()(0).getLong(0)
    if (biggest > maxClusterSize)
      throw new IllegalStateException(
        s"entity resolution produced a cluster of $biggest members " +
          s"(maxClusterSize=$maxClusterSize) — the match key chains distinct " +
          "entities transitively; add blockCols (a stable attribute true " +
          "duplicates share) or tighten the match predicate")
    clusters
      .join(names.select(col("id").as("entity_id"), col("__er_nm")), "entity_id")
      .select(col("entity_id"), col("n_members"), col("member_ids"),
        col("__er_nm").as("canonical_name"))
  }

  /** Per-field survivorship for resolved entities: after
    * [[fuzzyPairs]] → connected components, each multi-member entity gets
    * a golden value per field by rule — the MODE of a categorical field
    * (most frequent member value, ties to the smallest — the "majority
    * vote" survivorship stewards default to) and the MAX of a numeric
    * field ("best known" balance/limit). Complements [[resolveEntities]],
    * which only picks a canonical NAME.
    *
    * Shape: the member table (labels joined back to the source rows) is
    * aggregated three ways at entity/entity-value cardinality — base
    * stats, per-(entity, value) counts, max-count pick — all grouped
    * aggregations + entity-keyed joins; no window over members, no
    * collect. Returns (entity_id, n_members, max_<maxCol> rounded 2,
    * mode_<modeCol>) for entities of ≥ 2 members. */
  def goldenFields(
      df: DataFrame, idCol: String, strCol: String, blockCols: Seq[String],
      modeCol: String, maxCol: String): DataFrame = {
    val comp = Dedup.connectedComponents(fuzzyPairs(df, idCol, strCol, blockCols))
    val members = OpUtils.shared(comp.join(
      df.select(col(idCol).cast("long").as("id"),
        col(modeCol).as("__gf_m"), col(maxCol).as("__gf_x")), "id"))
    val base = members.groupBy(col("comp").as("entity_id"))
      .agg(count(lit(1)).as("n_members"),
        round(max(col("__gf_x")), 2).as(s"max_$maxCol"))
      .filter(col("n_members") >= 2)
    val cnts = members.groupBy(col("comp").as("entity_id"), col("__gf_m"))
      .agg(count(lit(1)).as("__gf_c"))
    val mode = cnts
      .join(cnts.groupBy(col("entity_id")).agg(max(col("__gf_c")).as("__gf_mc")),
        "entity_id")
      .filter(col("__gf_c") === col("__gf_mc"))
      .groupBy(col("entity_id")).agg(min(col("__gf_m")).as(s"mode_$modeCol"))
    base.join(mode, "entity_id")
  }

  /** Snapshot reconciliation (CDC-style table diff): classify every key
    * present in either snapshot as `added` (new only), `removed` (old
    * only) or `changed` (both, but some compared column differs);
    * unchanged keys are dropped. The change-data feed a pipeline derives
    * when the upstream system only ships full snapshots — and the audit
    * primitive for "did this rewrite/migration alter any row it shouldn't
    * have".
    *
    * 100 TB shape: both sides are projected to (key, xxhash64 of the
    * compared columns) BEFORE the full-outer join, so the exchange carries
    * ~16 bytes per row regardless of row width (the id-only-exchange
    * discipline); the join itself is the one unavoidable shuffle, and AQE
    * splits any hot key. Equality is judged on the 64-bit content hash: a
    * colliding changed row (p ≈ n²/2⁶⁴ across matched keys) would
    * misreport as unchanged — acceptable for a diff feed; re-verify
    * `changed` rows against full columns downstream if the consumer needs
    * certainty. Spark's hash functions SKIP null inputs (the fold leaves
    * the seed untouched), so a bare `xxhash64(cols)` would collide
    * DETERMINISTICALLY on null-shifted rows — ("a", NULL) vs (NULL, "a")
    * hash identically; the signature therefore interleaves a per-column
    * isnull flag with each value, which pins every column's position in
    * the fold and confines collisions to the random 2⁻⁶⁴ class. Keys must
    * be unique per snapshot (it is a diff of keyed states, not a multiset
    * compare — see Dedup for those). */
  def snapshotDiff(
      oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && compareCols.nonEmpty,
      "snapshotDiff needs key and compare columns")
    def sig(df: DataFrame, h: String) = df.select(
      keyCols.map(col) :+ OpUtils.nullSafeContentHash(compareCols).as(h): _*)
    sig(oldDf, "__ho").join(sig(newDf, "__hn"), keyCols, "full_outer")
      .withColumn("status",
        when(col("__ho").isNull, lit("added"))
          .when(col("__hn").isNull, lit("removed"))
          .when(col("__ho") =!= col("__hn"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(keyCols.map(col) :+ col("status"): _*)
  }
}
