package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: benchmark
  * decontamination, PII redaction, deterministic sampling, sequence packing,
  * vocabulary building, and an end-to-end cleaning composition.
  *
  * Beyond-reference surface (the reference engine has no data-curation
  * layer); designed for the 100 TB shape: narrow transforms where possible,
  * broadcast joins against the (small) eval set, semi-joins for filtering,
  * and deterministic hash-based decisions instead of `rand()` so reruns and
  * retried tasks agree.
  */
object Curation {

  /** Benchmark decontamination: for every corpus document, count how many of
    * its distinct word n-grams appear anywhere in `evalDocs` (the benchmark
    * /eval split). Training-data hygiene standard practice — documents with
    * overlap are dropped or audited so eval numbers aren't inflated.
    *
    * Shape: the eval n-gram set is distinct-ed and BROADCAST (benchmarks are
    * tiny next to the corpus — ~1e6 grams even for large suites); the corpus
    * side is a narrow explode + broadcast-hash-join + one partial-aggregated
    * groupBy on doc id. Nothing N², no shuffle of the corpus text. At this
    * synthetic corpus's vocabulary n=3 already discriminates; production
    * suites use 8–13-gram overlap.
    *
    * Returns (idCol, n_eval_ngrams, contaminated). */
  def decontaminate(
      corpus: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    val evalGrams = evalDocs
      .select(explode(Dedup.wordShingles(col(textCol), n)).as("sh"))
      .distinct()
    val corpusGrams = corpus.select(
      col(idCol).as("id"), explode(Dedup.wordShingles(col(textCol), n)).as("sh"))
    val hits = corpusGrams.join(broadcast(evalGrams), "sh")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("nh")) // shingles are distinct per doc already
    corpus.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        coalesce(col("nh"), lit(0L)).as("n_eval_ngrams"),
        (coalesce(col("nh"), lit(0L)) > 0).as("contaminated"))
  }

  /** Bloom-prefiltered decontamination: same contract and EXACT same output
    * as [[decontaminate]], built for the regime where the eval n-gram set is
    * too large to broadcast as a hash relation. A Bloom filter over the eval
    * grams (~10 bits/gram at the default fpp vs ~50+ bytes/gram hashed) is
    * built once with `DataFrameStatFunctions.bloomFilter` — a bounded,
    * sketch-sized driver collect — and applied as a NARROW map-side filter
    * over the corpus gram stream; only the ~fpp false-positive survivors and
    * the true hits reach the exact verification join, so the join input is
    * hit-sized, not corpus-sized. False positives are eliminated by the
    * verify join (bloom filters have no false negatives), which is why the
    * output is bit-identical to the exact operator and shares its oracle.
    *
    * The verify join deliberately carries no broadcast hint: its left side
    * is the tiny survivor stream, and at real scale the eval-gram relation
    * may be exactly what could NOT be broadcast — AQE picks the strategy
    * both sides can afford. Returns (idCol, n_eval_ngrams, contaminated). */
  def bloomDecontaminate(
      corpus: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      fpp: Double = 0.01): DataFrame = {
    import graft.functions.GraftFunctions.bloomMightContain
    val evalGrams = OpUtils.shared(
      evalDocs
        .select(explode(Dedup.wordShingles(col(textCol), n)).as("sh"))
        .distinct())
    val bloom = evalGrams.stat.bloomFilter("sh", math.max(evalGrams.count(), 1L), fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val survivors = corpus
      .select(col(idCol).as("id"), explode(Dedup.wordShingles(col(textCol), n)).as("sh"))
      .filter(bloomMightContain(col("sh"), bytes))
    val hits = survivors.join(evalGrams, "sh")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("nh"))
    corpus.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        coalesce(col("nh"), lit(0L)).as("n_eval_ngrams"),
        (coalesce(col("nh"), lit(0L)) > 0).as("contaminated"))
  }

  /** Keep each group's k HIGHEST-QUALITY documents (the quality-ranked
    * counterpart of [[capPerGroup]]'s hash-ordered cap): score with the
    * shared composite quality formula in the same narrow projection as the
    * group key, then rank with the bounded-heap top-k aggregate
    * ([[graft.functions.TopKByScore]]) — k ids per group per partition
    * cross the exchange, instead of a `row_number().over(Window)` sorting
    * every group's full membership. Ties break toward the smaller id
    * (row_number-oracle order). `idCol` must be LONG — the heap aggregate
    * is typed (analysis fails loudly otherwise); hash or zip surrogate ids
    * first for string-keyed corpora. Returns (groupCol, rank, idCol,
    * quality). */
  def topQualityPerGroup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      k: Int): DataFrame = {
    import graft.functions.GraftFunctions.topKByScore
    df.select(
        col(groupCol), col(idCol),
        TextAnalysis.qualityScoreExpr(col(textCol)).as("quality"))
      .groupBy(col(groupCol))
      .agg(topKByScore(col("quality"), col(idCol), k).as("tk"))
      .select(col(groupCol), posexplode(col("tk")))
      .select(
        col(groupCol),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.neighbor_id").as(idCol),
        col("col.sim").as("quality"))
  }

  /** Canonical text normalization in front of hashing/dedup/tokenization:
    * Unicode-normalize (NFC by default — composed vs decomposed accents
    * hash identically), optionally lowercase, strip control characters,
    * collapse whitespace runs to one space, trim. Purely narrow codegen'd
    * built-ins around the [[graft.functions.UnicodeNormalize]] kernel — a
    * map-only pass at any scale. Returns (idCol, text_norm,
    * n_chars_norm). */
  def normalizeText(
      df: DataFrame,
      idCol: String,
      textCol: String,
      form: String = "NFC",
      lowercase: Boolean = true): DataFrame = {
    import graft.functions.GraftFunctions.unicodeNormalize
    val unicode = unicodeNormalize(col(textCol), form)
    val cased = if (lowercase) lower(unicode) else unicode
    val cleaned = trim(regexp_replace(
      regexp_replace(cased, "[\\p{Cntrl}]", " "), "\\s+", " "))
    df.select(
      col(idCol),
      cleaned.as("text_norm"),
      length(cleaned).cast("long").as("n_chars_norm"))
  }

  /** Near-duplicate-level decontamination: drop corpus documents that are
    * MinHash-near-duplicates (Jaccard ≥ `threshold` on word shingles) of
    * any eval/benchmark document. Catches lightly-reworded benchmark
    * contamination that exact n-gram overlap ([[decontaminate]] /
    * [[bloomDecontaminate]]) misses, and — because the bipartite LSH join
    * ([[Dedup.crossMinhashPairs]]) never broadcasts either side — stays
    * viable when the eval corpus is itself too large for a broadcast gram
    * set. The corpus payload is filtered with one LEFT ANTI join on id
    * against the (tiny) verified hit list. */
  /** Contamination FRACTION per document: what share of a doc's distinct
    * n-grams appear in the eval set — the graded signal behind
    * [[decontaminate]]'s boolean (pipelines drop at high overlap but only
    * FLAG at a stray shared idiom; a 0/1 answer can't draw that line).
    * Same scale shape: eval grams broadcast once, corpus gram stream
    * joined map-side, one per-doc aggregation. Docs too short to shingle
    * surface with n_grams = 0 and NULL fraction (undefined, not 0 — they
    * cannot be contaminated or clean by this measure).
    * Returns (idCol, n_grams, n_hits, overlap_frac rounded 6). */
  def contaminationFraction(
      corpus: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3): DataFrame = {
    val evalGrams = evalDocs
      .select(explode(Dedup.wordShingles(col(textCol), n)).as("sh"))
      .distinct()
      .withColumn("__hit", lit(1L))
    val perDoc = corpus
      .select(col(idCol).as("id"), explode(Dedup.wordShingles(col(textCol), n)).as("sh"))
      .join(broadcast(evalGrams), Seq("sh"), "left")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hits"))
    corpus.select(col(idCol).as("id"))
      .join(perDoc, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(col("n_hits") / col("n_grams").cast("double"), 6).as("overlap_frac"))
  }

  def decontaminateNearDup(
      corpus: DataFrame,
      evalDf: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val hits = Dedup
      .crossMinhashPairs(corpus, evalDf, idCol, textCol, shingleSize, threshold = threshold)
      .select(col("id_a").as(idCol))
    corpus.join(hits, Seq(idCol), "left_anti")
  }

  /** Deterministic global shuffle + enumeration: every row gets its rank
    * under a hash-of-id total order — the reproducible "epoch ordering" a
    * training pipeline needs (same corpus ⇒ same order on any cluster,
    * any partitioning, any retry), WITHOUT the single-reducer funnel of
    * `row_number()` over a global window.
    *
    * Shape: range-repartition on (md5(id), id) gives a total order ACROSS
    * partitions (partition p's rows all precede partition p+1's); ranks
    * are then per-partition row_numbers plus each partition's start
    * offset, computed from the partition-cardinality table (a
    * #partitions-row collect, broadcast back as a literal map). Where the
    * range boundaries land only moves rows between partitions — the
    * (offset + within-rank) sum is the same global position regardless —
    * so the output is deterministic even though the sampler isn't.
    * Returns the input columns plus `rank` (1-based). */
  def shuffleDeterministic(df: DataFrame, idCol: String): DataFrame =
    runningTotalByHashOrder(df, idCol, lit(1L), "rank")

  /** Shared distributed-prefix-sum core of [[shuffleDeterministic]] and
    * [[sampleTokenBudget]]: range-partition `df` on the (md5(id), id)
    * total order, compute the inclusive running sum of `weight` in that
    * order as `outCol` — per-partition running windows plus each
    * partition's start offset from a #partitions-row broadcast table,
    * never a corpus-sized single-reducer window. With weight 1 the
    * running sum IS the 1-based global rank.
    *
    * The ranged frame MUST be persisted: the offset branch and the
    * running-sum branch both read it, and a re-executed range exchange may
    * sample DIFFERENT boundaries (the sampler is seeded per execution) —
    * offsets keyed on one materialization's partition ids would then be
    * applied to another's. One materialization makes the pid → offset
    * table and the windowed rows agree by construction. */
  private def runningTotalByHashOrder(
      df: DataFrame, idCol: String, weight: Column, outCol: String): DataFrame = {
    require(!df.columns.contains("__h"),
      "deterministic ordering reserves the '__h' column; rename it first")
    runningTotalOrdered(
        df.withColumn("__h", md5(col(idCol).cast("string"))),
        Seq("__h", idCol), weight, outCol)
      .drop("__h")
  }

  /** The distributed-prefix-sum core itself, parameterized on the total
    * order: range-partition `df` on `orderCols`, compute the inclusive
    * running sum of `weight` in that order as `outCol` — per-partition
    * running windows plus each partition's start offset from a
    * #partitions-row broadcast table, never a corpus-sized single-reducer
    * window. `orderCols` must be a total order (ties would make the
    * inclusive sum order-dependent). */
  private def runningTotalOrdered(
      df: DataFrame, orderCols: Seq[String], weight: Column,
      outCol: String): DataFrame = {
    Seq(outCol, "__pid", "__w", "__r", "__off").foreach(c =>
      require(!df.columns.contains(c),
        s"deterministic ordering reserves the '$c' column; rename it first"))
    val parts = df.sparkSession.sparkContext.defaultParallelism
    // sharedPinned, not shared: the pid-keyed frame feeds both the offset
    // branch and the windowed branch — an LRU-evicted recompute may
    // resample range boundaries and silently corrupt the prefix sums
    val ranged = OpUtils.sharedPinned(df
      .withColumn("__w", weight.cast("long"))
      .repartitionByRange(parts, orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id()))
    // partition start offsets: a #partitions-row aggregate, window-summed
    // (tiny, single-partition window is fine) and broadcast back
    val offsets = ranged.groupBy(col("__pid")).agg(sum(col("__w")).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    ranged
      .withColumn("__r", sum(col("__w")).over(
        Window.partitionBy(col("__pid")).orderBy(orderCols.map(col): _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(offsets), "__pid")
      .withColumn(outCol, (col("__r") + col("__off")).cast("long"))
      .drop("__pid", "__w", "__r", "__off")
  }

  /** Fill a TOKEN budget reproducibly: keep documents in the deterministic
    * hash-of-id order (same total order as [[shuffleDeterministic]]) while
    * the running whitespace-token total stays ≤ `tokenBudget` — "give me
    * exactly ~N tokens of corpus, the same N tokens on every run/cluster".
    * The running total is a DISTRIBUTED prefix sum: range partition on the
    * hash order, per-partition running sums, plus each partition's token
    * start-offset from a #partitions-row broadcast table — never a
    * corpus-sized single-reducer window. Returns the input columns plus
    * `n_tokens` (per doc) and `run_tokens` (inclusive running total). */
  def sampleTokenBudget(df: DataFrame, idCol: String, textCol: String,
      tokenBudget: Long): DataFrame = {
    require(!df.columns.contains("n_tokens"),
      "sampleTokenBudget reserves the 'n_tokens' column; rename it first")
    runningTotalByHashOrder(
        df.withColumn("n_tokens", size(split(col(textCol), " ")).cast("long")),
        idCol, col("n_tokens"), "run_tokens")
      .filter(col("run_tokens") <= tokenBudget)
  }

  /** GPT-style concat-and-chunk sequence packing: the corpus token stream
    * (documents concatenated in ascending `idCol` order, whitespace
    * tokens) split at exact `capacity`-token boundaries — documents may
    * span a window edge, every window except the tail is exactly full,
    * zero padding. This is the pretraining batch layout (GPT-2/LLaMA
    * concat-and-chunk), the step after curation that turns a document
    * table into fixed-length training sequences. Emits one row per
    * context window: (window_id, n_docs touching it, n_tokens in it,
    * n_spanning = docs that cross one of its edges).
    *
    * 100 TB shape: ONE range exchange on `idCol` feeds the distributed
    * prefix sum (per-partition windows + a #partitions-row broadcast
    * offset table — never a corpus-sized single-reducer window); the
    * window fan-out explode adds n_docs + total_tokens/capacity rows
    * (each doc spans at most nt/capacity + 2 windows), and the final
    * aggregate is windows-sized. Nothing is ever collected. */
  def packChunks(df: DataFrame, idCol: String, textCol: String,
      capacity: Long): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    val withTok = df.select(
      col(idCol), size(split(col(textCol), " ")).cast("long").as("__nt"))
    runningTotalOrdered(withTok, Seq(idCol), col("__nt"), "__run_end")
      .withColumn("__run_start", col("__run_end") - col("__nt"))
      .withColumn("__w0", expr(s"__run_start div ${capacity}L"))
      .withColumn("__w1", expr(s"(__run_end - 1) div ${capacity}L"))
      .withColumn("window_id", explode(sequence(col("__w0"), col("__w1"))))
      .groupBy(col("window_id"))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(
          least(col("__run_end"), (col("window_id") + 1) * lit(capacity)) -
            greatest(col("__run_start"), col("window_id") * lit(capacity)))
          .cast("long").as("n_tokens"),
        sum(when(col("__w0") =!= col("__w1"), 1L).otherwise(0L))
          .cast("long").as("n_spanning"))
  }

  /** Corpus-level duplicate-LINE removal (the CCNet / RefinedWeb /
    * MassiveText boilerplate pass): drop every occurrence of any line whose
    * corpus-wide frequency reaches `minFreq`, and reassemble each document
    * from its surviving lines in original order. Removes navigation bars,
    * cookie banners, license headers — the boilerplate that document-level
    * dedup can't touch because the surrounding text differs.
    *
    * Shape: one narrow posexplode of the line stream; the duplicated-line
    * set comes from ONE partial-aggregated count keyed on md5(line) — the
    * 128-bit digest crosses the exchange instead of arbitrarily long line
    * text, and grouping collides only on real duplicates (md5 collisions are
    * ignorable at any corpus size). The flagged-digest set attaches a dup
    * flag via an UNHINTED join: on a real web crawl the at/above-`minFreq`
    * digest set is itself hundreds of millions of rows (every boilerplate
    * line ever repeated), far past any broadcast budget, so the plan must
    * never force a broadcast — AQE upgrades the join to broadcast at
    * runtime exactly when the flagged side's measured size allows it, and
    * falls back to a hash-partitioned shuffle join when it doesn't. ONE
    * per-doc aggregation then computes the totals and reassembles the
    * surviving lines in position order (`sort_array` over (pos, line)
    * structs INSIDE the row, never a per-doc window). A document whose
    * every line is boilerplate still returns, with empty `text_clean` —
    * dropping it is the caller's policy decision, not this operator's.
    *
    * Returns (idCol, n_lines, n_lines_kept, text_clean). */
  def dedupLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sep: String = "\n",
      minFreq: Int = 2): DataFrame = {
    require(minFreq >= 2, "minFreq < 2 would drop every line")
    // the line stream is read by two plan branches (the count and the
    // regroup), but the branch feeding the broadcast build side is the
    // digest-only aggregate — cheap to recompute, not worth a persist
    val lines = df
      .select(col(idCol).as("__ld_id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("__ld_pos", "__ld_line")))
      .withColumn("__ld_h", md5(col("__ld_line")))
    val flagged = lines
      .groupBy(col("__ld_h"))
      .agg(count(lit(1)).as("__ld_n"))
      .filter(col("__ld_n") >= minFreq)
      .select(col("__ld_h"), lit(true).as("__ld_dup"))
    // unhinted join: the flagged-digest set is unbounded at crawl scale, so
    // the strategy choice (broadcast vs shuffle) is left to AQE's runtime
    // size measurement; ONE per-doc aggregation then yields totals + the
    // ordered surviving lines
    lines.join(flagged, Seq("__ld_h"), "left")
      .groupBy(col("__ld_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        count(when(col("__ld_dup").isNull, 1)).as("n_lines_kept"),
        sort_array(collect_list(when(col("__ld_dup").isNull,
          struct(col("__ld_pos"), col("__ld_line"))))).as("__ld_kl"))
      .select(
        col("__ld_id").as(idCol),
        col("n_lines"),
        col("n_lines_kept"),
        concat_ws(sep, transform(col("__ld_kl"), x => x.getField("__ld_line")))
          .as("text_clean"))
  }

  /** The Gopher "required words": a natural-language document is expected
    * to contain at least `minStopHits` DISTINCT members. */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher/RefinedWeb-style rule-based quality filtering: the battery of
    * cheap structural heuristics applied to web text BEFORE any model-based
    * scoring — word-count bounds, mean word length bounds, symbol-to-word
    * ratio (# and … are markup/truncation tells), bullet-point and
    * ellipsis-terminated line fractions, alphabetic-word fraction, and the
    * required-stopword count (documents of pure code/data contain none).
    * Every signal AND the composite `keep` verdict are returned so the
    * caller can audit or re-threshold without recomputing.
    *
    * Purely narrow: one projection of codegen'd built-ins over the row —
    * a map-only pass at any scale (the rule thresholds ride the plan as
    * literals). Ratios are rounded to 6 dp BEFORE thresholding so the
    * keep decision is engine-stable. Returns (idCol, n_words,
    * mean_word_len, symbol_ratio, bullet_frac, ellipsis_frac, alpha_frac,
    * stop_hits, keep). */
  def gopherRules(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3,
      minAlphaFrac: Double = 0.8,
      minStopHits: Int = 2): DataFrame = {
    val text = col(textCol)
    val toks = split(text, " ")
    val nWords = size(toks)
    val meanWordLen =
      round(length(regexp_replace(text, " ", "")).cast("double") / nWords, 6)
    // '#' occurrences + '...' occurrences, counted by replace-and-diff —
    // no regex scan needed for fixed strings
    val nHash = length(text) - length(regexp_replace(text, "#", ""))
    val nEllipsis = (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    val symbolRatio = round((nHash + nEllipsis).cast("double") / nWords, 6)
    val lines = split(text, "\n")
    val nLines = size(lines)
    val bulletFrac = round(
      size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("double") / nLines, 6)
    val ellipsisFrac = round(
      size(filter(lines, l => l.rlike("\\.\\.\\.\\s*$"))).cast("double") / nLines, 6)
    val alphaFrac = round(
      size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("double") / nWords, 6)
    val stopHits = GopherStopWords
      .map(sw => when(array_contains(toks, sw), 1).otherwise(0))
      .reduce(_ + _)
    df.select(
        col(idCol),
        nWords.cast("long").as("n_words"),
        meanWordLen.as("mean_word_len"),
        symbolRatio.as("symbol_ratio"),
        bulletFrac.as("bullet_frac"),
        ellipsisFrac.as("ellipsis_frac"),
        alphaFrac.as("alpha_frac"),
        stopHits.cast("long").as("stop_hits"))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(minMeanWordLen, maxMeanWordLen) &&
          col("symbol_ratio") <= maxSymbolRatio &&
          col("bullet_frac") <= maxBulletFrac &&
          col("ellipsis_frac") <= maxEllipsisFrac &&
          col("alpha_frac") >= minAlphaFrac &&
          col("stop_hits") >= minStopHits)
  }

  /** Email / IPv4 / US-phone patterns. Kept RE2-compatible (no backrefs, no
    * lookaround) so external engines can evaluate the same pattern. */
  val PiiPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" +
      "|\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b" +
      "|\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Blocklist toxicity screen: per-document count and fraction of tokens
    * on a caller-supplied blocklist (case-insensitive whole-token match,
    * never substring — "class" must not trip an "ass" entry), plus the
    * keep/drop flag at `maxFrac`. The wordlist pass is the cheap first
    * tier of toxicity filtering (a learned classifier is tier two —
    * [[qualityClassifier]]'s shape); lists are corpus-policy inputs, so
    * they are parameters, not constants.
    *
    * 100 TB shape: map-only — the blocklist rides the plan as a literal
    * array (policy lists are KBs; past ~10⁵ entries switch to a broadcast
    * join against the token explode, same result). No exchange at all.
    * Returns (idCol, n_tokens, n_flagged, tox_frac, flagged). */
  def toxicityScore(
      df: DataFrame, idCol: String, textCol: String,
      blocklist: Seq[String], maxFrac: Double = 0.1): DataFrame = {
    require(blocklist.nonEmpty, "toxicityScore requires a non-empty blocklist")
    require(maxFrac >= 0 && maxFrac <= 1, s"maxFrac must be in [0,1], got $maxFrac")
    val bl = array(blocklist.map(w => lit(w.toLowerCase)): _*)
    val toks = split(lower(col(textCol)), " ")
    val nFlag = size(filter(toks, t => array_contains(bl, t))).cast("long")
    df.select(
      col(idCol),
      size(toks).cast("long").as("n_tokens"),
      nFlag.as("n_flagged"),
      round(nFlag.cast("double") / size(toks), 6).as("tox_frac"),
      (nFlag.cast("double") / size(toks) > maxFrac).as("flagged"))
  }

  /** PII scrubbing: count and redact emails, IPv4 addresses and phone
    * numbers. Purely narrow, codegen'd `regexp_*` built-ins — scales as a
    * map-only pass. Returns (idCol, n_pii, redacted). */
  def piiRedact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(regexp_extract_all(col(textCol), lit(PiiPattern), lit(0)))
        .cast("long").as("n_pii"),
      regexp_replace(col(textCol), PiiPattern, "<PII>").as("redacted"))

  /** The hash-bucket expression every deterministic sampler shares:
    * uniform bucket in [0, buckets) as a pure function of the id. ONE
    * definition on purpose — [[sampleDeterministic]], [[sampleStratified]]
    * and [[capPerGroup]] all promise that reruns/retries make identical
    * decisions, which only holds while they hash identically. */
  private def idHashBucket(idCol: String, buckets: Int) =
    conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long") % buckets

  /** Deterministic bucket sampling: keep rows whose md5(id) falls in
    * `keepBucket` of `buckets` equal hash buckets (≈ 1/buckets sampling
    * rate). Unlike `df.sample()`/`rand()`, the decision is a pure function
    * of the id — task retries, reruns and incremental loads select the same
    * rows, which is what reproducible training-data splits need. Narrow
    * (no shuffle, no state). */
  def sampleDeterministic(
      df: DataFrame,
      idCol: String,
      buckets: Int = 5,
      keepBucket: Int = 0): DataFrame = {
    require(buckets > 0 && keepBucket >= 0 && keepBucket < buckets)
    df.filter(idHashBucket(idCol, buckets) === keepBucket)
  }

  /** Weighted sampling without replacement via sequential Poisson
    * (priority) sampling [Ohlsson 1998]: each row draws the deterministic
    * hash-uniform u ∈ (0,1] from its id and ranks by priority u/w; the k
    * SMALLEST priorities are the sample, so inclusion probability is
    * ≈ proportional to the weight (the πps design used for
    * length-proportional document sampling — long docs carry more tokens,
    * so sample them proportionally). The key is one IEEE division — no
    * ln/pow, so the selection is bit-identical across engines and across
    * reruns (the Efraimidis–Spirakis u^(1/w) key ranks identically but
    * drags libm into the comparison). Rows with weight <= 0 or NULL are
    * excluded (zero weight = zero inclusion probability; a NULL weight is
    * a data error, not a sampleable row).
    *
    * 100 TB shape: the priority is a narrow map-side expression and the
    * global k-smallest runs as TakeOrderedAndProject — every partition
    * keeps a k-bounded heap, the driver merges #partitions × k rows, no
    * full sort and no single-task funnel. Ties (same hash AND same
    * weight) break on the id in both engines.
    *
    * Returns the selected rows as (idCol, weight, pri) with pri rounded
    * to 8 dp for output parity — selection itself uses the exact key. */
  def sampleWeightedPriority(
      df: DataFrame, idCol: String, weightExpr: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    Seq("__wp_w", "__wp_pri").foreach(c =>
      require(!df.columns.contains(c), s"sampleWeightedPriority reserves '$c'; rename it first"))
    // same 32-hex-digit prefix as idHashBucket; +1 keeps u strictly > 0
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + 1.0) / 4294967296.0
    df.withColumn("__wp_w", weightExpr.cast("double"))
      .filter(col("__wp_w") > 0)
      .withColumn("__wp_pri", u / col("__wp_w"))
      .orderBy(col("__wp_pri"), col(idCol))
      .limit(k)
      .select(col(idCol), col("__wp_w").as("weight"),
        round(col("__wp_pri"), 8).as("pri"))
  }

  /** Stratified deterministic sampling: per-stratum keep rates expressed as
    * `keepBuckets` of [[sampleDeterministic]]'s `buckets` hash buckets
    * (stratum → how many buckets to keep; absent strata use `defaultKeep`).
    * The data-mixing primitive for training corpora — up-weight curated
    * sources, down-weight crawl — with the same reproducibility contract as
    * the uniform sampler: the keep decision is a pure function of the id,
    * so reruns, retries and incremental loads agree. Narrow map-only pass;
    * the rate map rides the closure (it is strata-sized, i.e. tiny). */
  def sampleStratified(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      keepBuckets: Map[String, Int],
      buckets: Int = 10,
      defaultKeep: Int = 0): DataFrame = {
    require(buckets > 0 && (keepBuckets.values ++ Seq(defaultKeep)).forall(k => k >= 0 && k <= buckets))
    val keep = keepBuckets.foldLeft(lit(defaultKeep)) { case (acc, (s, k)) =>
      when(col(strataCol) === s, lit(k)).otherwise(acc)
    }
    df.filter(idHashBucket(idCol, buckets) < keep)
  }

  /** Per-group deterministic cap: keep at most `k` rows per group, chosen
    * by md5-hash order of the id (ties on the id itself) — corpus balancing
    * that caps over-represented sources without `rand()`'s retry/rerun
    * nondeterminism. The selection is an unbiased pseudo-random k-subset of
    * each group, stable across runs. One window shuffle on the group
    * column; each group's sort is group-sized (cap skewed groups upstream
    * with [[sampleStratified]] if a single group dwarfs executors). */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String, k: Int): DataFrame = {
    require(k > 0)
    // order by the shared hash (bucket count 1 disables the modulo: the raw
    // hash is the order key) then id — same hash family as the samplers
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long")
    val w = Window.partitionBy(col(groupCol)).orderBy(h, col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Greedy sequence packing: within each `groupCol` partition, documents
    * (ordered by id) are packed into consecutive bins of `budgetTokens`
    * whitespace tokens — each document lands in the bin where its running
    * token offset starts. This is the contiguous-fill packing used to build
    * fixed-length training batches from variable-length documents.
    *
    * One window shuffle keyed on the group column. The group must be finer
    * than "everything" at real scale — pack per source/shard (a Zipf-heavy
    * group key skews the window; pre-shard with pmod(hash(id), k) if
    * needed). Returns per-bin stats (group, bin, n_docs, sum_tokens). */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      budgetTokens: Int): DataFrame = {
    // explicit ROWS frame: the default frame for an ordered window is RANGE,
    // which would give duplicate (group, id) rows each other's tokens in
    // their running sum — sequential packing is inherently row-ordered
    val w = Window.partitionBy(col("grp")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(
        col(groupCol).as("grp"),
        col(idCol).as("id"),
        size(split(col(textCol), " ")).cast("long").as("tok"))
      .withColumn("cum", sum(col("tok")).over(w))
      .withColumn("bin",
        floor((col("cum") - col("tok")) / lit(budgetTokens.toDouble)).cast("long"))
      .groupBy(col("grp"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("sum_tokens"))
  }

  /** Fixed-size document chunking with overlap — the window splitter that
    * turns variable-length documents into training/RAG-sized pieces. Chunk
    * i covers tokens [i·step, i·step + chunkTokens) with
    * step = chunkTokens − overlap; the final chunk may be short, and every
    * token is covered. Purely narrow: tokens → chunk-start sequence →
    * per-chunk slice, one output row per chunk, no shuffle. Returns
    * (idCol, chunk_idx, n_tokens, chunk_text). */
  def chunkDocuments(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int = 64,
      overlap: Int = 8): DataFrame = {
    require(chunkTokens > overlap && overlap >= 0)
    val step = chunkTokens - overlap
    val toks = split(col(textCol), " ")
    val n = size(toks)
    val nChunks = when(n <= chunkTokens, lit(1))
      .otherwise(ceil((n - overlap).cast("double") / step).cast("int"))
    // "__"-prefixed intermediates: unqualified names like tk/nc would
    // collide with (or capture) same-named user columns
    df.select(col(idCol), toks.as("__tk"), nChunks.as("__nc"))
      .select(
        col(idCol), col("__tk"),
        posexplode(sequence(lit(0), col("__nc") - 1)).as(Seq("__pos", "__ci")))
      .select(
        col(idCol),
        col("__ci").cast("long").as("chunk_idx"),
        expr(s"slice(__tk, __ci * $step + 1, $chunkTokens)").as("__ctk"))
      .select(
        col(idCol),
        col("chunk_idx"),
        size(col("__ctk")).cast("long").as("n_tokens"),
        concat_ws(" ", col("__ctk")).as("chunk_text"))
  }

  /** Corpus vocabulary: top-k whitespace tokens by frequency (ties broken by
    * token, so the result set is deterministic). Partial-aggregated count
    * per token, then a TakeOrdered top-k — only k rows reach the driver. */
  def vocabulary(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** End-to-end corpus cleaning: keep a document iff it is
    *   (a) the canonical keeper of its exact-duplicate group (min id per
    *       content hash),
    *   (b) above the `minQuality` composite quality score, and
    *   (c) not contaminated against `evalDocs` (`n`-gram overlap).
    * Composition of [[Dedup.exact]] semantics, [[TextAnalysis.qualityScore]]
    * and [[decontaminate]], all applied as LEFT SEMI joins on the id — the
    * document payload is never duplicated or shuffled per filter. Returns
    * the surviving rows of `df` unchanged. */
  def cleanCorpus(
      df: DataFrame,
      idCol: String,
      textCol: String,
      evalDocs: DataFrame,
      minQuality: Double = 0.5,
      n: Int = 3): DataFrame = {
    // the canonical-keeper definition is Dedup.exact's — reuse it so the
    // "keeper" rule lives in exactly one place
    val keepers = Dedup.exact(df, idCol, textCol)
      .select(col("keeper_id").as(idCol))
    val qualityPass = TextAnalysis.qualityScore(df, idCol, textCol)
      .filter(col("quality") >= minQuality)
      .select(idCol)
    val cleanPass = decontaminate(df, evalDocs, idCol, textCol, n)
      .filter(!col("contaminated"))
      .select(idCol)
    df.join(keepers, Seq(idCol), "left_semi")
      .join(qualityPass, Seq(idCol), "left_semi")
      .join(cleanPass, Seq(idCol), "left_semi")
  }

  /** Remove near-duplicates given a duplicate-pair list (from any detector:
    * minhash / simhash / n-gram / embedding LSH): resolve pairs to clusters
    * ([[Dedup.connectedComponents]]), keep ONE canonical keeper per cluster
    * (the minimum id among cluster members PRESENT in `df` — a detector may
    * have run on a superset of `df`, so the globally-minimal member can be
    * absent and must not take the whole cluster down with it) plus every
    * unpaired document — the step that turns pairwise hits into a
    * deduplicated corpus.
    *
    * The label/keeper relations are PAIR-ENDPOINT-sized (dup-cluster
    * members only), orders of magnitude smaller than the corpus, so the
    * left join broadcasts at scale; the keeper derivation touches `df`
    * only through a column-pruned id projection, and the corpus payload
    * crosses no exchange. Returns the surviving rows of `df` unchanged.
    * Internal columns are `__`-prefixed, so any `comp`/`id` column in `df`
    * is untouched. */
  def dropNearDuplicates(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val labels = Dedup.connectedComponents(pairs)
      .select(col("id").as("__ndd_id"), col("comp").as("__ndd_comp"))
    val present = df.select(col(idCol).as("__ndd_id")).join(labels, "__ndd_id")
    val keepers = present.groupBy(col("__ndd_comp"))
      .agg(min(col("__ndd_id")).as("__ndd_keeper"))
    val assigned = present.join(keepers, "__ndd_comp")
      .select(col("__ndd_id").as(idCol), col("__ndd_keeper"))
    df.join(assigned, Seq(idCol), "left")
      .filter(col("__ndd_keeper").isNull || col("__ndd_keeper") === col(idCol))
      .drop("__ndd_keeper")
  }

  /** Quality-aware keeper selection per near-duplicate cluster: instead of
    * [[dropNearDuplicates]]' minimum-id keeper, keep the member that
    * maximizes `scoreCol` (ties → smaller id) — the production dedup
    * policy when members of a duplicate cluster differ in quality
    * (boilerplate-stripped vs raw scrapes of the same page): discarding by
    * id throws away the best copy about half the time. Singleton documents
    * form their own cluster and keep themselves.
    *
    * Shape: cluster labels from the log-round CC over the (endpoint-sized)
    * pair list; the corpus attaches by ONE left join on id (labels
    * broadcast at scale); the argmax is a plain grouped `max(struct(score,
    * -id))` — no per-cluster window, no second pass. Returns one row per
    * cluster: (cluster_id, n_members, keeper_id, keeper_score). */
  def keepBestPerCluster(
      df: DataFrame, idCol: String, scoreCol: String, pairs: DataFrame): DataFrame = {
    val labels = Dedup.connectedComponents(pairs)
      .select(col("id").as("__kb_id"), col("comp").as("__kb_comp"))
    df.select(col(idCol).cast("long").as("__kb_id"),
        col(scoreCol).cast("long").as("__kb_score"))
      .join(labels, Seq("__kb_id"), "left")
      .select(col("__kb_id"),
        coalesce(col("__kb_comp"), col("__kb_id")).as("__kb_comp"), col("__kb_score"))
      .groupBy(col("__kb_comp"))
      .agg(
        count(lit(1)).as("n_members"),
        max(struct(col("__kb_score"), (-col("__kb_id")).as("__kb_nid"))).as("__kb_b"))
      .select(col("__kb_comp").as("cluster_id"), col("n_members"),
        (-col("__kb_b.__kb_nid")).as("keeper_id"),
        col("__kb_b.__kb_score").as("keeper_score"))
  }

  /** Data-mixing weights per corpus group (source/domain): each group's
    * sampling weight ∝ docs · avg_quality^alpha — the static quality-biased
    * mixing step of a training-data pipeline (upweight clean domains,
    * without starving large ones). Quality is the SHARED composite score
    * ([[TextAnalysis.qualityScoreExpr]]), so mixing and filtering agree on
    * what "quality" means. Shape: one narrow projection (group + score off
    * the same row), one grouped aggregate to group-cardinality rows, one
    * single-row broadcast total — the corpus crosses exactly one exchange.
    * Returns (groupCol, docs, avg_quality, weight) with weights summing
    * to 1. */
  def mixingWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      alpha: Double = 2.0): DataFrame = {
    // score computed IN the same projection as the group column — an
    // id-join back to qualityScore's output would shuffle two
    // corpus-cardinality relations just to reattach a derivable column
    val grouped = df
      .select(col(groupCol), TextAnalysis.qualityScoreExpr(col(textCol)).as("quality"))
      .groupBy(col(groupCol))
      // avg rounded BEFORE the power/normalize arithmetic: downstream math
      // then runs on identical doubles in any engine (oracle parity)
      .agg(count(lit(1)).as("docs"), round(avg(col("quality")), 4).as("avg_quality"))
    val raw = grouped.withColumn("raw", col("docs") * pow(col("avg_quality"), alpha))
    val total = raw.agg(sum(col("raw")).as("t"))
    raw.crossJoin(broadcast(total))
      .select(
        col(groupCol), col("docs"), col("avg_quality"),
        round(col("raw") / col("t"), 6).as("weight"))
  }

  /** Temperature-scaled sampling distribution over a categorical corpus
    * axis (language, domain): target share q_g ∝ p_g^(1/T) where p_g is
    * the natural share — the multilingual rebalancing step (mBERT/XLM-R
    * exponential smoothing) that lifts tail languages without flattening
    * the mix entirely. T=1 keeps natural proportions, T→∞ approaches
    * uniform. `sample_weight` = q/p is the per-document acceptance or
    * repetition factor a sampler applies downstream (>1 = upsample).
    *
    * The complement of [[mixingWeights]]: that op biases BY quality,
    * this one unbiases BY volume. The power runs on the RAW share
    * docs/total — one deterministic long/long division, already identical
    * in any engine — never a pre-rounded p: rounding first would collapse
    * a genuinely tiny share (100 docs in 10⁹, p = 1e-7) to 0, zeroing q
    * and NULLing the weight for exactly the tail group the op exists to
    * lift. Only the DISPLAYED columns round.
    *
    * Scale shape: one grouped count to #groups rows, a single-row total
    * cross-joined twice (count total, then power-sum total) — all
    * group-cardinality arithmetic; the corpus crosses one exchange.
    * Returns (groupCol, docs, p, q, sample_weight). */
  def temperatureMix(
      df: DataFrame,
      groupCol: String,
      temperature: Double = 3.0): DataFrame = {
    require(temperature > 0, s"temperature must be > 0, got $temperature")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("docs"))
    val total = counts.agg(sum(col("docs")).as("__t"))
    val p = counts.crossJoin(broadcast(total))
      .withColumn("__p", col("docs") / col("__t"))
      .withColumn("__q_raw", pow(col("__p"), 1.0 / temperature))
    val z = p.agg(sum(col("__q_raw")).as("__z"))
    p.crossJoin(broadcast(z))
      .select(
        col(groupCol), col("docs"), round(col("__p"), 6).as("p"),
        round(col("__q_raw") / col("__z"), 6).as("q"),
        round(col("__q_raw") / col("__z") / col("__p"), 6).as("sample_weight"))
  }

  /** Model-based quality scoring — the fasttext/CCNet "quality classifier"
    * pass: a multinomial Naive Bayes over hashed token features is trained
    * IN-QUERY to separate a reference class (`refPredicate` rows — a
    * curated corpus, Wikipedia, whatever the pipeline trusts) from the
    * rest, and every document is scored with its token log-odds plus the
    * class prior. Positive = "looks like the reference class"; the caller
    * thresholds or takes a top fraction. This is the standard model-based
    * filtering step (GPT-3 §A, CCNet) without an ML-runtime dependency —
    * NB's closed form IS two grouped counts.
    *
    * Scale shape: ONE token-stream exchange produces the per-(class, dim)
    * count table (`dims` rows — broadcastable at any corpus size, even
    * dims = 2^20); the weight table derives from it with a single-row
    * cross join (totals + doc-count prior), and scoring joins the
    * BROADCAST weights back onto the same persisted token stream with one
    * per-doc aggregation. The corpus crosses exactly two exchanges total
    * (count + score), the model never leaves the plan.
    *
    * Token→dim hashing is the md5-hex-prefix scheme of
    * [[TextAnalysis.hashFeatures]], so any engine reproduces the features
    * bit-for-bit; the per-doc sum is rounded to 4 dp (the same float
    * contract as the LM log-prob scorers). Returns (idCol, nb_score). */
  def qualityNBScores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      refPredicate: Column,
      dims: Int = 64,
      alpha: Double = 1.0): DataFrame = {
    require(dims > 0 && alpha > 0)
    import OpUtils.{shared, widen}
    val toks = shared(widen(df)
      .select(col(idCol).as("__nb_id"), refPredicate.as("__nb_ref"),
        explode(split(col(textCol), " ")).as("__nb_tk"))
      .withColumn("__nb_dim",
        conv(substring(md5(col("__nb_tk")), 1, 8), 16, 10).cast("long") % dims)
      .drop("__nb_tk"))
    val byDim = toks.groupBy(col("__nb_dim"))
      .agg(
        coalesce(sum(when(col("__nb_ref"), 1L)), lit(0L)).as("__nb_n1"),
        coalesce(sum(when(!col("__nb_ref"), 1L)), lit(0L)).as("__nb_n0"))
    // single-row scalars: token totals per class + the doc-count prior —
    // one broadcast nested-loop join onto the dims-sized weight table
    val scalars = toks.agg(
        sum(when(col("__nb_ref"), 1L)).as("__nb_t1"),
        sum(when(!col("__nb_ref"), 1L)).as("__nb_t0"))
      .crossJoin(df.agg(
        log((count(when(refPredicate, 1)) + alpha) /
          (count(when(!refPredicate, 1)) + alpha)).as("__nb_prior")))
    val weights = byDim.crossJoin(broadcast(scalars))
      .select(
        col("__nb_dim"),
        (log((col("__nb_n1") + alpha) / (col("__nb_t1") + alpha * dims)) -
          log((col("__nb_n0") + alpha) / (col("__nb_t0") + alpha * dims))).as("__nb_w"),
        col("__nb_prior"))
    toks.join(broadcast(weights), Seq("__nb_dim"))
      .groupBy(col("__nb_id"))
      .agg(round(sum(col("__nb_w")) + first(col("__nb_prior")), 4).as("nb_score"))
      .select(col("__nb_id").as(idCol), col("nb_score"))
  }

  /** Eval-side leakage depth: for every EVAL document, the fraction of
    * ITS n-grams that occur anywhere in the training corpus — the mirror
    * of [[contaminationFraction]] (which scores TRAIN docs). This is the
    * benchmark-integrity readout: a heavily-leaked eval item measures
    * memorization, not capability, and should be rotated out.
    *
    * Shape: the train side reduces to its distinct gram set (one grouped
    * exchange — the big side, deliberately UNHINTED so AQE broadcasts
    * the small EVAL gram stream instead); one per-eval-doc aggregation
    * finishes. Returns (idCol, n_grams, n_leaked, leak_frac rounded 6)
    * for eval docs with at least one gram. */
  def evalLeakage(
      corpus: DataFrame, evalDocs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val trainGrams = corpus
      .select(explode(Dedup.wordShingles(col(textCol), n)).as("sh"))
      .distinct()
      .withColumn("__lk", lit(1L))
    evalDocs
      .select(col(idCol).as("id"),
        explode(Dedup.wordShingles(col(textCol), n)).as("sh"))
      .join(trainGrams, Seq("sh"), "left")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("__lk"), lit(0L))).as("n_leaked"))
      .select(col("id").as(idCol), col("n_grams"), col("n_leaked"),
        round(col("n_leaked") / col("n_grams").cast("double"), 6).as("leak_frac"))
  }

  /** Deterministic train/val/test assignment by CONTENT-HASH buckets:
    * each row's split is a pure function of its id's md5 — stable under
    * re-partitioning, re-ordering, incremental appends and id-range
    * growth (the properties a `rand()` or modulo-on-id split loses the
    * moment data moves), so a document can never silently migrate from
    * train to test between pipeline runs. The first hex nibble buckets
    * 16 ways: 12 train / 2 val / 2 test (75/12.5/12.5).
    *
    * Map-only — zero exchanges; the split column is codegen'd string
    * comparison. Returns the id column plus `split`. */
  def hashSplit(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol),
      when(substring(md5(col(idCol).cast("string")), 1, 1) <= "b", "train")
        .when(substring(md5(col(idCol).cast("string")), 1, 1) <= "d", "val")
        .otherwise("test").as("split"))

  /** Group balancing by deterministic downsampling: every group keeps
    * exactly min-group-size rows (each group's winners under a content-
    * hash order), flattening a skewed source/label mix into a uniform one
    * — the strict-equalization counterpart of [[temperatureMix]]'s
    * partial flattening. The md5-of-id order makes the kept set a pure
    * function of the data: re-runs, retries and both engines agree on
    * it (the shuffleDeterministic discipline; never a `rand()` sample).
    *
    * Shape: the floor is one group-cardinality aggregate reduced to a
    * scalar; per-group ranks come from [[OpUtils.groupedRank]]'s range-
    * partitioned assembly — parallelism is partitions × groups, never a
    * task per group ([[TextAnalysis]]' perplexity-tier lesson). Returns
    * the `idCol`/`groupCol` pairs that survive. */
  def balanceGroups(df: DataFrame, idCol: String, groupCol: String): DataFrame = {
    val rows = df.select(col(idCol).as("__bg_id"), col(groupCol).as("__bg_g"))
      .withColumn("__bg_h", md5(col("__bg_id").cast("string")))
    val floor = rows.groupBy(col("__bg_g")).agg(count(lit(1)).as("__bg_n"))
      .agg(min(col("__bg_n")).as("__bg_floor"))
    OpUtils.groupedRank(rows, "__bg_g", Seq(col("__bg_h"), col("__bg_id")), "__bg_r")
      .crossJoin(broadcast(floor))
      .filter(col("__bg_r") <= col("__bg_floor"))
      .select(col("__bg_id").as(idCol), col("__bg_g").as(groupCol))
  }

  /** Global rank (quantile) normalization of a numeric column: each row
    * gets `q = (rank − 1)/(n − 1)` with RANK semantics (ties share their
    * group's first rank) — the distribution-free feature transform that
    * makes heavy-tailed signals comparable across sources before mixing
    * or thresholding. Pure integer counting until one exact division, so
    * the output is bit-identical to SQL `percent_rank()` on any engine.
    *
    * Shape: the classic single-reducer `Window.orderBy(value)` is
    * replaced by the KS discipline — values collapse to a count-per-value
    * table, range-partitioned prefix sums with broadcast partition
    * offsets produce each value's below-count, and the corpus joins that
    * value-keyed table back once. Returns the `idCol` and `q` rounded to
    * 6 dp (a single-row input maps to 0). */
  def rankNormalize(df: DataFrame, idCol: String, valueCol: String): DataFrame = {
    val parts = df.sparkSession.sparkContext.defaultParallelism
    val rows = df.select(col(idCol), col(valueCol).cast("double").as("__rn_v"))
      .filter(col("__rn_v").isNotNull)
    val counts = rows.groupBy(col("__rn_v")).agg(count(lit(1)).as("__rn_c"))
    val total = counts.agg(sum(col("__rn_c")).as("__rn_n"))
    // sharedPinned, not shared: the pid-keyed frame feeds BOTH the offset
    // branch and the below-count branch — an LRU-evicted recompute may
    // resample range boundaries and silently corrupt the prefix sums
    // (the groupedRank hazard)
    val ranged = OpUtils.sharedPinned(counts
      .repartitionByRange(parts, col("__rn_v"))
      .withColumn("__rn_pid", spark_partition_id()))
    val offsets = ranged.groupBy(col("__rn_pid"))
      .agg(sum(col("__rn_c")).as("__rn_pc"))
      .select(col("__rn_pid"),
        coalesce(sum(col("__rn_pc")).over(
          Window.orderBy(col("__rn_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("__rn_off"))
    val w = Window.partitionBy(col("__rn_pid")).orderBy(col("__rn_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val below = ranged
      .withColumn("__rn_cum", sum(col("__rn_c")).over(w))
      .join(broadcast(offsets), "__rn_pid")
      .select(col("__rn_v"),
        (col("__rn_cum") + col("__rn_off") - col("__rn_c")).as("__rn_below"))
    rows.join(below, "__rn_v")
      .crossJoin(broadcast(total))
      .select(col(idCol),
        round(when(col("__rn_n") > 1,
          col("__rn_below").cast("double") / (col("__rn_n") - 1))
          .otherwise(lit(0.0)), 6).as("q"))
  }

  /** Boilerplate-line report: the corpus's most widespread repeated lines
    * — (line, n_docs, n_total), lines present in at least `minDocs`
    * DISTINCT documents, top `k` by spread. The inspection companion to
    * [[dedupLines]]: before a crawl-wide line-dedup pass mutates the
    * corpus, this is the table a curator reads to see WHAT would be
    * stripped (cookie banners, nav menus, license footers).
    *
    * Shape: one line explosion into one grouped aggregation (the distinct
    * doc count plans as an Expand over the same exchange — no second
    * scan), then a TakeOrdered top-k; deterministic ties
    * (n_docs, n_total, line). Never a collect: the report is k rows by
    * construction. */
  def boilerplateReport(
      df: DataFrame, idCol: String, textCol: String, sep: String = "\n",
      minDocs: Int = 2, k: Int = 20): DataFrame = {
    require(minDocs >= 2, "minDocs < 2 would report every line")
    require(k >= 1, s"k must be >= 1, got $k")
    df.select(col(idCol).as("__bp_id"),
      explode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .as("line"))
      .groupBy(col("line"))
      .agg(
        countDistinct(col("__bp_id")).as("n_docs"),
        count(lit(1)).as("n_total"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("n_total").desc, col("line"))
      .limit(k)
  }
}
