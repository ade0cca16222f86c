package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Text-analysis operators for training-data curation: quality signals,
  * token counting, language ID, document fingerprinting. All are single-pass
  * narrow transforms (no shuffle) built from codegen'd built-ins plus the
  * native expressions in [[graft.functions]]. */
object TextAnalysis {

  private val StopWords = Seq("the", "a", "an", "and", "of", "to", "in", "is", "it")

  /** Per-document quality signals: char/word counts, average word length,
    * stopword ratio, punctuation ratio. Thresholding these is the standard
    * first-stage quality filter for web-scale corpora. */
  def qualityFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val toks = split(text, " ")
    val nWords = size(toks)
    val nChars = length(text)
    val charsNoSpace = length(regexp_replace(text, " ", ""))
    val stopHits = size(filter(toks, w => w.isin(StopWords.map(x => x: Any): _*)))
    val punct = nChars - length(regexp_replace(text, "[.,;:!?'\"()]", ""))
    df.select(
      col(idCol),
      nChars.cast("long").as("n_chars_c"),
      nWords.cast("long").as("n_words"),
      round(charsNoSpace.cast("double") / nWords, 6).as("avg_word_len"),
      round(stopHits.cast("double") / nWords, 6).as("stopword_ratio"),
      punct.cast("long").as("n_punct"))
  }

  /** The composite quality formula as a Column, over (n_words,
    * avg_word_len AS ROUNDED BY [[qualityFeatures]]). Single source of
    * truth: the batch scorer and the streaming curation pipeline both call
    * this, so the boundary behavior (a doc at avg_word_len exactly 12.0
    * after rounding) cannot diverge between the two. */
  private[graft] def qualityScoreCol(nWords: Column, avgWordLen: Column): Column = {
    val lenScore = least(nWords.cast("double") / 50.0, lit(1.0))
    val wordLenOk = when(avgWordLen.between(2.0, 12.0), 1.0).otherwise(0.3)
    round(lenScore * wordLenOk, 6)
  }

  /** The composite quality score straight from a text column — for callers
    * that need the score ALONGSIDE other columns of the same row in one
    * narrow projection (no id-join back to [[qualityScore]]'s output).
    * Feature construction matches [[qualityFeatures]] exactly, including
    * the 6-dp rounding of avg word length before thresholding. */
  private[graft] def qualityScoreExpr(text: Column): Column = {
    val nWords = size(split(text, " "))
    val charsNoSpace = length(regexp_replace(text, " ", ""))
    qualityScoreCol(nWords, round(charsNoSpace.cast("double") / nWords, 6))
  }

  /** Composite quality score in [0,1] from the features (simple clipped
    * heuristic: long-enough docs with normal word length score high). */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame =
    qualityFeatures(df, idCol, textCol)
      .withColumn("quality", qualityScoreCol(col("n_words"), col("avg_word_len")))
      .select(col(idCol), col("quality"))

  /** Token counts: whitespace tokens and BPE-ish regex tokens
    * (letter runs / digit runs / single non-alphanumeric marks). */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    df.select(
      col(idCol),
      size(split(text, " ")).cast("long").as("ws_tokens"),
      size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0)))
        .cast("long").as("re_tokens"))
  }

  /** Repetition signals (the Gopher-style quality rules): fraction of
    * duplicate words and the share of all word bigrams taken by the single
    * most frequent bigram. High values flag boilerplate/spam for filtering.
    * One explode + two grouped aggregates, partial-aggregated map-side. */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import OpUtils.{shared, widen}
    val toks = split(col(textCol), " ")
    // non-distinct fused shingle expression: bigram OCCURRENCES in text order
    val base = shared(widen(df).select(
      col(idCol).as("id"), toks.as("tk"), wordNgramsAll(col(textCol), 2).as("bg")))
    val top = base.select(col("id"), explode(col("bg")).as("b"))
      .groupBy(col("id"), col("b")).agg(count(lit(1)).as("c"))
      .groupBy(col("id")).agg(max(col("c")).as("mc"), sum(col("c")).as("total"))
    base
      .select(
        col("id"),
        round(lit(1.0) - size(array_distinct(col("tk"))).cast("double") / size(col("tk")), 6)
          .as("dup_word_frac"))
      // LEFT join: a doc with fewer than 2 tokens has no bigrams and no
      // `top` row, but its dup_word_frac is still defined — an inner join
      // would silently drop it from the signal table entirely
      .join(top, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        col("dup_word_frac"),
        coalesce(round(col("mc").cast("double") / col("total"), 6), lit(0.0))
          .as("top_bigram_frac"))
  }

  /** Per-document average unigram log-probability under the corpus's own
    * unigram language model — the cheap stand-in for perplexity-based
    * quality filtering (KenLM-style): documents of improbable tokens score
    * low. Two passes over the token stream: (1) global token counts — one
    * partial-aggregated shuffle; (2) re-join each token occurrence to its
    * count and average ln(count/total) per document — one shuffle on token
    * plus one on doc id. The count table is vocabulary-sized (Heaps' law:
    * ≪ corpus size), and the single-row total joins in broadcast, so
    * nothing here scales worse than the token stream itself. */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import OpUtils.{shared, widen}
    val toks = shared(widen(df)
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("tok")))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("n"))
    toks
      .join(counts, "tok")
      .crossJoin(broadcast(total))
      .groupBy(col("id"))
      .agg(round(avg(log(col("c").cast("double") / col("n"))), 4).as("logprob"))
      .select(col("id").as(idCol), col("logprob"))
  }

  /** Per-document average bigram conditional log-probability under the
    * corpus's own bigram LM — one order up from [[unigramLogProb]] and a
    * materially better perplexity-filter proxy: a document of common words
    * in an improbable ORDER now scores low, which is exactly the
    * word-salad/template signal unigrams cannot see. Scores
    * avg ln P(w_i | w_{i-1}) with MLE conditionals
    * c(w_{i-1} w_i) / c(w_{i-1} ·) — both counts come from the SAME bigram
    * stream (the denominator is the prefix-marginal, so every observed
    * bigram has probability > 0 and no smoothing constant leaks into the
    * contract).
    *
    * Shape: the fused [[graft.functions.GraftFunctions.wordNgramsAll]]
    * kernel emits bigram occurrences narrowly; the bigram-count table is
    * one partial-aggregated shuffle and Heaps-law-sized (≪ the token
    * stream), the prefix-marginal table is vocabulary-sized and derived
    * from the bigram counts (no second corpus pass). Re-attaching counts
    * shuffles on the bigram key, the marginal join is left to AQE (it
    * broadcasts while the vocab fits, shuffles when it doesn't), and the
    * final per-doc average shuffles on the id. Docs with fewer than two
    * tokens have no bigrams: they surface with NULL logprob_bi rather than
    * silently vanishing. Returns (idCol, n_bigrams, logprob_bi). */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import OpUtils.{shared, widen}
    val bigrams = shared(widen(df)
      .select(col(idCol).as("id"), explode(wordNgramsAll(col(textCol), 2)).as("bg")))
    val c2 = shared(bigrams.groupBy(col("bg")).agg(count(lit(1)).as("c2")))
    val c1 = c2
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c2")).as("c1"))
    val scored = bigrams
      .join(c2, "bg")
      .join(c1, substring_index(col("bg"), " ", 1) === col("w1"))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        round(avg(log(col("c2").cast("double") / col("c1"))), 4).as("logprob_bi"))
    df.select(col(idCol).as("id")).distinct()
      .join(scored, Seq("id"), "left")
      .select(
        col("id").as(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("logprob_bi"))
  }

  /** DSIR-style importance weights for domain-targeted data selection
    * (Xie et al. 2023, "Data Selection for Language Models via Importance
    * Resampling"): each document's log importance weight
    * Σ_w c_w(doc) · ln(p_target(w) / p_raw(w)) under add-one-smoothed
    * unigram LMs of the target slice (`targetPred` rows) and the whole
    * corpus. Documents that look like the target domain get positive
    * weights; resampling by these weights is the standard way to tilt a
    * crawl toward a curated domain without hard filtering.
    *
    * Shape: ONE token stream feeds both count tables (the target counts
    * are a filtered re-aggregation, not a second corpus pass); both tables
    * are vocabulary-sized (Heaps' law, ≪ corpus), their outer join and the
    * two single-row totals broadcast, and the per-token log ratio is
    * re-attached with one shuffle on the token key plus one per-doc
    * aggregation — exactly [[unigramLogProb]]'s scaling. Every stream
    * token exists in the raw table by construction, so the ratio join is
    * inner and lossless. Returns (idCol, n_tokens, log_weight rounded to
    * 4 dp). */
  def dsirWeights(
      df: DataFrame, idCol: String, textCol: String, targetPred: Column): DataFrame = {
    import OpUtils.{shared, widen}
    val toks = shared(widen(df).select(
      col(idCol).as("id"), targetPred.as("tgt"),
      explode(split(col(textCol), " ")).as("tok")))
    val raw = toks.groupBy(col("tok")).agg(count(lit(1)).as("cr"))
    val tgt = toks.filter(col("tgt")).groupBy(col("tok")).agg(count(lit(1)).as("ct"))
    val rawTotals = raw.agg(
      sum(col("cr")).cast("double").as("tr"), count(lit(1)).cast("double").as("v"))
    val tgtTotal = tgt.agg(coalesce(sum(col("ct")), lit(0L)).cast("double").as("tt"))
    val ratios = raw.join(tgt, Seq("tok"), "left")
      .crossJoin(broadcast(rawTotals))
      .crossJoin(broadcast(tgtTotal))
      .select(
        col("tok"),
        (log((coalesce(col("ct"), lit(0L)) + 1).cast("double") / (col("tt") + col("v"))) -
          log((col("cr") + 1).cast("double") / (col("tr") + col("v")))).as("lr"))
    toks.join(ratios, "tok")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        round(sum(col("lr")), 4).as("log_weight"))
      .select(col("id").as(idCol), col("n_tokens"), col("log_weight"))
  }

  /** CCNet-style perplexity bucketing: documents ranked per language by a
    * corpus-trained LM score and cut into head / middle / tail thirds —
    * the coarse quality tiers CCNet ships as its primary output. The score
    * is the unigram logprob ([[unigramLogProb]], computed here with the
    * language carried through so the corpus is scanned once); ranking is
    * (logprob desc, id asc), so ties are deterministic, and bucket
    * boundaries are floor((rank−1)·3 / n_lang) — exact integer math that
    * any engine reproduces bit-for-bit.
    *
    * The per-language rank uses [[OpUtils.groupedRank]]'s distributed
    * range-partition + per-partition offsets assembly, NOT a
    * `Window.partitionBy(lang)` — a handful of languages over a web-scale
    * corpus would otherwise funnel each language's every document through
    * one task. Returns (idCol, langCol, logprob, ppl_bucket). */
  def perplexityBuckets(
      df: DataFrame, idCol: String, textCol: String, langCol: String): DataFrame = {
    import OpUtils.{shared, widen, groupedRank}
    val toks = shared(widen(df).select(
      col(idCol).as("id"), col(langCol).as("lang"),
      explode(split(col(textCol), " ")).as("tok")))
    val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = counts.agg(sum(col("c")).as("n"))
    // persisted: the sizes branch and groupedRank's range repartition both
    // consume it — without this the token join + per-doc aggregation (the
    // expensive stage) would execute twice
    val scored = shared(toks.join(counts, "tok")
      .crossJoin(broadcast(total))
      .groupBy(col("id"), col("lang"))
      .agg(round(avg(log(col("c").cast("double") / col("n"))), 4).as("logprob")))
    // null-safe lang equality: a NULL language is still a cohort (both
    // engines' PARTITION BY rank it), so it must not drop out of the join
    val sizes = scored.groupBy(col("lang")).agg(count(lit(1)).as("__pb_n"))
      .withColumnRenamed("lang", "__pb_lang")
    groupedRank(scored, "lang", Seq(col("logprob").desc, col("id")), "__pb_rk")
      .join(broadcast(sizes), col("lang") <=> col("__pb_lang"))
      .withColumn("__pb_b", floor((col("__pb_rk") - 1) * 3 / col("__pb_n")))
      .select(
        col("id").as(idCol),
        col("lang").as(langCol),
        col("logprob"),
        when(col("__pb_b") === 0, "head")
          .when(col("__pb_b") === 1, "middle")
          .otherwise("tail").as("ppl_bucket"))
  }

  /** Corpus-level n-gram statistics: the `topK` n-grams by occurrence count
    * (ties broken by the gram ascending) with their document frequency.
    * Occurrences come from the non-distinct shingle stream; one grouped
    * aggregation (count + count-distinct docs), then a TakeOrdered top-k —
    * only k rows per partition reach the driver-side ordering. */
  def ngramStats(df: DataFrame, idCol: String, textCol: String,
                 n: Int = 3, topK: Int = 50): DataFrame = {
    import OpUtils.widen
    widen(df)
      .select(col(idCol).as("id"), explode(wordNgramsAll(col(textCol), n)).as("gram"))
      .groupBy(col("gram"))
      .agg(
        count(lit(1)).as("occurrences"),
        countDistinct(col("id")).as("doc_freq"))
      .orderBy(col("occurrences").desc, col("gram"))
      .limit(topK)
  }

  /** Top-`k` TF-IDF terms per document — keyword extraction for corpus
    * exploration and topic bucketing. tf = in-document count, idf =
    * ln(nDocs / docFreq); ranked per doc by (score desc, term asc) so ties
    * are deterministic.
    *
    * Shape: one grouped count on (doc, term), document frequency from a
    * second aggregation over that result (already one row per (doc, term),
    * so `count(*)` IS doc frequency), idf joined back on term, and a
    * per-document window for the rank — the window partitions on doc id,
    * so its sort is per-document-sized, never global. The nDocs scalar
    * broadcasts. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    import OpUtils.{shared, widen}
    val tf = shared(widen(df)
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf")))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // doc count from the persisted tf relation (every doc has ≥1 term row —
    // split of even an empty string yields [""]), not a second source scan
    val nDocs = tf.select(col("id")).distinct().agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col("id")).orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("id").as(idCol), col("rank"), col("term"), col("score"))
  }

  /** Signed feature hashing (the "hashing trick", Weinberger et al. 2009):
    * each document's bag of words folded into a `dim`-bucket signed count
    * vector — the deterministic, vocabulary-free text→vector bridge into
    * the embedding/ANN operators when no learned encoder is in the loop.
    * Bucket and sign both derive from md5 hex prefixes of the token, so
    * any engine reproduces them bit-for-bit, and the emitted values are
    * exact integers — no float parity concerns at all.
    *
    * Output is the SPARSE (idCol, dim, value) row form, one row per
    * populated bucket: exploding a dense array column out of a grouped
    * collect would shuffle `dim` doubles per document and make the result
    * order-sensitive; consumers that need the dense vector assemble it
    * with their own group-collect at the point of use. One token-stream
    * exchange, partial-aggregated. */
  def hashFeatures(df: DataFrame, idCol: String, textCol: String, dim: Int = 64): DataFrame = {
    import OpUtils.widen
    require(dim > 0)
    widen(df)
      .select(col(idCol).as("id"), explode(split(col(textCol), " ")).as("tok"))
      .withColumn("bucket",
        conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long") % dim)
      .withColumn("sign",
        when(conv(substring(md5(col("tok")), 9, 1), 16, 10).cast("long") % 2 === 0, 1L)
          .otherwise(-1L))
      .groupBy(col("id"), col("bucket"))
      .agg(sum(col("sign")).as("value"))
      .select(col("id").as(idCol), col("bucket").as("dim"), col("value"))
  }

  /** Predicted language per document (script + stopword heuristic). */
  def languages(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), langId(col(textCol)).as("lang_pred"))

  /** Detector-vs-label confusion matrix: how the n-gram language detector
    * scores against a labeled column — the calibration readout that tells
    * a pipeline operator WHERE the detector fails (which labels bleed into
    * 'und', which pairs confuse) before they trust its routing. One
    * narrow projection (label + detection off the same row — never an
    * id-join back to [[languages]]'s output, which would shuffle two
    * corpus-sized relations to reattach a derivable column), one grouped
    * count at ≤ #langs² cardinality. Returns (lang, lang_pred, n). */
  def langConfusion(df: DataFrame, labelCol: String, textCol: String): DataFrame =
    df.select(col(labelCol).as("lang"), langId(col(textCol)).as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))

  /** Character-distribution Shannon entropy per document — the classic
    * gibberish/boilerplate signal (low = repeated filler, high = random
    * noise). One narrow pass via the native [[graft.functions.CharEntropy]]
    * kernel; the explode-chars alternative would multiply the row count by
    * the text length. Rounded to 4 dp for cross-engine float parity.
    * Empty documents are excluded (their entropy is undefined — an external
    * aggregate over zero characters yields NULL, not 0). */
  /** RAKE keyphrase extraction (Rose et al. 2010) over the whole corpus:
    * candidate phrases are maximal stopword-free token runs (≤ `maxLen`
    * words); each word scores deg/freq where freq counts its phrase
    * occurrences and deg additionally weights by the length of each
    * hosting phrase (so words living in longer collocations outrank
    * equally-frequent loners); a phrase scores the sum of its member
    * words. Returns the top `k` (phrase, n, score), score desc, ties by
    * occurrence count then phrase text.
    *
    * 100 TB shape: the phrase stream collapses immediately to the DISTINCT
    * phrase table (vocabulary-sized, Heaps' law) carrying its occurrence
    * count; word stats re-aggregate THAT table occurrence-weighted, so the
    * corpus-sized exchange is exactly one grouped count of phrases. The
    * word-score join fans out only distinct-phrase × phrase-length rows,
    * and the top-k is a TakeOrdered, never a global sort. */
  def rakeKeyphrases(df: DataFrame, textCol: String, k: Int = 20, maxLen: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    import OpUtils.{shared, widen}
    val stopPat = s"\\b(?:${StopWords.mkString("|")})\\b"
    val phrases = widen(df)
      .select(explode(split(
        regexp_replace(lower(col(textCol)), stopPat, "|"), "\\|")).as("__rk_p0"))
      .select(trim(col("__rk_p0")).as("phrase"))
      .filter(col("phrase") =!= "")
    val ws = split(col("phrase"), " +")
    val pc = shared(phrases
      .groupBy(col("phrase")).agg(count(lit(1)).as("n"))
      .select(col("phrase"), col("n"), ws.as("__rk_ws"), size(ws).as("__rk_len"))
      .filter(col("__rk_len") <= maxLen))
    val wstat = pc
      .select(explode(col("__rk_ws")).as("w"), col("n"), col("__rk_len"))
      .groupBy(col("w"))
      .agg(sum(col("n")).as("__rk_freq"),
        sum(col("n") * col("__rk_len")).as("__rk_deg"))
    pc.select(col("phrase"), col("n"), explode(col("__rk_ws")).as("w"))
      .join(wstat, "w")
      .groupBy(col("phrase"), col("n"))
      .agg(round(sum(col("__rk_deg").cast("double") / col("__rk_freq")), 6)
        .as("score"))
      .orderBy(col("score").desc, col("n").desc, col("phrase"))
      .limit(k)
  }

  /** First-occurrence n-gram novelty per document: the fraction of a doc's
    * distinct word `n`-grams whose FIRST owner (minimum doc id over the
    * corpus) is the doc itself — the contribution-scoring complement of
    * [[Dedup.duplicatedNgramCoverage]]: coverage asks "how much of this
    * doc exists elsewhere", novelty asks "what did this doc add, reading
    * the corpus in id order". Sort curation keeps high-novelty docs first
    * and drops trailing near-echoes. Docs shorter than `n` tokens have no
    * grams and no row.
    *
    * 100 TB shape: identical to coverage — one shingle-stream partial-agg
    * exchange (xxhash64'd 8-byte gram keys; a 64-bit collision can steal
    * one gram's novelty, acceptable for a statistic) to find min-owner per
    * gram, one join back, one per-doc aggregation. Nothing pairwise,
    * nothing above vocabulary size after the first exchange.
    *
    * Returns (id, n_grams, n_novel, novelty), novelty 6 dp. */
  def gramNovelty(df: DataFrame, idCol: String, textCol: String, n: Int = 5): DataFrame = {
    import OpUtils.{shared, widen}
    val e = shared(widen(df)
      .select(col(idCol).as("id"),
        explode(wordShinglesExpr(col(textCol), n)).as("g0"))
      .select(col("id"), xxhash64(col("g0")).as("g")))
    val owner = e.groupBy(col("g")).agg(min(col("id")).as("__gn_owner"))
    e.join(owner, "g")
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("id") === col("__gn_owner"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("id").as(idCol), col("n_grams"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_grams"), 6).as("novelty"))
  }

  def characterEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.filter(length(col(textCol)) > 0)
      .select(col(idCol), round(charEntropy(col(textCol)), 4).as("char_entropy"))

  /** Winnowing rolling-hash fingerprint per document. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String, window: Int = 16): DataFrame =
    df.select(col(idCol), rollingFingerprint(col(textCol), window).as("fingerprint"))

  /** Corpus-health Zipf check: the slope of ln(frequency) against ln(rank)
    * over the token vocabulary. Natural corpora run near −1; synthetic,
    * template-heavy, or truncated-vocabulary data drifts visibly — a cheap
    * one-number drift detector for an ingestion pipeline. Ranking the
    * count relation with a global `Window.orderBy` would funnel the WHOLE
    * vocabulary — 10⁸–10⁹ distinct tokens on a web corpus — through one
    * reducer, so ranks come from [[OpUtils.groupedRank]]'s range-
    * partitioned assembly instead (the text_ppl_bucket discipline; one
    * constant group, parallelism = partitions); the regression is then a
    * single scalar aggregate. Returns one row (zipf_slope, vocab,
    * n_tokens). */
  def zipfSlope(df: DataFrame, textCol: String): DataFrame = {
    val counts = df.select(explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .withColumn("__zs_g", lit(0))
    OpUtils.groupedRank(counts, "__zs_g", Seq(col("c").desc, col("tok")), "rank")
      .agg(
        round(regr_slope(log(col("c")), log(col("rank"))), 4).as("zipf_slope"),
        count(lit(1)).cast("long").as("vocab"),
        sum(col("c")).cast("long").as("n_tokens"))
  }

  /** Inverted-index postings summary: per token, document frequency, total
    * term frequency, and the top-`k` documents by within-doc term frequency
    * — the build step of a keyword-search / retrieval index, and the
    * "where does this token concentrate" diagnostic for corpus audits.
    * Tokens below `minDf` documents are dropped (hapax noise).
    *
    * 100 TB shape: the token stream reduces to (token, doc) term
    * frequencies in one partial-aggregated exchange, then ONE per-token
    * aggregation computes df, total_tf AND the top-k docs together — the
    * top-k rides the bounded-heap [[graft.functions.TopKByScore]]
    * aggregate, so k docs per token per partition cross the exchange, never
    * a `row_number()` window sorting every posting of corpus-frequent
    * tokens (a stopword's posting list is corpus-sized; its heap is k).
    * Ties break toward the smaller doc id, the row_number-oracle order.
    *
    * Returns (tok, df, total_tf, rank, doc_id, tf), k rows per kept token. */
  def postings(df: DataFrame, idCol: String, textCol: String,
      minDf: Long = 10, k: Int = 3): DataFrame = {
    require(minDf >= 1, s"minDf must be >= 1, got $minDf")
    require(k >= 1, s"k must be >= 1, got $k")
    import graft.functions.GraftFunctions.topKByScore
    val tf = df
      .select(col(idCol).cast("long").as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col("tok"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
    tf.groupBy(col("tok"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("total_tf"),
        topKByScore(col("tf").cast("double"), col("doc_id"), k).as("tk"))
      .filter(col("df") >= minDf)
      .select(col("tok"), col("df"), col("total_tf"), posexplode(col("tk")))
      .select(col("tok"), col("df"), col("total_tf").cast("long").as("total_tf"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.neighbor_id").as("doc_id"),
        // integer-valued by construction — the heap carries scores as double
        col("col.sim").cast("long").as("tf"))
  }

  /** Top-k word associations by pointwise mutual information over
    * WINDOW-BOUNDED co-occurrence: two tokens co-occur when they sit at
    * most `window` positions apart in a document, so the pair stream is
    * O(len · window) — linear in the corpus — never the C(len, 2) per-doc
    * explosion of whole-document co-occurrence (a 100k-token concatenated
    * crawl page contributes 100k·w pairs here, not 5·10⁹).
    * PMI = ln(p(u,v) / (p(u)·p(v))) with p(u,v) from the pair stream and
    * p(·) from the token stream; pairs below `minCount` are dropped first
    * (PMI's low-count bias makes hapax pairs meaningless).
    *
    * Shape: pairs come from the fused n-gram kernel's (first, last)
    * endpoints at each distance 1..window — a narrow per-row fan-out, no
    * positional self-join. The pair-count and token-count tables are the
    * only corpus-crossing exchanges (both Heaps-law-sized after partial
    * aggregation); the two marginal joins are left to AQE (broadcast while
    * the vocab fits); the scalar totals ride 1-row broadcasts; and the
    * final top-k is a TakeOrdered, never a global sort materialization.
    * Ties are broken (pmi desc, u, v) so the k-boundary is deterministic.
    * Returns (u, v, c_pair, pmi). */
  def pmiTopPairs(df: DataFrame, textCol: String,
      window: Int = 3, minCount: Long = 5, k: Int = 50): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(k >= 1, s"k must be >= 1, got $k")
    import OpUtils.shared
    val text = df.select(col(textCol).as("t"))
    val cTok = shared(text
      .select(explode(split(col("t"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c")))
    val nTok = cTok.agg(sum(col("c")).cast("double").as("n_tok"))
    val pairs = shared((1 to window).map { d =>
      text.select(explode(wordNgramsAll(col("t"), d + 1)).as("g"))
        .select(
          substring_index(col("g"), " ", 1).as("a"),
          substring_index(col("g"), " ", -1).as("b"))
    }.reduce(_.unionAll(_))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v")))
    val nPair = pairs.agg(count(lit(1)).cast("double").as("n_pair"))
    pairs.groupBy(col("u"), col("v")).agg(count(lit(1)).as("c_pair"))
      .filter(col("c_pair") >= minCount)
      .join(cTok.select(col("tok").as("u"), col("c").as("cu")), "u")
      .join(cTok.select(col("tok").as("v"), col("c").as("cv")), "v")
      .crossJoin(broadcast(nPair))
      .crossJoin(broadcast(nTok))
      .select(col("u"), col("v"), col("c_pair"),
        round(log(
          (col("c_pair") * col("n_tok") * col("n_tok")) /
            (col("n_pair") * col("cu") * col("cv"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("u"), col("v"))
      .limit(k)
  }

  /** BM25 retrieval: top-`k` documents for ONE query (a fixed bag of
    * `queryTerms`) under the standard Robertson/Sparck-Jones weighting —
    * the lexical half of every RAG retrieval stack, and the scoring the
    * [[postings]] inverted index exists to serve. Uses the BM25+-free
    * original form: idf = ln((N − df + 0.5)/(df + 0.5) + 1) (the Lucene
    * non-negative variant), tf saturation `k1`, length normalization `b`.
    *
    * 100 TB shape: the corpus-sized work is exactly two passes over ONE
    * shared token stream — the per-doc length table (one partial-aggregated
    * exchange) and the query-term tf table, whose `isin` filter runs
    * BEFORE its grouped exchange so only tokens matching the query's
    * handful of terms ever cross it (the tf table is |terms| × matching
    * docs, not corpus-sized). The df table is |terms| rows, the (N, avgdl)
    * scalars ride a 1-row broadcast, the dl join is left to AQE (tf side
    * small → broadcast), and the final top-k is a TakeOrdered bounded
    * heap, never a global sort. Scores are rounded to 4 dp BEFORE the
    * top-k so the k-boundary is engine-stable; ties break toward the
    * smaller doc id.
    *
    * Returns (idCol, score), k rows, score desc. */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    import OpUtils.{shared, widen}
    val toks = shared(widen(df)
      .select(col(idCol).cast("long").as("doc_id"),
        explode(split(col(textCol), " ")).as("tok")))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val scalars = dl.agg(
      count(lit(1)).cast("double").as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = toks
      .filter(col("tok").isin(queryTerms.map(x => x: Any): _*))
      .groupBy(col("tok"), col("doc_id")).agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("tok")).agg(count(lit(1)).as("dft"))
    tf.join(dft, "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(scalars))
      .withColumn("__bm_w",
        log((col("n_docs") - col("dft") + 0.5) / (col("dft") + 0.5) + 1.0) *
          (col("tf") * (k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("__bm_w")), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id").as(idCol), col("score"))
  }

  /** Flesch reading-ease readability: the classic
    * 206.835 − 1.015·(words/sentence) − 84.6·(syllables/word) score, the
    * cheap fluency signal used alongside the Gopher structural rules when
    * tiering web text. Syllables use the standard vowel-group heuristic
    * (each maximal `[aeiouy]+` run in the lowercased text is one
    * syllable); sentences are maximal `[.!?]+` runs, floored at 1 so
    * unterminated fragments still score. Both counts are "collapse the
    * run to one char, diff the lengths" — two codegen'd regexp_replace
    * calls each, the same trick on both engines, so the score is
    * engine-portable with no per-word UDF logic. A totals-based syllable
    * count (a vowelless token contributes 0, not the per-word floor of 1)
    * is the documented simplification — at corpus scale the two variants
    * rank documents identically.
    *
    * 100 TB shape: map-only — ZERO exchanges, one projection, all
    * expressions inside whole-stage codegen.
    *
    * Returns (idCol, n_words, n_sentences, n_syllables, flesch). */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val low = lower(col(textCol))
    def runs(c: Column, pat: String): Column =
      length(regexp_replace(c, pat, "#")) - length(regexp_replace(c, pat, ""))
    val nWords = size(split(col(textCol), " ")).cast("long")
    val nSyll = runs(low, "[aeiouy]+").cast("long")
    val nSent = greatest(runs(low, "[.!?]+").cast("long"), lit(1L))
    df.select(
      col(idCol),
      nWords.as("n_words"),
      nSent.as("n_sentences"),
      nSyll.as("n_syllables"),
      round(lit(206.835)
        - lit(1.015) * (nWords.cast("double") / nSent.cast("double"))
        - lit(84.6) * (nSyll.cast("double") / nWords.cast("double")), 4)
        .as("flesch"))
  }

  /** Jensen–Shannon divergence between the token distributions of two
    * corpus slices (`condA` rows vs the rest) — the symmetric, bounded
    * [0, ln 2] distribution-drift metric for TEXT, completing the drift
    * suite ([[Profiler.psi]] / [[Profiler.ksStatistic]] cover numeric
    * columns; none of them can say "the web slice's vocabulary moved").
    * JSD = ½·KL(P‖M) + ½·KL(Q‖M) with M = (P+Q)/2; tokens absent from a
    * slice contribute their other-slice half-term (0·ln 0 = 0).
    *
    * 100 TB shape: the token stream collapses to (token, n_a, n_b) cells
    * in ONE partial-aggregated exchange (both slices' counts as
    * conditional sums of the same pass — never two scans or a vocab
    * self-join); totals are a single-row broadcast; the final reduce is
    * over vocab-sized per-token contributions. Returns one row
    * (n_tokens_a, n_tokens_b, vocab_shared, vocab_total, jsd). */
  def jsDivergence(df: DataFrame, textCol: String, condA: Column): DataFrame = {
    import OpUtils.shared
    // shared: the cells table feeds both the totals row and the
    // contribution scan — unpersisted, Spark would re-run the token
    // exchange (the only corpus-sized shuffle) once per branch
    val cells = shared(df
      .select(explode(split(col(textCol), " ")).as("tok"), condA.as("__a"))
      .groupBy(col("tok"))
      .agg(
        count(when(col("__a"), 1)).as("na"),
        count(when(!col("__a"), 1)).as("nb")))
    val totals = cells.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
    val contrib = cells.crossJoin(broadcast(totals))
      .withColumn("p", col("na") / col("ta"))
      .withColumn("q", col("nb") / col("tb"))
      .withColumn("m", (col("p") + col("q")) / 2)
      .withColumn("kl",
        when(col("p") > 0, col("p") * log(col("p") / col("m")) / 2).otherwise(0.0) +
          when(col("q") > 0, col("q") * log(col("q") / col("m")) / 2).otherwise(0.0))
    contrib.agg(
      max(col("ta")).cast("long").as("n_tokens_a"),
      max(col("tb")).cast("long").as("n_tokens_b"),
      count(when(col("na") > 0 && col("nb") > 0, 1)).as("vocab_shared"),
      count(lit(1)).as("vocab_total"),
      round(sum(col("kl")), 6).as("jsd"))
  }

  /** Out-of-vocabulary rate per document against the corpus's own
    * top-`vocabSize` token vocabulary — the tokenizer-coverage screen run
    * before committing to a vocab: documents dense in OOV tokens will
    * fragment into byte-fallback pieces and waste context length. The
    * vocabulary cut is deterministic ((count DESC, token) ties, the
    * [[graft.operators.Curation.vocabulary]] ordering).
    *
    * Shape: one token explosion feeds both the vocabulary aggregation
    * (vocab-sized, TakeOrdered cut) and the per-doc OOV count; the tiny
    * vocab list joins back by broadcast, so the corpus shuffles once on
    * the doc id. Returns (idCol, n_tokens, n_oov, oov_rate rounded 6). */
  def oovRate(
      df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 100): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val toks = OpUtils.shared(OpUtils.widen(df)
      .select(col(idCol).as("__ov_id"),
        explode(split(col(textCol), " ")).as("token")))
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("__ov_n"))
      .orderBy(col("__ov_n").desc, col("token"))
      .limit(vocabSize)
      .select(col("token"), lit(1).as("__ov_in"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("__ov_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        count(when(col("__ov_in").isNull, 1)).as("n_oov"))
      .select(col("__ov_id").as(idCol), col("n_tokens"), col("n_oov"),
        round(col("n_oov").cast("double") / col("n_tokens"), 6).as("oov_rate"))
  }

  /** Boundary marker for the BPE symbol encoding: every inter-symbol (and
    * edge) boundary carries TWO markers, and a merge pattern consumes one
    * from each side — so Java/SQL `replace`'s left-to-right resume-after-
    * replacement scan can never eat a neighbor pair's boundary ("a b a b"
    * merges to "ab ab", not "ab a b"), and a pattern can never false-match
    * across a symbol boundary (every symbol in the pattern is fully
    * marker-delimited). Symbols themselves are [a-z]+ by the word filter,
    * so they never contain the marker. */
  private val BpeSep = "·"
  private val BpeSep2 = BpeSep + BpeSep

  /** Word-frequency table in BPE symbol encoding: the corpus collapses to
    * vocab-sized (word, freq, symbol-string) rows BEFORE any merge
    * iteration — the standard trainer representation (pair counts are
    * freq-weighted), which is what makes BPE training tractable at
    * 100 TB: iterations touch Heaps-law vocabulary rows, never the
    * corpus. Non-[a-z]+ tokens are excluded so symbols can never collide
    * with the boundary marker. */
  private def bpeWordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), " ")).as("w"))
      // \A..\z (end-of-INPUT anchors): Java's $ matches before a trailing
      // line terminator, so "abc\n" would train here while the DuckDB
      // oracle (RE2, $ = end-of-text) excludes it — a latent cross-engine
      // divergence on newline-bearing tokens
      .filter(col("w").rlike("\\A[a-z]+\\z"))
      .groupBy(col("w")).agg(count(lit(1)).cast("long").as("freq"))
      .withColumn("s",
        concat(lit(BpeSep2), regexp_replace(col("w"), "(.)", "$1" + BpeSep2)))

  /** Freq-weighted adjacent-symbol-pair counts of one BPE round — the
    * trainer's per-iteration aggregate, vocab-sized on both sides. */
  private def bpePairCounts(words: DataFrame): DataFrame =
    words
      .select(col("freq"),
        expr(s"filter(split(s, '$BpeSep2'), x -> x != '')").as("syms"))
      .filter(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
          "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"))
        .as("pr"))
      .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
      .agg(sum(col("freq")).as("c"))

  /** Run `rounds` BPE merge iterations; returns the learned merges and the
    * final symbolized word table. Each round is one vocab-sized pair-count
    * aggregation plus a 1-row driver argmax (count desc, pair asc — the
    * deterministic tie order); the merge applies as a single `replace`
    * projection over the persisted base table (symbols are [a-z]+ by
    * construction, safe to inline in the expression). Plan depth grows by
    * one cheap projection per round — no checkpoint needed at tokenizer
    * round counts. Stops early if the vocabulary runs out of pairs. */
  private def bpeLoop(df: DataFrame, textCol: String, rounds: Int)
      : (Seq[(Long, String, String, Long)], DataFrame) = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var words = OpUtils.shared(bpeWordTable(df, textCol))
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var r = 1L
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val best = bpePairCounts(words)
        .orderBy(col("c").desc, col("a"), col("b")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, a, b, c))
        words = words.withColumn("s", expr(
          s"replace(s, '$BpeSep$a$BpeSep2$b$BpeSep', '$BpeSep$a$b$BpeSep')"))
        r += 1
      }
    }
    (merges.result(), words)
  }

  /** Byte-pair-encoding tokenizer TRAINING, distributed: learn the top
    * `rounds` merges over the corpus — each round counts freq-weighted
    * adjacent symbol pairs on the word-frequency table and merges the most
    * frequent pair (ties to the lexicographically smallest), exactly the
    * HuggingFace-tokenizers trainer loop re-expressed as Spark aggregates.
    *
    * 100 TB shape: ONE corpus-sized exchange builds the word-frequency
    * table; every iteration after that is vocab-sized (Heaps' law: ~10⁷
    * rows where the corpus has 10¹² tokens) with a 1-row driver argmax —
    * the driver never holds more than one merge. Returns
    * (round, sym_a, sym_b, pair_count), one row per learned merge. */
  def bpeTrain(df: DataFrame, textCol: String, rounds: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (merges, _) = bpeLoop(df, textCol, rounds)
    merges.toDF("round", "sym_a", "sym_b", "pair_count")
  }

  /** Corpus compression readout of a freshly-trained BPE tokenizer: train
    * `rounds` merges, encode the corpus with them, and report corpus-level
    * (n_words, n_chars, n_symbols, compression = symbols per char) — the
    * "is this tokenizer budget worth it" number a tokenization pipeline
    * tracks as vocabulary size grows. Same scale shape as [[bpeTrain]];
    * the encode is the final word table's symbol count, freq-weighted,
    * aggregated in one job. */
  def bpeEncodeStats(df: DataFrame, textCol: String, rounds: Int = 8): DataFrame = {
    val (_, words) = bpeLoop(df, textCol, rounds)
    bpeStats(words)
  }

  /** Corpus-level encode stats of a symbolized word table (the shared tail
    * of [[bpeEncodeStats]] and [[bpeApplySavedStats]]). */
  private def bpeStats(words: DataFrame): DataFrame =
    words
      .withColumn("n_syms",
        size(expr(s"filter(split(s, '$BpeSep2'), x -> x != '')")).cast("long"))
      .agg(
        sum(col("freq")).cast("long").as("n_words"),
        sum(col("freq") * length(col("w"))).cast("long").as("n_chars"),
        sum(col("freq") * col("n_syms")).cast("long").as("n_symbols"),
        round(sum(col("freq") * col("n_syms")).cast("double") /
          sum(col("freq") * length(col("w"))), 6).as("compression"))

  /** Train a BPE vocabulary on `df` and SAVE it: the learned merge table
    * (round, sym_a, sym_b, pair_count) written as parquet at `path` — the
    * tokenizer-artifact half of the train-once / apply-everywhere split.
    * The table is `rounds`-sized (a real vocabulary is 10⁴–10⁵ rows), so
    * one file holds it at any scale. Returns the saved table read back. */
  def bpeSaveVocab(
      df: DataFrame, textCol: String, rounds: Int, path: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (merges, _) = bpeLoop(df, textCol, rounds)
    merges.toDF("round", "sym_a", "sym_b", "pair_count")
      .coalesce(1).write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** Encode a NEW shard with a PINNED saved vocabulary — training never
    * reruns: the merge table is loaded (vocab-sized, driver-held in round
    * order), each merge applies as the same single `replace` projection the
    * trainer used, and the result is the shard's corpus-level encode stats.
    *
    * 100 TB shape: the shard pays ONE word-frequency aggregation; every
    * merge after that is a narrow vocab-sized projection with the merge
    * pair inlined as a literal — no join, no shuffle, cost tracks the
    * SHARD, never the training corpus. This is the tokenizer analogue of
    * the minhash/IVF saved-index apply paths: the artifact is immutable,
    * the new data streams against it. */
  def bpeApplySavedStats(
      df: DataFrame, textCol: String, vocabPath: String): DataFrame = {
    val spark = df.sparkSession
    val merges = spark.read.parquet(vocabPath)
      .orderBy(col("round"))
      .select(col("sym_a"), col("sym_b"))
      .collect() // rounds-sized by the bpeSaveVocab contract
    var words = bpeWordTable(df, textCol)
    merges.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      words = words.withColumn("s", expr(
        s"replace(s, '$BpeSep$a$BpeSep2$b$BpeSep', '$BpeSep$a$b$BpeSep')"))
    }
    bpeStats(words)
  }
}
