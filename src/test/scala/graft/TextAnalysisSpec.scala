package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.LanguageId
import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("language id detects real-language samples") {
    assert(LanguageId.detect("the quick brown fox is in the garden and it is raining") == "en")
    assert(LanguageId.detect("el perro está en la casa y la niña come pan con queso") == "es")
    assert(LanguageId.detect("der Hund ist im Haus und die Katze ist nicht da") == "de")
    assert(LanguageId.detect("le chat est dans la maison et les enfants sont pas là") == "fr")
    assert(LanguageId.detect("这是一个中文句子用来测试语言识别功能") == "zh")
    assert(LanguageId.detect("это русское предложение для проверки определения языка") == "ru")
    assert(LanguageId.detect("これは日本語のテストですかなカナ") == "ja")
    assert(LanguageId.detect("12345 67890 !!!") == "und")
    assert(LanguageId.detect("") == "und")
  }

  test("language id runs as a column expression") {
    val out = TextAnalysis.languages(
      Seq((1L, "the cat is on the mat and it is happy")).toDF("doc_id", "text"),
      "doc_id", "text").collect()
    assert(out(0).getString(1) == "en")
  }

  test("quality features compute expected values on a known doc") {
    val out = TextAnalysis.qualityFeatures(
      Seq((1L, "the cat sat")).toDF("doc_id", "text"), "doc_id", "text")
      .collect()(0)
    assert(out.getLong(1) == 11L) // n_chars
    assert(out.getLong(2) == 3L)  // n_words
    assert(out.getDouble(3) == 3.0) // avg word len: (11-2)/3
    assert(math.abs(out.getDouble(4) - 1.0 / 3.0) < 1e-5) // "the" of 3
    assert(out.getLong(5) == 0L) // no punctuation
  }

  test("quality score is in [0,1] and favors longer docs") {
    val df = Seq((1L, "short"), (2L, Seq.fill(60)("word").mkString(" ")))
      .toDF("doc_id", "text")
    val scores = TextAnalysis.qualityScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.values.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(2L) > scores(1L))
  }

  test("token counts: whitespace vs regex tokenization") {
    val out = TextAnalysis.tokenCounts(
      Seq((1L, "hello world42 x!y")).toDF("doc_id", "text"), "doc_id", "text")
      .collect()(0)
    assert(out.getLong(1) == 3L) // ws: hello, world42, x!y
    // re: hello, world, 42, x, !, y
    assert(out.getLong(2) == 6L)
  }

  test("unigram logprob averages ln(count/total) over token occurrences") {
    val df = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    // corpus counts: a=2, b=2, total=4
    val out = TextAnalysis.unigramLogProb(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected1 = BigDecimal((math.log(0.5) * 3) / 3)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == expected1)
    assert(out(2L) == expected1) // same per-token prob
  }

  test("bigram logprob conditions on the prefix word; short docs get NULL") {
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "solo")).toDF("doc_id", "text")
    // bigram counts: "a b"=2, "a c"=1; prefix-marginal c1("a")=3
    val rows = TextAnalysis.bigramLogProb(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), Option(r.get(2)))).toMap
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows(1L) == (1L, Some(r4(math.log(2.0 / 3)))))
    assert(rows(2L) == (1L, Some(r4(math.log(2.0 / 3)))))
    assert(rows(3L) == (1L, Some(r4(math.log(1.0 / 3)))))
    assert(rows(4L) == (0L, None), "a one-token doc has no bigrams, not a crash")
    // order sensitivity: identical token MULTISETS (unigram logprob ties)
    // but different orders diverge — doc 2's "a a" is the rare transition
    val ordered = Seq((1L, "a b a"), (2L, "a a b")).toDF("doc_id", "text")
    val s = TextAnalysis.bigramLogProb(ordered, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val u = TextAnalysis.unigramLogProb(ordered, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(u(1L) == u(2L), "unigrams cannot see word order")
    assert(s(2L) < s(1L), "the improbable ORDER must score lower")
  }

  test("ngram stats count occurrences WITH multiplicity and doc frequency") {
    val df = Seq((1L, "x y x y"), (2L, "x y z")).toDF("doc_id", "text")
    val rows = TextAnalysis.ngramStats(df, "doc_id", "text", n = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // "x y": 2 occurrences in doc 1 + 1 in doc 2
    assert(rows.head == ("x y", 3L, 2L))
    assert(rows.map(_._1).contains("y x")) // interior repeat bigram
  }

  test("duplicated-ngram coverage flags only grams shared across docs") {
    import graft.operators.Dedup
    val df = Seq(
      (1L, "a b c"),   // bigrams: {a b, b c}
      (2L, "b c d"),   // shares "b c" with doc 1
      (3L, "p q r"))   // shares nothing
      .toDF("doc_id", "text")
    val out = Dedup.duplicatedNgramCoverage(df, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L) == (2L, 0.5))
    assert(out(2L) == (2L, 0.5))
    assert(out(3L) == (2L, 0.0))
  }

  test("repetition signals keep sub-bigram docs with zero top_bigram_frac") {
    val df = Seq((1L, "hello"), (2L, "a a a a")).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L) == (0.0, 0.0)) // one token: no dup words, no bigrams — but PRESENT
    assert(out(2L)._1 == 0.75)    // 4 tokens, 1 distinct
    assert(out(2L)._2 == 1.0)     // "a a" is every bigram
  }

  test("tfidf ranks doc-specific terms above corpus-wide ones") {
    val df = Seq(
      (1L, "common common unique1 unique1 unique1"),
      (2L, "common common unique2"),
      (3L, "common filler words here")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // rank 1 for docs 1 and 2 must be their unique term, not "common"
    // (idf of a term in every doc is ln(1) = 0)
    assert(out.contains((1L, 1L, "unique1")))
    assert(out.contains((2L, 1L, "unique2")))
    assert(!out.exists { case (_, r, t) => t == "common" && r == 1L })
  }

  test("fingerprints: identical docs equal, different docs differ") {
    val df = Seq(
      (1L, "a long enough piece of text for fingerprinting windows"),
      (2L, "a long enough piece of text for fingerprinting windows"),
      (3L, "utterly different content that shares no window at all zzz"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprints(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("zipfSlope is negative on skewed corpora and totals check out") {
    // frequencies 8,4,2,1 over ranks 1..4 — a clean power-law decay
    val docs = Seq((1L, Array.fill(8)("alpha").mkString(" ") + " " +
      Array.fill(4)("beta").mkString(" ") + " " +
      Array.fill(2)("gamma").mkString(" ") + " delta"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.zipfSlope(docs, "text").collect()(0)
    assert(r.getDouble(0) < -1.0, s"power-law corpus should slope below -1: $r")
    assert(r.getLong(1) == 4L && r.getLong(2) == 15L)
  }

  test("dsirWeights tilts toward the target slice") {
    val df = Seq(
      (1L, "medical clinical trial", "tgt"),
      (2L, "medical clinical study", "tgt"),
      (3L, "random web junk words", "raw"),
      (4L, "medical clinical trial", "raw"))
      .toDF("doc_id", "text", "src")
    val out = TextAnalysis
      .dsirWeights(df, "doc_id", "text", org.apache.spark.sql.functions.col("src") === "tgt")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(4L)._1 == 3L && out(3L)._1 == 4L)
    // identical text ⇒ identical weight; target-looking ≫ junk
    assert(out(4L)._2 == out(1L)._2)
    assert(out(4L)._2 > out(3L)._2)
  }

  test("perplexityBuckets cuts each language into head/middle/tail by logprob") {
    // lang a: 'common' appears 6x, 'mid' 3x, rare words once — three docs
    // with strictly ordered unigram logprobs; lang b: two docs (sizes 1+1
    // under the floor cut: ranks 1,2 of n=2 -> buckets 0,1 -> head, middle)
    val df = Seq(
      (1L, "common common common", "a"),
      (2L, "common mid mid", "a"),
      (3L, "rare1 rare2 rare3", "a"),
      (4L, "common common mid", "b"),
      (5L, "rare4 rare5 rare6", "b"))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.perplexityBuckets(df, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(3))).toMap
    assert(out(1L) == ("a", "head"))
    assert(out(2L) == ("a", "middle"))
    assert(out(3L) == ("a", "tail"))
    assert(out(4L) == ("b", "head"))
    assert(out(5L) == ("b", "middle"))
  }


  test("perplexityBuckets keeps a NULL language as its own cohort") {
    val df = Seq(
      (1L, "common common common", Some("a")),
      (2L, "rare1 rare2 rare3", Some("a")),
      (3L, "common common rare4", None),
      (4L, "rare5 rare6 rare7", None))
      .toDF("doc_id", "text", "lang")
    val out = TextAnalysis.perplexityBuckets(df, "doc_id", "text", "lang")
      .collect().map(r => r.getLong(0) -> (Option(r.getString(1)), r.getString(3))).toMap
    // null-group rows must neither vanish nor merge into another cohort
    assert(out.keySet == Set(1L, 2L, 3L, 4L))
    assert(out(3L) == (None, "head"))
    assert(out(4L) == (None, "middle"))
    assert(out(1L) == (Some("a"), "head"))
    assert(out(2L) == (Some("a"), "middle"))
  }


  test("hashFeatures: deterministic signed bucket sums, token-count mass") {
    val df = Seq((1L, "alpha beta alpha"), (2L, "alpha beta alpha")).toDF("doc_id", "text")
    val out = TextAnalysis.hashFeatures(df, "doc_id", "text", dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val d1 = out.collect { case ((1L, d), v) => d -> v }.toMap
    val d2 = out.collect { case ((2L, d), v) => d -> v }.toMap
    // identical text ⇒ identical sparse vector; |values| sum ≤ 3 tokens
    assert(d1 == d2)
    assert(d1.values.map(math.abs).sum <= 3L)
    assert(d1.keys.forall(d => d >= 0 && d < 8))
    // 'alpha' lands twice in one bucket with one sign: some |value| == 2
    assert(d1.values.exists(v => math.abs(v) == 2L))
  }

  test("postings: df, total_tf and tie-broken top-k docs per token") {
    val df = Seq(
      (1L, "x x x y"), (2L, "x y"), (3L, "x x y"), (4L, "z")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.postings(df, "doc_id", "text", minDf = 2, k = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .toSet
    // x: df 3, total 6, top2 = doc1(tf3), doc3(tf2); y: df 3, total 3,
    // tf all 1 → tie breaks toward smaller doc id: doc1, doc2; z: df 1 cut
    assert(got == Set(
      ("x", 3L, 6L, 1L, 1L, 3L), ("x", 3L, 6L, 2L, 3L, 2L),
      ("y", 3L, 3L, 1L, 1L, 1L), ("y", 3L, 3L, 2L, 2L, 1L)))
    intercept[IllegalArgumentException](TextAnalysis.postings(df, "doc_id", "text", minDf = 0))
    intercept[IllegalArgumentException](TextAnalysis.postings(df, "doc_id", "text", k = 0))
  }

  test("postings plan: top-k is an aggregate heap, not a window sort") {
    val df = Seq((1L, "a b"), (2L, "a")).toDF("doc_id", "text")
    val plan = TextAnalysis.postings(df, "doc_id", "text", minDf = 1, k = 1)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("topk_by_score"), plan.take(600))
    assert(!plan.contains("Window"), plan.take(600))
  }

  test("pmiTopPairs: hand-computed window co-occurrence") {
    val df = Seq((1L, "a b a b"), (2L, "c d")).toDF("doc_id", "text")
    val out = TextAnalysis.pmiTopPairs(df, "text", window = 2, minCount = 2, k = 10)
      .collect()
    // pairs within distance 2: (a,b)x3 in doc 1 (self-pairs at distance 2
    // dropped), (c,d)x1 in doc 2; only (a,b) survives minCount=2.
    // PMI = ln(3 * 6 * 6 / (4 * 2 * 2)) = ln(6.75)
    assert(out.length == 1)
    val r = out(0)
    assert((r.getString(0), r.getString(1), r.getLong(2)) == ("a", "b", 3L))
    assert(math.abs(r.getDouble(3) - math.log(6.75)) < 5e-5)
  }

  test("pmiTopPairs matches brute force on a seeded random corpus") {
    val rnd = new scala.util.Random(7)
    val vocab = ('a' to 'j').map(_.toString)
    val docs = (1L to 30L).map(i =>
      (i, Seq.fill(5 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    val (window, minCount, k) = (3, 2, 20)
    val got = TextAnalysis.pmiTopPairs(docs.toDF("doc_id", "text"), "text",
        window, minCount, k)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val toks = docs.flatMap(_._2.split(" ", -1))
    val pairs = docs.flatMap { case (_, t) =>
      val w = t.split(" ", -1)
      for {
        i <- w.indices; j <- (i + 1) until math.min(i + window + 1, w.length)
        if w(i) != w(j)
      } yield if (w(i) < w(j)) (w(i), w(j)) else (w(j), w(i))
    }
    val cTok = toks.groupBy(identity).map { case (t, v) => t -> v.size.toLong }
    val want = pairs.groupBy(identity).toSeq
      .map { case ((u, v), occ) => (u, v, occ.size.toLong) }
      .filter(_._3 >= minCount)
      .map { case (u, v, c) =>
        val raw = c.toDouble * toks.size * toks.size / (pairs.size.toDouble * cTok(u) * cTok(v))
        (u, v, c, BigDecimal(math.log(raw)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (u, v, _, pmi) => (-pmi, u, v) }
      .take(k)
    assert(got.toSeq == want)
  }

  test("pmiTopPairs: top-k is a TakeOrdered, never a global sort") {
    val df = Seq((1L, "x y z x y")).toDF("doc_id", "text")
    val plan = TextAnalysis.pmiTopPairs(df, "text")
      .queryExecution.executedPlan.toString()
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
    assert(!plan.contains("CartesianProduct"), plan.take(600))
  }

  test("pmiTopPairs rejects bad parameters") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException](TextAnalysis.pmiTopPairs(df, "text", window = 0))
    intercept[IllegalArgumentException](TextAnalysis.pmiTopPairs(df, "text", minCount = 0))
    intercept[IllegalArgumentException](TextAnalysis.pmiTopPairs(df, "text", k = 0))
  }

  test("bm25TopK matches a hand-computed reference on a tiny corpus") {
    // 3 docs, query {cat}: df(cat)=2, N=3, avgdl = (2+3+1)/3 = 2.0
    val df = Seq((1L, "cat dog"), (2L, "cat cat dog"), (3L, "fish"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(df, "doc_id", "text", Seq("cat"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val idf = math.log((3.0 - 2 + 0.5) / (2 + 0.5) + 1.0)
    def w(tf: Long, dl: Long): Double = {
      val raw = idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / 2.0))
      BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    // doc 2 (tf=2) outscores doc 1 (tf=1, shorter); doc 3 has no hit
    assert(got == Seq((2L, w(2, 3)), (1L, w(1, 2))))
    intercept[IllegalArgumentException](
      TextAnalysis.bm25TopK(df, "doc_id", "text", Seq.empty))
    intercept[IllegalArgumentException](
      TextAnalysis.bm25TopK(df, "doc_id", "text", Seq("cat"), k = 0))
  }

  test("bm25TopK: top-k is a TakeOrdered, tf filter precedes its exchange") {
    val df = Seq((1L, "cat dog")).toDF("doc_id", "text")
    val qe = TextAnalysis.bm25TopK(df, "doc_id", "text", Seq("cat"))
      .queryExecution
    assert(qe.executedPlan.toString().contains("TakeOrderedAndProject"))
    // the isin filter must sit below the (tok, doc_id) aggregate in the
    // optimized plan — only query-term tokens cross that exchange
    val opt = qe.optimizedPlan.toString()
    val aggIdx = opt.indexOf("Aggregate [tok")
    val filtIdx = opt.indexOf("tok#", opt.indexOf("Filter"))
    assert(aggIdx >= 0 && opt.indexOf("Filter", aggIdx) > aggIdx,
      s"tf filter not below the grouped exchange:\n${opt.take(900)}")
    assert(filtIdx >= 0)
  }

  test("readability: vowel-group syllables, sentence floor, exact formula") {
    val df = Seq(
      (1L, "The cat sat. It ran!"),   // 5 words, 2 sentences, syllables: e,a,a,i,a = 5
      (2L, "xyz qrs")                 // no vowels (y counts!): "xyz" has y → 1 run
    ).toDF("doc_id", "text")
    val got = TextAnalysis.readability(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(_._1)
    def flesch(w: Long, s: Long, sy: Long): Double =
      BigDecimal(206.835 - 1.015 * (w.toDouble / s) - 84.6 * (sy.toDouble / w))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) == ((1L, 5L, 2L, 5L, flesch(5, 2, 5))))
    // "xyz qrs": y is a vowel-run; no terminators → sentence floor 1
    assert(got(1) == ((2L, 2L, 1L, 1L, flesch(2, 1, 1))))
  }

  test("readability is map-only: zero exchanges") {
    val df = Seq((1L, "a b c.")).toDF("doc_id", "text")
    val plan = TextAnalysis.readability(df, "doc_id", "text")
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), plan.take(600))
  }

  test("jsDivergence: identical slices → 0, disjoint vocabularies → ln 2") {
    val same = Seq((1L, "a", "x y z"), (2L, "b", "x y z"))
      .toDF("id", "g", "text")
    val r0 = TextAnalysis.jsDivergence(same, "text", org.apache.spark.sql.functions.col("g") === "a").collect()(0)
    assert(r0.getDouble(4) == 0.0)
    assert(r0.getLong(2) == 3L && r0.getLong(3) == 3L, "all vocab shared")

    val disjoint = Seq((1L, "a", "x x y"), (2L, "b", "p q q"))
      .toDF("id", "g", "text")
    val r1 = TextAnalysis.jsDivergence(disjoint, "text", org.apache.spark.sql.functions.col("g") === "a").collect()(0)
    assert(math.abs(r1.getDouble(4) - math.log(2)) < 1e-6, // output is 6 dp
      s"disjoint slices peg the bound: ${r1.getDouble(4)}")
    assert(r1.getLong(2) == 0L && r1.getLong(3) == 4L)
    assert(r1.getLong(0) == 3L && r1.getLong(1) == 3L)
  }

  test("rakeKeyphrases scores phrases by summed deg/freq of member words") {
    // stopword 'and' splits phrases; 'apples' appears in 3 phrases
    // (freq 3, deg 2+2+1=5), 'red'/'green' in one 2-word phrase each
    // (score 2). "red apples" = 2 + 5/3; bare "apples" = 5/3.
    val df = Seq(
      (1L, "red apples and green apples"),
      (2L, "apples"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.rakeKeyphrases(df, "text", k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val r6 = (x: Double) =>
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq(
      ("green apples", 1L, r6(2 + 5.0 / 3)),
      ("red apples", 1L, r6(2 + 5.0 / 3)),
      ("apples", 1L, r6(5.0 / 3))),
      s"got ${got.mkString(",")}")
    // phrases longer than maxLen are dropped from candidates entirely
    val long = Seq((1L, "one two three four five")).toDF("doc_id", "text")
    assert(TextAnalysis.rakeKeyphrases(long, "text", k = 10, maxLen = 4).count() == 0)
    intercept[IllegalArgumentException](TextAnalysis.rakeKeyphrases(df, "text", k = 0))
  }

  test("gramNovelty credits grams to their minimum-id first owner") {
    val df = Seq(
      (1L, "a b c"),   // grams {a b, b c}: both first-owned → 1.0
      (2L, "a b x"),   // {a b (owned by 1), b x} → 0.5
      (3L, "z"))       // shorter than n → no grams, no row
      .toDF("doc_id", "text")
    val got = TextAnalysis.gramNovelty(df, "doc_id", "text", n = 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == Map(
      1L -> ((2L, 2L, 1.0)),
      2L -> ((2L, 1L, 0.5))))
  }

  test("oovRate counts tokens outside the deterministic top-k vocabulary") {
    // vocab k=2: 'a' (4 uses) and 'b' (2) — 'c' (2) loses the tie to 'b'
    // on the token tiebreak, so every 'c' and 'z' is OOV
    val df = Seq(
      (1L, "a a b c"),
      (2L, "a a b c z"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.oovRate(df, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(1L -> ((4L, 1L, 0.25)), 2L -> ((5L, 2L, 0.4))))
  }

  test("bpe trainer learns merges in frequency order with lexicographic ties") {
    // "abab" ×3 + "ab" ×2: round 1 pairs (freq-weighted): (a,b) 3·2+2·1 = 8,
    // (b,a) 3. Merge (a,b) → "ab". Round 2: (ab,ab) 3. Merge. Round 3:
    // no pairs left → trainer stops early with 2 merges.
    val df = Seq((1L, "abab abab ab"), (2L, "abab ab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(df, "text", rounds = 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, "a", "b", 8L), (2L, "ab", "ab", 3L)))
  }

  test("bpe merge application is boundary-safe under adjacent repeats") {
    // "a b a b" must merge to "ab ab" (the resume-after-replace scan must
    // not consume the second pair's shared boundary), and a (b,a) pattern
    // must never false-match across the ab|ab symbol boundary
    val df = Seq((1L, "abab abab abab ba")).toDF("doc_id", "text")
    val stats = TextAnalysis.bpeEncodeStats(df, "text", rounds = 2)
      .collect()(0)
    // 4 words, chars = 3·4 + 2 = 14; after (a,b)→ab and (ab,ab)→abab:
    // "abab"→1 symbol ×3, "ba"→2 symbols → 5 symbols
    assert((stats.getLong(0), stats.getLong(1), stats.getLong(2)) == ((4L, 14L, 5L)))
    assert(math.abs(stats.getDouble(3) - 5.0 / 14.0) < 1e-6)
  }

  test("bpe non-alphabetic tokens are excluded from training") {
    val df = Seq((1L, "xy xy 12 x!y")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(df, "text", rounds = 1).collect()
    assert(got.length == 1)
    assert((got(0).getString(1), got(0).getString(2), got(0).getLong(3)) == (("x", "y", 2L)))
  }

  test("bpe excludes newline-bearing tokens (Java $ vs RE2 end-of-text anchor parity)") {
    // Java's $ matches before a trailing line terminator, so "ab\n" would
    // slip through a ^[a-z]+$ filter (and its \n would leak into the symbol
    // stream) while the RE2-based oracle excludes it — the \A..\z anchors
    // must keep both engines agreeing
    val df = Seq((1L, "ab\n ab xy")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrain(df, "text", rounds = 1).collect()
    assert(got.length == 1)
    assert((got(0).getString(1), got(0).getString(2), got(0).getLong(3)) == (("a", "b", 1L)))
  }
}
