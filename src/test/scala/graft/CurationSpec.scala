package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta", "s1"),
    (2L, "alpha beta gamma completely different tail here", "s1"),
    (3L, "nothing shared with anybody at all today", "s2"),
    (4L, "alpha beta gamma delta epsilon zeta", "s2")) // exact dup of 1
    .toDF("doc_id", "text", "source")

  test("decontaminate flags docs sharing a 3-gram with the eval set") {
    val eval = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val out = Curation.decontaminate(corpus, eval, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    // doc 1/4 share "alpha beta gamma" + "beta gamma delta"; doc 2 shares one
    assert(out(1L) == (2L, true))
    assert(out(4L) == (2L, true))
    assert(out(2L) == (1L, true))
    assert(out(3L) == (0L, false))
  }

  test("piiRedact counts and masks emails, IPs and phone numbers") {
    val df = Seq(
      (1L, "mail me at a.b@ex.com or 10.0.0.1 or 555-123-4567 ok"),
      (2L, "no pii here just words 1234"))
      .toDF("doc_id", "text")
    val out = Curation.piiRedact(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L)._1 == 3L)
    assert(out(1L)._2 == "mail me at <PII> or <PII> or <PII> ok")
    assert(out(2L) == (0L, "no pii here just words 1234"))
  }

  test("sampleWeightedPriority selects the exact k-smallest u/w keys") {
    import org.apache.spark.sql.functions.{col, lit}
    // 40 ids with weights cycling 1,2,5,10; weight-0 and NULL-weight rows
    // must be excluded regardless of how small their hash draw is
    val rows = (1L to 40L).map(i => (i, (Seq(1, 2, 5, 10)((i % 4).toInt)): java.lang.Integer)) ++
      Seq((100L, (0: java.lang.Integer)), (101L, (null: java.lang.Integer)))
    val df = rows.toDF("doc_id", "w")
    val got = Curation.sampleWeightedPriority(df, "doc_id", col("w"), k = 7)
      .collect().map(_.getLong(0))
    // independent reference: the same hash-uniform / weight priority
    // computed with java MessageDigest, sorted, first 7
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = rows.filter(r => r._2 != null && r._2 > 0).map { case (id, w) =>
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      val u = (java.lang.Long.parseLong(hex, 16).toDouble + 1.0) / 4294967296.0
      (u / w.toDouble, id)
    }.sorted.take(7).map(_._2)
    assert(got.toSeq == expect.toSeq)
    // reruns agree (pure function of id + weight)
    val again = Curation.sampleWeightedPriority(df, "doc_id", col("w"), k = 7)
      .collect().map(_.getLong(0))
    assert(again.toSeq == expect.toSeq)
    intercept[IllegalArgumentException](
      Curation.sampleWeightedPriority(df, "doc_id", lit(1), k = 0))
  }

  test("sampleDeterministic is a pure function of the id") {
    val df = (0L until 1000L).toDF("doc_id")
    val a = Curation.sampleDeterministic(df, "doc_id").collect().map(_.getLong(0)).toSet
    val b = Curation.sampleDeterministic(df, "doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
    // ~20% with hash-uniform spread
    assert(a.size > 120 && a.size < 280)
    // union of all buckets is a partition of the input
    val all = (0 until 5).flatMap(k =>
      Curation.sampleDeterministic(df, "doc_id", 5, k).collect().map(_.getLong(0)))
    assert(all.length == 1000 && all.toSet.size == 1000)
  }

  test("sampleStratified applies per-stratum rates and is deterministic") {
    import graft.operators.Curation
    val df = (0 until 1000)
      .map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "source")
    def run() = Curation.sampleStratified(
        df, "doc_id", "source", Map("a" -> 8), buckets = 10, defaultKeep = 2)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val kept = run()
    val byStratum = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // 500 docs per stratum; hash buckets ≈ uniform → a ≈ 400, b ≈ 100
    assert(byStratum("a") > 300 && byStratum("a") < 500)
    assert(byStratum("b") > 50 && byStratum("b") < 150)
    assert(run().toSet == kept.toSet) // pure function of the id
  }

  test("chunkDocuments covers every token with the declared overlap") {
    import graft.operators.Curation
    val words = (1 to 150).map(i => s"w$i")
    val df = Seq((1L, words.mkString(" ")), (2L, "tiny doc")).toDF("doc_id", "text")
    val out = Curation.chunkDocuments(df, "doc_id", "text", chunkTokens = 64, overlap = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val doc1 = out.filter(_._1 == 1L).sortBy(_._2)
    // 150 tokens, step 56 → ceil((150-8)/56) = 3 chunks: 64, 64, 150-112=38
    assert(doc1.map(c => (c._2, c._3)).toSeq == Seq((0L, 64L), (1L, 64L), (2L, 38L)))
    assert(doc1(1)._4.startsWith("w57 ")) // chunk 1 starts at token 57 (8-token overlap)
    assert(doc1(2)._4.endsWith(" w150")) // full coverage
    val doc2 = out.filter(_._1 == 2L)
    assert(doc2.map(c => (c._2, c._3)).toSeq == Seq((0L, 2L)))
  }

  test("packSequences fills bins in id order within each group") {
    // tokens: id1=2, id2=3, id3=2; budget 4 ⇒ id1 starts at 0 (bin 0),
    // id2 starts at 2 (bin 0), id3 starts at 5 (bin 1)
    val df = Seq(
      (1L, "a b", "g"),
      (2L, "c d e", "g"),
      (3L, "f g", "g"))
      .toDF("doc_id", "text", "source")
    val out = Curation.packSequences(df, "doc_id", "text", "source", 4)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(("g", 0L)) == (2L, 5L))
    assert(out(("g", 1L)) == (1L, 2L))
  }

  test("packSequences packs duplicate (group, id) rows sequentially (ROWS frame)") {
    import graft.operators.Curation
    // two docs sharing an id: a RANGE-framed running sum would give both
    // cum=10 → both land in bin 1 and bin 0 stays empty
    val df = Seq(
      (1L, "a b c d e", "g"),
      (1L, "a b c d e", "g"))
      .toDF("doc_id", "text", "source")
    val bins = Curation.packSequences(df, "doc_id", "text", "source", budgetTokens = 4)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(bins == Map(0L -> 1L, 1L -> 1L), s"got $bins")
  }

  test("vocabulary returns top-k tokens with deterministic tie-break") {
    val df = Seq("x x x y y z", "y w").toDF("text")
    val out = Curation.vocabulary(df, "text", 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("x", 3L), ("y", 3L), ("w", 1L)))
  }

  test("quantizeInt8 codes are exact floor(x*127/max) and bounded to [-127,127]") {
    import graft.operators.Similarity
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f)),
      (2L, Seq(0.0f, 0.0f, 0.0f))) // zero vector guard
      .toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getSeq[Long](2))).toMap
    assert(out(1L)._2 == Seq(127L, -64L, 31L)) // floor semantics: -63.5 → -64
    assert(out(1L)._1 == 1.0 / 127.0)
    assert(out(2L)._2 == Seq(0L, 0L, 0L))
    assert(out(2L)._1 == 0.0)
  }

  test("streaming exact dedup emits only first-seen content") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.CorpusStream
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val stream = MemoryStream[(Long, String, Timestamp)]
    stream.addData(Seq(
      (1L, "same text", ts(0)),
      (2L, "same text", ts(1)),  // dup inside the watermark → dropped
      (3L, "other text", ts(2))))
    val q = CorpusStream.dedupExactStreaming(
        stream.toDF().toDF("doc_id", "text", "ts"), "text", "ts")
      .writeStream.format("memory").queryName("dedup_stream_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val ids = spark.table("dedup_stream_out").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 3L))
    } finally q.stop()
  }

  test("streaming snapshot diff labels added/changed, drops unchanged, never 'removed'") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.CorpusStream
    implicit val sqlCtx = spark.sqlContext
    val prior = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "s", "v")
    val stream = MemoryStream[(Long, String, Double)]
    stream.addData(Seq(
      (1L, "a", 10.0),  // unchanged → dropped
      (2L, "b", 21.0),  // changed
      (3L, "c", 30.0))) // added
    val q = CorpusStream.snapshotDiffStreaming(
        stream.toDF().toDF("k", "s", "v"), prior, "k", Seq("s", "v"))
      .writeStream.format("memory").queryName("cdc_stream_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val out = spark.table("cdc_stream_out").collect()
        .map(r => r.getLong(0) -> r.getString(3)).toMap
      assert(out == Map(2L -> "changed", 3L -> "added"))
    } finally q.stop()
  }

  test("basketLift: planted always-together pair tops the ranking; lift arithmetic exact") {
    import graft.operators.Joins
    graft.functions.GraftFunctions.registerAll(spark)
    // items 1,2 co-occur in all 4 of their baskets; item 3 is everywhere
    // (lift vs 3 ≈ 1); repeated (basket, item) rows must dedupe
    val rows = (1 to 4).flatMap(b =>
      Seq((b.toLong, 1L), (b.toLong, 1L), (b.toLong, 2L), (b.toLong, 3L))) ++
      (5 to 8).map(b => (b.toLong, 3L))
    val out = Joins.basketLift(rows.toDF("bk", "itm"), "bk", "itm",
        minPairs = 2, k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // lift(1,2) = 4·8/(4·4) = 2.0 — the exclusive pair beats the
    // with-the-staple pairs, lift(1,3) = 4·8/(4·8) = 1.0
    assert(out.head == ((1L, 2L, 4L, 2.0)), s"got ${out.mkString(",")}")
    assert(out.toSeq.drop(1).map(t => (t._1, t._2, t._4)).toSet ==
      Set((1L, 3L, 1.0), (2L, 3L, 1.0)))
  }

  test("salted join equals the plain join; left rows survive unmatched; bad types rejected") {
    import graft.operators.Joins
    import org.apache.spark.sql.functions.col
    val big = (1L to 200L).map(i => (i % 7, i)).toDF("k", "v")        // key 0..6, skewed-ish
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "tag") // keys 3..6 unmatched
    val plain = big.join(small, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = Joins.saltedJoin(big, small, "k", salts = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    val left = Joins.saltedJoin(big, small, "k", salts = 5, joinType = "left")
    assert(left.count() == 200, "every big row exactly once under left join")
    assert(left.filter(col("tag").isNull).count() == big.filter(col("k") > 2).count())
    intercept[IllegalArgumentException](Joins.saltedJoin(big, small, "k", 5, "full"))
  }

  test("deterministic shuffle assigns each row a unique stable global rank") {
    import graft.operators.Curation
    val docs = Tables.load(spark, TestSpark.sf, "documents").select("doc_id")
    val r1 = Curation.shuffleDeterministic(docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap // doc_id -> rank
    val n = docs.count()
    assert(r1.values.toSeq.sorted == (1L to n).toSeq, "ranks are a permutation of 1..n")
    graft.operators.PipelineCache.clear()
    val r2 = Curation.shuffleDeterministic(docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == r2, "order must be identical across runs")
  }

  test("token-budget sampling keeps a stable hash-order prefix within budget") {
    import graft.operators.Curation
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, TestSpark.sf, "documents").select("doc_id", "text")
    val budget = 5000L
    val out = Curation.sampleTokenBudget(docs, "doc_id", "text", budget)
      .select(col("doc_id"), col("run_tokens")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty && out.values.max <= budget)
    // the kept set is the PREFIX of the shuffle order: every kept doc ranks
    // before every dropped doc under the shared hash-of-id total order
    graft.operators.PipelineCache.clear()
    val rank = Curation.shuffleDeterministic(docs.select("doc_id"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val keptRanks = out.keySet.map(rank)
    val maxKept = keptRanks.max
    assert(keptRanks == (1L to maxKept).toSet,
      "kept docs must be a contiguous rank prefix")
    // rerun agrees exactly
    graft.operators.PipelineCache.clear()
    val out2 = Curation.sampleTokenBudget(docs, "doc_id", "text", budget)
      .select(col("doc_id"), col("run_tokens")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == out2)
  }

  test("pack_chunks: every window but the tail is exactly full, totals and spans reconcile") {
    import graft.operators.Curation
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, TestSpark.sf, "documents").select("doc_id", "text")
    val cap = 2048L
    val windows = Curation.packChunks(docs, "doc_id", "text", cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(windows.nonEmpty)
    // window ids are contiguous from 0
    assert(windows.map(_._1).toSeq == windows.indices.map(_.toLong))
    // every window except the last holds exactly `cap` tokens (zero
    // padding is the concat-and-chunk contract); the tail holds the rest
    windows.init.foreach { case (w, _, nt, _) =>
      assert(nt == cap, s"window $w holds $nt tokens, expected $cap") }
    assert(windows.last._3 >= 1 && windows.last._3 <= cap)
    // token total reconciles with the corpus
    val corpusTokens = docs
      .selectExpr("sum(size(split(text, ' ')))").collect()(0).getLong(0)
    assert(windows.map(_._3).sum == corpusTokens)
    // docs tile the stream contiguously, so each of the W-1 internal
    // window boundaries is crossed by AT MOST one doc (zero when a doc
    // ends exactly on it) and every crossing adds exactly one extra
    // window-touch: nDocs <= sum(n_docs) <= nDocs + W - 1
    val nDocs = docs.count()
    val touches = windows.map(_._2).sum
    assert(touches >= nDocs && touches <= nDocs + windows.length - 1,
      s"window touches $touches outside [$nDocs, ${nDocs + windows.length - 1}]")
    // determinism across runs
    graft.operators.PipelineCache.clear()
    val again = Curation.packChunks(docs, "doc_id", "text", cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(windows.toSeq == again.toSeq)
  }

  test("streaming near-dup filter flags only docs near-duplicating the static reference") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.CorpusStream
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val base =
      "the quick brown fox jumps over the lazy dog and runs far away into the green forest " +
      "tonight while seven wizards watch quietly from the old stone tower beside the river"
    val ref = Seq((100L, base), (101L, "benchmark question about ancient rome and its emperors " +
      "during the long imperial centuries of expansion and decline across the mediterranean"))
      .toDF("ref_id", "ref_text")
    val stream = MemoryStream[(Long, String, Timestamp)]
    stream.addData(Seq(
      (1L, base.replace("wizards", "sorcerers"), ts(0)),   // REWORDED near-dup of ref 100
      (2L, "totally unrelated text about spark query planning and columnar execution with " +
        "shuffles exchanges and adaptive replanning in the optimizer pipeline", ts(1)),
      (3L, base, ts(2))))                                  // exact shingle match of ref 100
    val q = CorpusStream.nearDupHitsStreaming(
        stream.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts",
        ref, "ref_id", "ref_text", threshold = 0.5)
      .writeStream.format("memory").queryName("neardup_stream_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("neardup_stream_out").collect()
      val byId = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(rows.length == 2, s"each flagged doc emits exactly once: ${rows.mkString(",")}")
      assert(byId.keySet == Set(1L, 3L), s"got $byId")
      assert(byId.values.toSet == Set(100L), "witness must be the near-dup'd ref doc")
    } finally q.stop()
  }

  test("fuzzy pairs: exact recall at distance 1 across sub/ins/del; no distance-2 leakage") {
    import graft.operators.Joins
    val recs = Seq(
      (1L, "acme corp"),   // base
      (2L, "acme corp"),   // exact duplicate → dist 0
      (3L, "acme korp"),   // one substitution → dist 1
      (4L, "acme corps"),  // one insertion → dist 1
      (5L, "acme cor"),    // one deletion → dist 1
      (6L, "acme kords"),  // two edits from base → excluded
      (7L, "zenith ltd"))  // unrelated
      .toDF("rid", "name")
    val got = Joins.fuzzyPairs(recs, "rid", "name")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // brute-force expected set over all pairs
    val all = recs.collect().map(r => (r.getLong(0), r.getString(1)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val expect = (for {
      (ia, sa) <- all; (ib, sb) <- all if ia < ib
      dist = lev(sa, sb) if dist <= 1
    } yield ((ia, ib), dist.toLong)).toMap
    assert(got == expect, s"got $got expected $expect")
    assert(got(((1L, 2L))) == 0L && got(((1L, 3L))) == 1L &&
      got(((1L, 4L))) == 1L && got(((1L, 5L))) == 1L)
    assert(!got.contains((1L, 6L)) && !got.contains((1L, 7L)))
  }

  test("resolveEntities: golden record per multi-member cluster, singletons omitted") {
    import graft.operators.Joins
    val recs = Seq(
      (3L, "acme korp"),   // clusters with 1,5 through "acme corp"
      (1L, "acme corp"),
      (5L, "acme cor"),
      (9L, "beta inc"),    // exact-duplicate pair
      (8L, "beta inc"),
      (7L, "zenith ltd"))  // singleton → omitted
      .toDF("rid", "name")
    val got = Joins.resolveEntities(recs, "rid", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 3L, "1,3,5", "acme corp"),   // canonical = min id's name
      (8L, 2L, "8,9", "beta inc")))
  }

  test("keepBestPerCluster keeps the quality argmax, ties to smaller id, singletons stay") {
    import graft.operators.Curation
    val docs = Seq(
      (1L, 10L), (2L, 50L), (3L, 50L),  // cluster {1,2,3}: best score 50, tie → id 2
      (7L, 5L),                         // singleton keeps itself
      (8L, 9L), (9L, 30L))              // cluster {8,9}: 9 wins on score
      .toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("id_a", "id_b")
    val got = Curation.keepBestPerCluster(docs, "doc_id", "n_chars", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 3L, 2L, 50L),
      (7L, 1L, 7L, 5L),
      (8L, 2L, 9L, 30L)))
  }

  test("blockingRecallEval witnesses the deletion-neighborhood completeness proof") {
    import graft.operators.Joins
    // truth: (1,2) substitution, (3,4) deletion; (5) isolated
    val recs = Seq(
      (1L, "abc"), (2L, "abd"), (3L, "xyz"), (4L, "xy"), (5L, "qqqqq"))
      .toDF("rid", "name")
    val r = Joins.blockingRecallEval(recs, "rid", "name").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((2L, 2L, 1.0)))
  }

  test("fuzzyPairs blockCols: only records agreeing on every block column can pair") {
    import graft.operators.Joins
    val recs = Seq(
      (1L, "acme corp", "US", "auto"),
      (2L, "acme korp", "US", "auto"),  // dist 1, same block → pair
      (3L, "acme corp", "DE", "auto"),  // exact name, different nation → no pair
      (4L, "acme corp", "US", "bank"))  // exact name, different segment → no pair
      .toDF("rid", "name", "nation", "segment")
    val got = Joins.fuzzyPairs(recs, "rid", "name", Seq("nation", "segment"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
    // same data unblocked: every name pair within distance 1 appears
    val unblocked = Joins.fuzzyPairs(recs, "rid", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(unblocked == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("resolveEntities refuses a transitive mega-merge instead of emitting it") {
    import graft.operators.Joins
    // near-sequential identifiers: rec-1 .. rec-9 chain pairwise at edit
    // distance 1 even though they are distinct entities — the classic
    // weak-key failure resolveEntities must not answer with one cluster
    val recs = (1L to 9L).map(i => (i, s"rec-$i")).toDF("rid", "name")
    val e = intercept[IllegalStateException] {
      Joins.resolveEntities(recs, "rid", "name", maxClusterSize = 4).collect()
    }
    assert(e.getMessage.contains("maxClusterSize") && e.getMessage.contains("blockCols"))
  }

  test("NB quality classifier ranks reference-like docs above off-vocabulary docs") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    // reference class (ids 0,7): a distinctive "clean" vocabulary; the
    // probe doc 1 shares it, the probe doc 2 uses disjoint junk tokens —
    // the classifier must separate them by log-odds
    val clean = "the curated encyclopedia article discusses verified history with careful sources"
    val junk = "zzz qqq spam spam buy now click here winner zzz qqq spam"
    val docs = Seq(
      (0L, clean), (7L, clean + " and more verified careful sources"),
      (1L, "article discusses verified history with careful sources"),
      (2L, junk), (3L, junk + " free prize")).toDF("doc_id", "text")
    val scores = Curation.qualityNBScores(docs, "doc_id", "text",
        pmod(col("doc_id"), lit(7L)) === 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.size == 5)
    assert(scores(1L) > scores(2L),
      s"reference-vocabulary doc must outscore junk: ${scores.toSeq.sorted}")
    assert(scores(1L) > scores(3L))
    // scoring is deterministic across runs
    val again = Curation.qualityNBScores(docs, "doc_id", "text",
        pmod(col("doc_id"), lit(7L)) === 0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == scores)
  }

  test("streaming near-dup over a SAVED index flags the same docs as the in-memory path") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Dedup
    import graft.streaming.CorpusStream
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val base =
      "the quick brown fox jumps over the lazy dog and runs far away into the green forest " +
      "tonight while seven wizards watch quietly from the old stone tower beside the river"
    val ref = Seq((100L, base), (101L, "benchmark question about ancient rome and its emperors " +
      "during the long imperial centuries of expansion and decline across the mediterranean"))
      .toDF("ref_id", "ref_text")
    val idxDir = java.nio.file.Files.createTempDirectory("graft_stream_idx").toString
    Dedup.saveMinhashIndex(ref, "ref_id", "ref_text", idxDir)
    val (sets, buckets) = Dedup.loadMinhashIndex(spark, idxDir)
    val stream = MemoryStream[(Long, String, Timestamp)]
    stream.addData(Seq(
      (1L, base.replace("wizards", "sorcerers"), ts(0)), // REWORDED near-dup of ref 100
      (2L, "totally unrelated text about spark query planning and columnar execution with " +
        "shuffles exchanges and adaptive replanning in the optimizer pipeline", ts(1)),
      (3L, base, ts(2))))                                // exact shingle match of ref 100
    val q = CorpusStream.nearDupHitsStreamingIndexed(
        stream.toDF().toDF("doc_id", "text", "ts"), "doc_id", "text", "ts",
        sets, buckets, threshold = 0.5)
      .writeStream.format("memory").queryName("neardup_idx_stream_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("neardup_idx_stream_out").collect()
      val byId = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(rows.length == 2, s"each flagged doc emits exactly once: ${rows.mkString(",")}")
      assert(byId.keySet == Set(1L, 3L), s"got $byId")
      assert(byId.values.toSet == Set(100L), "witness must be the near-dup'd ref doc")
    } finally q.stop()
  }

  test("streaming curation dedups, redacts PII, filters quality and language") {
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.CorpusStream
    implicit val sqlCtx = spark.sqlContext
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    val good = Seq.fill(12)("the quick brown fox jumps over the lazy dog today again")
      .mkString(" ") // long + English → quality 1.0
    val stream = MemoryStream[(Long, String, Timestamp)]
    stream.addData(Seq(
      (1L, good + " mail me at a@b.com", ts(0)),
      (2L, good + " mail me at a@b.com", ts(1)), // exact dup → dropped
      (3L, "short", ts(2)),                      // quality fail
      (4L, Seq.fill(40)("el la de que y en los del se las por un una es").mkString(" "), ts(3)))) // es → lang fail
    val q = CorpusStream.curateStreaming(
        stream.toDF().toDF("doc_id", "text", "ts"),
        "doc_id", "text", "ts", minQuality = 0.5, keepLangs = Set("en"))
      .writeStream.format("memory").queryName("curate_stream_out")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("curate_stream_out").collect()
      assert(rows.map(_.getLong(0)).toSet == Set(1L))
      val text = rows(0).getString(rows(0).fieldIndex("text"))
      assert(text.contains("<PII>") && !text.contains("a@b.com"))
    } finally q.stop()
  }

  test("end-to-end pipeline: clean -> cap -> chunk -> partitioned sink round-trips") {
    import graft.operators.{Curation, Sinks}
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val eval = Seq((900001L, "completely disjoint benchmark text nothing shared"))
      .toDF("doc_id", "text")
    val cleaned = Curation.cleanCorpus(docs, "doc_id", "text", eval, minQuality = 0.0)
    val capped = Curation.capPerGroup(cleaned, "doc_id", "source", k = 5)
    val chunks = Curation.chunkDocuments(capped, "doc_id", "text")
      .join(capped.select("doc_id", "source"), "doc_id")
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_pipeline_e2e"
    val manifest = Sinks.writePartitioned(chunks, out, "source")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every surviving source wrote a partition; chunk counts are positive
    // and bounded by cap × max-chunks-per-doc
    assert(manifest.nonEmpty)
    assert(manifest.values.forall(n => n > 0 && n <= 5 * 20))
    // the written corpus reads back with the chunk schema intact
    val back = spark.read.parquet(out)
    assert(back.columns.toSet == Set("doc_id", "chunk_idx", "n_tokens", "chunk_text", "source"))
    assert(back.count() == manifest.values.sum)
  }

  test("temperatureMix lifts tail groups toward uniform, shares sum to 1") {
    import graft.operators.Curation
    val df = (Seq.fill(90)("big") ++ Seq.fill(10)("small")).zipWithIndex
      .map { case (g, i) => (i.toLong, g) }.toDF("id", "g")
    val out = Curation.temperatureMix(df, "g", temperature = 3.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (_, pBig, qBig, wBig) = out("big")
    val (_, pSmall, qSmall, wSmall) = out("small")
    assert(pBig == 0.9 && pSmall == 0.1)
    // temperature pulls toward uniform without crossing it
    assert(qBig < pBig && qBig > 0.5, s"big share shrinks: $qBig")
    assert(qSmall > pSmall && qSmall < 0.5, s"small share grows: $qSmall")
    assert(math.abs(qBig + qSmall - 1.0) < 1e-4, "target shares normalize")
    assert(wSmall > 1.0 && wBig < 1.0, "sample_weight up-samples the tail")

    // extreme tail: a share below the 6-dp display grid (p ≈ 3e-7) must
    // STILL get a real positive up-weight — the power runs on the raw
    // share, not a pre-rounded one that would collapse to 0 and NULL the
    // weight for exactly the group this op exists to lift
    val extreme = spark.range(3000000L).selectExpr("id", "'big' AS g")
      .unionAll(spark.range(1L).selectExpr("id + 9000000 AS id", "'tiny' AS g"))
    val tiny = Curation.temperatureMix(extreme, "g", temperature = 3.0)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), Option(r.get(4)).map(_.asInstanceOf[Double]))).toMap
    assert(tiny("tiny")._1 == 0.0, "displayed p rounds to 0 at 6 dp")
    assert(tiny("tiny")._2.exists(_ > 1.0),
      s"the sub-grid tail still gets a real up-weight: ${tiny("tiny")}")
  }

  test("compactFiles merges splinters into the content-sized file count") {
    import graft.operators.Sinks
    val tmp = System.getProperty("java.io.tmpdir")
    val frag = s"$tmp/graft_test_frag"
    val out = s"$tmp/graft_test_compact"
    // 100 rows x 1000 bytes over 50 splinter files → ceil(100000/30000)=4
    (0L until 100L).map(i => (i, 1000L)).toDF("id", "nbytes")
      .repartition(50).write.mode("overwrite").parquet(frag)
    assert(spark.read.parquet(frag)
      .select(org.apache.spark.sql.functions.input_file_name())
      .distinct().count() == 50)
    val m = Sinks.compactFiles(spark.read.parquet(frag), out, "nbytes", 30000L)
      .collect()(0)
    assert(m.getLong(0) == 4L, s"4 compacted files, got ${m.getLong(0)}")
    assert(m.getLong(1) == 100L && m.getLong(2) == 100000L, "content survives")
  }

  test("zorderWrite: files carry disjoint z-ranges; block boxes tighter than global") {
    import graft.operators.Sinks
    import org.apache.spark.sql.functions.{col, input_file_name, max => fmax, min => fmin}
    // a 32×32 grid: every (x, y) cell once — locality is then measurable
    val grid = (for (x <- 0 until 32; y <- 0 until 32)
      yield (x.toDouble, y.toDouble)).toDF("x", "y")
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_zorder_test"
    val blocks = Sinks.zorderWrite(grid, out, "x", "y", bits = 5, blockShift = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // 10-bit z, blockShift 4 → 64 blocks of 16 cells each
    assert(blocks.length == 64 && blocks.forall(_._2 == 16L))
    // each 16-cell Morton block is a 4×4 tile: span 3 in BOTH dims — the
    // two-dimensional locality a single-column sort cannot give
    assert(blocks.forall(b => b._4 - b._3 == 3.0 && b._6 - b._5 == 3.0),
      blocks.take(5).mkString(";"))
    // written files cover disjoint z-ranges (range partition + sort)
    val spans = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(fmin(col("__z")).as("lo"), fmax(col("__z")).as("hi"))
      .collect().map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1)
    spans.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi <= lo2, spans.mkString(","))
      case _ =>
    }
    intercept[IllegalArgumentException](
      Sinks.zorderWrite(grid, out, "x", "y", bits = 0))
    intercept[IllegalArgumentException](
      Sinks.zorderWrite(grid, out, "x", "y", bits = 5, blockShift = 10))
  }

  test("mergeUpsert: update/insert/keep semantics, NULL change cells keep base") {
    import graft.operators.Sinks
    val base = Seq((1L, Some("a"), 10.0), (2L, Some("b"), 20.0), (3L, Some("c"), 30.0))
      .toDF("k", "name", "bal")
    val changes = Seq((2L, None: Option[String], 99.0), (4L, Some("d"), 40.0))
      .toDF("k", "name", "bal")
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_merge_test"
    val got = Sinks.mergeUpsert(base, changes, "k", out)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2),
        r.getString(3))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, Some("a"), 10.0, "kept"),
      (2L, Some("b"), 99.0, "updated"),   // NULL name change → base name kept
      (3L, Some("c"), 30.0, "kept"),
      (4L, Some("d"), 40.0, "inserted")))
    // schema drift fails loudly
    intercept[IllegalArgumentException](Sinks.mergeUpsert(
      base, changes.select("k", "bal", "name"), "k", out))
  }

  test("toxicityScore matches whole tokens case-insensitively and flags at maxFrac") {
    import graft.operators.Curation
    val df = Seq(
      (1L, "BAD word bad ok"),  // 2/4 flagged, case-insensitive
      (2L, "badge ok ok ok"),   // whole-token: 'badge' never trips 'bad'
      (3L, "clean text here"))
      .toDF("doc_id", "text")
    val got = Curation.toxicityScore(df, "doc_id", "text", Seq("bad"), maxFrac = 0.25)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(got(1L) == ((4L, 2L, 0.5, true)))
    assert(got(2L) == ((4L, 0L, 0.0, false)))
    assert(got(3L) == ((3L, 0L, 0.0, false)))
    intercept[IllegalArgumentException](
      Curation.toxicityScore(df, "doc_id", "text", Seq()))
  }

  test("scd2Merge versions changed keys, keeps history, no-ops identical changes") {
    import graft.operators.Sinks
    val base = Seq(
      (1L, 10.0, "2023-01-01", None: Option[String]),        // will change
      (2L, 20.0, "2023-01-01", None: Option[String]),        // no change row
      (3L, 30.0, "2023-01-01", None: Option[String]),        // identical change
      (5L, 5.0, "2022-01-01", Some("2023-01-01")),           // closed history
      (5L, 6.0, "2023-01-01", None: Option[String]))         // open successor
      .toDF("k", "bal", "valid_from", "valid_to")
    val changes = Seq(
      (1L, 11.0, "2024-06-01"),
      (3L, 30.0, "2024-06-01"),
      (4L, 40.0, "2024-06-01"))
      .toDF("k", "bal", "change_ts")
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_scd2_test"
    val got = Sinks.scd2Merge(base, changes, "k", "change_ts", out)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
        Option(r.getString(3)), r.getString(4))).toSet
    assert(got == Set(
      (1L, 10.0, "2023-01-01", Some("2024-06-01"), "closed"),
      (1L, 11.0, "2024-06-01", None, "inserted"),
      (2L, 20.0, "2023-01-01", None, "kept"),
      (3L, 30.0, "2023-01-01", None, "unchanged"),
      (4L, 40.0, "2024-06-01", None, "inserted"),
      (5L, 5.0, "2022-01-01", Some("2023-01-01"), "history"),
      (5L, 6.0, "2023-01-01", None, "kept")), s"got $got")
    // schema drift fails loudly: changes missing the attr column
    intercept[IllegalArgumentException](Sinks.scd2Merge(
      base, changes.select("k", "change_ts"), "k", "change_ts", out))
    // base without validity columns fails loudly
    intercept[IllegalArgumentException](Sinks.scd2Merge(
      base.drop("valid_to"), changes, "k", "change_ts", out))
  }

  test("deltaAppend: create + append commits round-trip through DeltaCatalog and plain Spark") {
    import graft.operators.Sinks
    import graft.sources.DeltaCatalog
    import graft.model.BuzzException
    val out = java.nio.file.Files.createTempDirectory("graft_delta_sink").toString
    val b1 = Seq((1L, "x", "p1"), (2L, "y", "p2")).toDF("id", "v", "p")
    val b2 = Seq((3L, "z", "p1"), (4L, "w", "p3")).toDF("id", "v", "p")
    assert(Sinks.deltaAppend(b1, out, Seq("p")) == 0L)
    assert(Sinks.deltaAppend(b2, out, Seq("p")) == 1L)
    // the engine's own Delta reader sees both commits
    val cat = DeltaCatalog.fromDeltaLog(spark, out, "t")
    val got = cat.read(spark, cat.files)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set((1L, "x", "p1"), (2L, "y", "p2"), (3L, "z", "p1"), (4L, "w", "p3")))
    // time travel: version 0 holds only the first batch
    val v0 = DeltaCatalog.fromDeltaLog(spark, out, "t", versionAsOf = Some(0L))
    assert(v0.read(spark, v0.files).count() == 2)
    // a plain partitioned-parquet reader over the data dirs agrees (the
    // staged-then-committed files are the only ones under p=*/)
    val plain = spark.read.parquet(out).count()
    assert(plain == 4)
    // schema drift and partitioning drift fail loudly before any write
    intercept[BuzzException.SchemaMismatch](
      Sinks.deltaAppend(Seq((9L, 1.0, "p1")).toDF("id", "v", "p"), out, Seq("p")))
    intercept[BuzzException.SchemaMismatch](
      Sinks.deltaAppend(b1, out, Nil))
  }

  test("deltaAppend: concurrent appenders all commit at distinct versions with no lost rows") {
    import graft.operators.Sinks
    import graft.sources.DeltaCatalog
    val out = java.nio.file.Files.createTempDirectory("graft_delta_conc").toString
    val writers = 6
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // every writer appends its own disjoint batch at the same time —
    // including the CREATION race: nobody pre-creates the table, so the
    // version-0 winner lays down protocol+metaData and every loser must
    // fall through to a validated append retry
    val versions = Await.result(
      Future.sequence((0 until writers).map { w =>
        Future(Sinks.deltaAppend(
          Seq((w.toLong, s"writer$w")).toDF("id", "v"), out, Nil))
      }), 120.seconds)
    // all commits landed, each at its own version, densely 0..writers-1
    assert(versions.toSet == (0L until writers.toLong).toSet,
      s"expected versions 0..${writers - 1}, got $versions")
    // the final snapshot holds every writer's rows exactly once
    val cat = DeltaCatalog.fromDeltaLog(spark, out, "t")
    val got = cat.read(spark, cat.files)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == (0 until writers).map(w => (w.toLong, s"writer$w")).toSet)
    // and each intermediate version is a consistent prefix of size v+1
    (0L until writers.toLong).foreach { v =>
      val snap = DeltaCatalog.fromDeltaLog(spark, out, "t", versionAsOf = Some(v))
      assert(snap.read(spark, snap.files).count() == v + 1,
        s"version $v should hold ${v + 1} rows")
    }
  }

  test("deltaSinkStreaming lands each micro-batch as one transactional Delta commit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.CorpusStream
    import graft.sources.DeltaCatalog
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_delta_stream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_delta_ckpt").toString
    val stream = MemoryStream[(Long, String)]
    val q = CorpusStream.deltaSinkStreaming(
      stream.toDF().toDF("id", "v"), s"$out/t", ckpt)
    try {
      stream.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      stream.addData((3L, "c"))
      q.processAllAvailable()
      // two micro-batches → two commits; both visible to the engine reader
      val cat = DeltaCatalog.fromDeltaLog(spark, s"$out/t", "t")
      val got = cat.read(spark, cat.files)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
      // each micro-batch is its own time-travel point
      val v0 = DeltaCatalog.fromDeltaLog(spark, s"$out/t", "t", versionAsOf = Some(0L))
      assert(v0.read(spark, v0.files).count() == 2)
    } finally q.stop()
  }

  test("deltaRestore rolls the snapshot back as a forward commit; vacuumed horizon fails loudly") {
    import graft.operators.Sinks
    import graft.sources.DeltaCatalog
    import graft.model.BuzzException
    val out = java.nio.file.Files.createTempDirectory("graft_delta_restore").toString
    def batch(ids: Long*) = ids.map(i => (i, s"v$i")).toDF("id", "v")
    assert(Sinks.deltaAppend(batch(1L, 2L), out) == 0L)
    assert(Sinks.deltaAppend(batch(3L), out) == 1L)
    assert(Sinks.deltaAppend(batch(4L, 5L), out) == 2L)
    // restore to v1 commits v3; history keeps moving forward
    assert(Sinks.deltaRestore(spark, out, 1L) == 3L)
    val cat = DeltaCatalog.fromDeltaLog(spark, out, "t")
    assert(cat.read(spark, cat.files).select("id").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 3L))
    // v2 is still time-travelable (restore deleted nothing)
    val v2 = DeltaCatalog.fromDeltaLog(spark, out, "t", versionAsOf = Some(2L))
    assert(v2.read(spark, v2.files).count() == 5)
    // restore forward to v2 works too (the removed files still exist)
    assert(Sinks.deltaRestore(spark, out, 2L) == 4L)
    val cat2 = DeltaCatalog.fromDeltaLog(spark, out, "t")
    assert(cat2.read(spark, cat2.files).count() == 5)
    // no-op restore (already at v2's state) commits nothing
    assert(Sinks.deltaRestore(spark, out, 2L) == 4L)
    // out-of-range target is loud
    intercept[BuzzException.BadRequest](Sinks.deltaRestore(spark, out, 99L))
    // optimize + vacuum reaps v0's originals → restore past the vacuum
    // horizon must refuse, naming the missing file
    assert(Sinks.deltaRestore(spark, out, 0L) == 5L) // v0 files still live here
    assert(Sinks.deltaRestore(spark, out, 4L) == 6L) // back to all 5 rows
    Sinks.deltaOptimize(spark, out)                  // compacts, removes originals
    Sinks.deltaVacuum(spark, out)                    // deletes unreferenced files
    val e = intercept[BuzzException.BadRequest](Sinks.deltaRestore(spark, out, 0L))
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
  }

  test("deltaDeletePartition drops only the named partition, keeps time travel, no-ops when empty") {
    import graft.operators.Sinks
    import graft.sources.DeltaCatalog
    val out = java.nio.file.Files.createTempDirectory("graft_delta_del").toString
    val b1 = Seq((1L, "x", "p1"), (2L, "y", "p2"), (3L, "z", "p1")).toDF("id", "v", "p")
    assert(Sinks.deltaAppend(b1, out, Seq("p")) == 0L)
    assert(Sinks.deltaDeletePartition(spark, out, "p", "p1") == 1L)
    val cat = DeltaCatalog.fromDeltaLog(spark, out, "t")
    assert(cat.read(spark, cat.files).select("id").collect().map(_.getLong(0)).toSet
      == Set(2L))
    // metadata-only: v0 still time-travels to the full table
    val v0 = DeltaCatalog.fromDeltaLog(spark, out, "t", versionAsOf = Some(0L))
    assert(v0.read(spark, v0.files).count() == 3)
    // deleting an empty/unknown partition burns no version
    assert(Sinks.deltaDeletePartition(spark, out, "p", "p1") == 1L)
    assert(Sinks.deltaDeletePartition(spark, out, "p", "nope") == 1L)
    // a misspelled/non-partition COLUMN must fail loudly, not no-op — a
    // silent head return is indistinguishable from a successful retention
    // delete of an empty partition
    val e = intercept[graft.model.BuzzException.BadRequest] {
      Sinks.deltaDeletePartition(spark, out, "v", "x")
    }
    assert(e.getMessage.contains("not a partition column"))
  }

  test("deltaAppend txn stamps make replays no-ops, surviving checkpoint commit-cleaning") {
    import graft.operators.Sinks
    import graft.sources.DeltaCatalog
    val out = java.nio.file.Files.createTempDirectory("graft_delta_txn").toString
    val b1 = Seq((1L, "a")).toDF("id", "v")
    val b2 = Seq((2L, "b")).toDF("id", "v")
    assert(Sinks.deltaAppend(b1, out, Nil, Some(("app", 0L))) == 0L)
    assert(Sinks.deltaAppend(b2, out, Nil, Some(("app", 1L))) == 1L)
    // replaying batch 1 is a skip, not a new commit
    assert(Sinks.deltaAppend(b2, out, Nil, Some(("app", 1L))) == 1L)
    assert(DeltaCatalog.latestVersion(spark, s"$out/_delta_log") == 1L)
    assert(DeltaCatalog.lastTxnVersion(spark, out, "app") == Some(1L))
    assert(DeltaCatalog.lastTxnVersion(spark, out, "other") == None)
    // a DIFFERENT app's version counter is independent
    assert(Sinks.deltaAppend(b1, out, Nil, Some(("app2", 0L))) == 2L)
    // checkpoint with commit cleaning must preserve the watermarks
    Sinks.deltaCheckpoint(spark, out, cleanCommits = true)
    assert(DeltaCatalog.lastTxnVersion(spark, out, "app") == Some(1L))
    assert(Sinks.deltaAppend(b2, out, Nil, Some(("app", 1L))) == 2L,
      "post-checkpoint replay must still be recognized (returns latest, no commit)")
    assert(DeltaCatalog.latestVersion(spark, s"$out/_delta_log") == 2L)
    // rows: exactly one copy of each batch
    val cat = DeltaCatalog.fromDeltaLog(spark, out, "t")
    assert(cat.read(spark, cat.files).count() == 3L)
  }

  test("deltaOptimize compacts per partition, preserves time travel, no-ops when compact") {
    import graft.operators.Sinks
    import graft.sources.DeltaCatalog
    val out = java.nio.file.Files.createTempDirectory("graft_delta_opt").toString
    // three appends → ≥3 files in partition p1
    (0 until 3).foreach { i =>
      Sinks.deltaAppend(
        Seq((i.toLong, s"v$i", "p1"), (100L + i, s"w$i", "p2")).toDF("id", "v", "p"),
        out, Seq("p"))
    }
    val before = DeltaCatalog.fromDeltaLog(spark, out, "t")
    assert(before.files.count(_.partitionValues == Seq("p1")) == 3)
    val v = Sinks.deltaOptimize(spark, out)
    assert(v == 3L, "optimize is its own commit after appends 0,1,2")
    // post-optimize snapshot: one file per partition, identical rows
    val after = DeltaCatalog.fromDeltaLog(spark, out, "t")
    assert(after.files.size == 2 &&
      after.files.map(_.partitionValues).toSet == Set(Seq("p1"), Seq("p2")))
    val got = after.read(spark, after.files)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == (0 until 3).flatMap(i =>
      Seq((i.toLong, s"v$i", "p1"), (100L + i, s"w$i", "p2"))).toSet)
    // time travel PRE-optimize still reads: old data files were not deleted
    val v1 = DeltaCatalog.fromDeltaLog(spark, out, "t", versionAsOf = Some(1L))
    assert(v1.read(spark, v1.files).count() == 4)
    // a second optimize finds nothing to do: same version, no new commit
    assert(Sinks.deltaOptimize(spark, out) == 3L)

    // checkpoint + clean: pre-checkpoint commits are gone, the reader
    // seeds from the engine's OWN checkpoint and sees identical rows
    assert(Sinks.deltaCheckpoint(spark, out, cleanCommits = true) == 3L)
    val fromCp = DeltaCatalog.fromDeltaLog(spark, out, "t")
    assert(fromCp.read(spark, fromCp.files)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet == got)
    // time travel to cleaned history now fails loudly
    intercept[graft.model.BuzzException.BadRequest](
      DeltaCatalog.fromDeltaLog(spark, out, "t", versionAsOf = Some(1L)))

    // vacuum deletes the tombstoned splinter files; current snapshot intact
    val removed = Sinks.deltaVacuum(spark, out)
    assert(removed >= 6, s"the six pre-optimize files are reaped, got $removed")
    val afterVac = DeltaCatalog.fromDeltaLog(spark, out, "t")
    assert(afterVac.read(spark, afterVac.files).count() == 6)
    // nothing left to vacuum
    assert(Sinks.deltaVacuum(spark, out) == 0L)
  }

  test("delta maintenance round-trips Hive-ESCAPED partition values (the %3D path)") {
    import graft.operators.Sinks
    import graft.sources.DeltaCatalog
    // values that Hive-escape into dir names containing literal '%' —
    // the add.path must URI-encode them or the reader's decode mangles
    // the path; removes/checkpoints must round-trip the RAW log strings
    val vals = Seq("a=b", "sp ace", "pct%20v")
    val out = java.nio.file.Files.createTempDirectory("graft_delta_esc").toString
    (0 until 2).foreach { i =>
      Sinks.deltaAppend(
        vals.zipWithIndex.map { case (v, j) => (i * 10L + j, v) }.toDF("id", "p"),
        out, Seq("p"))
    }
    def readAll() = {
      val c = DeltaCatalog.fromDeltaLog(spark, out, "t")
      c.read(spark, c.files).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toSet
    }
    val expected = (0 until 2).flatMap(i =>
      vals.zipWithIndex.map { case (v, j) => (i * 10L + j) -> v }).toSet
    assert(readAll() == expected, "escaped values survive the append+read loop")
    // optimize: removes must match the log's raw paths exactly — a desync
    // leaves splinters live and doubles rows
    Sinks.deltaOptimize(spark, out)
    assert(readAll() == expected, "no doubled rows after optimize")
    // checkpoint + clean, then read seeds from the checkpoint's raw paths
    Sinks.deltaCheckpoint(spark, out, cleanCommits = true)
    assert(readAll() == expected, "checkpoint round-trips escaped paths")
    // vacuum must reap ONLY the tombstoned splinters, never live files
    val reaped = Sinks.deltaVacuum(spark, out)
    assert(reaped >= vals.size, s"pre-optimize splinters reaped, got $reaped")
    assert(readAll() == expected, "live data intact after vacuum")
  }

  test("cleanCorpus keeps only unique, quality, uncontaminated docs") {
    val eval = Seq((100L, "nothing shared with anybody")).toDF("doc_id", "text")
    // minQuality 0: isolate the dedup + decontamination semantics
    val kept = Curation.cleanCorpus(corpus, "doc_id", "text", eval, minQuality = 0.0)
      .collect().map(_.getLong(0)).toSet
    // doc 4 dropped (exact dup of 1, not the min id); doc 3 dropped (contaminated)
    assert(kept == Set(1L, 2L))
  }

  test("dropNearDuplicates keeps cluster keepers and unpaired docs") {
    val docs = Seq(
      (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (9L, "e"))
      .toDF("doc_id", "text")
    // clusters {1,2,3} (chained) and {4,9}; keepers 1 and 4
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 9L)).toDF("id_a", "id_b")
    val kept = Curation.dropNearDuplicates(docs, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L))
    // no pairs at all → everything survives
    val none = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Curation.dropNearDuplicates(docs, "doc_id", none).count() == 5)
    // pairs computed on a SUPERSET of df: cluster {1,2,3}'s global keeper 1
    // is absent from the subset — the present-member keeper (2) must
    // survive instead of the cluster vanishing
    val subset = docs.filter($"doc_id" =!= 1L)
    val keptSub = Curation.dropNearDuplicates(subset, "doc_id", pairs)
      .collect().map(_.getLong(0)).toSet
    assert(keptSub == Set(2L, 4L), s"got $keptSub")
  }

  test("bloomDecontaminate output is bit-identical to exact decontaminate") {
    val docs = Tables.load(spark, TestSpark.sf, "documents").limit(200)
    val eval = docs.filter($"doc_id" % 9 === 0)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getLong(1), r.getBoolean(2))
    val exact = Curation.decontaminate(docs, eval, "doc_id", "text")
      .collect().map(key).toSet
    val bloom = Curation.bloomDecontaminate(docs, eval, "doc_id", "text")
      .collect().map(key).toSet
    assert(bloom == exact)
    assert(exact.exists(_._3), "test must exercise contaminated docs")
    assert(exact.exists(!_._3), "test must exercise clean docs")
  }

  test("mixingWeights sum to 1 and favor the higher-quality group at equal size") {
    val longDoc = Array.fill(60)("word").mkString(" ") // quality 1.0
    val shortDoc = "tiny doc here"                     // length-penalized
    val docs = (
      (1 to 10).map(i => (i.toLong, longDoc, "clean")) ++
      (11 to 20).map(i => (i.toLong, shortDoc, "noisy"))
    ).toDF("doc_id", "text", "source")
    val w = Curation.mixingWeights(docs, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(w("clean")._1 == 10L && w("noisy")._1 == 10L)
    assert(math.abs(w.values.map(_._3).sum - 1.0) < 1e-4, s"weights must normalize: $w")
    assert(w("clean")._3 > w("noisy")._3,
      s"equal-sized higher-quality group must get more weight: $w")
    assert(w("noisy")._3 > 0.0, "no group is starved to zero")
  }

  test("dedupLines drops corpus-duplicated lines, keeps order, keeps emptied docs") {
    val docs = Seq(
      (1L, "cookie banner\nunique first\ncookie banner\nreal content one"),
      (2L, "unique second\ncookie banner\nreal content two"),
      (3L, "cookie banner"), // every line is boilerplate
      (4L, "all original\nnothing shared"))
      .toDF("doc_id", "text")
    val out = Curation.dedupLines(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // "cookie banner" occurs 4x corpus-wide (twice in doc 1) -> all dropped
    assert(out(1L) == (4L, 2L, "unique first\nreal content one"))
    assert(out(2L) == (3L, 2L, "unique second\nreal content two"))
    assert(out(3L) == (1L, 0L, ""), "fully-boilerplate doc survives, emptied")
    assert(out(4L) == (2L, 2L, "all original\nnothing shared"))
  }

  test("dedupLines minFreq raises the duplication bar") {
    val docs = Seq(
      (1L, "twice\nthrice"), (2L, "twice\nthrice"), (3L, "thrice\nsolo"))
      .toDF("doc_id", "text")
    val out = Curation.dedupLines(docs, "doc_id", "text", minFreq = 3)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    // freq("twice")=2 < 3 survives; freq("thrice")=3 dropped everywhere
    assert(out(1L) == "twice" && out(2L) == "twice" && out(3L) == "solo")
  }

  test("gopherRules signals and keep verdict") {
    val good = (Seq.fill(30)("the data") :+ "rest").mkString(" ") // 61 words
    val docs = Seq(
      (1L, good),
      (2L, "tiny doc"),
      (3L, (Seq.fill(60)("the word") :+ "x#y # ## #### ## ## ### ##").mkString(" ")),
      (4L, "- bullet one\n- bullet two\n* bullet three"),
      (5L, "waiting...\nmore waiting...\nstill..."))
      .toDF("doc_id", "text")
    val out = Curation.gopherRules(docs, "doc_id", "text", minStopHits = 1)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(out(1L).getAs[Long]("stop_hits") == 1L)
    // too short
    assert(out(2L).getAs[Long]("n_words") == 2L && !out(2L).getAs[Boolean]("keep"))
    // symbol-heavy: 17 '#' chars over 128 words → ratio ≈ 0.133 > 0.1; the
    // doc passes every OTHER rule, so keep=false pins the symbol clause
    assert(out(3L).getAs[Double]("symbol_ratio") > 0.1)
    assert(out(3L).getAs[Long]("n_words") == 128L)
    assert(!out(3L).getAs[Boolean]("keep"))
    // every line a bullet / ellipsis-terminated
    assert(out(4L).getAs[Double]("bullet_frac") == 1.0 && !out(4L).getAs[Boolean]("keep"))
    assert(out(5L).getAs[Double]("ellipsis_frac") == 1.0 && !out(5L).getAs[Boolean]("keep"))
  }

  test("evalLeakage scores each eval doc's gram exposure against train") {
    val train = Seq((1L, "a b c d"), (2L, "x y z w")).toDF("doc_id", "text")
    val eval_ = Seq(
      (10L, "a b c q"),   // grams {a b c, b c q}: 1 of 2 leaked
      (11L, "p q r s"),   // none leaked
      (12L, "a b c d"))   // fully leaked
      .toDF("doc_id", "text")
    val got = Curation.evalLeakage(train, eval_, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(
      10L -> ((2L, 1L, 0.5)),
      11L -> ((2L, 0L, 0.0)),
      12L -> ((2L, 2L, 1.0))))
  }

  test("hashSplit is a pure function of the id: stable under unions and reshuffles") {
    val base = (1L to 400L).toDF("id")
    val a = Curation.hashSplit(base, "id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // appending rows must not move any existing assignment
    val b = Curation.hashSplit(
        base.unionAll((401L to 800L).toDF("id")).repartition(7), "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.forall { case (k, v) => b(k) == v })
    // all three splits materialize at plausible shares (12/2/2 nibbles)
    val shares = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(shares.keySet == Set("train", "val", "test"))
    assert(shares("train") > shares("val") && shares("train") > shares("test"))
  }

  test("balanceGroups keeps exactly min-group-size rows per group, deterministically") {
    val df = ((1L to 10L).map(i => (i, "big")) ++ Seq((11L, "small"), (12L, "small")))
      .toDF("id", "g")
    val a = Curation.balanceGroups(df, "id", "g").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(a.count(_._2 == "big") == 2 && a.count(_._2 == "small") == 2)
    // deterministic: a reshuffled re-run keeps the identical set
    val b = Curation.balanceGroups(df.repartition(7), "id", "g").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(a.sorted.toSeq == b.sorted.toSeq)
  }

  test("rankNormalize == percent_rank semantics: ties share first rank, nulls drop") {
    val df = Seq[(Long, java.lang.Double)](
      (1L, 10.0), (2L, 10.0), (3L, 20.0), (4L, 30.0), (5L, null))
      .toDF("id", "v")
    val got = Curation.rankNormalize(df.repartition(3), "id", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // n=4: ranks 1,1,3,4 → q = 0, 0, 2/3, 1
    assert(got == Map(1L -> 0.0, 2L -> 0.0, 3L -> 0.666667, 4L -> 1.0))
    // single row → q pinned to 0, not 0/0
    assert(Curation.rankNormalize(Seq((9L, 5.0)).toDF("id", "v"), "id", "v")
      .collect().head.getDouble(1) == 0.0)
  }

  test("boilerplateReport ranks lines by distinct-doc spread with full tiebreaks") {
    val df = Seq(
      (1L, "nav\nbody one\nfooter"),
      (2L, "nav\nbody two\nfooter\nfooter"), // footer twice in one doc
      (3L, "nav\nunique text"),
      (4L, "solo line"))
      .toDF("doc_id", "text")
    val out = Curation.boilerplateReport(df, "doc_id", "text", minDocs = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // nav: 3 docs; footer: 2 docs but 3 occurrences; nothing else repeats
    assert(out.toSeq == Seq(("nav", 3L, 3L), ("footer", 2L, 3L)))
  }

  test("boilerplateReport cut is a TakeOrdered over one aggregation") {
    val df = Seq((1L, "a\nb"), (2L, "a\nc")).toDF("doc_id", "text")
    val plan = Curation.boilerplateReport(df, "doc_id", "text")
      .queryExecution.executedPlan.toString()
    assert(plan.contains("TakeOrderedAndProject"), plan.take(600))
    // distinct-doc counting plans as the staged (line, doc) pre-aggregate —
    // two grouped exchanges, never a window or a global sort
    assert(!plan.contains("Window ["), plan.take(600))
    assert("Exchange".r.findAllIn(plan).size <= 2, plan.take(900))
  }
}
