package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Planted-duplicate tests: the sf0.01 corpus has no true near-dups, so each
  * detector is proven on data where we know the answer. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away into the green forest tonight " +
    "while seven wizards watch quietly from the old stone tower beside the silver river"

  /** id 1/2: near-identical (one word changed); id 3: unrelated. */
  private def planted = Seq(
    (1L, base, "s1"),
    (2L, base.replace("silver", "golden"), "s1"),
    (3L, "completely different text about spark query engines and columnar execution at scale " +
      "with shuffles exchanges and adaptive planning everywhere in the optimizer", "s1"))
    .toDF("doc_id", "text", "source")

  test("exact dedup groups identical texts") {
    val dups = Seq((1L, "same"), (2L, "same"), (3L, "other")).toDF("doc_id", "text")
    val out = Dedup.exact(dups, "doc_id", "text").collect()
    assert(out.length == 2)
    val big = out.find(_.getLong(2) == 2L).get
    assert(big.getLong(1) == 1L) // keeper is the min id
  }

  test("minhash LSH finds the planted near-dup pair and not the unrelated doc") {
    val pairs = Dedup.minhashPairs(planted, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)))
  }

  test("cross-corpus minhash finds only cross-side pairs; decontamination drops the hit") {
    import org.apache.spark.sql.functions.col
    // left: two internal near-dups (1, 2) plus one doc (4) near-dup'ing the
    // right side; right: one eval doc. Internal left pairs must NOT surface.
    val left = Seq(
      (1L, base, "s1"),
      (2L, base.replace("silver", "golden"), "s1"),
      (4L, base.replace("quick", "sly"), "s1"),
      (3L, "completely different text about spark query engines and columnar execution at scale " +
        "with shuffles exchanges and adaptive planning everywhere in the optimizer", "s1"))
      .toDF("doc_id", "text", "source")
    val right = Seq((100L, base, "eval")).toDF("doc_id", "text", "source")
    val pairs = Dedup.crossMinhashPairs(left, right, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 100L), (2L, 100L), (4L, 100L)),
      s"expected only cross-side hits, got $pairs")
    // id spaces may overlap: the eval doc reusing a left id must not confuse
    // verification (sets resolve per side)
    val rightSameId = Seq((3L, base, "eval")).toDF("doc_id", "text", "source")
    val overlap = Dedup.crossMinhashPairs(left, rightSameId, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(overlap == Set((1L, 3L), (2L, 3L), (4L, 3L)), s"got $overlap")
    val kept = graft.operators.Curation
      .decontaminateNearDup(left, right, "doc_id", "text", threshold = 0.5)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L), s"only the unrelated doc survives, got $kept")
  }

  test("containment finds a doc subsumed by a much larger one that Jaccard misses") {
    // small doc = the first ~20 words of big doc; J ≈ 20/60 ≪ 0.8 but
    // containment(small ⊆ big) = 1.0 — the asymmetric case
    val big = base + " " + ("extra filler words about many other topics " * 5).trim
    val small = base.split(" ").take(20).mkString(" ")
    val docs = Seq(
      (1L, big, "s1"),
      (2L, small, "s1"),
      (3L, "completely different text about spark query engines and columnar execution", "s1"),
      (4L, small, "s2")) // same text, different block → never compared
      .toDF("doc_id", "text", "source")
    val out = Dedup.containmentPairs(docs, "doc_id", "text", "source", n = 2, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(t => (t._1, t._2)).toSet == Set((2L, 1L)), s"got ${out.toSeq}")
    assert(out.head._3 == 1.0)
    // the symmetric detector must NOT fire on this pair at the same bar
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", n = 2, threshold = 0.8)
      .collect()
    assert(jac.isEmpty, s"jaccard should miss subsumption: ${jac.toSeq}")
  }

  test("simhash banding finds shingle-identical docs, skips unrelated ones") {
    // simhash needs many features for a small hamming delta; with short docs
    // only shingle-set-identical pairs are guaranteed within the banded
    // maxHamming=3 contract (near-dup behavior on long docs is covered by
    // the distance assertions in ExpressionSpec)
    val docs = Seq(
      (1L, base, "s1"),
      (2L, base, "s1"), // identical shingle set ⇒ hamming 0, guaranteed hit
      (3L, "completely different text about spark query engines and columnar execution at scale " +
        "with shuffles exchanges and adaptive planning everywhere in the optimizer", "s1"))
      .toDF("doc_id", "text", "source")
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("simhash corpus-sized banding returns identical pairs at every width") {
    // the pigeonhole guarantee holds for ANY block count, so the verified
    // output must be byte-identical whether the corpus hint selects the
    // classic 4-block banding (small n) or wide multi-block keys (large n)
    val docs = Tables.load(spark, TestSpark.sf, "documents").limit(200)
    def run(hint: Option[Long]) =
      Dedup.simhashPairs(docs, "doc_id", "text", corpusSizeHint = hint)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val small = run(Some(100L))          // b = 4:  classic 16-bit bands
    val large = run(Some(100_000_000L))  // b ≥ 7: multi-block wide keys
    assert(small == large, s"banding width changed the result: ${small.diff(large)} / ${large.diff(small)}")
    // block-count growth curve: wider keys as n grows, capped key fan-out
    assert(Dedup.simhashBlockCount(3, 1000L) == 4)
    val b9 = Dedup.simhashBlockCount(3, 1_000_000_000L)
    assert(b9 > 4 && b9 <= 10, s"10⁹ docs should select multi-block banding, got $b9")
    // maxHamming = 0 (exact-signature dedup) must terminate with one
    // full-width key, and every admissible maxHamming must terminate
    assert(Dedup.simhashBlockCount(0, 1_000_000L) == 1)
    for (k <- 1 to 63; n <- Seq(100L, 1_000_000_000L))
      assert(Dedup.simhashBlockCount(k, n) > k)
  }

  test("ngram jaccard within block finds the planted pair with its score") {
    val out = Dedup.ngramJaccardPairs(planted, "doc_id", "text", "source", threshold = 0.5)
      .collect()
    assert(out.length == 1)
    assert((out(0).getLong(0), out(0).getLong(1)) == (1L, 2L))
    assert(out(0).getDouble(2) > 0.8)
  }

  test("embedding LSH finds planted near-identical vectors") {
    val rnd = new scala.util.Random(7)
    val v1 = Array.fill(64)(rnd.nextGaussian().toFloat)
    val v2 = v1.clone(); v2(0) = v1(0) + 0.01f // near-identical
    val far = Array.fill(64)(rnd.nextGaussian().toFloat)
    val df = Seq((1L, v1.toSeq), (2L, v2.toSeq), (3L, far.toSeq))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingPairs(df, "vec_id", "embedding", dim = 64, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)))
  }

  test("twoTierPairs confirms embedding candidates with text Jaccard") {
    val rnd = new scala.util.Random(7)
    val v1 = Array.fill(64)(rnd.nextGaussian().toFloat)
    val v2 = v1.clone(); v2(0) = v1(0) + 0.01f
    val v3 = v1.clone(); v3(1) = v1(1) + 0.01f // ALSO near v1, but text differs
    val far = Array.fill(64)(rnd.nextGaussian().toFloat)
    val vecs = Seq((1L, v1.toSeq), (2L, v2.toSeq), (3L, v3.toSeq), (4L, far.toSeq))
      .toDF("vec_id", "embedding")
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog now"), // near-dup of 1
      (3L, "completely different words about streaming state stores"),
      (4L, "another unrelated document about checkpoints"))
      .toDF("doc_id", "text")
    val got = Dedup.twoTierPairs(vecs, "vec_id", "embedding", dim = 64,
        docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // (1,3) and (2,3) pass the cosine tier but FAIL the text tier
    assert(got.toSet == Set((1L, 2L)), s"got ${got.mkString(",")}")
  }

  test("embeddingThresholdSweep bins one candidate pass, zero-count bins included") {
    val rnd = new scala.util.Random(7)
    val v1 = Array.fill(64)(rnd.nextGaussian().toFloat)
    val v2 = v1.clone(); v2(0) = v1(0) + 0.01f     // cos ~0.9999
    val far = Array.fill(64)(rnd.nextGaussian().toFloat)
    val df = Seq((1L, v1.toSeq), (2L, v2.toSeq), (3L, far.toSeq))
      .toDF("vec_id", "embedding")
    val got = Dedup.embeddingThresholdSweep(df, "vec_id", "embedding", dim = 64,
        thresholds = Seq(0.95, 0.9999999))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got(0.95) == 1L, s"got $got")
    assert(got(0.9999999) == 0L, "a too-tight bin still reports its zero")
    intercept[IllegalArgumentException](
      Dedup.embeddingThresholdSweep(df, "vec_id", "embedding", 64, Seq()))
  }

  test("saved minhash index round-trips; shard dedup against it finds the planted hit") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_mhidx").toString
    // history = docs 2 and 3; incoming shard = doc 1 (near-dup of 2) plus an
    // unrelated doc 4
    val history = planted.filter(col("doc_id") > 1)
    val shard = planted.filter(col("doc_id") === 1).unionAll(
      Seq((4L, "entirely new material covering streaming watermarks state stores and " +
        "checkpoint recovery semantics in modern engines today", "s2"))
        .toDF("doc_id", "text", "source"))
    Dedup.saveMinhashIndex(history, "doc_id", "text", dir)
    val (sets, buckets) = Dedup.loadMinhashIndex(spark, dir)
    // round-trip shape: one row per history doc with its hashed set + size,
    // plus a self-describing params file
    assert(sets.count() == 2 && sets.columns.toSeq == Seq("id", "shl", "s"))
    assert(buckets.columns.toSeq == Seq("band", "bucket", "id"))
    assert(Dedup.loadMinhashIndexParams(spark, dir) ==
      Map("shingleSize" -> 3, "numHashes" -> 256, "bands" -> 64))
    // a dir without a params file fails loudly instead of silently
    // returning zero hits with guessed parameters
    intercept[IllegalArgumentException] {
      Dedup.dedupAgainstSavedIndex(spark, shard, "doc_id", "text",
        java.nio.file.Files.createTempDirectory("graft_noparams").toString)
    }
    val hits = Dedup.dedupAgainstSavedIndex(spark, shard, "doc_id", "text", dir,
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hits.toSet == Set((1L, 2L)), s"got ${hits.toSeq}")
    // agreement with the direct bipartite pass over the same corpora
    val direct = Dedup.crossMinhashPairs(shard, history, "doc_id", "text",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(direct.toSet == hits.toSet)
  }

  test("minhash misses genuinely dissimilar pairs (no false positives at 0.8)") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.8).collect()
    // sf0.001 corpus: every returned pair must actually exceed the threshold
    // (verification step is exact), so just sanity-check the shape
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("connected components: min reachable id labels each duplicate cluster") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L),                     // chain: needs >1 propagation round
      (10L, 11L),                             // pair
      (20L, 21L), (21L, 22L), (20L, 22L))     // triangle
      .toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connected components converge in ~log(diameter) rounds on a chain graph") {
    // a 512-node path is the worst case for label PROPAGATION (511 rounds);
    // star contraction must finish in O(log diameter) — the bound below is
    // 2·log2(d) + slack, loose enough to be stable, tight enough that any
    // regression to diameter-bound convergence trips it immediately
    val chain = (1L to 511L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // cutoff 0: this spec pins the DISTRIBUTED loop's round bound; the
    // small-graph driver fast path would trivially report 0 rounds
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(
      chain, maxIterations = 64, localEdgeCutoff = 0)
    val comps = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(comps.length == 512 && comps.forall(_._2 == 1L))
    assert(rounds <= 22, s"expected ~log2(512)=9-ish rounds, got $rounds")
  }

  test("stripDuplicatedNgrams removes exactly the cross-doc-covered tokens") {
    // docs 1 and 2 share the 5-gram "q w e r t" (positions 2-6 in doc 1,
    // 0-4 in doc 2); doc 1's in-doc repetition of "a a a a a" must NOT
    // flag (distinct-doc df = 1); doc 3 is too short for any gram
    val df = Seq(
      (1L, "x y q w e r t z a a a a a a a a a a"),
      (2L, "q w e r t only here"),
      (3L, "tiny doc"))
      .toDF("doc_id", "text")
    val out = Dedup.stripDuplicatedNgrams(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((18L, 13L, "x y z a a a a a a a a a a")))
    assert(out(2L) == ((7L, 2L, "only here")))
    assert(out(3L) == ((2L, 2L, "tiny doc")))
  }

  test("small-graph CC fast path: identical labels to the loop, zero rounds") {
    // mixed shapes: chain, clique, pair, self-pair-only node, shared ids
    val rnd = new scala.util.Random(7)
    val edges = ((1L to 200L).map(i => (i, i + 1)) ++              // long chain
      (for (a <- 300L to 320L; b <- a + 1 to 320L) yield (a, b)) ++ // clique
      Seq((400L, 400L), (500L, 501L)) ++                            // self-pair, pair
      (1 to 300).map(_ => (rnd.nextInt(100).toLong + 600L,
        rnd.nextInt(100).toLong + 600L)))                           // random blob
      .toDF("id_a", "id_b")
    val (fast, fastRounds) = Dedup.connectedComponentsWithRounds(
      edges, localEdgeCutoff = 1000000)
    val (loop, loopRounds) = Dedup.connectedComponentsWithRounds(
      edges, maxIterations = 64, localEdgeCutoff = 0)
    assert(fastRounds == 0 && loopRounds > 0)
    val f = fast.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val l = loop.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(f == l)
    assert(f(400L) == 400L) // self-pair-only node labels itself
  }

  test("CC fast path preserves the input id type in both columns") {
    val edges = Seq((1, 2), (2, 3), (10, 11)).toDF("id_a", "id_b") // ints
    val out = Dedup.connectedComponents(edges)
    assert(out.schema("id").dataType.simpleString == "int")
    assert(out.schema("comp").dataType.simpleString == "int")
    val m = out.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(m == Map(1 -> 1, 2 -> 1, 3 -> 1, 10 -> 10, 11 -> 10))
  }

  test("non-integral id types always take the loop") {
    val edges = Seq(("a", "b"), ("b", "c")).toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.connectedComponentsWithRounds(edges)
    assert(rounds > 0) // string ids cannot collect as longs — loop path
    val m = labels.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("a" -> "a", "b" -> "a", "c" -> "a"))
  }

  test("connected components fail loudly instead of returning partial labels") {
    // a 6-node chain cannot converge in 1 iteration — partial labels would
    // silently keep several "keepers" in one duplicate cluster
    val chain = (1L to 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      // cutoff 0: non-convergence is a LOOP property; the driver fast
      // path needs no rounds and would (correctly) succeed here
      Dedup.connectedComponentsWithRounds(
        chain, maxIterations = 1, localEdgeCutoff = 0)._1.collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }
}
