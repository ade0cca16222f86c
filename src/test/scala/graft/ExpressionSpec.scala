package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions._

class ExpressionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine_sim matches manual computation (float arrays, codegen path)") {
    val df = Seq(
      (Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 1.0f), Seq(-1.0f, -1.0f)))
      .toDF("a", "b")
    val out = df.select(cosineSim($"a", $"b")).collect().map(_.getDouble(0))
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(math.abs(out(1)) < 1e-12)
    assert(math.abs(out(2) + 1.0) < 1e-12)
  }

  test("word_shingles matches the built-in split/transform/distinct/sort chain") {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    // the chain WordShingles replaced — kept here as the semantic oracle
    def chain(textCol: Column, n: Int): Column = {
      val toks = split(textCol, " ")
      when(size(toks) >= n,
        array_sort(array_distinct(
          transform(
            sequence(lit(1), size(toks) - (n - 1)),
            i => concat_ws(" ", slice(toks, i, lit(n)))))))
        .otherwise(array().cast("array<string>"))
    }
    val docs = Seq(
      "a b c d e",
      "a a a a",            // repeats → distinct collapses
      "one two",            // fewer than 3 tokens → empty
      "",                   // empty text
      "x  y z",             // double space → empty token kept by split
      "trailing space ",    // trailing empty token
      "Zeta alpha Beta zeta alpha Beta", // case-sensitive sort order
      "ümlaut é ascii mixed bytes here") // non-ASCII byte order
      .toDF("text")
    for (n <- Seq(2, 3)) {
      val got = docs.select(wordShinglesExpr(col("text"), n)).collect().map(_.getSeq[String](0))
      val want = docs.select(chain(col("text"), n)).collect().map(_.getSeq[String](0))
      assert(got.toSeq == want.toSeq, s"n=$n")
    }
  }

  test("pair_combinations handles string ids and fails loudly on blown buckets") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.PairCombinations
    import org.apache.spark.sql.functions.{col => fcol, expr => fexpr}
    // string ids through the DataFrame API
    val out = Seq(Tuple1(Seq("b", "a", "c"))).toDF("ids")
      .select(org.apache.spark.sql.graftshim.GraftColumn.of(
        PairCombinations(org.apache.spark.sql.graftshim.GraftColumn.expr(fcol("ids")))).as("p"))
      .selectExpr("explode(p) AS q").selectExpr("q.id_a", "q.id_b")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    // occupancy guard: a bucket over the pair cap fails with guidance, not OOM
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val big = Literal.create((0 until 100).map(_.toLong), ArrayType(LongType))
    val capped = PairCombinations(big, maxPairs = 10L)
    val e = intercept[IllegalStateException](capped.eval(null))
    assert(e.getMessage.contains("bucket occupancy"))
  }

  test("pair_combinations_stream matches the eager kernel pair-for-pair, lazily and uncapped") {
    import graft.functions.GraftFunctions.{pairCombinations, pairCombinationsStream}
    import org.apache.spark.sql.functions.explode
    // parity on a mixed bag: duplicates (no self-pairs), unsorted input,
    // singleton and empty arrays (no output rows)
    val bags: Seq[Seq[Long]] =
      Seq(Seq(5L, 1L, 3L, 3L, 9L), Seq(2L, 2L), Seq(7L), Seq(), (0L until 200L).reverse)
    val df = bags.map(Tuple1(_)).toDF("ids")
    val eager = df.select(explode(pairCombinations(col("ids"))).as("p"))
      .selectExpr("p.id_a", "p.id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val lazily = df.select(pairCombinationsStream(col("ids")).as(Seq("a", "b")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(lazily == eager)
    assert(lazily.forall { case (a, b) => a < b }, "strict id_a < id_b, no self-pairs")
    // the generator has no occupancy cap: a bucket the eager kernel
    // rejects streams through (bounded-fan-out call sites rely on this)
    val n = 4500 // C(4500,2) ≈ 10.1M > DefaultMaxPairs
    val bigDf = Seq(Tuple1((0L until n.toLong))).toDF("ids")
    val cnt = bigDf.select(pairCombinationsStream(col("ids")).as(Seq("a", "b"))).count()
    assert(cnt == n.toLong * (n - 1) / 2)
  }

  test("unicode_normalize canonicalizes composed/decomposed forms; NFKC folds compatibility chars") {
    import graft.functions.GraftFunctions.unicodeNormalize
    val composed = "café"            // é as one codepoint
    val decomposed = "café"         // e + combining acute
    val df = Seq((composed, decomposed)).toDF("a", "b")
    val nfc = df.select(unicodeNormalize(col("a")), unicodeNormalize(col("b")))
      .collect()(0)
    assert(nfc.getString(0) == nfc.getString(1), "NFC must unify composed/decomposed")
    // NFKC folds compatibility characters (ﬁ ligature → fi)
    val nfkc = Seq(Tuple1("ﬁle")).toDF("t")
      .select(unicodeNormalize(col("t"), "NFKC")).collect()(0).getString(0)
    assert(nfkc == "file")
    // normalization composes with the full cleaning pass
    val out = graft.operators.Curation.normalizeText(
        Seq((1L, "  Café\tNOISEhere  ")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect()(0)
    // the literal above carries a decomposed é, a tab, and a BEL control
    // char — NFC composes the accent, tab/BEL become spaces and collapse
    assert(out.getString(1) == "café noise here", s"got '${out.getString(1)}'")
    assert(out.getLong(2) == out.getString(1).length)
  }

  test("cross_pair_combinations emits the full cross product and guards occupancy") {
    import graft.functions.CrossPairCombinations
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val out = Seq((Seq(1L, 2L), Seq(10L, 11L))).toDF("la", "ra")
      .select(graft.functions.GraftFunctions.crossPairCombinations(col("la"), col("ra")).as("p"))
      .selectExpr("explode(p) AS q").selectExpr("q.id_a", "q.id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)))
    val big = Literal.create((0 until 100).map(_.toLong), ArrayType(LongType))
    val capped = CrossPairCombinations(big, big, maxPairs = 10L)
    val e = intercept[IllegalStateException](capped.eval(null))
    assert(e.getMessage.contains("bucket occupancy"))
  }

  test("size_filtered_pair_combinations prunes size-incompatible pairs in-kernel") {
    import graft.functions.GraftFunctions.sizeFilteredPairCombinations
    val df = Seq(Tuple1(Seq((10, 1L), (40, 2L), (18, 3L)))).toDF("e")
      .selectExpr("transform(e, x -> struct(x._1 AS sz, x._2 AS id)) AS entries")
    val out = df.select(explode(sizeFilteredPairCombinations(col("entries"), 0.5)).as("p"))
      .selectExpr("p.id_a", "p.id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // min >= 0.5*max admits (10,18) and nothing touching 40 (18 < 20, 10 < 20)
    assert(out == Set((1L, 3L)), s"got $out")
    // duplicate ids in one bucket never emit a self-pair; output is id-ordered
    val dup = Seq(Tuple1(Seq((10, 7L), (10, 7L), (10, 2L)))).toDF("e")
      .selectExpr("transform(e, x -> struct(x._1 AS sz, x._2 AS id)) AS entries")
      .select(explode(sizeFilteredPairCombinations(col("entries"), 0.9)).as("p"))
      .selectExpr("p.id_a", "p.id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dup.toSet == Set((2L, 7L)), s"got ${dup.toSeq}")
    // occupancy guard fires on the UNFILTERED pair count
    import graft.functions.SizeFilteredPairCombinations
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types._
    val st = ArrayType(StructType(Seq(
      StructField("sz", IntegerType), StructField("id", LongType))))
    val big = Literal.create(
      new GenericArrayData((0 until 100).map(i => InternalRow(1, i.toLong)).toArray), st)
    val e = intercept[IllegalStateException](
      SizeFilteredPairCombinations(big, 0.5, maxPairs = 10L).eval(null))
    assert(e.getMessage.contains("bucket occupancy"))
  }

  test("cosine_sim handles zero vectors and nulls") {
    val zero = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    assert(zero.select(cosineSim($"a", $"b")).collect()(0).getDouble(0) == 0.0)
    val withNull = Seq((Some(Seq(1.0f)), None: Option[Seq[Float]]))
      .toDF("a", "b")
    assert(withNull.select(cosineSim($"a", $"b")).collect()(0).isNullAt(0))
  }

  test("cosine_sim works in SQL via registry") {
    val r = spark.sql("SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("minhash signatures are deterministic and similarity-preserving") {
    val a = (1 to 100).map(i => s"tok$i")
    val b = (1 to 80).map(i => s"tok$i") ++ (200 to 219).map(i => s"tok$i") // ~2/3 jaccard
    val c = (1000 to 1099).map(i => s"tok$i") // disjoint
    val df = Seq((1L, a), (2L, a), (3L, b), (4L, c)).toDF("id", "toks")
    val sigs = df.select($"id", minhashSig($"toks", 128).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L)) // deterministic
    def sim(x: Seq[Long], y: Seq[Long]) =
      x.zip(y).count { case (p, q) => p == q }.toDouble / x.length
    val jacAB = 80.0 / 120.0
    assert(math.abs(sim(sigs(1L), sigs(3L)) - jacAB) < 0.15)
    assert(sim(sigs(1L), sigs(4L)) < 0.05)
  }

  test("simhash: near-identical token sets have small hamming distance") {
    val a = (1 to 200).map(i => s"w$i")
    val b = (1 to 195).map(i => s"w$i") ++ (300 to 304).map(i => s"w$i")
    val c = (500 to 699).map(i => s"w$i")
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "toks")
    val hs = df.select($"id", simhash64($"toks").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(hs(1L), hs(2L)) < 12)
    assert(ham(hs(1L), hs(3L)) > 16)
  }

  test("hamming64 expression") {
    val r = spark.sql("SELECT hamming64(0, 255) AS h, hamming64(7, 7) AS z")
      .collect()(0)
    assert(r.getInt(0) == 8 && r.getInt(1) == 0)
  }

  test("rolling fingerprint: equality iff same minimum window") {
    val r = spark.sql(
      """SELECT rolling_fingerprint('abcdefghij klmnop qrstuv', 8) AS a,
        |       rolling_fingerprint('abcdefghij klmnop qrstuv', 8) AS b,
        |       rolling_fingerprint('zzzz', 8) AS c""".stripMargin).collect()(0)
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) != r.getLong(2))
  }

  test("char_entropy matches -sum(p*log2 p); empty string is 0; SQL-callable") {
    // "aabbc": p = {2/5, 2/5, 1/5} -> 1.5219... (matches DuckDB's entropy())
    val r = spark.sql(
      "SELECT char_entropy('aabbc') AS e, char_entropy('aaaa') AS z, char_entropy('') AS v")
      .collect()(0)
    val expect = {
      val ps = Seq(2.0 / 5, 2.0 / 5, 1.0 / 5)
      -ps.map(p => p * math.log(p) / math.log(2.0)).sum
    }
    assert(math.abs(r.getDouble(0) - expect) < 1e-12)
    assert(r.getDouble(1) == 0.0) // single distinct char
    assert(r.getDouble(2) == 0.0)
    // non-BMP symbols count as ONE code point, not two UTF-16 units — a
    // repeated emoji is a single-symbol distribution (entropy 0), and
    // emoji+ascii is a fair coin (entropy 1), matching a per-character
    // external oracle
    val astral = spark.sql(
      "SELECT char_entropy('😀😀') AS a, char_entropy('😀x') AS b")
      .collect()(0)
    assert(astral.getDouble(0) == 0.0)
    assert(math.abs(astral.getDouble(1) - 1.0) < 1e-12)
  }

  test("char_entropy rejects non-string input at analysis time") {
    val ex = intercept[Exception] {
      spark.sql("SELECT char_entropy(42)").collect()
    }
    assert(ex.getMessage.contains("char_entropy") || ex.getMessage.contains("DATATYPE"))
  }

  test("bloom_might_contain: no false negatives, few false positives") {
    import org.apache.spark.util.sketch.BloomFilter
    val members = (0 until 1000).map(i => s"member_$i")
    val bf = BloomFilter.create(1000, 0.01)
    members.foreach(bf.putString)
    val bytes = { val b = new java.io.ByteArrayOutputStream(); bf.writeTo(b); b.toByteArray }
    val probes = (members ++ (0 until 1000).map(i => s"other_$i")).toDF("s")
    val hits = probes.filter(bloomMightContain($"s", bytes))
      .collect().map(_.getString(0)).toSet
    assert(members.forall(hits.contains), "bloom filters must have NO false negatives")
    assert(hits.size < 1000 + 100, s"fpp blown: ${hits.size - 1000} false positives")
  }

  test("sign sketch is deterministic and bucket count bounded") {
    val v = Seq.fill(64)(0.5f)
    val df = Seq((1L, v), (2L, v)).toDF("id", "vec")
    val sk = df.select($"id", signSketch($"vec", 64, 8, 4).as("sk"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(sk(1L) == sk(2L))
    assert(sk(1L).length == 8)
    assert(sk(1L).forall(b => b >= 0 && b < 16))
  }
}
