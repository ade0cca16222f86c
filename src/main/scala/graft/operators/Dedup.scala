package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * All near-dup variants follow the same scale-safe shape: per-document
  * signature (narrow, one pass) → candidate generation via an equi-join on
  * LSH bucket keys (a shuffle on small keys — never an N² crossJoin) →
  * exact verification on the candidate pairs only. At 100 TB the bucket join
  * is the only shuffle and its width is #docs × #bands rows of (key, id),
  * independent of document size.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest id per group.
    * Map-side partial aggregation makes this one narrow shuffle. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n"))

  /** Distinct word n-gram shingles of a text column (built-in composition:
    * split → sequence → transform → array_distinct; no UDF). */
  def wordShingles(textCol: Column, n: Int): Column = {
    val toks = split(textCol, " ")
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(toks) - (n - 1), lit(0))),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Exact Jaccard similarity between two array columns (on distinct sets). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b)))
  }

  /** MinHash + LSH near-duplicate pairs.
    *
    * shingle(n words) → minhash signature (`numHashes` slots) → `bands`
    * bands of `numHashes/bands` rows hashed to a bucket key → self-join on
    * (band, bucket) → exact Jaccard verification at `threshold`.
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
    val rows = numHashes / bands
    val sh = df
      .select(col(idCol).as("id"), wordShingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
    val sig = sh.withColumn("sig", minhashSig(col("sh"), numHashes))
    // one row per (doc, band): bucket = hash of the band's signature slice
    val buckets = sig.select(
      col("id"), col("sh"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => hash(slice(col("sig"), b * lit(rows) + 1, lit(rows)), b))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    val left = buckets.select(col("band"), col("bucket"), col("id").as("id_a"), col("sh").as("sh_a"))
    val right = buckets.select(col("band"), col("bucket"), col("id").as("id_b"), col("sh").as("sh_b"))
    left.join(right, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b"))
      .dropDuplicates("id_a", "id_b")
      .filter(jaccard(col("sh_a"), col("sh_b")) >= threshold)
      .select("id_a", "id_b")
  }

  /** SimHash near-duplicate pairs: 64-bit simhash over word shingles, banded
    * into four 16-bit keys (a pair within Hamming distance 3 of each other
    * collides on at least one band by pigeonhole — exact recall, no
    * probabilistic misses), verified by exact Hamming distance. */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      maxHamming: Int = 3): DataFrame = {
    val sig = df
      .select(col(idCol).as("id"), wordShingles(col(textCol), shingleSize).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("sim", simhash64(col("sh")))
      .select(col("id"), col("sim"))
    val banded = sig.select(
      col("id"), col("sim"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("sim"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
    val left = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("sim").as("sim_a"))
    val right = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("sim").as("sim_b"))
    left.join(right, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sim_a"), col("sim_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming64(col("sim_a"), col("sim_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming").cast("long").as("hamming"))
  }

  /** Exact n-gram Jaccard dedup within a blocking key (e.g. source/domain):
    * deterministic (no LSH), the blocking key bounds the pair blow-up. The
    * join is an equi-join on the block, so it scales with the largest block,
    * not the corpus. Returns (id_a, id_b, jac rounded to 6dp). */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockCol: String,
      n: Int = 2,
      threshold: Double = 0.5): DataFrame = {
    val sh = df.select(
      col(blockCol).as("block"),
      col(idCol).as("id"),
      wordShingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val a = sh.select(col("block"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("block"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jac", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jac"), 6).as("jac"))
  }

  /** Embedding near-duplicate pairs via random-hyperplane (sign) LSH:
    * `tables` independent `bitsPerTable`-bit sign sketches; bucket-join on
    * each sketch; exact cosine verification at `threshold`.
    *
    * With cos θ ≥ 0.95 (θ ≤ 18.2°), P(bit match) = 1 − θ/π ≈ 0.899;
    * P(miss in all of 32 8-bit tables) = (1 − 0.899^8)^32 ≈ 2e-9. The
    * hyperplanes are a fixed seeded pseudo-random matrix, broadcast as a
    * literal — deterministic across runs and executors. */
  def embeddingPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double = 0.95,
      tables: Int = 32,
      bitsPerTable: Int = 8): DataFrame = {
    val sk = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      posexplode(signSketch(col(vecCol), dim, tables, bitsPerTable)))
      .withColumnRenamed("pos", "tbl")
      .withColumnRenamed("col", "bucket")
    val left = sk.select(col("tbl"), col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val right = sk.select(col("tbl"), col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    left.join(right, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("v_a"), col("v_b"))
      .dropDuplicates("id_a", "id_b")
      .filter(cosineSim(col("v_a"), col("v_b")) >= threshold)
      .select("id_a", "id_b")
  }
}
