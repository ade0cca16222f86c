package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fromText builds the canonical media schema with byte metadata") {
    val df = Multimodal.fromText(
      Seq((1L, "hello"), (2L, "héllo")).toDF("doc_id", "text"), "doc_id", "text")
    assert(df.schema.fieldNames.toSeq ==
      Seq("media_id", "modality", "payload", "meta_format", "meta_bytes"))
    val bytes = df.collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(bytes(1L) == 5L)
    assert(bytes(2L) == 6L) // é is 2 bytes in UTF-8
  }

  test("extractFeatures is deterministic and preserves ids") {
    val media = Multimodal.fromText(
      Tables.load(spark, TestSpark.sf, "documents").limit(50), "doc_id", "text")
    val f1 = Multimodal.extractFeatures(media).collect()
      .map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
    val f2 = Multimodal.extractFeatures(media).collect()
      .map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 50)
  }

  test("sampleFrames fans out every k-th stride frame with a partial tail") {
    // 10-byte payload, 4-byte frames, every 2nd → frames 0 and 2;
    // frame 2 is the 2-byte tail
    val media = Multimodal.fromText(
      Seq((7L, "abcdefghij")).toDF("doc_id", "text"), "doc_id", "text")
    val rows = Multimodal.sampleFrames(media, frameBytes = 4, every = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.toSeq == Seq((0L, 4L), (2L, 2L)))
    // deterministic digests: same payload → same frame hashes
    val h1 = Multimodal.sampleFrames(media).collect().map(_.getLong(3)).toSeq
    val h2 = Multimodal.sampleFrames(media).collect().map(_.getLong(3)).toSeq
    assert(h1 == h2)
  }

  test("fake decode produces fixed-width feature vectors") {
    val media = Multimodal.fromText(
      Seq((1L, "some payload text")).toDF("doc_id", "text"), "doc_id", "text")
    val row = Multimodal.extractFeatures(media).collect()(0)
    assert(row.getSeq[Float](4).length == 8)
    assert(row.getLong(2) == 17L)
  }
}
