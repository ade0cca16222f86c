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

  test("fake decode produces fixed-width feature vectors") {
    val media = Multimodal.fromText(
      Seq((1L, "some payload text")).toDF("doc_id", "text"), "doc_id", "text")
    val row = Multimodal.extractFeatures(media).collect()(0)
    assert(row.getSeq[Float](4).length == 8)
    assert(row.getLong(2) == 17L)
  }
}
