package graft

import org.apache.spark.sql.functions.col
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

  test("WAV codec round-trips samples through a real RIFF parse") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 1000, -999)
    val bytes = Multimodal.WavCodec.encode(samples, 8000)
    // the header is a real RIFF file: ascii tags at the spec'd offsets
    assert(new String(bytes.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(bytes.slice(8, 12), "US-ASCII") == "WAVE")
    val (ch, rate, bits, out) = Multimodal.WavCodec.decode(bytes)
    assert((ch, rate, bits) == ((1, 8000, 16)))
    assert(out.toSeq == samples.toSeq)
  }

  test("WAV decode walks past unknown chunks and rejects non-PCM") {
    // encode() plants a LIST chunk before data — decode must skip it
    val bytes = Multimodal.WavCodec.encode(Array[Short](5, 6), 44100)
    assert(Multimodal.WavCodec.decode(bytes)._4.toSeq == Seq(5, 6))
    // corrupt the fmt tag's audio-format field (offset 20) to 2 (ADPCM)
    val bad = bytes.clone(); bad(20) = 2
    intercept[IllegalArgumentException](Multimodal.WavCodec.decode(bad))
  }

  test("BMP codec round-trips pixels: padding, BGR, bottom-up undone") {
    // width 3 → rowSize 12 with 3 pad bytes; distinct channel values per
    // position so any layout bug misplaces a recognizable pixel
    val w = 3; val h = 2
    def pix(x: Int, y: Int): Int = ((y * w + x) * 3 + 1) << 16 |
      ((y * w + x) * 3 + 2) << 8 | ((y * w + x) * 3 + 3)
    val bytes = Multimodal.BmpCodec.encode(w, h, pix)
    assert(bytes.length == 54 + 12 * 2) // 54 headers + 2 padded rows
    val (dw, dh, px) = Multimodal.BmpCodec.decode(bytes)
    assert((dw, dh) == ((w, h)))
    assert(px.toSeq == (0 until w * h).map(i => pix(i % w, i / w)))
    // stored bottom-up: byte 54 starts the LAST output row (y=1, x=0, B)
    assert((bytes(54) & 0xFF) == ((1 * w + 0) * 3 + 3))
  }

  test("decodeWav/decodeBmp run partition-parallel over synthetic tables") {
    val ids = Seq(0L, 1L, 8L, 63L, 64L).toDF("doc_id")
    val wav = Multimodal.decodeWav(Multimodal.syntheticWavTable(ids, "doc_id"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getSeq[Int](4).length)).toMap
    // header fields come from the parse; sample count follows the fixture formula
    assert(wav(0L) == ((1L, 8000L, 16L, 64)))
    assert(wav(63L) == ((1L, 8000L, 16L, 127)))
    assert(wav(64L) == ((1L, 8000L, 16L, 64)))
    // fixture formula spot-check: id=1, i=0 → (31 % 2003) − 1001 = −970
    val s1 = Multimodal.decodeWav(Multimodal.syntheticWavTable(ids, "doc_id"))
      .filter(col("media_id") === 1L).collect()(0).getSeq[Int](4)
    assert(s1.head == -970)
    val bmp = Multimodal.decodeBmp(Multimodal.syntheticBmpTable(ids, "doc_id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bmp(0L) == ((16L, 8L)))
    assert(bmp(8L) == ((24L, 8L)))
    // pixel formula spot-check: id=8, x=0, y=0 → r=8, g=16, b=40
    val px8 = Multimodal.decodeBmp(Multimodal.syntheticBmpTable(ids, "doc_id"))
      .filter(col("media_id") === 8L).collect()(0).getSeq[Int](3)
    assert(px8.head == ((8 << 16) | (16 << 8) | 40))
  }

  test("PngCodec round-trips through every filter type and rejects unsupported forms") {
    val (w, h) = (19, 10) // 10 rows → filters 0..4 each applied twice
    def pix(x: Int, y: Int): Int =
      (((x * 7 + y * 13) % 256) << 16) | (((x + y * y) % 256) << 8) | ((x * x + y) % 256)
    val bytes = Multimodal.PngCodec.encode(w, h, pix)
    // real PNG signature + IHDR chunk
    assert((bytes(0) & 0xFF) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G')
    assert(new String(bytes.slice(12, 16)) == "IHDR")
    val (dw, dh, px) = Multimodal.PngCodec.decode(bytes)
    assert((dw, dh) == ((w, h)))
    assert(px.toSeq == (0 until w * h).map(i => pix(i % w, i / w)))
    // a javax.imageio reader agrees — the hand-rolled encoder emits real
    // PNGs, not a private format only our decoder understands
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img.getWidth == w && img.getHeight == h)
    assert((img.getRGB(5, 7) & 0xFFFFFF) == pix(5, 7))
    // unsupported shapes are loud, not silently wrong
    assert(intercept[IllegalArgumentException] {
      Multimodal.PngCodec.decode("nope".getBytes)
    }.getMessage.contains("not a PNG"))
  }

  test("decodePng runs partition-parallel over the synthetic table") {
    val ids = Seq(0L, 3L, 8L).toDF("doc_id")
    val png = Multimodal.decodePng(Multimodal.syntheticPngTable(ids, "doc_id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(png(0L) == ((16L, 10L)))
    assert(png(8L) == ((24L, 10L)))
    // pixel formula spot-check: id=3, x=2, y=4 → r=27, g=29, b=50
    val px3 = Multimodal.decodePng(Multimodal.syntheticPngTable(ids, "doc_id"))
      .filter(col("media_id") === 3L).collect()(0).getSeq[Int](3)
    val w3 = 16 + 3 % 9
    assert(px3(4 * w3 + 2) == ((27 << 16) | (29 << 8) | 50))
  }
}
