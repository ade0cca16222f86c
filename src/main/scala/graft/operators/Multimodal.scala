package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media payloads are opaque `binary` columns
  * with typed metadata alongside. The Spark-side plumbing — schema,
  * partition-preserving batch processing, feature schema — is real; the
  * actual media decode is STUBBED (no image/audio codecs in this
  * environment) behind [[FakeDecoder]], a deterministic stand-in with the
  * same signature a real decoder (e.g. javacv / a JNI codec) would have.
  */
object Multimodal {

  /** Canonical media-row schema: id, modality tag, opaque payload, metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta_format", StringType, nullable = true),
    StructField("meta_bytes", LongType, nullable = true)))

  /** Build a media table from any (id, text) table by treating the UTF-8
    * bytes as an opaque payload — exercises the binary-column plumbing with
    * real data shapes. */
  def fromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit("text").as("modality"),
      col(textCol).cast("binary").as("payload"),
      lit("utf-8").as("meta_format"),
      octet_length(col(textCol).cast("binary")).cast("long").as("meta_bytes"))

  /** Extracted-feature schema a real decoder would produce. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("content_hash", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = true)))

  /** ======= STUB: deterministic fake media decode =======
    * A real implementation would decode image/audio/video here (resize,
    * frame-sample, spectrogram, ...). This environment ships no codecs, so
    * the decode is a deterministic fake: an 8-dim "feature" derived from
    * byte statistics. Everything around it — mapPartitions batching (one
    * decoder init per partition, as a real codec needs), schema, narrow
    * no-shuffle execution — is the real production plumbing. */
  object FakeDecoder {
    def decode(modality: String, payload: Array[Byte]): Array[Float] = {
      if (payload == null) return Array.fill(8)(0.0f)
      val f = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        f(i % 8) += (payload(i) & 0xFF) / 255.0f
        i += 1
      }
      val n = math.max(payload.length / 8, 1)
      f.map(_ / n)
    }
  }

  /** Sampled-frame schema: one row per sampled frame of a media payload. */
  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("frame_bytes", LongType, nullable = false),
    StructField("frame_hash", LongType, nullable = false)))

  /** Frame sampling: the payload is treated as consecutive `frameBytes`-wide
    * frames (a real video decoder would surface codec frames; the fixed
    * stride is the stub), and every `every`-th frame is emitted as its own
    * row — the one-media-row → many-frame-rows batch shape of video
    * pipelines. Partition-parallel flatMap, digest init once per partition,
    * no shuffle; downstream ops (dedup, embedding) treat frames as
    * first-class rows. `frame_hash` is the md5-top-60-bits content digest
    * ([[extractFeatures]]'s convention, reproducible by any SQL engine).
    * The final frame may be shorter than `frameBytes`. */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64, every: Int = 4): DataFrame = {
    require(frameBytes > 0 && every > 0)
    val enc = Encoders.row(frameSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.flatMap { r =>
        val id = r.getLong(0)
        val payload = if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
        val nFrames = (payload.length + frameBytes - 1) / frameBytes
        (0 until nFrames by every).iterator.map { idx =>
          val from = idx * frameBytes
          val until = math.min(from + frameBytes, payload.length)
          val frame = java.util.Arrays.copyOfRange(payload, from, until)
          val d = md.digest(frame)
          var h = 0L
          var i = 0
          while (i < 8) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
          Row(id, idx.toLong, (until - from).toLong, h >>> 4)
        }
      }
    }(enc)
  }

  /** Feature extraction over the media table: partition-parallel, one
    * decoder per partition, no shuffle. `content_hash` is the top 60 bits of
    * the payload's MD5 (big-endian) — an engine-portable content digest any
    * SQL oracle reproduces as `('0x' || substr(md5(payload), 1, 15))::BIGINT`
    * (60 bits so the value fits a signed 64-bit integer in every engine). */
  def extractFeatures(media: DataFrame): DataFrame = {
    val enc = Encoders.row(featureSchema)
    media.select("media_id", "modality", "payload").mapPartitions { rows =>
      // per-partition decoder/digest init (codec contexts and MessageDigest
      // instances are not serializable; this placement is the real pattern)
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id = r.getLong(0)
        val modality = r.getString(1)
        val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
        val nBytes = if (payload == null) 0L else payload.length.toLong
        val hash = if (payload == null) 0L else {
          val d = md.digest(payload)
          var h = 0L
          var i = 0
          while (i < 8) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
          h >>> 4 // top 60 bits = first 15 hex digits of the md5
        }
        Row(id, modality, nBytes, hash, FakeDecoder.decode(modality, payload))
      }
    }(enc)
  }
}
