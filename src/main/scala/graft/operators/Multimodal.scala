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

  /** ======= REAL pure-JVM codecs: BMP (24-bit) and WAV (16-bit PCM) =======
    * These two formats need no native codec — the writers/parsers below
    * implement the actual on-disk formats (RIFF chunk walking, the
    * BITMAPFILEHEADER/BITMAPINFOHEADER pair, bottom-up row order, BGR
    * byte order, 4-byte row padding), so [[decodeBmp]]/[[decodeWav]] are
    * REAL decodes whose outputs are verifiable against the pixels/samples
    * that went in — unlike [[FakeDecoder]], which stands in for the
    * codec-backed formats (JPEG/MP3/H.264) this environment cannot
    * decode. */
  object WavCodec {
    /** Mono 16-bit PCM WAV: RIFF("WAVE") + fmt + a LIST chunk the decoder
      * must SKIP (so the chunk walk is exercised, not just assumed) +
      * data. */
    def encode(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val listLen = 4 // "INFO", no entries
      val riffLen = 4 + (8 + 16) + (8 + listLen) + (8 + dataLen)
      val buf = java.nio.ByteBuffer.allocate(8 + riffLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2) // byte rate
        .putShort(2)            // block align
        .putShort(16)           // bits per sample
      buf.put("LIST".getBytes("US-ASCII")).putInt(listLen)
        .put("INFO".getBytes("US-ASCII"))
      buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(buf.putShort)
      buf.array()
    }

    /** Parse a PCM WAV: walks the RIFF chunks (unknown chunks skipped,
      * odd-length chunks padded per spec) to the fmt and data chunks.
      * Returns (numChannels, sampleRate, bitsPerSample, samples) —
      * 16-bit mono PCM only; anything else fails loudly. */
    def decode(bytes: Array[Byte]): (Int, Int, Int, Array[Short]) = {
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
      }
      require(tag() == "RIFF", "not a RIFF file")
      buf.getInt // riff length
      require(tag() == "WAVE", "not a WAVE file")
      var channels, rate, bits = -1
      var samples: Array[Short] = null
      while (buf.remaining() >= 8 && (samples == null || channels < 0)) {
        val id = tag()
        val len = buf.getInt
        val next = buf.position() + len + (len & 1) // chunks pad to even
        id match {
          case "fmt " =>
            val fmt = buf.getShort
            require(fmt == 1, s"not PCM (fmt=$fmt)")
            channels = buf.getShort
            rate = buf.getInt
            buf.getInt; buf.getShort // byte rate, block align
            bits = buf.getShort
            require(bits == 16, s"only 16-bit PCM supported, got $bits")
          case "data" =>
            samples = new Array[Short](len / 2)
            var i = 0
            while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
          case _ => // skip (LIST etc.)
        }
        buf.position(next)
      }
      require(channels > 0 && samples != null, "missing fmt or data chunk")
      (channels, rate, bits, samples)
    }
  }

  object BmpCodec {
    /** 24-bit uncompressed BMP: BITMAPFILEHEADER + BITMAPINFOHEADER +
      * bottom-up BGR rows, each padded to 4 bytes. `pixel(x, y)` returns
      * packed 0xRRGGBB for the TOP-DOWN coordinate (x right, y down). */
    def encode(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
      val rowSize = ((w * 3 + 3) / 4) * 4
      val dataSize = rowSize * h
      val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put('B'.toByte).put('M'.toByte)
        .putInt(54 + dataSize).putInt(0).putInt(54) // file size, reserved, offBits
      buf.putInt(40).putInt(w).putInt(h) // info header size, width, +height = bottom-up
        .putShort(1).putShort(24)        // planes, bpp
        .putInt(0).putInt(dataSize)      // BI_RGB, image size
        .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette unused
      var yUp = h - 1
      while (yUp >= 0) { // rows bottom-up
        var x = 0
        var written = 0
        while (x < w) {
          val p = pixel(x, yUp)
          buf.put((p & 0xFF).toByte)         // B
            .put(((p >> 8) & 0xFF).toByte)   // G
            .put(((p >> 16) & 0xFF).toByte)  // R
          written += 3
          x += 1
        }
        while (written < rowSize) { buf.put(0.toByte); written += 1 }
        yUp -= 1
      }
      buf.array()
    }

    /** Parse a 24-bit uncompressed BMP. Returns (width, height, pixels)
      * with pixels packed 0xRRGGBB in ROW-MAJOR TOP-DOWN order — i.e. the
      * parser undoes the format's bottom-up row layout, BGR byte order
      * and row padding (all three are the classic BMP-reader bugs; the
      * position-weighted oracle sum catches each). */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      val buf = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
      val offBits = buf.getInt(10)
      val w = buf.getInt(18)
      val h = buf.getInt(22)
      require(h > 0, "top-down BMPs (negative height) not supported")
      require(buf.getShort(28) == 24, "only 24-bit BMPs supported")
      require(buf.getInt(30) == 0, "compressed BMPs not supported")
      val rowSize = ((w * 3 + 3) / 4) * 4
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) { // output top-down; stored rows are bottom-up
        val base = offBits + (h - 1 - y) * rowSize
        var x = 0
        while (x < w) {
          val b = bytes(base + 3 * x) & 0xFF
          val g = bytes(base + 3 * x + 1) & 0xFF
          val r = bytes(base + 3 * x + 2) & 0xFF
          out(y * w + x) = (r << 16) | (g << 8) | b
          x += 1
        }
        y += 1
      }
      (w, h, out)
    }
  }

  object PngCodec {
    private val Signature =
      Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val out = java.nio.ByteBuffer.allocate(12 + data.length) // PNG ints are BE
      out.putInt(data.length).put(t).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      out.putInt(crc.getValue.toInt)
      out.array()
    }

    /** Non-interlaced 8-bit truecolor (RGB) PNG via the JDK's zlib.
      * `pixel(x, y)` returns packed 0xRRGGBB top-down. Row y is encoded
      * with filter type `y % 5` — every PNG filter (None/Sub/Up/Average/
      * Paeth) appears in each image taller than 4 rows, so a decoder that
      * mishandles ANY unfilter path produces wrong pixels. */
    def encode(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
      val bpp = 3
      val stride = w * bpp
      val raw = Array.ofDim[Byte](h, stride)
      for (y <- 0 until h; x <- 0 until w) {
        val p = pixel(x, y)
        raw(y)(x * 3) = ((p >> 16) & 0xFF).toByte
        raw(y)(x * 3 + 1) = ((p >> 8) & 0xFF).toByte
        raw(y)(x * 3 + 2) = (p & 0xFF).toByte
      }
      val filtered = new Array[Byte](h * (1 + stride))
      for (y <- 0 until h) {
        val f = y % 5
        filtered(y * (1 + stride)) = f.toByte
        var i = 0
        while (i < stride) {
          val cur = raw(y)(i) & 0xFF
          val left = if (i >= bpp) raw(y)(i - bpp) & 0xFF else 0
          val up = if (y > 0) raw(y - 1)(i) & 0xFF else 0
          val ul = if (y > 0 && i >= bpp) raw(y - 1)(i - bpp) & 0xFF else 0
          val pred = f match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 => paeth(left, up, ul)
          }
          filtered(y * (1 + stride) + 1 + i) = ((cur - pred) & 0xFF).toByte
          i += 1
        }
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(filtered); deflater.finish()
      val zBuf = new java.io.ByteArrayOutputStream()
      val tmp = new Array[Byte](8192)
      while (!deflater.finished()) zBuf.write(tmp, 0, deflater.deflate(tmp))
      deflater.end()
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h)
        .put(8.toByte)  // bit depth
        .put(2.toByte)  // color type: truecolor RGB
        .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
        .array()
      Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", zBuf.toByteArray) ++
        chunk("IEND", Array.emptyByteArray)
    }

    /** Parse a non-interlaced 8-bit truecolor PNG: chunk walk (IDAT may be
      * split), JDK Inflater, and the full 5-filter unfilter pass. Returns
      * (width, height, pixels packed 0xRRGGBB row-major top-down). Palette,
      * alpha, 16-bit and interlaced images are loudly rejected — this is
      * the planted-fixture decode path, not a general image library. */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      require(bytes.length > 8 && Signature.indices.forall(i => bytes(i) == Signature(i)),
        "not a PNG")
      val buf = java.nio.ByteBuffer.wrap(bytes)
      buf.position(8)
      var w = 0; var h = 0
      val idat = new java.io.ByteArrayOutputStream()
      var sawIhdr = false; var done = false
      while (!done && buf.remaining() >= 12) {
        val len = buf.getInt
        val t = new Array[Byte](4); buf.get(t)
        val typ = new String(t, java.nio.charset.StandardCharsets.US_ASCII)
        val data = new Array[Byte](len); buf.get(data)
        buf.getInt // CRC (not verified: planted fixtures, not hostile input)
        typ match {
          case "IHDR" =>
            sawIhdr = true
            val ib = java.nio.ByteBuffer.wrap(data)
            w = ib.getInt; h = ib.getInt
            require(ib.get() == 8, "only 8-bit PNGs supported")
            require(ib.get() == 2, "only truecolor (RGB) PNGs supported")
            ib.get() // compression (always 0 per spec)
            ib.get() // filter method (always 0)
            require(ib.get() == 0, "interlaced PNGs not supported")
          case "IDAT" => idat.write(data)
          case "IEND" => done = true
          case _      => () // ancillary chunks skipped
        }
      }
      require(sawIhdr && w > 0 && h > 0, "missing/empty IHDR")
      val bpp = 3
      val stride = w * bpp
      val inflater = new java.util.zip.Inflater()
      inflater.setInput(idat.toByteArray)
      val filtered = new Array[Byte](h * (1 + stride))
      var off = 0
      while (off < filtered.length && !inflater.finished()) {
        val n = inflater.inflate(filtered, off, filtered.length - off)
        require(n > 0 || !inflater.needsInput, "truncated IDAT stream")
        off += n
      }
      inflater.end()
      require(off == filtered.length, s"IDAT inflated to $off bytes, expected ${filtered.length}")
      val raw = Array.ofDim[Byte](h, stride)
      for (y <- 0 until h) {
        val f = filtered(y * (1 + stride)) & 0xFF
        require(f <= 4, s"unknown PNG filter type $f")
        var i = 0
        while (i < stride) {
          val cur = filtered(y * (1 + stride) + 1 + i) & 0xFF
          val left = if (i >= bpp) raw(y)(i - bpp) & 0xFF else 0
          val up = if (y > 0) raw(y - 1)(i) & 0xFF else 0
          val ul = if (y > 0 && i >= bpp) raw(y - 1)(i - bpp) & 0xFF else 0
          val pred = f match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) / 2
            case 4 => paeth(left, up, ul)
          }
          raw(y)(i) = ((cur + pred) & 0xFF).toByte
          i += 1
        }
      }
      val out = new Array[Int](w * h)
      for (y <- 0 until h; x <- 0 until w) {
        out(y * w + x) = ((raw(y)(x * 3) & 0xFF) << 16) |
          ((raw(y)(x * 3 + 1) & 0xFF) << 8) | (raw(y)(x * 3 + 2) & 0xFF)
      }
      (w, h, out)
    }
  }

  /** Deterministic WAV fixture table from an id column: mono 8 kHz 16-bit
    * PCM, `64 + id % 64` samples, sample i = ((id·31 + i·17) mod 2003) −
    * 1001 — integer formulas a SQL oracle recomputes exactly, so the
    * DECODED stats are externally verifiable. Partition-parallel encode,
    * no shuffle. */
  def syntheticWavTable(ids: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.row(mediaSchema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val n = (64 + id % 64).toInt
        val samples = Array.tabulate(n)(i =>
          ((id * 31 + i * 17) % 2003 - 1001).toShort)
        val payload = WavCodec.encode(samples, 8000)
        Row(id, "audio/wav", payload, "pcm_s16le", payload.length.toLong)
      }
    }(enc)
  }

  /** Deterministic BMP fixture table from an id column: `16 + id % 9` ×
    * 8 images (widths 16–24 — most rows need real padding), channels
    * r = (id + 3x + 7y) mod 256, g = (2id + x + 5y) mod 256,
    * b = (5id + 11x + y) mod 256 in top-down coordinates. The distinct
    * per-channel formulas make a BGR/RGB swap visible; the y-dependence
    * makes a bottom-up/top-down flip visible. */
  def syntheticBmpTable(ids: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.row(mediaSchema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = (16 + id % 9).toInt
        val payload = BmpCodec.encode(w, 8, (x, y) => {
          val rr = ((id + 3 * x + 7 * y) % 256).toInt
          val gg = ((2 * id + x + 5 * y) % 256).toInt
          val bb = ((5 * id + 11 * x + y) % 256).toInt
          (rr << 16) | (gg << 8) | bb
        })
        Row(id, "image/bmp", payload, "bmp24", payload.length.toLong)
      }
    }(enc)
  }

  /** Deterministic PNG fixture table from an id column: `16 + id % 9` ×
    * 10 truecolor images (10 rows → every PNG filter type appears twice),
    * channels r = (3id + 5x + 2y) mod 256, g = (id + 7x + 3y) mod 256,
    * b = (4id + x + 9y) mod 256 top-down — distinct per-channel formulas
    * catch an RGB swap, y-dependence catches a row flip, and the per-row
    * filter rotation makes every unfilter path load-bearing. */
  def syntheticPngTable(ids: DataFrame, idCol: String): DataFrame = {
    val enc = Encoders.row(mediaSchema)
    ids.select(col(idCol).cast("long")).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val w = (16 + id % 9).toInt
        val payload = PngCodec.encode(w, 10, (x, y) => {
          val rr = ((3 * id + 5 * x + 2 * y) % 256).toInt
          val gg = ((id + 7 * x + 3 * y) % 256).toInt
          val bb = ((4 * id + x + 9 * y) % 256).toInt
          (rr << 16) | (gg << 8) | bb
        })
        Row(id, "image/png", payload, "png_rgb8", payload.length.toLong)
      }
    }(enc)
  }

  /** REAL PNG decode over a media table: partition-parallel chunk walk +
    * JDK-zlib inflate + full 5-filter unfilter, one pass, no shuffle.
    * Same output shape as [[decodeBmp]]. */
  def decodePng(media: DataFrame): DataFrame = {
    val enc = Encoders.row(bmpDecodedSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = PngCodec.decode(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), w.toLong, h.toLong, px)
      }
    }(enc)
  }

  private val wavDecodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_channels", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("bits_per_sample", LongType, nullable = false),
    StructField("samples", ArrayType(IntegerType, containsNull = false), nullable = false)))

  /** REAL WAV decode over a media table: partition-parallel RIFF parse
    * (one pass, no shuffle) to (media_id, n_channels, sample_rate,
    * bits_per_sample, samples). Header fields come from the PARSED bytes,
    * not from assumptions — a mis-read fmt chunk or a chunk-walk bug
    * surfaces in the output. Sample stats stay declarative downstream
    * (explode + grouped aggregate). */
  def decodeWav(media: DataFrame): DataFrame = {
    val enc = Encoders.row(wavDecodedSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val (ch, rate, bits, samples) = WavCodec.decode(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), ch.toLong, rate.toLong, bits.toLong,
          samples.map(_.toInt))
      }
    }(enc)
  }

  private val bmpDecodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("pixels", ArrayType(IntegerType, containsNull = false), nullable = false)))

  /** REAL BMP decode over a media table: partition-parallel header+pixel
    * parse to (media_id, width, height, pixels packed 0xRRGGBB row-major
    * top-down). Width/height come from the parsed BITMAPINFOHEADER;
    * pixel order undoes bottom-up storage, BGR bytes and row padding. */
  def decodeBmp(media: DataFrame): DataFrame = {
    val enc = Encoders.row(bmpDecodedSchema)
    media.select("media_id", "payload").mapPartitions { rows =>
      rows.map { r =>
        val (w, h, px) = BmpCodec.decode(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), w.toLong, h.toLong, px)
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
