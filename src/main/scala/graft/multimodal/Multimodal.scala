package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support for training-data
  * pipelines: payloads are opaque `binary` columns with a typed metadata
  * struct; decode / feature-extraction / resize / frame-sampling run as
  * `mapPartitions` over the binary batches — the Scala analogue of
  * `mapInPandas`, one codec instantiation per partition, streaming through
  * rows without collecting.
  *
  * Codecs behind the [[Codec]] seam: [[BmpCodec]] (uncompressed 24-bit
  * BI_RGB Windows BMP), [[PngCodec]] (8-bit truecolor PNG — zlib via the
  * JDK's Inflater/Deflater, all five scanline filters) and [[WavCodec]]
  * (RIFF/WAVE 16-bit PCM) decode actual container bytes, pure JVM;
  * [[FakeCodec]] remains as the deterministic synthetic "GRFT" container
  * for formats this environment has no library for (JPEG/MP3 need native
  * codecs). The Spark-side plumbing — schema, batch iteration, partition
  * sizing, output shapes — is codec-agnostic.
  */
object Multimodal {

  // ------------------------------------------------------------- data model

  val MetaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Decoded in-memory form a real codec would produce. */
  final case class Decoded(format: String, width: Int, height: Int,
      channels: Int, nFrames: Int, pixels: Array[Byte])

  /** Codec seam: swap [[FakeCodec]] for a real image/audio backend. */
  trait Codec extends Serializable {
    def decode(payload: Array[Byte]): Decoded
    def encode(d: Decoded): Array[Byte]
  }

  /** STUB codec for the synthetic GRFT container:
    * header = "GRFT" ++ 4×int32BE (width, height, channels, nFrames),
    * body = width*height*channels*nFrames bytes (row-major frames).
    * Non-GRFT payloads "decode" deterministically from their bytes so the
    * pipeline is total — clearly NOT a real decoder. */
  object FakeCodec extends Codec {
    private val Magic = "GRFT".getBytes("ASCII")

    def encode(d: Decoded): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(20 + d.pixels.length)
      bb.put(Magic).putInt(d.width).putInt(d.height)
        .putInt(d.channels).putInt(d.nFrames).put(d.pixels)
      bb.array()
    }

    def decode(payload: Array[Byte]): Decoded =
      if (payload.length >= 20 && payload.startsWith(Magic)) {
        val bb = java.nio.ByteBuffer.wrap(payload, 4, 16)
        val w = bb.getInt; val h = bb.getInt; val c = bb.getInt; val f = bb.getInt
        Decoded("grft", w, h, c, f,
          java.util.Arrays.copyOfRange(payload, 20, payload.length))
      } else {
        // deterministic pseudo-decode of foreign bytes (stub fallback)
        val w = 1 + math.floorMod(payload.length, 64)
        Decoded("unknown", w, 1, 1, 1, payload.take(w))
      }
  }

  /** REAL pure-JVM image codec: uncompressed 24-bit BI_RGB Windows BMP
    * (BITMAPINFOHEADER). Handles the three byte-layout traps a naive
    * reader gets wrong — rows stored bottom-up (positive height) or
    * top-down (negative height), per-pixel BGR order, and 4-byte row
    * padding — and normalizes to the seam's row-major top-down RGB
    * `Decoded`. Unsupported variants (palette/16/32-bpp, RLE, core
    * header) raise a typed error rather than mis-decoding. */
  object BmpCodec extends Codec {
    private def u16(a: Array[Byte], o: Int): Int =
      (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8)
    private def i32(a: Array[Byte], o: Int): Int =
      (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8) |
        ((a(o + 2) & 0xff) << 16) | ((a(o + 3) & 0xff) << 24)
    private def putU16(a: Array[Byte], o: Int, v: Int): Unit = {
      a(o) = v.toByte; a(o + 1) = (v >>> 8).toByte
    }
    private def putI32(a: Array[Byte], o: Int, v: Int): Unit = {
      a(o) = v.toByte; a(o + 1) = (v >>> 8).toByte
      a(o + 2) = (v >>> 16).toByte; a(o + 3) = (v >>> 24).toByte
    }
    private def bad(why: String): Nothing =
      throw graft.OpenEoError("CodecError", s"BmpCodec: $why")

    /** Writes canonical bottom-up 24-bpp BI_RGB. `Decoded` must carry
      * channels=3, nFrames=1, pixels row-major top-down RGB. */
    def encode(d: Decoded): Array[Byte] = {
      if (d.channels != 3 || d.nFrames != 1)
        bad(s"encode needs channels=3, nFrames=1 (got ${d.channels}/${d.nFrames})")
      if (d.pixels.length != d.width * d.height * 3)
        bad(s"pixel buffer ${d.pixels.length} != ${d.width}x${d.height}x3")
      val rowSize = ((d.width * 3 + 3) / 4) * 4
      val imageSize = rowSize * d.height
      val out = Array.ofDim[Byte](54 + imageSize) // padding pre-zeroed
      out(0) = 'B'; out(1) = 'M'
      putI32(out, 2, 54 + imageSize); putI32(out, 10, 54)
      putI32(out, 14, 40); putI32(out, 18, d.width); putI32(out, 22, d.height)
      putU16(out, 26, 1); putU16(out, 28, 24)
      putI32(out, 34, imageSize)
      putI32(out, 38, 2835); putI32(out, 42, 2835) // 72 dpi in px/metre
      var y = 0
      while (y < d.height) {
        val fileRow = d.height - 1 - y // bottom-up
        var x = 0
        while (x < d.width) {
          val src = (y * d.width + x) * 3
          val dst = 54 + fileRow * rowSize + x * 3
          out(dst) = d.pixels(src + 2)     // B
          out(dst + 1) = d.pixels(src + 1) // G
          out(dst + 2) = d.pixels(src)     // R
          x += 1
        }
        y += 1
      }
      out
    }

    def decode(payload: Array[Byte]): Decoded = {
      if (payload.length < 54 || payload(0) != 'B' || payload(1) != 'M')
        bad("not a BMP (missing 'BM' magic or truncated header)")
      val dataOffset = i32(payload, 10)
      val dibSize = i32(payload, 14)
      if (dibSize < 40) bad(s"unsupported DIB header size $dibSize (BITMAPCOREHEADER?)")
      val width = i32(payload, 18)
      val rawHeight = i32(payload, 22)
      val topDown = rawHeight < 0
      val height = math.abs(rawHeight)
      val bpp = u16(payload, 28)
      val compression = i32(payload, 30)
      if (bpp != 24) bad(s"unsupported bit depth $bpp (only 24-bpp BI_RGB)")
      if (compression != 0) bad(s"unsupported compression $compression (only BI_RGB)")
      if (width <= 0 || height <= 0) bad(s"bad dimensions ${width}x$rawHeight")
      if (dataOffset < 54 || dataOffset > payload.length)
        bad(s"data offset $dataOffset outside [54, ${payload.length}]")
      // header fields are untrusted: do the size math in Long so a
      // hostile width (~2^30) can't overflow into a passing bounds check
      val rowSizeL = ((width.toLong * 3 + 3) / 4) * 4
      val needL = dataOffset.toLong + rowSizeL * height
      if (needL > payload.length)
        bad(s"truncated pixel data: need $needL, have ${payload.length}")
      val rowSize = rowSizeL.toInt
      val px = Array.ofDim[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val fileRow = if (topDown) y else height - 1 - y
        var x = 0
        while (x < width) {
          val src = dataOffset + fileRow * rowSize + x * 3
          val dst = (y * width + x) * 3
          px(dst) = payload(src + 2)     // R
          px(dst + 1) = payload(src + 1) // G
          px(dst + 2) = payload(src)     // B
          x += 1
        }
        y += 1
      }
      Decoded("bmp", width, height, 3, 1, px)
    }
  }

  /** REAL pure-JVM image codec: PNG, 8-bit truecolor (color type 2),
    * non-interlaced — the subset an encoder of RGB training images
    * actually emits (PNG spec, RFC 2083 / W3C PNG 2nd ed.). zlib is the
    * JDK's `java.util.zip.Inflater`/`Deflater`; no native libraries.
    *
    * The hard part of PNG is scanline filtering: each row is predicted
    * from its left/up/up-left neighbors under one of five filter types
    * (None/Sub/Up/Average/Paeth) BEFORE deflate. [[encode]] deliberately
    * cycles the filter type per row (`y % 5`) so every reconstruction
    * path is exercised by any multi-row round-trip, and [[decode]]
    * implements all five, byte-exact mod-256 arithmetic with the Paeth
    * tie-break order (left, up, up-left) from the spec. Chunk CRCs are
    * verified on read; header fields are untrusted, so all size math is
    * Long-checked before allocation (the BmpCodec overflow lesson). */
  object PngCodec extends Codec {
    private val Sig: Array[Byte] =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    private def bad(why: String): Nothing =
      throw graft.OpenEoError("CodecError", s"PngCodec: $why")
    private def i32be(a: Array[Byte], o: Int): Int =
      ((a(o) & 0xff) << 24) | ((a(o + 1) & 0xff) << 16) |
        ((a(o + 2) & 0xff) << 8) | (a(o + 3) & 0xff)
    private def putI32be(a: Array[Byte], o: Int, v: Int): Unit = {
      a(o) = (v >>> 24).toByte; a(o + 1) = (v >>> 16).toByte
      a(o + 2) = (v >>> 8).toByte; a(o + 3) = v.toByte
    }
    private def crc(typ: Array[Byte], data: Array[Byte], len: Int): Int = {
      val c = new java.util.zip.CRC32
      c.update(typ); c.update(data, 0, len)
      c.getValue.toInt
    }
    private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
        data: Array[Byte], len: Int = -1): Unit = {
      val n = if (len < 0) data.length else len
      val hdr = Array.ofDim[Byte](4); putI32be(hdr, 0, n)
      out.write(hdr)
      val t = typ.getBytes("ASCII"); out.write(t)
      out.write(data, 0, n)
      val tail = Array.ofDim[Byte](4); putI32be(tail, 0, crc(t, data, n))
      out.write(tail)
    }
    /** a = left, b = up, c = up-left; spec §6.6 tie-break order. */
    private def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }

    /** Writes 8-bit RGB (color type 2), filter type cycling `y % 5`.
      * `Decoded` must carry channels=3, nFrames=1, pixels row-major
      * top-down RGB. */
    def encode(d: Decoded): Array[Byte] = {
      if (d.channels != 3 || d.nFrames != 1)
        bad(s"encode needs channels=3, nFrames=1 (got ${d.channels}/${d.nFrames})")
      if (d.pixels.length != d.width * d.height * 3)
        bad(s"pixel buffer ${d.pixels.length} != ${d.width}x${d.height}x3")
      val stride = d.width * 3
      val raw = Array.ofDim[Byte]((stride + 1) * d.height)
      var y = 0
      while (y < d.height) {
        val ft = y % 5
        val ro = y * (stride + 1)
        raw(ro) = ft.toByte
        var i = 0
        while (i < stride) {
          val x = d.pixels(y * stride + i) & 0xff
          val a = if (i >= 3) d.pixels(y * stride + i - 3) & 0xff else 0
          val b = if (y > 0) d.pixels((y - 1) * stride + i) & 0xff else 0
          val c = if (y > 0 && i >= 3) d.pixels((y - 1) * stride + i - 3) & 0xff else 0
          val filt = ft match {
            case 0 => x
            case 1 => x - a
            case 2 => x - b
            case 3 => x - ((a + b) >> 1)
            case 4 => x - paeth(a, b, c)
          }
          raw(ro + 1 + i) = filt.toByte
          i += 1
        }
        y += 1
      }
      val defl = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION)
      defl.setInput(raw); defl.finish()
      val zBuf = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val tmp = Array.ofDim[Byte](8192)
      while (!defl.finished()) zBuf.write(tmp, 0, defl.deflate(tmp))
      defl.end()
      val out = new java.io.ByteArrayOutputStream(zBuf.size() + 64)
      out.write(Sig)
      val ihdr = Array.ofDim[Byte](13)
      putI32be(ihdr, 0, d.width); putI32be(ihdr, 4, d.height)
      ihdr(8) = 8; ihdr(9) = 2 // bit depth 8, truecolor
      chunk(out, "IHDR", ihdr)
      chunk(out, "IDAT", zBuf.toByteArray)
      chunk(out, "IEND", Array.emptyByteArray)
      out.toByteArray
    }

    def decode(payload: Array[Byte]): Decoded = {
      if (payload.length < 8 + 25 || !java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(payload, 0, 8), Sig))
        bad("not a PNG (bad signature or truncated)")
      var off = 8
      var width = -1; var height = -1
      var sawEnd = false
      val idat = new java.io.ByteArrayOutputStream()
      while (off + 12 <= payload.length && !sawEnd) {
        val len = i32be(payload, off)
        if (len < 0 || off.toLong + 12 + len > payload.length)
          bad(s"chunk length $len at offset $off overruns file")
        val typ = new String(payload, off + 4, 4, "ASCII")
        val stored = i32be(payload, off + 8 + len)
        val actual = {
          val c = new java.util.zip.CRC32
          c.update(payload, off + 4, 4 + len); c.getValue.toInt
        }
        if (stored != actual) bad(s"CRC mismatch in $typ chunk")
        typ match {
          case "IHDR" =>
            if (len != 13) bad(s"IHDR length $len != 13")
            width = i32be(payload, off + 8); height = i32be(payload, off + 12)
            val bitDepth = payload(off + 16) & 0xff
            val colorType = payload(off + 17) & 0xff
            val interlace = payload(off + 20) & 0xff
            if (bitDepth != 8) bad(s"unsupported bit depth $bitDepth (only 8)")
            if (colorType != 2) bad(s"unsupported color type $colorType (only truecolor)")
            if (interlace != 0) bad(s"unsupported interlace $interlace (only none)")
            if (width <= 0 || height <= 0) bad(s"bad dimensions ${width}x$height")
            // untrusted header: bound the decode buffer in Long BEFORE
            // allocating (3 bytes/px + 1 filter byte/row)
            if ((width.toLong * 3 + 1) * height > Int.MaxValue - 8)
              bad(s"image ${width}x$height too large to decode")
          case "IDAT" =>
            if (width < 0) bad("IDAT before IHDR")
            idat.write(payload, off + 8, len)
          case "IEND" => sawEnd = true
          case _ => () // tEXt, pHYs, gAMA… ancillary chunks — skip
        }
        off += 12 + len
      }
      if (width < 0) bad("no IHDR chunk found")
      if (!sawEnd) bad("no IEND chunk found")
      if (idat.size() == 0) bad("no IDAT data found")
      val stride = width * 3
      val raw = Array.ofDim[Byte]((stride + 1) * height)
      val infl = new java.util.zip.Inflater()
      infl.setInput(idat.toByteArray)
      var got = 0
      try {
        while (got < raw.length && !infl.finished()) {
          val n = infl.inflate(raw, got, raw.length - got)
          if (n == 0 && infl.needsInput()) bad("truncated IDAT stream")
          got += n
        }
      } catch {
        case e: java.util.zip.DataFormatException =>
          bad(s"corrupt zlib stream: ${e.getMessage}")
      } finally infl.end()
      if (got != raw.length)
        bad(s"inflated ${got} bytes, expected ${raw.length}")
      val px = Array.ofDim[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val ft = raw(y * (stride + 1)) & 0xff
        if (ft > 4) bad(s"bad filter type $ft on row $y")
        val ro = y * (stride + 1) + 1
        var i = 0
        while (i < stride) {
          val f = raw(ro + i) & 0xff
          val a = if (i >= 3) px(y * stride + i - 3) & 0xff else 0
          val b = if (y > 0) px((y - 1) * stride + i) & 0xff else 0
          val c = if (y > 0 && i >= 3) px((y - 1) * stride + i - 3) & 0xff else 0
          val recon = ft match {
            case 0 => f
            case 1 => f + a
            case 2 => f + b
            case 3 => f + ((a + b) >> 1)
            case 4 => f + paeth(a, b, c)
          }
          px(y * stride + i) = recon.toByte
          i += 1
        }
        y += 1
      }
      Decoded("png", width, height, 3, 1, px)
    }
  }

  /** REAL pure-JVM audio codec: RIFF/WAVE, 16-bit little-endian PCM.
    * Walks the chunk list (skipping LIST/fact/etc., as real files carry
    * them), requires format tag 1 (PCM) at 16 bits, and maps each sample
    * to the seam's byte plane as its high byte offset by 128 —
    * `encode(decode(wav))` is lossy in the low byte by construction, but
    * `decode(encode(d))` round-trips `Decoded` exactly, which is the
    * contract the pipeline math needs. width = frames (samples per
    * channel), height = 1, interleaved channel order preserved. */
  object WavCodec extends Codec {
    val SampleRate = 16000
    private def u16(a: Array[Byte], o: Int): Int =
      (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8)
    private def i32(a: Array[Byte], o: Int): Int =
      (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8) |
        ((a(o + 2) & 0xff) << 16) | ((a(o + 3) & 0xff) << 24)
    private def bad(why: String): Nothing =
      throw graft.OpenEoError("CodecError", s"WavCodec: $why")

    def encode(d: Decoded): Array[Byte] = {
      if (d.height != 1 || d.nFrames != 1)
        bad(s"encode needs height=1, nFrames=1 (got ${d.height}/${d.nFrames})")
      if (d.pixels.length != d.width * d.channels)
        bad(s"sample buffer ${d.pixels.length} != ${d.width}x${d.channels}")
      val nSamples = d.pixels.length
      val dataSize = nSamples * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("ASCII")).putInt(36 + dataSize)
        .put("WAVE".getBytes("ASCII"))
      bb.put("fmt ".getBytes("ASCII")).putInt(16)
        .putShort(1).putShort(d.channels.toShort).putInt(SampleRate)
        .putInt(SampleRate * d.channels * 2)         // byte rate
        .putShort((d.channels * 2).toShort).putShort(16)
      bb.put("data".getBytes("ASCII")).putInt(dataSize)
      var i = 0
      while (i < nSamples) {
        bb.putShort((((d.pixels(i) & 0xff) - 128) << 8).toShort)
        i += 1
      }
      bb.array()
    }

    def decode(payload: Array[Byte]): Decoded = {
      if (payload.length < 44 ||
          !(payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
            payload(3) == 'F') ||
          !(payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' &&
            payload(11) == 'E'))
        bad("not a RIFF/WAVE file")
      var off = 12
      var channels = -1
      var samples: Array[Byte] = null
      while (off + 8 <= payload.length && (channels < 0 || samples == null)) {
        val id = new String(payload, off, 4, "ASCII")
        val size = i32(payload, off + 4)
        if (size < 0 || off + 8 + size > payload.length)
          bad(s"chunk '$id' overruns file (size $size at offset $off)")
        id match {
          case "fmt " =>
            if (size < 16) bad(s"fmt chunk too small ($size)")
            val tag = u16(payload, off + 8)
            val bits = u16(payload, off + 22)
            if (tag != 1) bad(s"unsupported format tag $tag (only PCM)")
            if (bits != 16) bad(s"unsupported bit depth $bits (only 16)")
            channels = u16(payload, off + 10)
            if (channels < 1) bad(s"bad channel count $channels")
          case "data" =>
            if (channels < 0) bad("data chunk before fmt chunk")
            val n = size / 2
            samples = Array.ofDim[Byte](n)
            var i = 0
            while (i < n) {
              val s = (payload(off + 8 + i * 2) & 0xff) |
                (payload(off + 9 + i * 2) << 8) // sign-extends high byte
              samples(i) = ((s >> 8) + 128).toByte
              i += 1
            }
          case _ => () // LIST, fact, cue, bext… — skip
        }
        off += 8 + size + (size & 1) // RIFF chunks are word-aligned
      }
      if (channels < 0) bad("no fmt chunk found")
      if (samples == null) bad("no data chunk found")
      if (samples.length % channels != 0)
        bad(s"sample count ${samples.length} not divisible by $channels channels")
      Decoded("wav", samples.length / channels, 1, channels, 1, samples)
    }
  }

  // ---------------------------------------------------------------- plumbing

  /** Decode metadata + per-payload stats via mapPartitions: the codec is
    * instantiated once per partition and rows stream through (constant
    * memory — the batch shape a real decoder needs). Appends a `meta`
    * struct and `mean_px` double. */
  def decodeMeta(df: DataFrame, binCol: String, codec: Codec = FakeCodec): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("meta", MetaSchema), StructField("mean_px", DoubleType)))
    val idx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val d = codec.decode(row.getAs[Array[Byte]](idx))
        val mean = if (d.pixels.isEmpty) 0.0
          else d.pixels.map(b => (b & 0xff).toDouble).sum / d.pixels.length
        Row.fromSeq(row.toSeq ++ Seq(
          Row(d.format, d.width, d.height, d.channels, d.nFrames), mean))
      }
    }(enc)
  }

  /** Nearest-neighbor resize of every frame (stub math over fake pixels;
    * the partition/batch shape is the real part). Payload is re-encoded. */
  def resize(df: DataFrame, binCol: String, newW: Int, newH: Int,
      codec: Codec = FakeCodec): DataFrame = {
    val idx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(df.schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val d = codec.decode(row.getAs[Array[Byte]](idx))
        val out = Array.ofDim[Byte](newW * newH * d.channels * d.nFrames)
        val frameIn = d.width * d.height * d.channels
        val frameOut = newW * newH * d.channels
        for (f <- 0 until d.nFrames; y <- 0 until newH; x <- 0 until newW;
             ch <- 0 until d.channels) {
          val sy = math.min(d.height - 1, y * d.height / newH)
          val sx = math.min(d.width - 1, x * d.width / newW)
          val src = f * frameIn + (sy * d.width + sx) * d.channels + ch
          if (src < d.pixels.length)
            out(f * frameOut + (y * newW + x) * d.channels + ch) = d.pixels(src)
        }
        val nd = d.copy(width = newW, height = newH, pixels = out)
        Row.fromSeq(row.toSeq.updated(idx, codec.encode(nd)))
      }
    }(enc)
  }

  /** Sample every `everyN`-th frame of a multi-frame payload into its own
    * row (`frame_idx` appended) — the video→frames explode. */
  def frameSample(df: DataFrame, binCol: String, everyN: Int,
      codec: Codec = FakeCodec): DataFrame = {
    val idx = df.schema.fieldIndex(binCol)
    val schema = StructType(df.schema.fields :+ StructField("frame_idx", IntegerType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      rows.flatMap { row =>
        val d = codec.decode(row.getAs[Array[Byte]](idx))
        val frameLen = d.width * d.height * d.channels
        (0 until d.nFrames by everyN).iterator.map { f =>
          val frame = java.util.Arrays.copyOfRange(d.pixels,
            f * frameLen, math.min((f + 1) * frameLen, d.pixels.length))
          val one = codec.encode(d.copy(nFrames = 1, pixels = frame))
          Row.fromSeq(row.toSeq.updated(idx, one) :+ f)
        }
      }
    }(enc)
  }

  /** Fixed-dimension feature vector from the payload (stub: block-pooled
    * byte means — deterministic, embedding-shaped `Array[Float]`). */
  def featureExtract(df: DataFrame, binCol: String, dim: Int = 16,
      codec: Codec = FakeCodec): DataFrame = {
    val idx = df.schema.fieldIndex(binCol)
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val d = codec.decode(row.getAs[Array[Byte]](idx))
        val feats = Array.ofDim[Float](dim)
        if (d.pixels.nonEmpty) {
          val block = math.max(1, d.pixels.length / dim)
          var i = 0
          while (i < dim) {
            var s = 0.0; var n = 0; var j = i * block
            while (j < math.min((i + 1) * block, d.pixels.length)) {
              s += (d.pixels(j) & 0xff); n += 1; j += 1
            }
            feats(i) = if (n == 0) 0f else (s / n / 255.0).toFloat
            i += 1
          }
        }
        Row.fromSeq(row.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Horizontal flip — the canonical deterministic augmentation: pixel
    * (y, x, c) ← (y, width−1−x, c), re-encoded through the codec. Same
    * constant-memory mapPartitions seam as [[resize]]. */
  def hflip(df: DataFrame, binCol: String,
      codec: Codec = FakeCodec): DataFrame = {
    val idx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(df.schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val d = codec.decode(row.getAs[Array[Byte]](idx))
        val out = Array.ofDim[Byte](d.pixels.length)
        val ch = d.channels
        var y = 0
        while (y < d.height) {
          var x = 0
          while (x < d.width) {
            var c = 0
            while (c < ch) {
              out((y * d.width + x) * ch + c) =
                d.pixels((y * d.width + (d.width - 1 - x)) * ch + c)
              c += 1
            }
            x += 1
          }
          y += 1
        }
        Row.fromSeq(row.toSeq.updated(idx, codec.encode(d.copy(pixels = out))))
      }
    }(enc)
  }

  /** Center crop to (min(width, cw), min(height, ch)) — offsets floor
    * ((dim − crop) / 2), the torchvision CenterCrop convention. */
  def centerCrop(df: DataFrame, binCol: String, cw: Int, chh: Int,
      codec: Codec = FakeCodec): DataFrame = {
    require(cw >= 1 && chh >= 1, "crop dims must be >= 1")
    val idx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(df.schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val d = codec.decode(row.getAs[Array[Byte]](idx))
        val w2 = math.min(d.width, cw); val h2 = math.min(d.height, chh)
        val x0 = (d.width - w2) / 2; val y0 = (d.height - h2) / 2
        val ch = d.channels
        val out = Array.ofDim[Byte](w2 * h2 * ch)
        var y = 0
        while (y < h2) {
          var x = 0
          while (x < w2) {
            var c = 0
            while (c < ch) {
              out((y * w2 + x) * ch + c) =
                d.pixels(((y0 + y) * d.width + (x0 + x)) * ch + c)
              c += 1
            }
            x += 1
          }
          y += 1
        }
        Row.fromSeq(row.toSeq.updated(idx,
          codec.encode(d.copy(width = w2, height = h2, pixels = out))))
      }
    }(enc)
  }

  /** Position-weighted plane checksum `Σ j·byte(j)` (+ plane length) —
    * detects any pixel PERMUTATION a plain mean would miss; the test/
    * oracle companion of the augmentation ops. Exact integer. */
  def pixelChecksum(df: DataFrame, binCol: String,
      codec: Codec = FakeCodec): DataFrame = {
    val idx = df.schema.fieldIndex(binCol)
    val schema = StructType(df.schema.fields :+
      StructField("n_px", IntegerType) :+ StructField("wsum", LongType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { row =>
        val d = codec.decode(row.getAs[Array[Byte]](idx))
        var s = 0L; var j = 0
        while (j < d.pixels.length) {
          s += j.toLong * (d.pixels(j) & 0xff); j += 1
        }
        Row.fromSeq(row.toSeq :+ d.pixels.length :+ s)
      }
    }(enc)
  }

  /** Per-frame AUDIO features over the decoded sample plane: RMS energy
    * and zero-crossing rate in fixed windows of `frameLen` samples (the
    * interleaved stream; the trailing partial frame is kept). Sample
    * values are the seam's byte plane re-centred to signed −128..127
    * (the WavCodec high-byte convention). Each frame's squared-sum and
    * crossing count are EXACT integers; the only IEEE steps are one
    * division + sqrt (RMS) and one division (ZCR), so an external
    * oracle replays the math bit-for-bit. A zero sample counts as
    * non-negative for crossing purposes (`v<0` vs `v>=0` flip), the
    * convention that needs no three-way sign case.
    *
    * Output: one row per (row, frame_idx) with n_samples, energy, zcr.
    * Same mapPartitions codec seam as [[featureExtract]] — constant
    * memory, codec instantiated per partition, no driver involvement. */
  def audioFrameFeatures(df: DataFrame, binCol: String, frameLen: Int,
      codec: Codec = FakeCodec): DataFrame = {
    require(frameLen >= 1, "frameLen must be >= 1")
    val idx = df.schema.fieldIndex(binCol)
    val schema = StructType(df.schema.fields :+
      StructField("frame_idx", IntegerType) :+
      StructField("n_samples", IntegerType) :+
      StructField("energy", DoubleType) :+
      StructField("zcr", DoubleType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    df.mapPartitions { rows =>
      rows.flatMap { row =>
        val d = codec.decode(row.getAs[Array[Byte]](idx))
        val n = d.pixels.length
        val nFramesOut = (n + frameLen - 1) / frameLen
        (0 until nFramesOut).iterator.map { f =>
          val lo = f * frameLen
          val hi = math.min(lo + frameLen, n)
          var ss = 0L
          var crossings = 0L
          var i = lo
          var prevNeg = false
          while (i < hi) {
            val v = (d.pixels(i) & 0xff) - 128
            ss += v.toLong * v
            val neg = v < 0
            if (i > lo && (neg != prevNeg)) crossings += 1
            prevNeg = neg
            i += 1
          }
          val cnt = hi - lo
          val energy = math.sqrt(ss.toDouble / cnt)
          val zcr =
            if (cnt <= 1) 0.0 else crossings.toDouble / (cnt - 1)
          Row.fromSeq(row.toSeq :+ f :+ cnt :+ energy :+ zcr)
        }
      }
    }(enc)
  }

  /** Temporal mean-pool — the video-embedding step: frame-level feature
    * vectors (one row per sampled frame) collapse to ONE vector per id,
    * each dimension the mean over frames. Two narrow shuffles:
    * (id, dim)-keyed partial-aggregated means, then the per-id array
    * rebuild. The double mean is exact for the oracled 2-frame sampling;
    * at high frame counts partial-agg order can wiggle the last ulp —
    * switch the avg to a decimal(28,10) sum like the k-means trainer if
    * an engine-exact hash matters there. */
  def poolFrameFeatures(df: DataFrame, idCol: String,
      featCol: String = "features"): DataFrame =
    df.select(col(idCol), posexplode(col(featCol)).as(Seq("_fi", "_fv")))
      .groupBy(col(idCol), col("_fi"))
      .agg(avg(col("_fv").cast("double")).as("_m"))
      .groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(struct(col("_fi"), col("_m")))),
        s => s.getField("_m")).as(featCol))

  /** Size-aware repartition: binary payloads skew partition bytes, so
    * partition count derives from total payload size, not row count. */
  def repartitionBySize(df: DataFrame, binCol: String,
      targetBytesPerPartition: Long = 128L << 20): DataFrame = {
    val total = df.agg(sum(octet_length(col(binCol)))).head().getLong(0)
    val parts = math.max(1, (total / targetBytesPerPartition).toInt)
    df.repartition(parts)
  }
}
