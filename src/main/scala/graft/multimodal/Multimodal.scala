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
  * JDK's Inflater/Deflater, all five scanline filters), [[WavCodec]]
  * (RIFF/WAVE 16-bit PCM) and [[JpegCodec]] (baseline-sequential
  * grayscale JPEG — Huffman + dequant + IDCT, pure JVM) decode actual
  * container bytes; [[FakeCodec]] remains as the deterministic synthetic
  * "GRFT" container for formats this environment has no library for
  * (color JPEG chroma paths, MP3, video containers). The Spark-side
  * plumbing — schema, batch iteration, partition sizing, output shapes —
  * is codec-agnostic.
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

  /** REAL pure-JVM baseline-sequential JPEG codec (ITU-T T.81), grayscale
    * (1-component) profile — the format real multimodal corpora actually
    * carry (round-14 verdict task 6).
    *
    * Decoder: full marker parse (DQT / SOF0 / DHT / SOS; APPn/COM
    * skipped), canonical Huffman decode of the interleaved DC-diff + AC
    * run-length stream with 0xFF00 byte-unstuffing, dequantization
    * through the zigzag order, naive double-precision IDCT per 8×8
    * block, level shift + clamp, crop from the padded block grid.
    * Progressive (SOF2), multi-component, 16-bit tables, and restart
    * intervals raise a typed CodecError rather than mis-decoding.
    *
    * Encoder: general grayscale FDCT + quantization + Annex-K luminance
    * Huffman tables (the spec's own public example tables), quant table
    * = DC step 8, AC step 16. LOSSLESS-BY-CONSTRUCTION case, which the
    * oracle row exploits: an image whose every 8×8 block is CONSTANT has
    * all-zero AC coefficients (the FDCT of a constant signal) and DC =
    * 8·(v−128) — an exact multiple of the DC quant step — so
    * decode(encode(img)) == img EXACTLY, letting a DuckDB oracle replay
    * decoded-pixel stats from the generative bytes while the whole
    * Huffman+IDCT path sits on the hash. Determinism: pure JVM double
    * arithmetic (IEEE-defined since JDK17), no platform codecs. */
  object JpegCodec extends Codec {
    private def bad(why: String): Nothing =
      throw graft.OpenEoError("CodecError", s"JpegCodec: $why")

    /** zigzag index -> natural (row-major) index, T.81 Figure 5. */
    private val Zigzag: Array[Int] = Array(
      0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

    /** Annex K.3.1 luminance DC table: BITS (codes per length 1..16)
      * and HUFFVAL (categories). Public example tables from the spec. */
    private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
    private val DcVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
    /** Annex K.3.2 luminance AC table. */
    private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
    private val AcVals = Array(
      0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
      0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
      0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
      0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
      0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
      0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
      0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
      0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
      0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
      0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
      0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
      0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
      0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
      0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
      0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
      0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
      0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
      0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
      0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
      0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
      0xf9, 0xfa)

    /** Quant table: DC step 8 (exact for the flat-block construction),
      * AC step 16. */
    private val Quant: Array[Int] =
      Array.tabulate(64)(i => if (i == 0) 8 else 16)

    private val CosTab: Array[Double] = {
      val t = new Array[Double](8 * 8)
      var x = 0
      while (x < 8) {
        var u = 0
        while (u < 8) {
          t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
          u += 1
        }
        x += 1
      }
      t
    }
    private def cFac(u: Int): Double = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0

    /** Canonical Huffman codes from (BITS, HUFFVAL): per value (code,
      * length), in the T.81 Annex C generation order. */
    private def buildCodes(bits: Array[Int],
        vals: Array[Int]): Map[Int, (Int, Int)] = {
      var code = 0
      var k = 0
      val out = scala.collection.mutable.Map[Int, (Int, Int)]()
      var len = 1
      while (len <= 16) {
        var i = 0
        while (i < bits(len - 1)) {
          out(vals(k)) = (code, len)
          code += 1; k += 1; i += 1
        }
        code <<= 1
        len += 1
      }
      out.toMap
    }

    private lazy val DcEnc = buildCodes(DcBits, DcVals)
    private lazy val AcEnc = buildCodes(AcBits, AcVals)

    private final class BitWriter(out: java.io.ByteArrayOutputStream) {
      private var acc = 0; private var nBits = 0
      def put(code: Int, len: Int): Unit = {
        var i = len - 1
        while (i >= 0) {
          acc = (acc << 1) | ((code >>> i) & 1)
          nBits += 1
          if (nBits == 8) {
            out.write(acc)
            if (acc == 0xff) out.write(0x00) // byte stuffing
            acc = 0; nBits = 0
          }
          i -= 1
        }
      }
      def flush(): Unit = if (nBits > 0) { // pad with 1s (spec F.1.2.3)
        acc = (acc << (8 - nBits)) | ((1 << (8 - nBits)) - 1)
        out.write(acc)
        if (acc == 0xff) out.write(0x00)
        acc = 0; nBits = 0
      }
    }

    private def category(v: Int): Int = {
      var a = math.abs(v); var s = 0
      while (a != 0) { a >>= 1; s += 1 }
      s
    }

    /** FDCT + quantize + Huffman-encode ONE 8×8 block of level-shifted
      * samples (row-major, value−128). Returns the new DC predictor.
      * Shared by the grayscale and color paths so their per-block math
      * cannot diverge. */
    private def encodeBlock(bw: BitWriter, blk: Array[Double],
        prevDc: Int): Int = {
      val coef = new Array[Double](64)
      var u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          var s = 0.0
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              s += blk(y * 8 + x) * CosTab(x * 8 + u) * CosTab(y * 8 + v)
              x += 1
            }
            y += 1
          }
          coef(v * 8 + u) = 0.25 * cFac(u) * cFac(v) * s
          v += 1
        }
        u += 1
      }
      val q = new Array[Int](64)
      var z = 0
      while (z < 64) {
        q(z) = math.round(coef(Zigzag(z)) / Quant(z)).toInt
        z += 1
      }
      val diff = q(0) - prevDc
      val s0 = category(diff)
      val (dc, dl) = DcEnc.getOrElse(s0, bad(s"DC category $s0"))
      bw.put(dc, dl)
      if (s0 > 0)
        bw.put(if (diff < 0) diff + (1 << s0) - 1 else diff, s0)
      var zz = 1
      var run = 0
      while (zz < 64) {
        if (q(zz) == 0) run += 1
        else {
          while (run > 15) {
            val (zc, zl) = AcEnc(0xf0); bw.put(zc, zl); run -= 16
          }
          val sc = category(q(zz))
          val (ac, al) = AcEnc.getOrElse((run << 4) | sc,
            bad(s"AC (run=$run,size=$sc)"))
          bw.put(ac, al)
          bw.put(if (q(zz) < 0) q(zz) + (1 << sc) - 1 else q(zz), sc)
          run = 0
        }
        zz += 1
      }
      if (run > 0) { val (ec, el) = AcEnc(0x00); bw.put(ec, el) } // EOB
      q(0)
    }

    /** Round-half-up clamped to [0,255] — used on BOTH color-transform
      * directions because a DuckDB oracle replays it literally as
      * `FLOOR(x + 0.5)` (DuckDB's round() is half-EVEN; Math.round is
      * floor(x+0.5) — mixing the two flips exact .5 boundaries). */
    private def r255(x: Double): Int =
      math.max(0, math.min(255, math.floor(x + 0.5).toInt))

    /** Common header/MCU-loop skeleton for both color modes. `sub` =
      * 4:2:0 (Y 2×2, chroma 1×1 over a 16×16 MCU); false = 4:4:4. All
      * components share the one quant table and the Annex-K luminance
      * Huffman pair — legal baseline JPEG (every selector may point at
      * table 0) and half the header machinery. */
    private def encodeColor(d: Decoded, sub: Boolean): Array[Byte] = {
      val w = d.width; val h = d.height
      if (d.pixels.length != w * h * 3)
        bad(s"pixel buffer ${d.pixels.length} != ${w}x${h}x3")
      if (w < 1 || h < 1 || w > 0xffff || h > 0xffff)
        bad(s"dimensions ${w}x$h out of JPEG range")
      // JFIF RGB→YCbCr planes (integer, round-half-up)
      val py = new Array[Int](w * h)
      val pcb = new Array[Int](w * h)
      val pcr = new Array[Int](w * h)
      var i = 0
      while (i < w * h) {
        val r = d.pixels(3 * i) & 0xff
        val g = d.pixels(3 * i + 1) & 0xff
        val b = d.pixels(3 * i + 2) & 0xff
        py(i) = r255(0.299 * r + 0.587 * g + 0.114 * b)
        pcb(i) = r255(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0)
        pcr(i) = r255(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)
        i += 1
      }
      val out = new java.io.ByteArrayOutputStream(d.pixels.length / 4 + 256)
      def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
      def seg(m: Int, body: Array[Byte]): Unit = {
        marker(m)
        out.write((body.length + 2) >>> 8); out.write((body.length + 2) & 0xff)
        out.write(body)
      }
      marker(0xd8) // SOI
      seg(0xdb, (Array(0x00) ++ Zigzag.indices.map(z => Quant(z)))
        .map(_.toByte))
      val ySamp = if (sub) 0x22 else 0x11
      seg(0xc0, Array(8, h >>> 8, h & 0xff, w >>> 8, w & 0xff, 3,
        1, ySamp, 0, 2, 0x11, 0, 3, 0x11, 0).map(_.toByte)) // SOF0 ×3
      seg(0xc4, (Array(0x00) ++ DcBits ++ DcVals).map(_.toByte))
      seg(0xc4, (Array(0x10) ++ AcBits ++ AcVals).map(_.toByte))
      seg(0xda, Array(3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0)
        .map(_.toByte)) // SOS ×3, all selectors table 0
      val bw = new BitWriter(out)
      val blk = new Array[Double](64)
      // fill an 8×8 block from a full-res plane with edge replication
      def fill(plane: Array[Int], ox: Int, oy: Int): Unit = {
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val sy = math.min(h - 1, oy + y); val sx = math.min(w - 1, ox + x)
            blk(y * 8 + x) = plane(sy * w + sx) - 128
            x += 1
          }
          y += 1
        }
      }
      // 2×2 box-averaged chroma sample at subsampled coords (4:2:0)
      def fillSub(plane: Array[Int], ox: Int, oy: Int): Unit = {
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            var s = 0; var n = 0
            var dy = 0
            while (dy < 2) {
              var dx = 0
              while (dx < 2) {
                val sy = (oy + y) * 2 + dy; val sx = (ox + x) * 2 + dx
                if (sy < h && sx < w) { s += plane(sy * w + sx); n += 1 }
                dx += 1
              }
              dy += 1
            }
            val v = if (n == 0) { // pad region: replicate nearest sample
              plane(math.min(h - 1, (oy + y) * 2) * w +
                math.min(w - 1, (ox + x) * 2))
            } else r255(s.toDouble / n)
            blk(y * 8 + x) = v - 128
            x += 1
          }
          y += 1
        }
      }
      var dcY = 0; var dcCb = 0; var dcCr = 0
      if (!sub) {
        val bw8 = (w + 7) / 8; val bh8 = (h + 7) / 8
        var by = 0
        while (by < bh8) {
          var bx = 0
          while (bx < bw8) {
            fill(py, bx * 8, by * 8); dcY = encodeBlock(bw, blk, dcY)
            fill(pcb, bx * 8, by * 8); dcCb = encodeBlock(bw, blk, dcCb)
            fill(pcr, bx * 8, by * 8); dcCr = encodeBlock(bw, blk, dcCr)
            bx += 1
          }
          by += 1
        }
      } else {
        val mx = (w + 15) / 16; val my = (h + 15) / 16
        var m2 = 0
        while (m2 < my) {
          var m1 = 0
          while (m1 < mx) {
            // 4 Y blocks, raster order within the MCU (T.81 A.2.3)
            var byy = 0
            while (byy < 2) {
              var bxx = 0
              while (bxx < 2) {
                fill(py, m1 * 16 + bxx * 8, m2 * 16 + byy * 8)
                dcY = encodeBlock(bw, blk, dcY)
                bxx += 1
              }
              byy += 1
            }
            fillSub(pcb, m1 * 8, m2 * 8); dcCb = encodeBlock(bw, blk, dcCb)
            fillSub(pcr, m1 * 8, m2 * 8); dcCr = encodeBlock(bw, blk, dcCr)
            m1 += 1
          }
          m2 += 1
        }
      }
      bw.flush()
      marker(0xd9) // EOI
      out.toByteArray
    }

    /** 4:2:0 chroma-subsampled color encode — the layout real cameras
      * emit; see [[encodeColor]]. Lossless for flat 16×16 construction
      * (every 2×2 chroma box is constant, so subsampling drops nothing). */
    def encode420(d: Decoded): Array[Byte] =
      if (d.channels == 3 && d.nFrames == 1) encodeColor(d, sub = true)
      else bad(s"encode420 needs channels=3, nFrames=1 " +
        s"(got ${d.channels}/${d.nFrames})")

    def encode(d: Decoded): Array[Byte] = {
      if (d.nFrames != 1)
        bad(s"encode needs nFrames=1 (got ${d.nFrames})")
      if (d.channels == 3) return encodeColor(d, sub = false)
      if (d.channels != 1)
        bad(s"encode needs channels=1 or 3 (got ${d.channels})")
      if (d.pixels.length != d.width * d.height)
        bad(s"pixel buffer ${d.pixels.length} != ${d.width}x${d.height}")
      if (d.width < 1 || d.height < 1 || d.width > 0xffff || d.height > 0xffff)
        bad(s"dimensions ${d.width}x${d.height} out of JPEG range")
      val out = new java.io.ByteArrayOutputStream(d.pixels.length / 2 + 256)
      def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
      def seg(m: Int, body: Array[Byte]): Unit = {
        marker(m)
        out.write((body.length + 2) >>> 8); out.write((body.length + 2) & 0xff)
        out.write(body)
      }
      marker(0xd8) // SOI
      seg(0xdb, (Array(0x00) ++ Zigzag.indices.map(z => Quant(z)))
        .map(_.toByte)) // DQT: Pq=0/Tq=0, entries in zigzag order
      seg(0xc0, Array(8, d.height >>> 8, d.height & 0xff,
        d.width >>> 8, d.width & 0xff, 1, 1, 0x11, 0).map(_.toByte)) // SOF0
      seg(0xc4, (Array(0x00) ++ DcBits ++ DcVals).map(_.toByte)) // DHT DC0
      seg(0xc4, (Array(0x10) ++ AcBits ++ AcVals).map(_.toByte)) // DHT AC0
      seg(0xda, Array(1, 1, 0x00, 0, 63, 0).map(_.toByte)) // SOS
      val bw = new BitWriter(out)
      val bw8 = (d.width + 7) / 8; val bh8 = (d.height + 7) / 8
      val blk = new Array[Double](64)
      var prevDc = 0
      var by = 0
      while (by < bh8) {
        var bx = 0
        while (bx < bw8) {
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              val sy = math.min(d.height - 1, by * 8 + y)
              val sx = math.min(d.width - 1, bx * 8 + x)
              blk(y * 8 + x) = (d.pixels(sy * d.width + sx) & 0xff) - 128
              x += 1
            }
            y += 1
          }
          prevDc = encodeBlock(bw, blk, prevDc)
          bx += 1
        }
        by += 1
      }
      bw.flush()
      marker(0xd9) // EOI
      out.toByteArray
    }

    /** Canonical Huffman decoding tables (T.81 F.2.2.3): MINCODE /
      * MAXCODE / VALPTR per code length. */
    private final class HuffDec(bits: Array[Int], vals: Array[Int]) {
      val minCode = new Array[Int](17); val maxCode = new Array[Int](17)
      val valPtr = new Array[Int](17)
      locally {
        var code = 0; var k = 0; var l = 1
        while (l <= 16) {
          if (bits(l - 1) == 0) maxCode(l) = -1
          else {
            valPtr(l) = k; minCode(l) = code
            code += bits(l - 1); k += bits(l - 1)
            maxCode(l) = code - 1
          }
          code <<= 1
          l += 1
        }
      }
      def value(len: Int, code: Int): Int =
        vals(valPtr(len) + code - minCode(len))
    }

    private final class BitReader(a: Array[Byte], var off: Int) {
      private var acc = 0; private var nBits = 0
      def nextBit(): Int = {
        if (nBits == 0) {
          if (off >= a.length) bad("entropy stream truncated")
          var b = a(off) & 0xff; off += 1
          if (b == 0xff) {
            if (off >= a.length) bad("entropy stream truncated at 0xFF")
            val m = a(off) & 0xff
            if (m == 0x00) off += 1 // stuffed byte
            else if (m == 0xd9) b = 0xff // EOI next: let padding bits run out
            else bad(f"unexpected marker 0xFF$m%02x inside entropy data")
          }
          acc = b; nBits = 8
        }
        nBits -= 1
        (acc >>> nBits) & 1
      }
      def bits(n: Int): Int = {
        var v = 0; var i = 0
        while (i < n) { v = (v << 1) | nextBit(); i += 1 }
        v
      }
      def decodeHuff(h: HuffDec): Int = {
        var code = nextBit(); var l = 1
        while (l <= 16) {
          if (h.maxCode(l) >= 0 && code <= h.maxCode(l)) return h.value(l, code)
          code = (code << 1) | nextBit(); l += 1
        }
        bad("invalid Huffman code")
      }
    }

    private def extend(v: Int, s: Int): Int =
      if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

    /** Huffman-decode + dequantize + IDCT ONE 8×8 block into `px64`
      * (clamped [0,255] ints). Returns the component's new DC predictor. */
    private def decodeBlockPx(br: BitReader, dcT: HuffDec, acT: HuffDec,
        qt: Array[Int], prevDc: Int, px64: Array[Int]): Int = {
      val zz = new Array[Int](64)
      val s0 = br.decodeHuff(dcT)
      val dc = prevDc + extend(br.bits(s0), s0)
      zz(0) = dc * qt(0)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = br.decodeHuff(acT)
        val r = rs >> 4; val s = rs & 0x0f
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else eob = true
        } else {
          k += r
          if (k > 63) bad("AC run overruns block")
          zz(k) = extend(br.bits(s), s) * qt(k)
          k += 1
        }
      }
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          var s = 0.0
          var z = 0
          while (z < 64) {
            if (zz(z) != 0) {
              val nat = Zigzag(z)
              val u = nat % 8; val v = nat / 8
              s += cFac(u) * cFac(v) * zz(z) *
                CosTab(x * 8 + u) * CosTab(y * 8 + v)
            }
            z += 1
          }
          val vv = math.round(0.25 * s + 128.0).toInt
          px64(y * 8 + x) = math.max(0, math.min(255, vv))
          x += 1
        }
        y += 1
      }
      dc
    }

    def decode(payload: Array[Byte]): Decoded = {
      if (payload.length < 4 || (payload(0) & 0xff) != 0xff ||
          (payload(1) & 0xff) != 0xd8)
        bad("not a JPEG (no SOI)")
      var off = 2
      val quant = scala.collection.mutable.Map[Int, Array[Int]]()
      val dcTabs = scala.collection.mutable.Map[Int, HuffDec]()
      val acTabs = scala.collection.mutable.Map[Int, HuffDec]()
      var width = -1; var height = -1
      // per SOF component: (id, hFac, vFac, quant selector)
      var comps: Array[(Int, Int, Int, Int)] = null
      // per scan component (SOF order): (dc selector, ac selector)
      var scanSel: Array[(Int, Int)] = null
      var scanStart = -1
      while (scanStart < 0) {
        if (off + 4 > payload.length) bad("truncated before SOS")
        if ((payload(off) & 0xff) != 0xff)
          bad(f"expected marker at $off, got 0x${payload(off) & 0xff}%02x")
        val m = payload(off + 1) & 0xff
        off += 2
        if (m == 0xd8) () // stray SOI
        else if (m >= 0xd0 && m <= 0xd9) bad(f"unexpected bare marker 0x$m%02x")
        else {
          val len = ((payload(off) & 0xff) << 8) | (payload(off + 1) & 0xff)
          if (len < 2 || off + len > payload.length) bad("segment overruns file")
          val body = java.util.Arrays.copyOfRange(payload, off + 2, off + len)
          off += len
          m match {
            case 0xdb => // DQT (possibly several tables per segment)
              var p = 0
              while (p < body.length) {
                val pq = (body(p) & 0xf0) >> 4; val tq = body(p) & 0x0f
                if (pq != 0) bad("16-bit quant tables unsupported")
                if (p + 65 > body.length) bad("DQT truncated")
                val t = new Array[Int](64)
                var i = 0
                while (i < 64) { t(i) = body(p + 1 + i) & 0xff; i += 1 }
                quant(tq) = t
                p += 65
              }
            case 0xc0 => // SOF0 baseline: 1 (gray) or 3 (YCbCr) components
              if (body.length < 8) bad("SOF0 truncated")
              if ((body(0) & 0xff) != 8) bad("only 8-bit precision supported")
              height = ((body(1) & 0xff) << 8) | (body(2) & 0xff)
              width = ((body(3) & 0xff) << 8) | (body(4) & 0xff)
              val nc = body(5) & 0xff
              if (nc != 1 && nc != 3)
                bad(s"only 1- or 3-component images supported, got $nc")
              if (body.length < 6 + nc * 3) bad("SOF0 component list truncated")
              comps = Array.tabulate(nc) { i =>
                val cid = body(6 + i * 3) & 0xff
                val hv = body(7 + i * 3) & 0xff
                val hF = (hv & 0xf0) >> 4; val vF = hv & 0x0f
                if (hF < 1 || hF > 2 || vF < 1 || vF > 2)
                  bad(s"sampling factor ${hF}x$vF unsupported (1..2 only)")
                (cid, hF, vF, body(8 + i * 3) & 0xff)
              }
              if (nc == 1 && (comps(0)._2 != 1 || comps(0)._3 != 1))
                bad("grayscale subsampling must be 1x1")
              if (nc == 3 && (comps(1)._2 != 1 || comps(1)._3 != 1 ||
                  comps(2)._2 != 1 || comps(2)._3 != 1))
                bad("chroma sampling factors must be 1x1")
            case 0xc2 => bad("progressive JPEG (SOF2) unsupported")
            case 0xc4 => // DHT (possibly several tables per segment)
              var p = 0
              while (p < body.length) {
                val tc = (body(p) & 0xf0) >> 4; val th = body(p) & 0x0f
                if (p + 17 > body.length) bad("DHT truncated")
                val bits = Array.tabulate(16)(i => body(p + 1 + i) & 0xff)
                val n = bits.sum
                if (p + 17 + n > body.length) bad("DHT values truncated")
                val vals = Array.tabulate(n)(i => body(p + 17 + i) & 0xff)
                val dec = new HuffDec(bits, vals)
                if (tc == 0) dcTabs(th) = dec else acTabs(th) = dec
                p += 17 + n
              }
            case 0xdd => // DRI
              val ri = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
              if (ri != 0) bad("restart intervals unsupported")
            case 0xda => // SOS
              if (comps == null) bad("SOS before SOF0")
              if (body.length < 1 + comps.length * 2 + 3) bad("SOS truncated")
              if ((body(0) & 0xff) != comps.length)
                bad(s"SOS must cover ${comps.length} component(s)")
              val byId = Array.tabulate(comps.length)(i =>
                ((body(1 + i * 2) & 0xff), body(2 + i * 2) & 0xff))
              scanSel = comps.map { case (cid, _, _, _) =>
                val e = byId.find(_._1 == cid)
                  .getOrElse(bad(s"SOS missing component $cid"))
                ((e._2 & 0xf0) >> 4, e._2 & 0x0f)
              }
              scanStart = off
            case _ => () // APPn / COM / others: skipped
          }
        }
      }
      if (width <= 0 || height <= 0) bad("no SOF0 before SOS")
      val nc = comps.length
      val hMax = comps.map(_._2).max; val vMax = comps.map(_._3).max
      val wh = width.toLong * height * nc
      if (wh > Int.MaxValue / 2) bad(s"image ${width}x$height too large")
      val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
      val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
      // per-component decode plane, padded to whole MCUs
      val planeW = comps.map(c => mcusX * 8 * c._2)
      val planes = comps.zipWithIndex.map { case (c, i) =>
        new Array[Int](planeW(i) * mcusY * 8 * c._3)
      }
      val qts = comps.map(c =>
        quant.getOrElse(c._4, bad(s"quant table ${c._4} missing")))
      val dcTs = scanSel.map(s =>
        dcTabs.getOrElse(s._1, bad(s"DC table ${s._1} missing")))
      val acTs = scanSel.map(s =>
        acTabs.getOrElse(s._2, bad(s"AC table ${s._2} missing")))
      val br = new BitReader(payload, scanStart)
      val px64 = new Array[Int](64)
      val dcPred = new Array[Int](nc)
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          var ci = 0
          while (ci < nc) {
            val hF = comps(ci)._2; val vF = comps(ci)._3
            var byy = 0
            while (byy < vF) {
              var bxx = 0
              while (bxx < hF) {
                dcPred(ci) = decodeBlockPx(br, dcTs(ci), acTs(ci), qts(ci),
                  dcPred(ci), px64)
                val ox = (mx * hF + bxx) * 8; val oy = (my * vF + byy) * 8
                val pw = planeW(ci)
                var y = 0
                while (y < 8) {
                  var x = 0
                  while (x < 8) {
                    planes(ci)((oy + y) * pw + ox + x) = px64(y * 8 + x)
                    x += 1
                  }
                  y += 1
                }
                bxx += 1
              }
              byy += 1
            }
            ci += 1
          }
          mx += 1
        }
        my += 1
      }
      if (nc == 1) {
        val pixels = new Array[Byte](width * height)
        val pw = planeW(0)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            pixels(y * width + x) = planes(0)(y * pw + x).toByte
            x += 1
          }
          y += 1
        }
        Decoded("jpeg", width, height, 1, 1, pixels)
      } else {
        // chroma upsample by sample replication (integer coordinate
        // truncation), then JFIF YCbCr→RGB with round-half-up — the
        // same r255 the encoder used, so the whole transform chain is
        // DuckDB-replayable
        val pixels = new Array[Byte](width * height * 3)
        val pwY = planeW(0); val pwCb = planeW(1); val pwCr = planeW(2)
        val hCb = comps(1)._2; val vCb = comps(1)._3
        val hCr = comps(2)._2; val vCr = comps(2)._3
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val yy = planes(0)(y * pwY + x)
            val cb = planes(1)((y * vCb / vMax) * pwCb + x * hCb / hMax)
            val cr = planes(2)((y * vCr / vMax) * pwCr + x * hCr / hMax)
            val o = (y * width + x) * 3
            pixels(o) = r255(yy + 1.402 * (cr - 128)).toByte
            pixels(o + 1) = r255(yy - 0.344136 * (cb - 128) -
              0.714136 * (cr - 128)).toByte
            pixels(o + 2) = r255(yy + 1.772 * (cb - 128)).toByte
            x += 1
          }
          y += 1
        }
        Decoded("jpeg", width, height, 3, 1, pixels)
      }
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
