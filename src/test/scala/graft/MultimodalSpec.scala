package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{Decoded, FakeCodec}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  def blob(w: Int, h: Int, c: Int = 1, frames: Int = 1): Array[Byte] = {
    val px = Array.tabulate[Byte](w * h * c * frames)(i => (i % 251).toByte)
    FakeCodec.encode(Decoded("grft", w, h, c, frames, px))
  }

  lazy val df = Seq(
    (1L, blob(4, 2)), (2L, blob(8, 8, 3)), (3L, blob(2, 2, 1, frames = 6)))
    .toDF("id", "payload")

  test("decodeMeta parses header metadata and payload stats per partition") {
    val r = Multimodal.decodeMeta(df, "payload")
    val m = r.select(col("id"), col("meta.width"), col("meta.height"),
      col("meta.channels"), col("meta.n_frames")).collect()
      .map(row => row.getLong(0) -> (row.getInt(1), row.getInt(2),
        row.getInt(3), row.getInt(4))).toMap
    m(1L) shouldBe ((4, 2, 1, 1))
    m(2L) shouldBe ((8, 8, 3, 1))
    m(3L) shouldBe ((2, 2, 1, 6))
    // mean of bytes 0..7 = 3.5
    r.where(col("id") === 1).select("mean_px").head().getDouble(0) shouldBe 3.5
  }

  test("decodeMeta is total on foreign binary (stub fallback)") {
    val f = Seq((9L, "not an image".getBytes("UTF-8"))).toDF("id", "payload")
    val r = Multimodal.decodeMeta(f, "payload")
    r.select("meta.format").head().getString(0) shouldBe "unknown"
  }

  test("resize changes dimensions and re-encodes the payload") {
    val r = Multimodal.resize(df.where(col("id") === 2), "payload", 4, 4)
    val meta = Multimodal.decodeMeta(r, "payload")
      .select("meta.width", "meta.height", "meta.channels").head()
    (meta.getInt(0), meta.getInt(1), meta.getInt(2)) shouldBe ((4, 4, 3))
  }

  test("frameSample explodes every Nth frame into single-frame rows") {
    val r = Multimodal.frameSample(df.where(col("id") === 3), "payload", everyN = 2)
    val frames = r.select("frame_idx").collect().map(_.getInt(0)).sorted
    frames shouldBe Array(0, 2, 4)
    Multimodal.decodeMeta(r, "payload").select("meta.n_frames")
      .distinct().head().getInt(0) shouldBe 1
  }

  test("featureExtract emits deterministic fixed-dim float vectors") {
    val r1 = Multimodal.featureExtract(df, "payload", dim = 8)
      .select("id", "features").collect()
      .map(row => row.getLong(0) -> row.getSeq[Float](1)).toMap
    val r2 = Multimodal.featureExtract(df, "payload", dim = 8)
      .select("id", "features").collect()
      .map(row => row.getLong(0) -> row.getSeq[Float](1)).toMap
    r1 shouldBe r2
    r1.values.foreach(_.length shouldBe 8)
  }

  test("repartitionBySize derives partition count from payload bytes") {
    val r = Multimodal.repartitionBySize(df, "payload",
      targetBytesPerPartition = 64)
    r.rdd.getNumPartitions should be >= 2
    r.count() shouldBe 3
  }

  test("poolFrameFeatures mean-pools per-frame vectors into one embedding") {
    // 2-frame 2×1 video: frame 0 bytes (10, 30), frame 1 bytes (50, 70)
    val v = FakeCodec.encode(Decoded("grft", 2, 1, 1, 2,
      Array[Byte](10, 30, 50, 70)))
    val frames = Multimodal.frameSample(
      Seq((7L, v)).toDF("id", "payload"), "payload", everyN = 1)
    frames.count() shouldBe 2
    val feats = Multimodal.featureExtract(frames, "payload", dim = 2)
      .select(col("id"), col("features"))
    val pooled = Multimodal.poolFrameFeatures(feats, "id")
      .select(col("id"), col("features")).head()
    val fs = pooled.getSeq[Double](1)
    // dim 0: mean(10/255, 50/255); dim 1: mean(30/255, 70/255)
    fs(0) shouldBe ((10.0 / 255 + 50.0 / 255) / 2 +- 1e-6)
    fs(1) shouldBe ((30.0 / 255 + 70.0 / 255) / 2 +- 1e-6)
  }

  // ------------------------------------------------------------ real codecs

  import Multimodal.{BmpCodec, WavCodec}

  test("BmpCodec decodes a hand-assembled real 2x2 24-bpp BMP byte-exactly") {
    // Hand-built fixture (NOT via encode): 2×2, bottom-up, rows padded to
    // 8 bytes (2 px × 3 B = 6 + 2 pad). Image: top row [red, green],
    // bottom row [blue, white]. File row 0 = image bottom row.
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val header =
      Array[Byte]('B', 'M') ++ le32(54 + 16) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(2) ++ le32(2) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(16) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0)
    header.length shouldBe 54
    // file row 0 (image BOTTOM): blue(0,0,255), white(255,255,255);
    // file row 1 (image TOP): red(255,0,0), green(0,255,0); BGR + 2 pad
    val data = Array[Byte](
      -1, 0, 0,  -1, -1, -1,  0, 0,          // B,G,R: blue px, white px, pad
      0, 0, -1,  0, -1, 0,    0, 0)          // red px, green px, pad
    val bmp = header ++ data
    val d = BmpCodec.decode(bmp)
    (d.format, d.width, d.height, d.channels, d.nFrames) shouldBe
      (("bmp", 2, 2, 3, 1))
    // top-down row-major RGB: red, green, blue, white
    d.pixels shouldBe Array[Byte](-1, 0, 0,  0, -1, 0,  0, 0, -1,  -1, -1, -1)
  }

  test("BmpCodec encode/decode round-trips odd widths (row padding) exactly") {
    for (w <- 1 to 5; h <- Seq(1, 3)) {
      val px = Array.tabulate[Byte](w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
      val d = Multimodal.Decoded("bmp", w, h, 3, 1, px)
      val back = BmpCodec.decode(BmpCodec.encode(d))
      (back.width, back.height) shouldBe ((w, h))
      back.pixels shouldBe px
    }
  }

  test("BmpCodec handles top-down BMPs (negative height) identically") {
    val px = Array.tabulate[Byte](3 * 2 * 3)(i => (i * 7).toByte)
    val bottomUp = BmpCodec.encode(Multimodal.Decoded("bmp", 3, 2, 3, 1, px))
    // flip to top-down: height := -2, pixel rows reordered to top-first
    val topDown = bottomUp.clone()
    topDown(22) = (-2).toByte; topDown(23) = -1; topDown(24) = -1; topDown(25) = -1
    val rowSize = ((3 * 3 + 3) / 4) * 4
    System.arraycopy(bottomUp, 54 + rowSize, topDown, 54, rowSize)
    System.arraycopy(bottomUp, 54, topDown, 54 + rowSize, rowSize)
    BmpCodec.decode(topDown).pixels shouldBe px
  }

  test("BmpCodec raises typed CodecError on unsupported variants") {
    val px = Array.ofDim[Byte](12)
    val good = BmpCodec.encode(Multimodal.Decoded("bmp", 2, 2, 3, 1, px))
    val badBpp = good.clone(); badBpp(28) = 32
    val e1 = intercept[graft.OpenEoError](BmpCodec.decode(badBpp))
    e1.code shouldBe "CodecError"
    val badComp = good.clone(); badComp(30) = 1 // BI_RLE8
    intercept[graft.OpenEoError](BmpCodec.decode(badComp))
    intercept[graft.OpenEoError](BmpCodec.decode("nope".getBytes("ASCII")))
  }

  test("BmpCodec raises typed CodecError on hostile header fields") {
    def le32At(a: Array[Byte], o: Int, v: Int): Unit = {
      a(o) = v.toByte; a(o + 1) = (v >> 8).toByte
      a(o + 2) = (v >> 16).toByte; a(o + 3) = (v >> 24).toByte
    }
    val px = Array.ofDim[Byte](12)
    val good = BmpCodec.encode(Multimodal.Decoded("bmp", 2, 2, 3, 1, px))
    // width ~2^30: Int math would overflow width*3 into a small/negative
    // rowSize, slip past the truncation check, and blow up as
    // NegativeArraySize/ArrayIndexOutOfBounds — must be a typed error
    val hugeW = good.clone(); le32At(hugeW, 18, 1 << 30)
    intercept[graft.OpenEoError](BmpCodec.decode(hugeW)).code shouldBe "CodecError"
    // height = Int.MinValue: math.abs stays negative
    val minH = good.clone(); le32At(minH, 22, Int.MinValue)
    intercept[graft.OpenEoError](BmpCodec.decode(minH)).code shouldBe "CodecError"
    // dataOffset out of range, both directions
    val negOff = good.clone(); le32At(negOff, 10, -8)
    intercept[graft.OpenEoError](BmpCodec.decode(negOff)).code shouldBe "CodecError"
    val farOff = good.clone(); le32At(farOff, 10, good.length + 1)
    intercept[graft.OpenEoError](BmpCodec.decode(farOff)).code shouldBe "CodecError"
  }

  test("WavCodec decodes a hand-assembled PCM16 WAV, skipping LIST chunks") {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    // samples (stereo, 2 frames): 0, -32768, 32512, 256
    val samples = Seq(0, -32768, 32512, 256)
    val data = samples.flatMap(s => le16(s & 0xffff)).toArray
    val list = "LIST".getBytes("ASCII") ++ le32(4) ++ "INFO".getBytes("ASCII")
    val fmt = "fmt ".getBytes("ASCII") ++ le32(16) ++ le16(1) ++ le16(2) ++
      le32(8000) ++ le32(8000 * 4) ++ le16(4) ++ le16(16)
    val dataCh = "data".getBytes("ASCII") ++ le32(data.length) ++ data
    val body = list ++ fmt ++ dataCh
    val wav = "RIFF".getBytes("ASCII") ++ le32(4 + body.length) ++
      "WAVE".getBytes("ASCII") ++ body
    val d = WavCodec.decode(wav)
    (d.format, d.width, d.height, d.channels) shouldBe (("wav", 2, 1, 2))
    // byte plane = (sample >> 8) + 128
    d.pixels shouldBe Array[Byte](
      (0 + 128).toByte, (-128 + 128).toByte, (127 + 128).toByte, (1 + 128).toByte)
  }

  test("WavCodec decode(encode(d)) round-trips the byte plane exactly") {
    for (ch <- Seq(1, 2); n <- Seq(1, 7)) {
      val px = Array.tabulate[Byte](n * ch)(i => ((i * 53 + 3) % 256).toByte)
      val d = Multimodal.Decoded("wav", n, 1, ch, 1, px)
      val back = WavCodec.decode(WavCodec.encode(d))
      (back.width, back.channels) shouldBe ((n, ch))
      back.pixels shouldBe px
    }
  }

  test("WavCodec raises typed CodecError on non-PCM and truncated input") {
    val good = WavCodec.encode(Multimodal.Decoded("wav", 4, 1, 1, 1,
      Array[Byte](1, 2, 3, 4)))
    val badTag = good.clone(); badTag(20) = 3 // IEEE float
    intercept[graft.OpenEoError](WavCodec.decode(badTag)).code shouldBe "CodecError"
    val badBits = good.clone(); badBits(34) = 8
    intercept[graft.OpenEoError](WavCodec.decode(badBits))
    intercept[graft.OpenEoError](WavCodec.decode(good.take(20)))
  }

  test("decodeMeta + featureExtract run the real BMP codec through the seam") {
    val px = Array.tabulate[Byte](5 * 2 * 3)(i => (i * 3).toByte)
    val payload = BmpCodec.encode(Multimodal.Decoded("bmp", 5, 2, 3, 1, px))
    val df2 = Seq((1L, payload)).toDF("id", "payload")
    val meta = Multimodal.decodeMeta(df2, "payload", BmpCodec)
    val m = meta.select("meta.format", "meta.width", "meta.height", "mean_px")
      .head()
    (m.getString(0), m.getInt(1), m.getInt(2)) shouldBe (("bmp", 5, 2))
    m.getDouble(3) shouldBe (px.map(b => (b & 0xff).toDouble).sum / px.length)
    val feats = Multimodal.featureExtract(df2, "payload", dim = 4,
      codec = BmpCodec).select("features").head().getSeq[Float](0)
    feats.length shouldBe 4
  }

  import Multimodal.PngCodec

  test("PngCodec decodes a hand-assembled PNG with stored deflate blocks") {
    // Independent fixture, NOT via encode: 2×1 RGB [red, blue], filter 0,
    // zlib built by hand with a stored (BTYPE=00) deflate block.
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("ASCII")
      val c = new java.util.zip.CRC32; c.update(t); c.update(data)
      be32(data.length) ++ t ++ data ++ be32(c.getValue.toInt)
    }
    val raw = Array[Byte](0, -1, 0, 0, 0, 0, -1) // filter 0, red px, blue px
    val adler = { val a = new java.util.zip.Adler32; a.update(raw); a.getValue }
    val zlib = Array[Byte](0x78, 0x01, 0x01, // CMF/FLG, final stored block
      raw.length.toByte, 0, (~raw.length & 0xff).toByte, -1) ++ raw ++
      be32(adler.toInt)
    val ihdr = be32(2) ++ be32(1) ++ Array[Byte](8, 2, 0, 0, 0)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", zlib) ++
      chunk("IEND", Array.emptyByteArray)
    val d = PngCodec.decode(png)
    (d.format, d.width, d.height, d.channels) shouldBe (("png", 2, 1, 3))
    d.pixels shouldBe Array[Byte](-1, 0, 0, 0, 0, -1)
  }

  test("PngCodec round-trips exactly through all five scanline filters") {
    // h >= 5 cycles filter types 0..4 (encode filters row y with y % 5);
    // w = 1 stresses the "no left neighbor" edge of Sub/Average/Paeth
    for (w <- Seq(1, 2, 5); h <- Seq(1, 5, 7)) {
      val px = Array.tabulate[Byte](w * h * 3)(i => ((i * 97 + 13) % 256).toByte)
      val d = Multimodal.Decoded("png", w, h, 3, 1, px)
      val back = PngCodec.decode(PngCodec.encode(d))
      (back.width, back.height, back.channels) shouldBe ((w, h, 3))
      back.pixels shouldBe px
    }
  }

  test("PngCodec skips ancillary chunks and verifies CRCs") {
    val px = Array.tabulate[Byte](2 * 2 * 3)(i => (i * 11).toByte)
    val good = PngCodec.encode(Multimodal.Decoded("png", 2, 2, 3, 1, px))
    // splice a tEXt chunk between IHDR and IDAT — decode must skip it
    def be32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    val data = "k v".getBytes("ASCII")
    val t = "tEXt".getBytes("ASCII")
    val c = new java.util.zip.CRC32; c.update(t); c.update(data)
    val text = be32(data.length) ++ t ++ data ++ be32(c.getValue.toInt)
    val ihdrEnd = 8 + 12 + 13
    val spliced = good.take(ihdrEnd) ++ text ++ good.drop(ihdrEnd)
    PngCodec.decode(spliced).pixels shouldBe px
    // flip one IDAT byte: CRC check must catch it as a typed error
    val corrupt = good.clone(); corrupt(ihdrEnd + 12) = (corrupt(ihdrEnd + 12) ^ 0x40).toByte
    intercept[graft.OpenEoError](PngCodec.decode(corrupt)).code shouldBe "CodecError"
  }

  test("PngCodec raises typed CodecError on unsupported and hostile input") {
    val px = Array.ofDim[Byte](12)
    val good = PngCodec.encode(Multimodal.Decoded("png", 2, 2, 3, 1, px))
    def withIhdr(mut: Array[Byte] => Unit): Array[Byte] = {
      val a = good.clone(); mut(a)
      // re-seal the IHDR CRC so the mutation reaches the field checks
      val c = new java.util.zip.CRC32; c.update(a, 12, 4 + 13)
      val crc = c.getValue.toInt
      a(29) = (crc >>> 24).toByte; a(30) = (crc >>> 16).toByte
      a(31) = (crc >>> 8).toByte; a(32) = crc.toByte
      a
    }
    // grayscale color type
    intercept[graft.OpenEoError](
      PngCodec.decode(withIhdr(_(25) = 0))).code shouldBe "CodecError"
    // 16-bit depth
    intercept[graft.OpenEoError](PngCodec.decode(withIhdr(_(24) = 16)))
    // hostile width ~2^30: Long-checked before allocation
    intercept[graft.OpenEoError](PngCodec.decode(withIhdr { a =>
      a(16) = 0x40; a(17) = 0; a(18) = 0; a(19) = 0
    })).code shouldBe "CodecError"
    // Adler/len mismatch: truncated IDAT (drop IEND + half of IDAT)
    intercept[graft.OpenEoError](PngCodec.decode("bogus".getBytes("ASCII")))
  }

  test("decodeMeta + featureExtract run the real PNG codec through the seam") {
    val px = Array.tabulate[Byte](4 * 6 * 3)(i => (i * 5).toByte)
    val payload = PngCodec.encode(Multimodal.Decoded("png", 4, 6, 3, 1, px))
    val df2 = Seq((1L, payload)).toDF("id", "payload")
    val m = Multimodal.decodeMeta(df2, "payload", PngCodec)
      .select("meta.format", "meta.width", "meta.height", "mean_px").head()
    (m.getString(0), m.getInt(1), m.getInt(2)) shouldBe (("png", 4, 6))
    m.getDouble(3) shouldBe (px.map(b => (b & 0xff).toDouble).sum / px.length)
  }

  test("hflip / centerCrop / pixelChecksum: worked example on a 3×2 RGB plane") {
    // plane rows: (A B C / D E F) as per-pixel gray triples 1..6
    val px = Array[Byte](1,1,1, 2,2,2, 3,3,3, 4,4,4, 5,5,5, 6,6,6)
    val bmp = Multimodal.BmpCodec.encode(
      Multimodal.Decoded("bmp", 3, 2, 3, 1, px))
    val df = Seq((1L, bmp)).toDF("id", "payload")
    // flip: rows become (C B A / F E D)
    val flipped = Multimodal.hflip(df, "payload", Multimodal.BmpCodec)
    val fpx = Multimodal.BmpCodec.decode(
      flipped.select("payload").as[Array[Byte]].head()).pixels
    fpx.toSeq shouldBe Seq[Byte](3,3,3, 2,2,2, 1,1,1, 6,6,6, 5,5,5, 4,4,4)
    // center crop 2×2 of the flipped plane: x0=0 (3−2)/2=0, rows (C B / F E)
    val cropped = Multimodal.centerCrop(flipped, "payload", 2, 2,
      Multimodal.BmpCodec)
    val cpx = Multimodal.BmpCodec.decode(
      cropped.select("payload").as[Array[Byte]].head()).pixels
    cpx.toSeq shouldBe Seq[Byte](3,3,3, 2,2,2, 6,6,6, 5,5,5)
    val ck = Multimodal.pixelChecksum(cropped, "payload",
      Multimodal.BmpCodec).select("n_px", "wsum").as[(Int, Long)].head()
    ck._1 shouldBe 12
    ck._2 shouldBe cpx.zipWithIndex.map { case (b, j) => j.toLong * (b & 0xff) }.sum
  }

  test("audioFrameFeatures: worked example — alternating square wave") {
    // 8 samples alternating +100/−100 (bytes 228 / 28): RMS = 100,
    // ZCR = 7/7 = 1.0 in one 8-sample frame; then a 4-sample silent
    // tail (byte 128 → v=0): energy 0, zcr 0
    val plane = (Array.fill(4)(Seq(228, 28)).flatten ++ Seq(128, 128, 128, 128))
      .map(_.toByte).toArray
    val wav = Multimodal.WavCodec.encode(
      Multimodal.Decoded("wav", plane.length, 1, 1, 1, plane))
    val df = Seq((1L, wav)).toDF("id", "payload")
    val out = Multimodal.audioFrameFeatures(df, "payload", frameLen = 8,
        codec = Multimodal.WavCodec)
      .select("frame_idx", "n_samples", "energy", "zcr")
      .as[(Int, Int, Double, Double)].collect().sortBy(_._1)
    out.length shouldBe 2
    out(0) shouldBe ((0, 8, 100.0, 1.0))
    out(1) shouldBe ((1, 4, 0.0, 0.0))
  }

  test("audioFrameFeatures: trailing partial frame and single-sample zcr=0") {
    val plane = Array[Byte](200.toByte, 50, 130.toByte) // v = 72, −78, 2
    val wav = Multimodal.WavCodec.encode(
      Multimodal.Decoded("wav", 3, 1, 1, 1, plane))
    val df = Seq((1L, wav)).toDF("id", "payload")
    val out = Multimodal.audioFrameFeatures(df, "payload", frameLen = 2,
        codec = Multimodal.WavCodec)
      .select("frame_idx", "n_samples", "energy", "zcr")
      .as[(Int, Int, Double, Double)].collect().sortBy(_._1)
    out.length shouldBe 2
    out(0)._2 shouldBe 2
    out(0)._3 shouldBe math.sqrt((72.0 * 72 + 78.0 * 78) / 2)
    out(0)._4 shouldBe 1.0 // 72 → −78 is one flip over one transition
    out(1) shouldBe ((1, 1, 2.0, 0.0)) // single sample: energy |v|, zcr 0
  }

  test("JpegCodec: flat-8x8-block images round-trip EXACTLY (DC-only, " +
      "qDC=8 lossless construction)") {
    import Multimodal.JpegCodec
    // each 8x8 block constant: AC coefficients are exactly zero, DC is a
    // multiple of the quant step -> decode(encode(img)) == img
    for ((bw, bh) <- Seq((1, 1), (3, 2), (5, 3))) {
      val w = bw * 8; val h = bh * 8
      val px = Array.tabulate[Byte](w * h) { i =>
        val x = i % w; val y = i / w
        (((y / 8) * bw + (x / 8)) * 97 % 256).toByte
      }
      val jp = JpegCodec.encode(Multimodal.Decoded("jpeg", w, h, 1, 1, px))
      // it is a real JPEG: SOI..EOI markers on the wire
      (jp(0) & 0xff, jp(1) & 0xff) shouldBe ((0xff, 0xd8))
      (jp(jp.length - 2) & 0xff, jp(jp.length - 1) & 0xff) shouldBe
        ((0xff, 0xd9))
      val back = JpegCodec.decode(jp)
      (back.format, back.width, back.height, back.channels) shouldBe
        (("jpeg", w, h, 1))
      back.pixels shouldBe px
    }
  }

  test("JpegCodec: general (non-flat) images decode with bounded lossy " +
      "error; odd dimensions pad and crop correctly") {
    import Multimodal.JpegCodec
    for ((w, h) <- Seq((8, 8), (13, 7), (17, 9))) {
      val px = Array.tabulate[Byte](w * h) { i =>
        (128 + 90 * math.sin(i * 0.7)).toInt.toByte
      }
      val back = JpegCodec.decode(JpegCodec.encode(
        Multimodal.Decoded("jpeg", w, h, 1, 1, px)))
      (back.width, back.height) shouldBe ((w, h))
      // AC quant step 16 bounds per-coefficient error; empirically the
      // pixel error stays well inside +-40 for a smooth signal
      px.zip(back.pixels).foreach { case (a, b) =>
        math.abs((a & 0xff) - (b & 0xff)) should be <= 40
      }
    }
    // decode is deterministic: same bytes -> same pixels
    val d0 = Multimodal.Decoded("jpeg", 16, 16,
      1, 1, Array.tabulate[Byte](256)(i => (i * 37 % 256).toByte))
    val wire = JpegCodec.encode(d0)
    JpegCodec.decode(wire).pixels shouldBe JpegCodec.decode(wire).pixels
  }

  test("JpegCodec raises typed CodecError on unsupported and hostile " +
      "input") {
    import Multimodal.JpegCodec
    val good = JpegCodec.encode(Multimodal.Decoded("jpeg", 8, 8, 1, 1,
      Array.ofDim[Byte](64)))
    // not a JPEG
    intercept[graft.OpenEoError](
      JpegCodec.decode("bogus".getBytes("ASCII"))).code shouldBe "CodecError"
    // progressive: flip SOF0 (0xc0) to SOF2 (0xc2)
    val sof = good.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    val prog = good.clone(); prog(sof + 1) = 0xc2.toByte
    intercept[graft.OpenEoError](JpegCodec.decode(prog))
      .code shouldBe "CodecError"
    // truncated entropy stream
    intercept[graft.OpenEoError](
      JpegCodec.decode(good.dropRight(8))).code shouldBe "CodecError"
    // 2-channel encode rejected (1 = gray and 3 = YCbCr are the JPEG
    // component counts; anything else is a typed error)
    intercept[graft.OpenEoError](JpegCodec.encode(
      Multimodal.Decoded("jpeg", 2, 2, 2, 1, Array.ofDim[Byte](8))))
      .code shouldBe "CodecError"
    // multi-frame encode rejected
    intercept[graft.OpenEoError](JpegCodec.encode(
      Multimodal.Decoded("jpeg", 2, 2, 1, 2, Array.ofDim[Byte](8))))
      .code shouldBe "CodecError"
  }

  /** Test-side reimplementation of the codec's round-half-up + JFIF
    * transforms — an independent spelling of the same formulas, so a
    * codec-side slip cannot self-verify. */
  private def r255t(x: Double): Int =
    math.max(0, math.min(255, math.floor(x + 0.5).toInt))
  private def rgb2ycc(r: Int, g: Int, b: Int): (Int, Int, Int) = (
    r255t(0.299 * r + 0.587 * g + 0.114 * b),
    r255t(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0),
    r255t(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0))
  private def ycc2rgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = (
    r255t(y + 1.402 * (cr - 128)),
    r255t(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
    r255t(y + 1.772 * (cb - 128)))

  test("JpegCodec color 4:4:4: flat-8x8-block RGB round-trips through " +
      "the EXACT YCbCr integer chain (DCT lossless per plane)") {
    import Multimodal.JpegCodec
    val bw = 3; val bh = 2; val w = bw * 8; val h = bh * 8
    val px = Array.tabulate[Byte](w * h * 3) { j =>
      val i = j / 3; val c = j % 3
      val blk = ((i / w) / 8) * bw + ((i % w) / 8)
      ((blk * 53 + c * 31 + 17) % 256).toByte
    }
    val wire = JpegCodec.encode(Multimodal.Decoded("jpeg", w, h, 3, 1, px))
    val back = JpegCodec.decode(wire)
    (back.format, back.width, back.height, back.channels) shouldBe
      (("jpeg", w, h, 3))
    // every plane is flat per 8×8 block after RGB→YCbCr (same transform
    // on identical pixels), so the codec loses NOTHING except the two
    // integer color transforms — replayed here independently
    val expect = Array.tabulate[Byte](w * h * 3) { j =>
      val i = j / 3; val c = j % 3
      val blk = ((i / w) / 8) * bw + ((i % w) / 8)
      def in(ch: Int) = (blk * 53 + ch * 31 + 17) % 256
      val (y, cb, cr) = rgb2ycc(in(0), in(1), in(2))
      val (r, g, b) = ycc2rgb(y, cb, cr)
      (c match { case 0 => r; case 1 => g; case _ => b }).toByte
    }
    back.pixels shouldBe expect
  }

  test("JpegCodec color 4:2:0: flat-16x16-block RGB round-trips exactly " +
      "(constant 2x2 chroma boxes make subsampling lossless)") {
    import Multimodal.JpegCodec
    val bw = 2; val bh = 2; val w = bw * 16; val h = bh * 16
    def in(blk: Int, ch: Int) = (blk * 41 + ch * 29 + 11) % 256
    val px = Array.tabulate[Byte](w * h * 3) { j =>
      val i = j / 3; val c = j % 3
      val blk = ((i / w) / 16) * bw + ((i % w) / 16)
      in(blk, c).toByte
    }
    val wire = JpegCodec.encode420(Multimodal.Decoded("jpeg", w, h, 3, 1, px))
    // the wire declares 2x2 Y sampling: SOF0 = FF C0 len(2) prec(1)
    // h(2) w(2) nc(1), then per-component (id, hv, tq) — Y's hv byte
    // sits at offset 11 from the FF
    val sof = wire.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    (wire(sof + 9) & 0xff) shouldBe 3 // component count
    (wire(sof + 11) & 0xff) shouldBe 0x22
    val back = JpegCodec.decode(wire)
    (back.width, back.height, back.channels) shouldBe ((w, h, 3))
    val expect = Array.tabulate[Byte](w * h * 3) { j =>
      val i = j / 3; val c = j % 3
      val blk = ((i / w) / 16) * bw + ((i % w) / 16)
      val (y, cb, cr) = rgb2ycc(in(blk, 0), in(blk, 1), in(blk, 2))
      val (r, g, b) = ycc2rgb(y, cb, cr)
      (c match { case 0 => r; case 1 => g; case _ => b }).toByte
    }
    back.pixels shouldBe expect
  }

  test("JpegCodec color: general images decode with bounded error in " +
      "both modes, odd dimensions pad/crop, decode is deterministic") {
    import Multimodal.JpegCodec
    for ((w, h) <- Seq((16, 16), (19, 13))) {
      val px = Array.tabulate[Byte](w * h * 3) { j =>
        (128 + 80 * math.sin(j * 0.31)).toInt.toByte
      }
      val d = Multimodal.Decoded("jpeg", w, h, 3, 1, px)
      for (wire <- Seq(JpegCodec.encode(d), JpegCodec.encode420(d))) {
        val back = JpegCodec.decode(wire)
        (back.width, back.height, back.channels) shouldBe ((w, h, 3))
        // color transform (±1) + AC quantization + (4:2:0) chroma
        // averaging: smooth-signal error stays well inside ±48
        px.zip(back.pixels).foreach { case (a, b) =>
          math.abs((a & 0xff) - (b & 0xff)) should be <= 48
        }
        JpegCodec.decode(wire).pixels shouldBe back.pixels
      }
    }
  }

  test("decodeMeta + featureExtract run the real JPEG codec through the " +
      "seam") {
    import Multimodal.JpegCodec
    val px = Array.tabulate[Byte](16 * 8)(i =>
      (if ((i % 16) < 8) 40 else 200).toByte) // two flat blocks
    val payload = JpegCodec.encode(Multimodal.Decoded("jpeg", 16, 8, 1, 1, px))
    val df2 = Seq((1L, payload)).toDF("id", "payload")
    val m = Multimodal.decodeMeta(df2, "payload", JpegCodec)
      .select("meta.format", "meta.width", "meta.height", "mean_px").head()
    (m.getString(0), m.getInt(1), m.getInt(2)) shouldBe (("jpeg", 16, 8))
    m.getDouble(3) shouldBe 120.0 // (40 + 200) / 2
  }
}
