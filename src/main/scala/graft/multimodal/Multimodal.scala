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
  * Codec reality: this container has no image/audio libraries, so the
  * byte-level decoders are STUBS behind [[Codec]] — a deterministic fake
  * format ("GRFT") carries real metadata in a parsed header, and pixel
  * payloads are synthesized from the bytes. The Spark-side plumbing —
  * schema, batch iteration, partition sizing, output shapes — is real and
  * is what a production codec would drop into.
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
