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
}
