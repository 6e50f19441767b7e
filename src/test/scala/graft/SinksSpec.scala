package graft

import graft.cube.{Cube, CubeMeta, Dim}
import graft.ops.Sinks
import javax.imageio.ImageIO

class SinksSpec extends SparkSpec {
  import spark.implicits._

  def raster: Cube = {
    // band-less 2×2 raster, values 0..3 (reduced cube: no time dim)
    val df = Seq(
      (0.0, 0.0, 0.0), (0.0, 1.0, 1.0), (1.0, 0.0, 2.0), (1.0, 1.0, 3.0))
      .toDF("y", "x", "value")
    Cube(df, CubeMeta(crs = Some("EPSG:32632")))
  }

  test("PNG sink renders a stretched 8-bit image, north-up") {
    val dir = java.nio.file.Files.createTempDirectory("png").toString
    val path = Sinks.writePng(raster, s"$dir/r.png", None)
    val img = ImageIO.read(new java.io.File(path))
    img.getWidth shouldBe 2
    img.getHeight shouldBe 2
    // y DESC: top row is y=1 → values (2,3) stretch to (170,255)
    (img.getRGB(1, 0) & 0xff) shouldBe 255
    (img.getRGB(0, 1) & 0xff) shouldBe 0 // bottom-left = min value
  }

  test("GTiff sink writes a parseable little-endian TIFF with geo tags") {
    val dir = java.nio.file.Files.createTempDirectory("tif").toString
    val path = Sinks.writeGTiff(raster, s"$dir/r.tif")
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    bytes(0).toChar shouldBe 'I'
    bytes(1).toChar shouldBe 'I'
    bytes(2) shouldBe 42
    // float32 pixels start at offset 8; first pixel is top-left (y=1,x=0) = 2
    val bb = java.nio.ByteBuffer.wrap(bytes, 8, 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.getFloat() shouldBe 2.0f
    bb.getFloat() shouldBe 3.0f
    bb.getFloat() shouldBe 0.0f
    bb.getFloat() shouldBe 1.0f
  }

  test("time-bearing cube is rejected by raster sinks (reference parity)") {
    val c = cubeOf(("2024-01-01", "B", 0, 0, 1.0))
    an[IllegalArgumentException] should be thrownBy
      Sinks.writeGTiff(Cube(c.df.drop(Dim.Band), c.meta), "/tmp/x.tif")
  }

  test("JSON sink writes row objects") {
    val dir = java.nio.file.Files.createTempDirectory("json").toString
    val path = Sinks.writeJson(raster.df, s"$dir/r.json")
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    txt should startWith("[")
    txt should include(""""value":3.0""")
  }
}
