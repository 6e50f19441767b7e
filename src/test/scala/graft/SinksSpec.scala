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

  def twoBandRaster: Cube = {
    val df = Seq(
      ("A", 0.0, 0.0, 1.0), ("A", 0.0, 1.0, 2.0),
      ("A", 1.0, 0.0, 3.0), ("A", 1.0, 1.0, 4.0),
      ("B", 0.0, 0.0, 10.0), ("B", 0.0, 1.0, 20.0),
      ("B", 1.0, 0.0, 30.0), ("B", 1.0, 1.0, 40.0))
      .toDF("band", "y", "x", "value")
    Cube(df, CubeMeta(crs = Some("EPSG:32632"), bandOrder = Seq("A", "B")))
  }

  test("PNG sink maps red/green/blue options onto the chosen bands") {
    val df = Seq(
      ("R", 0.0, 0.0, 0.0), ("R", 0.0, 1.0, 10.0),
      ("G", 0.0, 0.0, 10.0), ("G", 0.0, 1.0, 0.0),
      ("B", 0.0, 0.0, 0.0), ("B", 0.0, 1.0, 0.0))
      .toDF("band", "y", "x", "value")
    val c = Cube(df, CubeMeta(bandOrder = Seq("R", "G", "B")))
    val opts = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree("""{"red":"R","green":"G","blue":"B"}""")
    val dir = java.nio.file.Files.createTempDirectory("pngrgb").toString
    val img = ImageIO.read(new java.io.File(
      Sinks.writePng(c, s"$dir/rgb.png", Some(opts))))
    // x=1: red channel maxed; x=0: green channel maxed
    (img.getRGB(1, 0) >> 16 & 0xff) shouldBe 255
    (img.getRGB(0, 0) >> 8 & 0xff) shouldBe 255
    (img.getRGB(1, 0) >> 8 & 0xff) shouldBe 0
  }

  test("GTiff sink round-trips a 2-band planar raster with stats + nodata") {
    val dir = java.nio.file.Files.createTempDirectory("tif2").toString
    val path = Sinks.writeGTiff(twoBandRaster, s"$dir/r2.tif")
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.getChar; bb.getChar // II, 42 checked by the single-band test
    // parse the IFD: entries keyed by tag
    val ifd = bb.getInt(4)
    val n = bb.getShort(ifd) & 0xffff
    val tags = (0 until n).map { i =>
      val off = ifd + 2 + i * 12
      (bb.getShort(off) & 0xffff) ->
        (bb.getShort(off + 2) & 0xffff, bb.getInt(off + 4), off + 8)
    }.toMap
    tags(277)._2 shouldBe 1; bb.getShort(tags(277)._3) shouldBe 2 // 2 samples
    bb.getShort(tags(284)._3) shouldBe 2                          // planar
    // two strips: band A plane then band B plane (row-major, y desc)
    val so = tags(273); so._2 shouldBe 2
    val stripTable = bb.getInt(so._3)
    val offA = bb.getInt(stripTable); val offB = bb.getInt(stripTable + 4)
    bb.getFloat(offA) shouldBe 3.0f  // top-left of A (y=1 row first)
    bb.getFloat(offB) shouldBe 30.0f // top-left of B
    // GDAL metadata + nodata tags present with per-band stats
    val txt = new String(bytes, "ISO-8859-1")
    txt should include("STATISTICS_MINIMUM")
    txt should include("""sample="1"""")
    tags should contain key 42113
  }

  test("JSON cube sink: 1-D time axis with bands → {label: {band: [v]}}") {
    val df = Seq(
      (ts("2024-01-01 00:00:00"), "A", 1.0), (ts("2024-01-01 00:00:00"), "B", 2.0),
      (ts("2024-01-02 00:00:00"), "A", 3.0), (ts("2024-01-02 00:00:00"), "B", 4.0))
      .toDF("time", "band", "value")
    val c = Cube(df, CubeMeta(bandOrder = Seq("A", "B")))
    val dir = java.nio.file.Files.createTempDirectory("jsonc").toString
    val path = Sinks.writeJsonCube(c, s"$dir/r.json")
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    node.fieldNames().next() should startWith("2024-01-01")
    val day1 = node.get(node.fieldNames().next())
    day1.get("A").get(0).asDouble() shouldBe 1.0
    day1.get("B").get(0).asDouble() shouldBe 2.0
  }

  test("JSON cube sink: 0-D with bands → {band: [[v]]}") {
    val df = Seq(("A", 7.0), ("B", 8.0)).toDF("band", "value")
    val c = Cube(df, CubeMeta(bandOrder = Seq("A", "B")))
    val dir = java.nio.file.Files.createTempDirectory("json0").toString
    val path = Sinks.writeJsonCube(c, s"$dir/r.json")
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    node.get("A").get(0).get(0).asDouble() shouldBe 7.0
    node.get("B").get(0).get(0).asDouble() shouldBe 8.0
  }

  test("JSON cube sink: 2-D (y,x) → xarray-to_dict shape {dims,coords,data}") {
    val path = Sinks.writeJsonCube(raster,
      java.nio.file.Files.createTempDirectory("json2").toString + "/r.json")
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    node.get("dims").get(0).asText() shouldBe "y"
    node.get("dims").get(1).asText() shouldBe "x"
    // data[y=0][x=1] = 1.0 (labels sorted ascending)
    node.get("data").get(0).get(1).asDouble() shouldBe 1.0
    node.get("coords").get("y").get("data").size() shouldBe 2
  }

  test("JSON sink writes row objects") {
    val dir = java.nio.file.Files.createTempDirectory("json").toString
    val path = Sinks.writeJson(raster.df, s"$dir/r.json")
    val txt = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    txt should startWith("[")
    txt should include(""""value":3.0""")
  }
}
