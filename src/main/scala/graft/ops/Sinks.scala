package graft.ops

import com.fasterxml.jackson.databind.JsonNode
import graft.cube.{Cube, Dim}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import java.awt.image.BufferedImage
import java.io.{DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import javax.imageio.ImageIO

/** `save_result` sinks (SURVEY.md §2.1 S5-S8).
  *
  * The canonical persisted form is parquet (distributed write — the 100 TB
  * path); PNG/GeoTIFF/JSON are presentation renditions of an
  * already-reduced raster, so they collect to the driver exactly like the
  * reference materializes the Dask cube before imageio/rasterio writes
  * (openeo_odc_driver.py:1616-1827). A 4-D cube to GTiff raises like the
  * reference (openeo_odc_driver.py:1703).
  */
object Sinks {

  def saveResult(value: Any, format: String, outDir: String,
      options: Option[JsonNode] = None): String = {
    new java.io.File(outDir).mkdirs()
    val fmt = format.toUpperCase
    value match {
      case c: Cube => fmt match {
        case "PNG"    => writePng(c, s"$outDir/result.png", options)
        case "GTIFF"  => writeGTiff(c, s"$outDir/result.tif")
        case "JSON"   => writeJson(c.df, s"$outDir/result.json")
        case "NETCDF" | "PARQUET" =>
          // canonical distributed sink; optional dtype cast like the
          // reference's options.dtype (openeo_odc_driver.py:1731-1732)
          val dtype = options.flatMap(o => Option(o.get("dtype"))).map(_.asText)
          val df = dtype.map(t =>
            c.df.withColumn(Cube.ValueCol, col(Cube.ValueCol).cast(t)))
            .getOrElse(c.df)
          df.write.mode("overwrite").parquet(s"$outDir/result.parquet")
          s"$outDir/result.parquet"
        case other => throw new IllegalArgumentException(s"format: $other")
      }
      case df: DataFrame =>  // zonal stats / fit params path
        fmt match {
          case "JSON" => writeJson(df, s"$outDir/result.json")
          case _ =>
            df.write.mode("overwrite").parquet(s"$outDir/result.parquet")
            s"$outDir/result.parquet"
        }
      case scalar =>  // 0-D result
        val p = s"$outDir/result.json"
        java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
          String.valueOf(scalar))
        p
    }
  }

  /** Collect a (time-less) raster into a dense row-major grid.
    * Returns (grid(y)(x) per band, xs ascending, ys DESCENDING — north-up
    * image order, the reference's y-flip at 1623-1627). */
  def collectRaster(c: Cube, bands: Seq[String]): (Map[String, Array[Array[Double]]], Seq[Double], Seq[Double]) = {
    require(!c.has(Dim.Time),
      "raster sinks need a time-reduced cube (reference raises on 3-D+ PNG)")
    val hasBand = c.has(Dim.Band)
    val rows = c.df.collect()
    val xs = rows.map(_.getAs[Double](Dim.X)).distinct.sorted.toSeq
    val ys = rows.map(_.getAs[Double](Dim.Y)).distinct.sorted.reverse.toSeq
    val xi = xs.zipWithIndex.toMap; val yi = ys.zipWithIndex.toMap
    val wanted = if (bands.nonEmpty) bands
      else if (hasBand) c.meta.bandOrder match {
        case Nil => rows.map(_.getAs[String](Dim.Band)).distinct.toSeq
        case bo  => bo
      }
      else Seq("value")
    val grids = wanted.map(_ -> Array.fill(ys.length, xs.length)(Double.NaN)).toMap
    rows.foreach { r =>
      val b = if (hasBand) r.getAs[String](Dim.Band) else "value"
      grids.get(b).foreach { g =>
        val v = r.getAs[Any](Cube.ValueCol) match {
          case null => Double.NaN
          case d: Double => d; case f: Float => f.toDouble
          case n: Number => n.doubleValue()
        }
        g(yi(r.getAs[Double](Dim.Y)))(xi(r.getAs[Double](Dim.X))) = v
      }
    }
    (grids, xs, ys)
  }

  /** 8-bit PNG with optional RGB(A)/gray band selection and longest-edge
    * `size` resize (openeo_odc_driver.py:1616-1677). Values are linearly
    * stretched to 0-255 over the finite min/max like a default rendering. */
  def writePng(c: Cube, path: String, options: Option[JsonNode]): String = {
    def opt(k: String): Option[String] =
      options.flatMap(o => Option(o.get(k))).map(_.asText)
    val rgb = Seq("red", "green", "blue").flatMap(opt)
    val gray = opt("gray")
    val bands = if (rgb.length == 3) rgb else gray.toSeq
    val (grids, xs, ys) = collectRaster(c, bands)
    val names = if (bands.nonEmpty) bands else grids.keys.toSeq.take(3)
    val h = ys.length; val w = xs.length
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    def stretch(g: Array[Array[Double]]): Array[Array[Int]] = {
      val finite = g.flatten.filter(d => !d.isNaN && !d.isInfinite)
      val lo = if (finite.nonEmpty) finite.min else 0.0
      val hi = if (finite.nonEmpty) finite.max else 1.0
      val span = if (hi > lo) hi - lo else 1.0
      g.map(_.map(v =>
        if (v.isNaN) 0 else ((v - lo) / span * 255.0).round.toInt.max(0).min(255)))
    }
    val chans = names.map(n => stretch(grids(n)))
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = chans match {
        case Seq(c0) => (c0(y)(x), c0(y)(x), c0(y)(x))
        case Seq(c0, c1, c2) => (c0(y)(x), c1(y)(x), c2(y)(x))
        case _ => (0, 0, 0)
      }
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val out = opt("size").map(_.toInt).filter(_ > 0).map { target =>
      val scale = target.toDouble / math.max(w, h)
      val nw = math.max(1, (w * scale).round.toInt)
      val nh = math.max(1, (h * scale).round.toInt)
      val scaled = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
      val gr = scaled.createGraphics()
      gr.drawImage(img.getScaledInstance(nw, nh, java.awt.Image.SCALE_SMOOTH),
        0, 0, null)
      gr.dispose(); scaled
    }.getOrElse(img)
    ImageIO.write(out, "png", new java.io.File(path))
    path
  }

  /** Minimal single-band-per-page float32 GeoTIFF (uncompressed, one strip
    * per image) with ModelPixelScale/ModelTiepoint georeferencing — the
    * subset of the format the reference emits through rasterio
    * (openeo_odc_driver.py:1679-1724). Multi-band cubes raise for now
    * (reference raises on 4-D; our single-page writer covers the reduced
    * 2-D case the golden query produces). */
  def writeGTiff(c: Cube, path: String): String = {
    val (grids, xs, ys) = collectRaster(c, Nil)
    require(grids.size == 1,
      s"GTiff sink supports a single band, got ${grids.keys}")
    val g = grids.values.head
    val h = ys.length; val w = xs.length
    val dx = if (xs.length > 1) xs(1) - xs.head else 1.0
    val dy = if (ys.length > 1) ys.head - ys(1) else 1.0
    // pixel-is-area: tiepoint at the outer corner of the top-left cell
    val originX = xs.head - dx / 2; val originY = ys.head + dy / 2
    val data = ByteBuffer.allocate(w * h * 4).order(ByteOrder.LITTLE_ENDIAN)
    for (row <- g; v <- row) data.putFloat(v.toFloat)
    // --- TIFF structure: header, pixel data, then IFD ---
    val dataOffset = 8
    val ifdOffset = dataOffset + w * h * 4
    case class Entry(tag: Int, typ: Int, count: Int, value: Long)
    var extraOffset = ifdOffset + 2 + 15 * 12 + 4
    val extras = scala.collection.mutable.ArrayBuffer[(Long, Array[Byte])]()
    def extra(bytes: Array[Byte]): Long = {
      val off = extraOffset; extras += ((off, bytes)); extraOffset += bytes.length
      off
    }
    def doubles(vs: Double*): Long = {
      val b = ByteBuffer.allocate(vs.length * 8).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(b.putDouble); extra(b.array())
    }
    def shorts(vs: Int*): Long = {
      val b = ByteBuffer.allocate(vs.length * 2).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(v => b.putShort(v.toShort)); extra(b.array())
    }
    val epsg = c.meta.crs.flatMap(Filters.crsEpsg).getOrElse(4326)
    val geoKeys = Seq( // GeoKeyDirectory: version, rev, minor, nKeys, then keys
      1, 1, 0, 3,
      1024, 0, 1, 1,      // GTModelType = projected(1)
      1025, 0, 1, 1,      // RasterPixelIsArea
      3072, 0, 1, epsg)   // ProjectedCSType
    val entries = Seq(
      Entry(256, 3, 1, w),                         // ImageWidth
      Entry(257, 3, 1, h),                         // ImageLength
      Entry(258, 3, 1, 32),                        // BitsPerSample
      Entry(259, 3, 1, 1),                         // Compression: none
      Entry(262, 3, 1, 1),                         // Photometric: minIsBlack
      Entry(273, 4, 1, dataOffset),                // StripOffsets
      Entry(277, 3, 1, 1),                         // SamplesPerPixel
      Entry(278, 3, 1, h),                         // RowsPerStrip
      Entry(279, 4, 1, w * h * 4),                 // StripByteCounts
      Entry(339, 3, 1, 3),                         // SampleFormat: IEEE float
      Entry(33550, 12, 3, doubles(dx, dy, 0.0)),   // ModelPixelScale
      Entry(33922, 12, 6,                          // ModelTiepoint
        doubles(0, 0, 0, originX, originY, 0)),
      Entry(34735, 3, geoKeys.length, shorts(geoKeys: _*)), // GeoKeyDirectory
      Entry(284, 3, 1, 1),                         // PlanarConfig
      Entry(338, 3, 0, 0)                          // placeholder keeps count=15
    ).sortBy(_.tag)
    val out = new DataOutputStream(new FileOutputStream(path))
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = { var i = 0; while (i < 4) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    out.write('I'); out.write('I'); le16(42); le32(ifdOffset)
    out.write(data.array())
    le16(entries.length)
    entries.foreach { e =>
      le16(e.tag); le16(e.typ); le32(e.count)
      e.typ match {
        case 3 if e.count <= 2 => le16(e.value.toInt); le16(0)
        case _ => le32(e.value)
      }
    }
    le32(0) // next IFD
    extras.sortBy(_._1).foreach { case (_, bytes) => out.write(bytes) }
    out.close()
    path
  }

  /** Label-keyed JSON rendition (openeo_odc_driver.py:1783-1827): rows as
    * an array of objects keyed by dimension labels. */
  def writeJson(df: DataFrame, path: String): String = {
    val json = df.toJSON.collect().mkString("[", ",", "]")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), json)
    path
  }
}
