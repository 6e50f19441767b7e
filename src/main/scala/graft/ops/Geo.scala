package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geometry primitives used by the spatial operators.
  *
  * Point-in-polygon is compiled to a pure `Column` expression (even-odd ray
  * casting unrolled over the polygon's edges) so it stays inside
  * whole-stage codegen — no UDF, no driver round-trip. The geometry is
  * always small (query literals), the cube is the 100 TB side; unrolling the
  * edges into the expression tree is the broadcast-free way to filter.
  * Reference behavior: rasterize-polygon-then-mask
  * (load_odc_collection.py:190-226, openeo_odc_driver.py:641-652).
  */
object Geo {

  /** Closed ring as (x, y) vertex list (first vertex need not be repeated). */
  type Ring = Seq[(Double, Double)]

  /** Even-odd rule point-in-polygon as a codegen-friendly expression:
    * count edge crossings of the rightward ray from (px, py); odd = inside.
    */
  def pointInRing(px: Column, py: Column, ring: Ring): Column = {
    val n = ring.length
    val crossings: Seq[Column] = (0 until n).map { i =>
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % n)
      if (y1 == y2) lit(0) // horizontal edge never crosses the ray
      else {
        val straddles = (lit(y1) > py) =!= (lit(y2) > py)
        val xAtY = lit(x1) + (py - lit(y1)) * lit((x2 - x1) / (y2 - y1))
        when(straddles && px < xAtY, 1).otherwise(0)
      }
    }
    (crossings.reduce(_ + _) % 2) === 1
  }

  /** Point in any ring of a multi-polygon (no hole support — the reference's
    * rasterize path has none either). */
  def pointInPolygons(px: Column, py: Column, rings: Seq[Ring]): Column =
    rings.map(pointInRing(px, py, _)).reduce(_ || _)

  /** Feature-id assignment: first polygon containing the point, else null.
    * Mirrors the per-feature clip loop of aggregate_spatial
    * (openeo_odc_driver.py:662-684) as one expression. */
  def featureId(px: Column, py: Column, features: Seq[Ring]): Column =
    features.zipWithIndex.foldRight(lit(null).cast("int")) {
      case ((ring, i), acc) => when(pointInRing(px, py, ring), lit(i)).otherwise(acc)
    }

  def bboxOf(ring: Ring): (Double, Double, Double, Double) =
    (ring.map(_._1).min, ring.map(_._2).min, ring.map(_._1).max, ring.map(_._2).max)
}

/** Minimal Transverse-Mercator (UTM) <-> geographic conversion, pure Scala,
  * driver-side only — used to transform the 4 bbox corners / polygon
  * vertices of a spatial filter from EPSG:4326 into the cube CRS before
  * compiling the range predicate, replacing the reference's pyproj calls
  * (openeo_odc_driver.py:1036-1078, 641-652). Formulas are the public
  * Snyder series (USGS PP 1395, pp. 60-64); accuracy ~1e-2 m, ample for
  * bbox corners.
  */
object Utm {
  private val a = 6378137.0              // WGS84
  private val f = 1.0 / 298.257223563
  private val e2 = f * (2 - f)
  private val ep2 = e2 / (1 - e2)
  private val k0 = 0.9996

  def epsgToZone(epsg: Int): (Int, Boolean) = {
    require((epsg >= 32601 && epsg <= 32660) || (epsg >= 32701 && epsg <= 32760),
      s"not a UTM EPSG code: $epsg")
    if (epsg <= 32660) (epsg - 32600, true) else (epsg - 32700, false)
  }

  /** lon/lat (deg, EPSG:4326) → (easting, northing) in the given UTM EPSG. */
  def fromLonLat(lon: Double, lat: Double, epsg: Int): (Double, Double) = {
    val (zone, north) = epsgToZone(epsg)
    val lam0 = math.toRadians(zone * 6 - 183)
    val phi = math.toRadians(lat); val lam = math.toRadians(lon)
    val n = a / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    val t = math.tan(phi) * math.tan(phi)
    val c = ep2 * math.cos(phi) * math.cos(phi)
    val bigA = (lam - lam0) * math.cos(phi)
    val m = a * ((1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256) * phi -
      (3 * e2 / 8 + 3 * e2 * e2 / 32 + 45 * e2 * e2 * e2 / 1024) * math.sin(2 * phi) +
      (15 * e2 * e2 / 256 + 45 * e2 * e2 * e2 / 1024) * math.sin(4 * phi) -
      (35 * e2 * e2 * e2 / 3072) * math.sin(6 * phi))
    val x = k0 * n * (bigA + (1 - t + c) * math.pow(bigA, 3) / 6 +
      (5 - 18 * t + t * t + 72 * c - 58 * ep2) * math.pow(bigA, 5) / 120) + 500000.0
    val y0 = k0 * (m + n * math.tan(phi) * (bigA * bigA / 2 +
      (5 - t + 9 * c + 4 * c * c) * math.pow(bigA, 4) / 24 +
      (61 - 58 * t + t * t + 600 * c - 330 * ep2) * math.pow(bigA, 6) / 720))
    (x, if (north) y0 else y0 + 10000000.0)
  }

  /** (easting, northing) in UTM EPSG → lon/lat (deg). */
  def toLonLat(x: Double, y: Double, epsg: Int): (Double, Double) = {
    val (zone, north) = epsgToZone(epsg)
    val lam0 = math.toRadians(zone * 6 - 183)
    val yy = if (north) y else y - 10000000.0
    val m = yy / k0
    val mu = m / (a * (1 - e2 / 4 - 3 * e2 * e2 / 64 - 5 * e2 * e2 * e2 / 256))
    val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    val phi1 = mu + (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
      (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu) +
      (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
    val n1 = a / math.sqrt(1 - e2 * math.sin(phi1) * math.sin(phi1))
    val r1 = a * (1 - e2) / math.pow(1 - e2 * math.sin(phi1) * math.sin(phi1), 1.5)
    val t1 = math.tan(phi1) * math.tan(phi1)
    val c1 = ep2 * math.cos(phi1) * math.cos(phi1)
    val d = (x - 500000.0) / (n1 * k0)
    val phi = phi1 - (n1 * math.tan(phi1) / r1) * (d * d / 2 -
      (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * math.pow(d, 4) / 24 +
      (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) *
        math.pow(d, 6) / 720)
    val lam = lam0 + (d - (1 + 2 * t1 + c1) * math.pow(d, 3) / 6 +
      (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) *
        math.pow(d, 5) / 120) / math.cos(phi1)
    (math.toDegrees(lam), math.toDegrees(phi))
  }

  /** Transform a ring between EPSG:4326 and a UTM CRS (either direction). */
  def transformRing(ring: Geo.Ring, fromEpsg: Int, toEpsg: Int): Geo.Ring = {
    if (fromEpsg == toEpsg) ring
    else if (fromEpsg == 4326) ring.map { case (lo, la) => fromLonLat(lo, la, toEpsg) }
    else if (toEpsg == 4326) ring.map { case (x, y) => toLonLat(x, y, fromEpsg) }
    else transformRing(transformRing(ring, fromEpsg, 4326), 4326, toEpsg)
  }
}
