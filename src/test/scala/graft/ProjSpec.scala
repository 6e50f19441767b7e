package graft

import graft.cube.Cube
import graft.ops._

class ProjSpec extends SparkSpec {

  private val samplePoints = Seq(
    (9.05, 48.52), (11.3, 46.5), (7.8, 51.1), (10.0, 50.0))

  test("generic TransverseMercator reproduces the pinned UTM fast path") {
    val utm32 = TransverseMercator(Ellipsoid.Wgs84, 0.0, 9.0, 0.9996,
      500000.0, 0.0)
    for ((lo, la) <- samplePoints) {
      val (xg, yg) = utm32.forward(lo, la)
      val (xl, yl) = Utm.fromLonLat(lo, la, 32632)
      xg shouldBe xl +- 1e-6
      yg shouldBe yl +- 1e-6
      val (lo2, la2) = utm32.inverse(xg, yg)
      lo2 shouldBe lo +- 1e-8 // Snyder series truncation (~1 mm)
      la2 shouldBe la +- 1e-8
    }
    // southern hemisphere false northing
    val utm33s = TransverseMercator(Ellipsoid.Wgs84, 0.0, 15.0, 0.9996,
      500000.0, 10000000.0)
    val (xs, ys) = utm33s.forward(16.4, -33.9)
    val (xl, yl) = Utm.fromLonLat(16.4, -33.9, 32733)
    xs shouldBe xl +- 1e-6
    ys shouldBe yl +- 1e-6
  }

  test("generic LCC-2SP reproduces the pinned Lambert-93 fast path") {
    val l93 = LambertConformal2SP(Ellipsoid.Grs80, 46.5, 3.0, 49.0, 44.0,
      700000.0, 6600000.0)
    for ((lo, la) <- Seq((2.35, 48.85), (5.37, 43.3), (-1.55, 47.22))) {
      val (xg, yg) = l93.forward(lo, la)
      val (xl, yl) = Lambert93.fromLonLat(lo, la)
      xg shouldBe xl +- 1e-6
      yg shouldBe yl +- 1e-6
    }
  }

  test("generic LAEA reproduces the pinned EPSG:3035 fast path") {
    val laea = LambertAzimuthalEA(Ellipsoid.Grs80, 52.0, 10.0,
      4321000.0, 3210000.0)
    for ((lo, la) <- samplePoints) {
      val (xg, yg) = laea.forward(lo, la)
      val (xl, yl) = Laea.fromLonLat(lo, la)
      xg shouldBe xl +- 1e-6
      yg shouldBe yl +- 1e-6
    }
  }

  test("British National Grid: OS worked example matches to the centimeter") {
    // Published OSGB worked example (OS "A guide to coordinate systems in
    // Great Britain", Annex C): OSGB36 lat 52°39'27.2531"N,
    // lon 1°43'4.5177"E -> E 651409.903, N 313177.270. Projection-only
    // (input is OSGB36 geodetic, so no Helmert step).
    val bng = TransverseMercator(Ellipsoid.Airy1830, 49.0, -2.0,
      0.9996012717, 400000.0, -100000.0)
    val lat = 52.0 + 39.0 / 60 + 27.2531 / 3600
    val lon = 1.0 + 43.0 / 60 + 4.5177 / 3600
    val (e, n) = bng.forward(lon, lat)
    e shouldBe 651409.903 +- 0.01
    n shouldBe 313177.270 +- 0.01
  }

  test("registry CRSs roundtrip WGS84 -> projected -> WGS84 incl. datum shift") {
    val domains = Map(
      27700 -> Seq((-0.13, 51.51), (-3.2, 55.95), (-5.9, 54.6)),
      2193 -> Seq((174.78, -41.29), (172.64, -43.53)),
      3034 -> Seq((10.0, 50.0), (-3.7, 40.4), (25.3, 54.7)),
      3978 -> Seq((-75.7, 45.42), (-123.1, 49.28)),
      31370 -> Seq((4.35, 50.85), (3.22, 51.21)),
      31467 -> Seq((9.18, 48.78), (11.58, 48.14)),
      26917 -> Seq((-79.38, 43.65), (-83.05, 42.33)))
    for ((epsg, pts) <- domains; (lo, la) <- pts) {
      val pd = Proj.forEpsg(epsg).get
      val (x, y) = pd.fromLonLat(lo, la)
      val (lo2, la2) = pd.toLonLat(x, y)
      // Helmert forward+inverse uses the standard negated-parameter
      // approximation: residual well under 1e-6 deg (~0.1 m)
      lo2 shouldBe lo +- 1e-6
      la2 shouldBe la +- 1e-6
    }
    // the Helmert shift is real: OSGB36 grid coords of a WGS84 point must
    // differ from the no-datum-shift projection by the ~100 m OSGB offset
    val bngNoShift = TransverseMercator(Ellipsoid.Airy1830, 49.0, -2.0,
      0.9996012717, 400000.0, -100000.0)
    val pd = Proj.forEpsg(27700).get
    val (xs, ys) = pd.fromLonLat(-0.13, 51.51)
    val (xn, yn) = bngNoShift.forward(-0.13, 51.51)
    val d = math.hypot(xs - xn, ys - yn)
    d should be > 50.0
    d should be < 200.0
  }

  test("Crs dispatch reaches registry codes and keeps typed errors") {
    Crs.supported(27700) shouldBe true
    Crs.supported(3978) shouldBe true
    Crs.supported(99999) shouldBe false
    val (x, y) = Crs.transformPoint(-0.13, 51.51, 4326, 27700)
    val (lo, la) = Crs.transformPoint(x, y, 27700, 4326)
    lo shouldBe -0.13 +- 1e-6
    la shouldBe 51.51 +- 1e-6
    val err = intercept[OpenEoError](Crs.transformPoint(0, 0, 4326, 99999))
    err.code shouldBe "CrsNotSupported"
  }

  test("proj-string parser: utm/tmerc/lcc/longlat + malformed -> typed error") {
    // +proj=utm == the UTM fast path
    val utm = Proj.parse("+proj=utm +zone=32 +ellps=WGS84")
    for ((lo, la) <- samplePoints) {
      val (xg, yg) = utm.fromLonLat(lo, la)
      val (xl, yl) = Utm.fromLonLat(lo, la, 32632)
      xg shouldBe xl +- 1e-6
      yg shouldBe yl +- 1e-6
    }
    // full BNG proj-string == the registry entry (incl. towgs84)
    val bng = Proj.parse("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 " +
      "+x_0=400000 +y_0=-100000 +ellps=airy " +
      "+towgs84=446.448,-125.157,542.060,0.1502,0.2470,0.8421,-20.4894")
    val reg = Proj.forEpsg(27700).get
    val (xa, ya) = bng.fromLonLat(-0.13, 51.51)
    val (xb, yb) = reg.fromLonLat(-0.13, 51.51)
    xa shouldBe xb +- 1e-6
    ya shouldBe yb +- 1e-6
    // lcc with lat_2 defaulting to lat_1 and spherical-mercator web string
    Proj.parse("+proj=lcc +lat_1=49 +lat_0=49 +lon_0=-95 +ellps=GRS80")
    val web = Proj.parse("+proj=merc +a=6378137 +b=6378137")
    val (xw, _) = web.fromLonLat(180.0, 0.0)
    xw shouldBe 20037508.342789244 +- 1e-6
    // longlat is the identity
    Proj.parse("+proj=longlat +ellps=WGS84").fromLonLat(5.0, 45.0) shouldBe
      ((5.0, 45.0))
    // PROJ default: omitted +lat_0 is 0, not lat_1
    val lccDefault = Proj.parse("+proj=lcc +lat_1=33 +lat_2=45 +lon_0=-95 +ellps=GRS80")
    val lccExplicit = Proj.parse("+proj=lcc +lat_0=0 +lat_1=33 +lat_2=45 +lon_0=-95 +ellps=GRS80")
    val (xd, yd) = lccDefault.fromLonLat(-90.0, 40.0)
    val (xe2, ye2) = lccExplicit.fromLonLat(-90.0, 40.0)
    xd shouldBe xe2 +- 1e-9
    yd shouldBe ye2 +- 1e-9
    // malformed inputs keep the typed-error contract; ellipsoidal merc is
    // rejected rather than silently computed on the sphere
    for (bad <- Seq("+proj=foo", "+proj=utm", "+proj=utm +zone=99",
        "+proj=tmerc +lat_0=abc", "+proj=lcc",
        "+proj=tmerc +towgs84=1,2,3,4,5", "no plus prefix",
        "+proj=merc +ellps=WGS84", "+proj=merc",
        "+proj=merc +a=6378137 +b=6378137 +lat_ts=30"))
      intercept[OpenEoError] {
        val pd = CrsRef.parse(bad) match {
          case DefRef(p) => p
          case EpsgRef(_) => throw OpenEoError("CrsNotSupported", bad)
        }
        pd.fromLonLat(0, 0)
      }.code shouldBe "CrsNotSupported"
  }

  test("filter_bbox accepts a proj-string crs for the bbox") {
    import org.apache.spark.sql.functions._
    val (x1, y1) = Utm.fromLonLat(11.30, 46.50, 32632) // inside
    val (x2, y2) = Utm.fromLonLat(11.60, 46.80, 32632) // outside
    val c0 = cubeOf(
      ("2024-01-01", "B04", y1, x1, 1.0),
      ("2024-01-01", "B04", y2, x2, 2.0))
    val c = Cube(c0.df, c0.meta.copy(crs = Some("EPSG:32632")))
    // bbox given in plain geographic coordinates via proj-string
    val r = Filters.filterBboxRef(c, west = 11.2, south = 46.4,
      east = 11.4, north = 46.6,
      bboxCrs = CrsRef.parse("+proj=longlat +ellps=WGS84"))
    r.df.select("value").collect().map(_.getDouble(0)).toSeq shouldBe Seq(1.0)
    // and the string "EPSG:4326" resolves identically
    val r2 = Filters.filterBboxRef(c, 11.2, 46.4, 11.4, 46.6,
      CrsRef.parse("EPSG:4326"))
    r2.df.select("value").collect().map(_.getDouble(0)).toSeq shouldBe Seq(1.0)
    // a cube WITHOUT a parseable CRS keeps the assume-same-CRS convention
    // even for a proj-string bbox: raw-coordinate compare, no silent
    // 4326 transform (which would compare degrees against meters)
    val noCrs = Cube(c0.df, c0.meta.copy(crs = None))
    val r3 = Filters.filterBboxRef(noCrs,
      west = x1 - 1, south = y1 - 1, east = x1 + 1, north = y1 + 1,
      bboxCrs = CrsRef.parse("+proj=utm +zone=32 +ellps=WGS84"))
    r3.df.select("value").collect().map(_.getDouble(0)).toSeq shouldBe Seq(1.0)
  }
}
