package graft.tools

import graft.cube.{Cube, CubeMeta, GridRef}
import graft.ops.Sar2Cube
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-smoke for the SAR tier (round 10): geocode (nearest bin +
  * hull-masked linear), radar_mask, and the lon/lat data-band bbox scan
  * at 1× and 10× pixel counts. The design claims under test: every path
  * is a constant number of distributed passes — one window + one
  * bin-groupBy for nearest geocode, one scatter + pivot for radar_mask,
  * a bounded hull derivation for linear — so cost must stay ~linear in
  * pixels, never super-linear. Run:
  * {{{ sbt "runMain graft.tools.SarProbe" }}}
  */
object SarProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val t0 = lit(java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))

    /** n×n SAR-geometry cube: view data band + per-pixel lon/lat grids
      * (the q_geocode fixture's shape, scaled). */
    def geoCube(n: Int): Cube = {
      val base = spark.range(n.toLong * n).select(
        (col("id") / n).cast("double").as("y"),
        (col("id") % n).cast("double").as("x"))
      val lon = lit(11.0) + col("x") * 0.0001 + col("y") * 0.000001
      val lat = lit(45.0) + col("y") * 0.0001 + col("x") * 0.000001
      val df = base.select(t0.as("time"), col("y"), col("x"),
        explode(array(
          struct(lit("view").as("band"),
            (col("x") + col("y") * 2.0).as("value")),
          struct(lit("grid_lon").as("band"), lon.as("value")),
          struct(lit("grid_lat").as("band"), lat.as("value")))).as("_e"))
        .select(col("time"), col("_e.band").as("band"), col("y"),
          col("x"), col("_e.value").as("value"))
      Cube(df, CubeMeta(bandOrder = Seq("view", "grid_lon", "grid_lat"),
        grid = Some(GridRef(0, 0, 1, 1))))
    }

    /** n×n DEM+LIA cube for radar_mask: a smooth hill + a constant-ish
      * local incidence angle. */
    def demCube(n: Int): Cube = {
      val base = spark.range(n.toLong * n).select(
        (col("id") / n).cast("double").as("y"),
        (col("id") % n).cast("double").as("x"))
      val dem = (sin(col("x") / 20.0) + cos(col("y") / 20.0)) * 50.0
      val df = base.select(t0.as("time"), col("y"), col("x"),
        explode(array(
          struct(lit("DEM").as("band"), dem.as("value")),
          struct(lit("LIA").as("band"),
            (lit(35.0) + sin(col("x") / 50.0)).as("value")))).as("_e"))
        .select(col("time"), col("_e.band").as("band"), col("y"),
          col("x"), col("_e.value").as("value"))
      Cube(df, CubeMeta(bandOrder = Seq("DEM", "LIA"),
        grid = Some(GridRef(0, 0, 1, 1))))
    }

    def probe(tag: String, n: Int): Unit = {
      val px = n.toLong * n
      val gc = geoCube(n)
      val near = time(sink(
        Sar2Cube.geocode(gc, targetEpsg = 32632, resolution = 100.0).df))
      val lin = time(sink(
        Sar2Cube.geocode(gc, targetEpsg = 32632, resolution = 100.0,
          method = "linear").df))
      val bbox = time(sink(
        Sar2Cube.filterBboxByLonLatBands(gc, west = 11.0005,
          south = 45.0005, east = 11.0025, north = 45.0305).df))
      val dm = demCube(n)
      val mask = time(sink(
        Sar2Cube.radarMask(dm, foreshorteningTh = 0.1, layoverTh = 0.5,
          orbitDirection = "DSC").df))
      println(f"[sarprobe] $tag px=$px geocode_near=$near%.2f " +
        f"geocode_linear=$lin%.2f bbox_lonlat=$bbox%.2f " +
        f"radar_mask=$mask%.2f")
    }

    probe("warm", 60) // JIT/codegen warm-up, uncounted
    probe("x1", 200)  // 40k pixels
    probe("x10", 632) // ~400k pixels
    spark.stop()
  }
}
