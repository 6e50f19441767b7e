package graft.ops

import graft.cube.{Cube, Dim}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** `run_udf` — the external-UDF escape hatch (SURVEY.md §2.11).
  *
  * The reference ships cube chunks to an R worker pool through NetCDF
  * files on disk and reassembles with open_mfdataset
  * (openeo_odc_driver.py:282-339) — a filesystem shuffle. Here the same
  * architectural slot is `flatMapGroups` over (time, band) tiles: Spark's
  * shuffle moves the tiles, each group materializes one slice in memory
  * (the reference's `chunk_size` analogue is the tile extent), and the
  * user function runs once per tile on the executor. The R/Python bridge
  * itself is out of scope (zero-egress container) — [[TileFn]] is the seam
  * where a py4j/Rserve call would plug in.
  */
object RunUdf {

  /** One raster tile: the (y, x, value) triples of a (time?, band?) slice. */
  final case class TilePoint(y: Double, x: Double, value: Double)

  /** User function: slice key (time millis or 0, band or "") + points →
    * transformed points. Must be pure and serializable. */
  type TileFn = (Long, String, Seq[TilePoint]) => Seq[TilePoint]

  /** Run a tile function over every (time, band) slice — optionally
    * sub-tiled into `chunkSize`×`chunkSize`-pixel spatial chunks like the
    * reference's `context.chunk_size` (default 512,
    * openeo_odc_driver.py:304-316). Output keeps the cube schema; the fn
    * may move/add/remove points within its tile.
    *
    * 100 TB shape: WITHOUT chunking a group is a whole (time, band) slice
    * — fine for reduced cubes, but a full-resolution slice can be
    * 10k×10k and every group materializes in one task's memory. With
    * `chunkSize` set (requires `CubeMeta.grid` for the pixel indices),
    * the group key gains (tileY, tileX) and per-task memory is bounded by
    * chunkSize² regardless of slice extent — the same reason the
    * reference chunks its R-worker input. */
  def runOnTiles(c: Cube, fn: TileFn, chunkSize: Option[Int] = None): Cube = {
    val hasTime = c.has(Dim.Time); val hasBand = c.has(Dim.Band)
    val spark = c.df.sparkSession
    import spark.implicits._
    val (tileY, tileX) = chunkSize match {
      case Some(cs) =>
        require(cs > 0, s"chunk_size must be positive, got $cs")
        val g = c.meta.requireGrid
        (floor(g.yIdx(col(Dim.Y)).cast("double") / cs).cast("long"),
          floor(g.xIdx(col(Dim.X)).cast("double") / cs).cast("long"))
      case None => (lit(0L), lit(0L))
    }
    val keyed = c.df.select(
      (if (hasTime) col(Dim.Time).cast("long") * 1000 else lit(0L)).as("_t"),
      (if (hasBand) col(Dim.Band) else lit("")).as("_b"),
      tileY.as("_ty"), tileX.as("_tx"),
      col(Dim.Y), col(Dim.X), col(Cube.ValueCol).cast("double"))
      .as[(Long, String, Long, Long, Double, Double, Double)]
    val out = keyed.groupByKey(r => (r._1, r._2, r._3, r._4))
      .flatMapGroups { (key: (Long, String, Long, Long),
          rows: Iterator[(Long, String, Long, Long, Double, Double, Double)]) =>
        val pts = rows.map(r => TilePoint(r._5, r._6, r._7)).toSeq
        fn(key._1, key._2, pts).iterator
          .map(p => (key._1, key._2, p.y, p.x, p.value))
      }
    val df0 = out.toDF("_t", "_b", Dim.Y, Dim.X, Cube.ValueCol)
    val withTime = if (hasTime)
      df0.withColumn(Dim.Time, timestamp_millis(col("_t"))) else df0
    val withBand = if (hasBand)
      withTime.withColumn(Dim.Band, col("_b")) else withTime
    val cols = c.dims.map(col) :+ col(Cube.ValueCol)
    c.withDF(withBand.select(cols: _*))
  }

  /** Per-row scalar escape hatch (vectorized alternatives exist for
    * everything the reference does — use Column expressions first). */
  def runOnValues(c: Cube, fn: Double => Double): Cube = {
    val f = udf(fn)
    c.mapValue(v => f(v.cast("double")))
  }
}
