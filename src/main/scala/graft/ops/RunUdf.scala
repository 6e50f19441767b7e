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

  /** Run a tile function over every (time, band) slice. Output keeps the
    * cube schema; the fn may move/add/remove points within its tile. */
  def runOnTiles(c: Cube, fn: TileFn): Cube = {
    val hasTime = c.has(Dim.Time); val hasBand = c.has(Dim.Band)
    val spark = c.df.sparkSession
    import spark.implicits._
    val keyed = c.df.select(
      (if (hasTime) col(Dim.Time).cast("long") * 1000 else lit(0L)).as("_t"),
      (if (hasBand) col(Dim.Band) else lit("")).as("_b"),
      col(Dim.Y), col(Dim.X), col(Cube.ValueCol).cast("double"))
      .as[(Long, String, Double, Double, Double)]
    val out = keyed.groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key: (Long, String),
          rows: Iterator[(Long, String, Double, Double, Double)]) =>
        val pts = rows.map(r => TilePoint(r._3, r._4, r._5)).toSeq
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
