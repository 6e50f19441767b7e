package graft.ops

import graft.cube.{Cube, CubeMeta, Dim, GridRef}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cube alignment operators — the reference's joins-in-disguise
  * (SURVEY.md §2.5).
  */
object Joins {

  /** `merge_cubes` (openeo_odc_driver.py:1134-1291). The reference's seven
    * runtime dimension cases collapse to two physical shapes, chosen by
    * compile-time analysis of the two cubes' dims + band order (CubeMeta):
    *
    *  - label-disjoint (different bands, or caller asserts disjoint times)
    *    → `unionByName`, a zero-shuffle concat;
    *  - overlapping labels → full-outer equi-join on the shared dims with a
    *    resolver expression over the two value columns (`coalesce` when no
    *    resolver, mirroring xarray's combine_first bias to cube1).
    *
    * The resolver receives the two sides as Columns — the graph compiler
    * binds the overlap-resolver subgraph's `x`/`y` parameters to them
    * (openeo_odc_driver.py:393-407).
    */
  def mergeCubes(a: Cube, b: Cube,
      resolver: Option[(Column, Column) => Column] = None,
      assumeDisjoint: Boolean = false): Cube = {
    val bandsDisjoint = a.has(Dim.Band) && b.has(Dim.Band) &&
      a.meta.bandOrder.nonEmpty && b.meta.bandOrder.nonEmpty &&
      a.meta.bandOrder.intersect(b.meta.bandOrder).isEmpty
    // partially common band sets: the reference raises rather than guess a
    // semantics (openeo_odc_driver.py:1195-1198); falling through to the
    // outer-join path would silently resolve bands that should concat
    if (a.has(Dim.Band) && b.has(Dim.Band) &&
        a.meta.bandOrder.nonEmpty && b.meta.bandOrder.nonEmpty && {
          // set comparison: identical band sets listed in different orders
          // (e.g. [B04,B08] vs [B08,B04]) must take the resolver path, not
          // throw
          val common = a.meta.bandOrder.toSet intersect b.meta.bandOrder.toSet
          common.nonEmpty && (common != a.meta.bandOrder.toSet ||
            common != b.meta.bandOrder.toSet)
        })
      throw graft.OpenEoError.BandsPartiallyCommon
    val mergedMeta = a.meta.copy(
      bandOrder = (a.meta.bandOrder ++ b.meta.bandOrder).distinct)
    if (assumeDisjoint || bandsDisjoint) {
      require(a.dims == b.dims,
        s"merge_cubes concat case needs equal dims: ${a.dims} vs ${b.dims}")
      Cube(a.df.unionByName(b.df), mergedMeta)
    } else {
      val keys = a.dims.intersect(b.dims)
      require(keys.nonEmpty, "merge_cubes: no shared dimensions")
      val l = a.df.withColumnRenamed(Cube.ValueCol, "_v1")
      val r = b.df.withColumnRenamed(Cube.ValueCol, "_v2")
      val joined = l.join(r, keys, "full_outer")
      val resolved = resolver
        .map(f => f(col("_v1"), col("_v2")))
        .getOrElse(coalesce(col("_v1"), col("_v2")))
      Cube(joined.withColumn(Cube.ValueCol, resolved).drop("_v1", "_v2"),
        mergedMeta)
    }
  }

  /** `resample_cube_temporal` — nearest as-of alignment of `source` onto
    * `target`'s time axis (openeo_odc_driver.py:360-380: per target
    * timestamp, pick the source slice with min |Δt| and relabel).
    *
    * The time axes are tiny relative to the cube (thousands vs billions of
    * rows at 100 TB), so the target→source mapping is computed driver-side
    * from the two distinct-time sets and broadcast-joined back — one small
    * shuffle-free pass over the source. */
  /** Note: an empty source or target time axis yields an empty result (the
    * mapping table is empty, so the join drops every row) — empty-in /
    * empty-out by design; a driver-side emptiness check would force an
    * extra job on the 100 TB lineage just to raise earlier. */
  def resampleCubeTemporal(source: Cube, target: Cube): Cube = {
    // The time axes are tiny relative to the cube (thousands vs billions
    // of rows at 100 TB), so the target→source mapping is a cross join of
    // the two DISTINCT-time sets with a rank-1 window — all inside the lazy
    // plan (no driver collect: the plan stays one job and the upstream
    // lineage is computed once), then broadcast-joined back to the source.
    val srcTimes = source.df.select(col(Dim.Time).as("_src_time")).distinct()
    val tgtTimes = target.df.select(col(Dim.Time).as("_tgt_time")).distinct()
    // nearest source time per target time; ties → earlier source, matching
    // argmin over the ascending time order
    val dist = abs(unix_micros(col("_tgt_time")) - unix_micros(col("_src_time")))
    val w = Window.partitionBy(col("_tgt_time")).orderBy(dist, col("_src_time"))
    val mapDf = broadcast(tgtTimes.crossJoin(srcTimes)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(col("_src_time"), col("_tgt_time")))
    val relabeled = source.df.withColumnRenamed(Dim.Time, "_src_time")
      .join(mapDf, "_src_time")
      .withColumnRenamed("_tgt_time", Dim.Time)
      .drop("_src_time")
    Cube(relabeled, source.meta)
  }

  /** Reproject a cube's x/y coordinates into another CRS — one codegen
    * projection over the native [[graft.functions.GeoExprs.ReprojectPoint]]
    * expression, no shuffle. The result is an IRREGULAR point set in the
    * target CRS; follow with a regrid (resampleCubeSpatial*) to get back
    * onto a regular grid, exactly like the reference's warp-at-load
    * (load_odc_collection.py:128-173). */
  def reprojectCube(c: Cube, fromEpsg: Int, toEpsg: Int): Cube = {
    val p = graft.functions.GeoExprs.reproject(
      col(Dim.X), col(Dim.Y), fromEpsg, toEpsg)
    Cube(c.df.withColumn("_p", p)
      .withColumn(Dim.X, col("_p.x"))
      .withColumn(Dim.Y, col("_p.y"))
      .drop("_p"),
      c.meta.copy(crs = Some(s"EPSG:$toEpsg"), grid = None))
  }

  /** `resample_cube_spatial` nearest — regrid source onto target's grid
    * (openeo_odc_driver.py:342-358, method near→nearest). Each source cell
    * is binned to the nearest target cell index; among sources landing in
    * one target cell the nearest-to-center wins (min_by on squared
    * distance). Pure groupBy — shuffles once on the target key, no
    * collect. */
  def resampleCubeSpatialNearest(source: Cube, targetGrid: GridRef): Cube = {
    val g = targetGrid
    val tx = g.xIdx(col(Dim.X)); val ty = g.yIdx(col(Dim.Y))
    val cx = g.xCoord(tx); val cy = g.yCoord(ty)
    val d2 = (col(Dim.X) - cx) * (col(Dim.X) - cx) +
      (col(Dim.Y) - cy) * (col(Dim.Y) - cy)
    val others = source.dims.filterNot(d => d == Dim.X || d == Dim.Y).map(col)
    val out = source.df
      .withColumn("_tx", tx).withColumn("_ty", ty).withColumn("_d2", d2)
      .groupBy(others :+ col("_tx") :+ col("_ty"): _*)
      // tie-break equal distances on (y, x) so the pick is deterministic
      // across engines and partitionings
      .agg(min_by(col(Cube.ValueCol),
        struct(col("_d2"), col(Dim.Y), col(Dim.X))).as(Cube.ValueCol))
      .withColumn(Dim.X, g.xCoord(col("_tx")))
      .withColumn(Dim.Y, g.yCoord(col("_ty")))
      .drop("_tx", "_ty")
    Cube(out, source.meta.copy(grid = Some(g)))
  }

  /** `resample_cube_spatial` bilinear — 4-neighbor weighted regrid. For
    * each target cell (driven from the source side to stay distributed):
    * every source cell scatters its value into the up-to-4 target cells
    * whose interpolation stencil it participates in, with the bilinear
    * weight; groupBy target cell sums weights. Equivalent to gather-side
    * bilinear when grids are axis-aligned. */
  def resampleCubeSpatialBilinear(source: Cube, targetGrid: GridRef): Cube =
    resampleCubeSpatialBilinear(source, targetGrid, None)

  /** @param exactScale when the grid ratio makes every bilinear weight an
    *   exact multiple of 1/exactScale (e.g. 16 for a 2:1 regrid with
    *   quarter-cell offsets), accumulate `value·(w·scale)` in exact
    *   decimals instead of doubles — the weighted mean becomes independent
    *   of aggregation order, so an external oracle can hash-match it. */
  def resampleCubeSpatialBilinear(source: Cube, targetGrid: GridRef,
      exactScale: Option[Long]): Cube = {
    val src = source.meta.requireGrid
    val g = targetGrid
    // fractional source index of each target cell center:
    // fx = (xT - x0s)/dxs. A source cell (i,j) contributes to target cells
    // whose fx ∈ [i-1, i+1]; enumerate candidate target cells per source
    // cell via explode over the bounded index window.
    val ratioX = g.dx / src.dx; val ratioY = g.dy / src.dy
    val spanX = math.max(1, math.ceil(1.0 / math.min(1.0, ratioX)).toInt)
    val spanY = math.max(1, math.ceil(1.0 / math.min(1.0, ratioY)).toInt)
    // target index window around each source cell
    val txLo = floor((col(Dim.X) - lit(src.dx) - lit(g.x0)) / lit(g.dx)).cast("long")
    val tyLo = floor((col(Dim.Y) - lit(src.dy) - lit(g.y0)) / lit(g.dy)).cast("long")
    val others = source.dims.filterNot(d => d == Dim.X || d == Dim.Y).map(col)
    val candX = sequence(txLo, txLo + lit(2 * spanX))
    val candY = sequence(tyLo, tyLo + lit(2 * spanY))
    val exploded = source.df
      .withColumn("_tx", explode(candX))
      .withColumn("_ty", explode(candY))
    val xT = g.xCoord(col("_tx")); val yT = g.yCoord(col("_ty"))
    val fx = (xT - col(Dim.X)) / lit(src.dx)   // signed offset in cells
    val fy = (yT - col(Dim.Y)) / lit(src.dy)
    val wx = greatest(lit(0.0), lit(1.0) - abs(fx))
    val wy = greatest(lit(0.0), lit(1.0) - abs(fy))
    val w = wx * wy
    // null (nodata) neighbors are excluded from BOTH sums — the kernel
    // renormalizes over valid samples like odc/rioxarray reprojection;
    // counting their weight in the denominator alone would bias the
    // result toward zero
    val valid = col(Cube.ValueCol).isNotNull
    val weightedMean = exactScale match {
      case Some(sc) =>
        // w·sc is integer-valued by precondition; value·(w·sc) is an exact
        // decimal → the sums are order-independent, and the final division
        // of two correctly-rounded doubles is one IEEE op
        val wi = (w * sc.toDouble).cast("decimal(10,0)")
        sum(col(Cube.ValueCol).cast("decimal(18,2)") * wi).cast("double") /
          sum(when(valid, wi)).cast("double")
      case None =>
        sum(col(Cube.ValueCol) * w) / sum(when(valid, w))
    }
    val out = exploded.where(w > 0)
      .groupBy(others :+ col("_tx") :+ col("_ty"): _*)
      .agg(weightedMean.as(Cube.ValueCol))
      .withColumn(Dim.X, g.xCoord(col("_tx")))
      .withColumn(Dim.Y, g.yCoord(col("_ty")))
      .drop("_tx", "_ty")
    Cube(out, source.meta.copy(grid = Some(g)))
  }

  /** Catmull-Rom cubic kernel (a = -0.5, the GDAL/OpenCV "cubic"
    * default), Horner form — the SQL oracle mirrors the exact same
    * operation order so the double weights agree bit-for-bit. */
  private def cubicK(t: Column): Column = {
    val a = abs(t)
    when(a <= 1.0, (lit(1.5) * a - lit(2.5)) * a * a + lit(1.0))
      .when(a < 2.0, ((lit(-0.5) * a + lit(2.5)) * a - lit(4.0)) * a + lit(2.0))
      .otherwise(lit(0.0))
  }

  /** `resample_cube_spatial` cubic — 16-neighbor Catmull-Rom regrid (the
    * reference forwards method='cubic' to odc/rioxarray reprojection,
    * openeo_odc_driver.py:346-358). Same scatter shape as bilinear with a
    * ±2-cell reach and SIGNED kernel lobes; weights sum to 1 on full 4×4
    * support (partition-of-unity), so normalisation only re-scales edge
    * cells with partial support.
    *
    * @param exactScale as in bilinear: when the grid ratio makes every
    *   per-axis kernel weight an exact multiple of 1/sqrt(exactScale)
    *   (128 per axis → 16384 for the 2:1 quarter-offset pair), decimal
    *   accumulation makes the weighted mean order-independent and
    *   oracle-hashable. */
  def resampleCubeSpatialCubic(source: Cube, targetGrid: GridRef,
      exactScale: Option[Long] = None): Cube = {
    val src = source.meta.requireGrid
    val g = targetGrid
    val ratioX = g.dx / src.dx; val ratioY = g.dy / src.dy
    // candidate target cells within the kernel's ±2-source-cell reach
    val nCandX = math.ceil(4.0 / ratioX).toInt + 1
    val nCandY = math.ceil(4.0 / ratioY).toInt + 1
    val txLo = floor((col(Dim.X) - lit(2 * src.dx) - lit(g.x0)) / lit(g.dx)).cast("long")
    val tyLo = floor((col(Dim.Y) - lit(2 * src.dy) - lit(g.y0)) / lit(g.dy)).cast("long")
    val others = source.dims.filterNot(d => d == Dim.X || d == Dim.Y).map(col)
    val exploded = source.df
      .withColumn("_tx", explode(sequence(txLo, txLo + lit(nCandX))))
      .withColumn("_ty", explode(sequence(tyLo, tyLo + lit(nCandY))))
    val fx = (g.xCoord(col("_tx")) - col(Dim.X)) / lit(src.dx)
    val fy = (g.yCoord(col("_ty")) - col(Dim.Y)) / lit(src.dy)
    val w = cubicK(fx) * cubicK(fy)
    // null (nodata) neighbors renormalize out of the kernel, as in
    // bilinear above
    val valid = col(Cube.ValueCol).isNotNull
    val weightedMean = exactScale match {
      case Some(sc) =>
        val wi = (w * sc.toDouble).cast("decimal(12,0)")
        val num = sum(col(Cube.ValueCol).cast("decimal(18,2)") * wi).cast("double")
        val den = sum(when(valid, wi)).cast("double")
        num / when(den =!= 0.0, den) // null (dropped) on zero net weight
      case None =>
        val den = sum(when(valid, w))
        sum(col(Cube.ValueCol) * w) / when(den =!= 0.0, den)
    }
    val out = exploded.where(abs(fx) < 2 && abs(fy) < 2)
      .groupBy(others :+ col("_tx") :+ col("_ty"): _*)
      .agg(weightedMean.as(Cube.ValueCol))
      .where(col(Cube.ValueCol).isNotNull)
      .withColumn(Dim.X, g.xCoord(col("_tx")))
      .withColumn(Dim.Y, g.yCoord(col("_ty")))
      .drop("_tx", "_ty")
    Cube(out, source.meta.copy(grid = Some(g)))
  }
}
