package graft.ops

import graft.cube.{Cube, Dim}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spatial-neighborhood and ordered-axis operators (SURVEY.md §2.6). */
object Neighborhood {

  /** `apply_kernel` — 2-D convolution over (x, y) per time/band slice
    * (openeo_odc_driver.py:1385-1418). Formulated as scatter + aggregate:
    * each cell scatters value*weight to the kernel-offset targets
    * (explode over the small literal kernel), then groupBy the target cell
    * sums contributions. This is the join+groupBy plan from SURVEY §2.6 W1
    * with the join replaced by a generator — no shuffle for the kernel
    * side, one shuffle on the target key (and AQE can coalesce it).
    *
    * Border modes (openeo_odc_driver.py:1405-1415): out-of-extent
    * contributions are remapped by index arithmetic — replicate (clamp),
    * reflect, mirror, wrap — or dropped with a constant fill (cval).
    * NaN/null pre-fill via `replaceInvalid` mirrors replace_invalid.
    */
  def applyKernel(c: Cube, kernel: Seq[Seq[Double]], factor: Double = 1.0,
      border: String = "reflect", cval: Double = 0.0,
      replaceInvalid: Double = 0.0): Cube = {
    val g = c.meta.requireGrid
    val kh = kernel.length; val kw = kernel.head.length
    require(kh % 2 == 1 && kw % 2 == 1, "kernel must have odd dimensions")
    val ky0 = kh / 2; val kx0 = kw / 2
    // kernel as a literal array of (dy, dx, w) structs, exploded inline
    val taps = for {
      (row, j) <- kernel.zipWithIndex
      (w, i) <- row.zipWithIndex if w != 0.0
    } yield struct(lit(j - ky0).as("dy"), lit(i - kx0).as("dx"), lit(w).as("w"))
    // extent for border remapping: a broadcast one-row aggregate joined
    // into the plan — NOT a driver-side collect, so the whole operator is
    // one lazy plan with a single scan of the cube lineage (a collect here
    // would run the upstream pipeline twice and serialize two jobs)
    val extent = broadcast(c.df.agg(
      min(g.xIdx(col(Dim.X))).as("_minx"), max(g.xIdx(col(Dim.X))).as("_maxx"),
      min(g.yIdx(col(Dim.Y))).as("_miny"), max(g.yIdx(col(Dim.Y))).as("_maxy")))
    val minX = col("_minx"); val maxX = col("_maxx")
    val minY = col("_miny"); val maxY = col("_maxy")
    def remap(idx: Column, lo: Column, hi: Column): Column = border match {
      case "replicate" => greatest(lo, least(hi, idx))
      case "reflect" => // abcd -> dcba|abcd|dcba  (scipy 'reflect')
        reflectIdx(idx, lo, hi, mirror = false)
      case "mirror" => // abcd -> dcb|abcd|cba   (scipy 'mirror')
        reflectIdx(idx, lo, hi, mirror = true)
      case "wrap" => lo + pmod(idx - lo, hi - lo + 1)
      case _ => idx // constant mode: keep index; missing cells get cval
    }
    val filled = c.df.withColumn(Cube.ValueCol,
      coalesce(nanvl(col(Cube.ValueCol).cast("double"), lit(replaceInvalid)),
        lit(replaceInvalid)))
    val others = c.dims.filterNot(d => d == Dim.X || d == Dim.Y).map(col)
    val tap = explode(array(taps: _*)).as("_tap")
    val scattered = filled
      .crossJoin(extent)
      .withColumn("_ix", g.xIdx(col(Dim.X)))
      .withColumn("_iy", g.yIdx(col(Dim.Y)))
      .select(others ++ Seq(col("_ix"), col("_iy"), col(Cube.ValueCol), tap,
        minX, maxX, minY, maxY): _*)
      .withColumn("_txr", col("_ix") + col("_tap.dx"))
      .withColumn("_tyr", col("_iy") + col("_tap.dy"))
      // border remap happens on the TARGET index as seen from the source
      // cell: a contribution falling outside the extent is re-aimed at the
      // border-rule cell (equivalently: the padded source value equals the
      // remapped in-extent value)
      .withColumn("_tx", remap(col("_txr"), minX, maxX))
      .withColumn("_ty", remap(col("_tyr"), minY, maxY))
    val inExtent =
      if (border == "constant")
        scattered.where(col("_txr").between(minX, maxX) &&
          col("_tyr").between(minY, maxY))
      else scattered
    val out = inExtent
      .groupBy(others :+ col("_tx") :+ col("_ty"): _*)
      .agg(sum(col(Cube.ValueCol) * col("_tap.w")).as("_conv"))
    val withCval =
      if (border == "constant") {
        // cells near the border miss the out-of-extent taps: add cval * (sum
        // of missing weights) = cval * (totalW - sum of received weights).
        // Track received weight alongside the sum.
        val out2 = inExtent.groupBy(others :+ col("_tx") :+ col("_ty"): _*)
          .agg(sum(col(Cube.ValueCol) * col("_tap.w")).as("_conv"),
            sum(col("_tap.w")).as("_wsum"))
        val totalW = kernel.flatten.sum
        out2.withColumn("_conv",
          col("_conv") + lit(cval) * (lit(totalW) - col("_wsum"))).drop("_wsum")
      } else out
    val res = withCval
      .withColumn(Dim.X, g.xCoord(col("_tx")))
      .withColumn(Dim.Y, g.yCoord(col("_ty")))
      .withColumn(Cube.ValueCol, col("_conv") * lit(factor))
      .drop("_tx", "_ty", "_conv")
    c.withDF(res)
  }

  /** Focal (neighborhood) statistics — `apply_neighborhood` with an
    * order-statistic or moment reducer: for each cell, `stat` (any
    * [[Reducers.reducer]] name — median/min/max/mean/sd/…) of the
    * (2·radius+1)² window centered on it, per time/band slice. The
    * window SHRINKS at borders and interior holes (absent neighbors
    * simply don't contribute — the xarray rolling(...,
    * min_periods=1) convention); output cells are exactly the input
    * cells (a hole never fabricates a value).
    *
    * Same scatter+aggregate shape as [[applyKernel]]: each cell
    * scatters its value to the window's offset targets (map-side
    * generator over a literal tap array, ×(2r+1)² narrow-row
    * amplification), then ONE shuffle groups by target cell. The
    * output-cells-only rule costs no join: the dy=dx=0 self-tap marks
    * groups whose center exists, and the aggregate keeps only those. */
  def focalStats(c: Cube, radius: Int, stat: String = "median"): Cube = {
    require(radius >= 1, s"radius must be >= 1, got $radius")
    val g = c.meta.requireGrid
    val taps = for { dy <- -radius to radius; dx <- -radius to radius }
      yield struct(lit(dy).as("dy"), lit(dx).as("dx"))
    val others = c.dims.filterNot(d => d == Dim.X || d == Dim.Y).map(col)
    val tap = explode(array(taps: _*)).as("_tap")
    val scattered = c.df
      .withColumn("_ix", g.xIdx(col(Dim.X)))
      .withColumn("_iy", g.yIdx(col(Dim.Y)))
      .select(others ++ Seq(col("_ix"), col("_iy"),
        col(Cube.ValueCol), tap): _*)
      .select(others ++ Seq(
        (col("_ix") + col("_tap.dx")).as("_tx"),
        (col("_iy") + col("_tap.dy")).as("_ty"),
        col(Cube.ValueCol),
        (col("_tap.dx") === 0 && col("_tap.dy") === 0)
          .cast("int").as("_self")): _*)
    val out = scattered
      .groupBy(others :+ col("_tx") :+ col("_ty"): _*)
      .agg(Reducers.reducer(stat)(col(Cube.ValueCol).cast("double"))
          .as("_stat"),
        max(col("_self")).as("_ctr"))
      .where(col("_ctr") === 1)
      .withColumn(Dim.X, g.xCoord(col("_tx")))
      .withColumn(Dim.Y, g.yCoord(col("_ty")))
      .withColumn(Cube.ValueCol, col("_stat"))
      .drop("_tx", "_ty", "_stat", "_ctr")
    c.withDF(out)
  }

  /** reflect/mirror index folding for a bounded extent; valid while |over|
    * <= extent (always true for kernels smaller than the raster). */
  private def reflectIdx(idx: Column, lo: Column, hi: Column, mirror: Boolean): Column = {
    val m = if (mirror) 0 else 1
    val lower = (lo * 2 - m) - idx  // reflect below lo
    val upper = (hi * 2 + m) - idx  // reflect above hi
    when(idx < lo, lower).when(idx > hi, upper).otherwise(idx)
  }

  /** `array_interpolate_linear` — linear gap-fill of nulls along an ordered
    * dimension (openeo_odc_driver.py:1326-1337, xarray interpolate_na).
    * Two window passes (previous / next non-null value and its coordinate)
    * + one interpolation expression. The reference re-chunks the whole
    * axis into one partition to do this; here the window partition keys
    * (all dims except the interpolation axis) give per-pixel series
    * locality with no manual re-chunking. Ends stay null (no
    * extrapolation), matching interpolate_na defaults. */
  def interpolateLinear(c: Cube, dimension: String): Cube = {
    val d = Dim.canonical(dimension)
    require(c.has(d), s"no dimension $d")
    val parts = c.dimsExcept(d).map(col)
    val ord = col(d).cast(if (d == Dim.Time) "timestamp" else "double")
    val pos = if (d == Dim.Time) col(d).cast("double") else col(d)
    val v = col(Cube.ValueCol)
    val wPrev = Window.partitionBy(parts: _*).orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy(parts: _*).orderBy(ord)
      .rowsBetween(0, Window.unboundedFollowing)
    val prevV = last(v, ignoreNulls = true).over(wPrev)
    val prevP = last(when(v.isNotNull, pos), ignoreNulls = true).over(wPrev)
    val nextV = first(v, ignoreNulls = true).over(wNext)
    val nextP = first(when(v.isNotNull, pos), ignoreNulls = true).over(wNext)
    val frac = (pos - prevP) / (nextP - prevP)
    val interp = when(v.isNotNull, v)
      .when(prevV.isNotNull && nextV.isNotNull,
        when(nextP === prevP, prevV)
          .otherwise(prevV + (nextV - prevV) * frac))
      .otherwise(lit(null))
    c.withDF(c.df.withColumn(Cube.ValueCol, interp))
  }

  /** ±1-cell finite-difference stencil along x or y — the primitive under
    * `radar_mask` (openeo_odc_driver.py:1465-1482). lag/lead over a window
    * ordered by the dense grid index. Returns df with `_prev`/`_next`
    * columns. */
  def shifted(c: Cube, along: String): DataFrame = {
    val d = Dim.canonical(along)
    val parts = c.dimsExcept(d).map(col)
    val w = Window.partitionBy(parts: _*).orderBy(col(d))
    c.df
      .withColumn("_prev", lag(col(Cube.ValueCol), 1).over(w))
      .withColumn("_next", lead(col(Cube.ValueCol), 1).over(w))
  }
}
