package graft

import graft.cube.{Cube, Dim}
import graft.ops.Neighborhood
import org.apache.spark.sql.functions._

class NeighborhoodSpec extends SparkSpec {

  def grid3x3: graft.cube.Cube = cubeOf(
    (for { y <- 0 to 2; x <- 0 to 2 }
      yield ("2024-01-01", "B", y.toDouble, x.toDouble, (y * 3 + x + 1).toDouble)): _*)
  // values 1..9 laid out row-major:
  // y=0: 1 2 3
  // y=1: 4 5 6
  // y=2: 7 8 9

  def valueAt(df: org.apache.spark.sql.DataFrame, y: Double, x: Double): Double =
    df.where(col(Dim.Y) === y && col(Dim.X) === x)
      .select(Cube.ValueCol).head().getDouble(0)

  test("apply_kernel identity kernel is a no-op") {
    val r = Neighborhood.applyKernel(grid3x3, Seq(Seq(0.0, 0.0, 0.0),
      Seq(0.0, 1.0, 0.0), Seq(0.0, 0.0, 0.0)))
    rowSet(r.df.select(Dim.Y, Dim.X, Cube.ValueCol)) shouldBe
      rowSet(grid3x3.df.select(Dim.Y, Dim.X, Cube.ValueCol))
  }

  test("apply_kernel 3x3 box sum, replicate border (scipy 'nearest')") {
    val box = Seq.fill(3)(Seq.fill(3)(1.0))
    val r = Neighborhood.applyKernel(grid3x3, box, border = "replicate")
    valueAt(r.df, 1, 1) shouldBe 45.0 // full interior sum 1..9
    // corner (0,0): replicate pad → 1 1 2 / 1 1 2 / 4 4 5 = 21
    valueAt(r.df, 0, 0) shouldBe 21.0
  }

  test("apply_kernel constant border adds cval for missing taps") {
    val box = Seq.fill(3)(Seq.fill(3)(1.0))
    val r0 = Neighborhood.applyKernel(grid3x3, box, border = "constant", cval = 0.0)
    valueAt(r0.df, 0, 0) shouldBe 12.0 // 1+2+4+5, rest 0
    val r9 = Neighborhood.applyKernel(grid3x3, box, border = "constant", cval = 1.0)
    valueAt(r9.df, 0, 0) shouldBe 17.0 // 12 + 5 missing taps × 1
  }

  test("apply_kernel factor multiplies the result") {
    val r = Neighborhood.applyKernel(grid3x3,
      Seq(Seq(0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0), Seq(0.0, 0.0, 0.0)),
      factor = 0.5)
    valueAt(r.df, 1, 1) shouldBe 2.5
  }

  test("array_interpolate_linear fills interior gaps, leaves ends null") {
    import spark.implicits._
    val df = Seq(
      (ts("2024-01-01 00:00:00"), 0.0, 0.0, Option.empty[Double]),
      (ts("2024-01-02 00:00:00"), 0.0, 0.0, Some(10.0)),
      (ts("2024-01-03 00:00:00"), 0.0, 0.0, Option.empty[Double]),
      (ts("2024-01-05 00:00:00"), 0.0, 0.0, Some(40.0)),
      (ts("2024-01-06 00:00:00"), 0.0, 0.0, Option.empty[Double]))
      .toDF("time", "y", "x", "value")
    val c = Cube(df, graft.cube.CubeMeta())
    val r = Neighborhood.interpolateLinear(c, "t").df.orderBy("time").collect()
    r(0).isNullAt(3) shouldBe true                   // leading end: no extrapolation
    r(1).getDouble(3) shouldBe 10.0
    r(2).getDouble(3) shouldBe 20.0 +- 1e-9          // 1/3 of the 10→40 gap
    r(3).getDouble(3) shouldBe 40.0
    r(4).isNullAt(3) shouldBe true                   // trailing end
  }

  test("shifted exposes lag/lead neighbors along an axis") {
    val c = cubeOf(
      ("2024-01-01", "B", 0, 0, 1.0), ("2024-01-01", "B", 0, 1, 2.0),
      ("2024-01-01", "B", 0, 2, 3.0))
    val r = Neighborhood.shifted(c, "x").orderBy(Dim.X).collect()
    r(1).getDouble(r(1).fieldIndex("_prev")) shouldBe 1.0
    r(1).getDouble(r(1).fieldIndex("_next")) shouldBe 3.0
    r(0).isNullAt(r(0).fieldIndex("_prev")) shouldBe true
  }

  test("focalStats median: full window interior, shrunk window at corners") {
    val r = Neighborhood.focalStats(grid3x3, radius = 1, stat = "median")
    valueAt(r.df, 1, 1) shouldBe 5.0 // median of 1..9
    valueAt(r.df, 0, 0) shouldBe 3.0 // corner window {1,2,4,5} -> (2+4)/2
    r.df.count() shouldBe 9 // output cells == input cells, no halo
  }

  test("focalStats min/max honor the shrunk border window too") {
    val mn = Neighborhood.focalStats(grid3x3, 1, "min")
    val mx = Neighborhood.focalStats(grid3x3, 1, "max")
    valueAt(mn.df, 2, 2) shouldBe 5.0 // {5,6,8,9} min
    valueAt(mx.df, 0, 1) shouldBe 6.0 // {1,2,3,4,5,6} max
  }

  test("focalStats never fabricates a value at an interior hole") {
    val holed = grid3x3.withDF(grid3x3.df
      .where(!(col(Dim.Y) === 1 && col(Dim.X) === 1)))
    val r = Neighborhood.focalStats(holed, 1, "max")
    r.df.count() shouldBe 8
    r.df.where(col(Dim.Y) === 1 && col(Dim.X) === 1).count() shouldBe 0
    // neighbors aggregate without the missing center: max{1..9}\{5} at (0,0)-window
    valueAt(r.df, 0, 0) shouldBe 4.0 // {1,2,4} without the 5
  }
}
