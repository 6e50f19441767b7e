package graft

import graft.ops.RunUdf
import graft.ops.RunUdf.TilePoint
import org.apache.spark.sql.functions._

class RunUdfSpec extends SparkSpec {

  test("runOnTiles sees whole (time, band) slices and can transform them") {
    val c = cubeOf(
      ("2024-01-01", "A", 0, 0, 1.0), ("2024-01-01", "A", 0, 1, 3.0),
      ("2024-01-01", "B", 0, 0, 10.0),
      ("2024-01-02", "A", 0, 0, 5.0))
    // subtract the tile mean from each point (a per-slice normalization
    // that genuinely needs the whole tile)
    val r = RunUdf.runOnTiles(c, (_, _, pts) => {
      val mean = pts.map(_.value).sum / pts.length
      pts.map(p => p.copy(value = p.value - mean))
    })
    val a1 = r.df.where(col("band") === "A" &&
      col("time") === ts("2024-01-01 00:00:00")).collect()
      .map(row => row.getAs[Double]("x") -> row.getAs[Double]("value")).toMap
    a1 shouldBe Map(0.0 -> -1.0, 1.0 -> 1.0)
    // singleton tiles normalize to zero
    r.df.where(col("band") === "B").head().getAs[Double]("value") shouldBe 0.0
    r.df.count() shouldBe 4
  }

  test("runOnTiles can resample a tile (change its point set)") {
    val c = cubeOf(
      ("2024-01-01", "A", 0, 0, 2.0), ("2024-01-01", "A", 0, 1, 4.0))
    val r = RunUdf.runOnTiles(c, (_, _, pts) =>
      Seq(TilePoint(0, 0, pts.map(_.value).max)))
    r.df.count() shouldBe 1
    r.df.head().getAs[Double]("value") shouldBe 4.0
  }

  test("runOnValues applies a scalar function per cell") {
    val c = cubeOf(("2024-01-01", "A", 0, 0, 9.0))
    RunUdf.runOnValues(c, math.sqrt).df.head()
      .getAs[Double]("value") shouldBe 3.0
  }
}
