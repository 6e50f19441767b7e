package graft

import graft.cube.{Cube, CubeMeta, Dim, GridRef}
import graft.ops.{Filters, Scan}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the operators must not just be correct — the
  * plans must be the ones that survive a 100 TB scale-up. Filters reach the
  * parquet scan (row-group skipping), small sides broadcast, element-wise
  * chains stay in one WholeStageCodegen stage. */
class PlanQualitySpec extends SparkSpec {

  lazy val storeDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("plan-coll").toString
    val rows = for { d <- 1 to 3; b <- Seq("B04", "B08"); y <- 0 to 3; x <- 0 to 3 }
      yield (ts(f"2022-06-0$d 00:00:00"), b, y.toDouble, x.toDouble, d * 1.0)
    rows.toDF("time", "band", "y", "x", "value")
      .write.mode("overwrite").parquet(s"$dir/c")
    dir
  }

  def spec: Scan.CollectionSpec = Scan.CollectionSpec(s"$storeDir/c",
    bandOrder = Seq("B04", "B08"), grid = Some(GridRef(0, 0, 1, 1)))

  def planString(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("scan filters (band, time, bbox) are pushed to the parquet source") {
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    val c = Scan.loadCollection(spark, spec, bands = Seq("B04"),
      temporalExtent = Some(("2022-06-01", "2022-06-03")),
      bbox = Some((0.5, 0.5, 2.5, 2.5)), bboxEpsg = 0)
    val plan = planString(c.df)
    plan should include("PushedFilters")
    // single-band isin simplifies to EqualTo; time + x/y ranges pushed
    plan should include("EqualTo(band,B04)")
    plan should include("GreaterThanOrEqual(time")
    plan should include("GreaterThanOrEqual(x")
    plan should include("LessThanOrEqual(y")
  }

  test("filter composition keeps one scan node (no materialization barriers)") {
    val c0 = Scan.loadCollection(spark, spec)
    val c = Filters.filterBands(
      Filters.filterTemporal(c0, "2022-06-01", "2022-06-02"), Seq("B08"))
    val plan = planString(c.df)
    plan.split("FileScan").length - 1 shouldBe 1
    plan should include("PushedFilters")
  }

  test("column pruning: selecting two columns reads only those from parquet") {
    val c = Scan.loadCollection(spark, spec)
    val pruned = c.df.select("band", "value")
    val plan = planString(pruned)
    plan should include("ReadSchema: struct<band:string,value:double>")
  }

  test("mask join broadcasts the reduced mask side") {
    val data = Scan.loadCollection(spark, spec)
    val mask = Cube(
      data.df.where(col(Dim.Band) === "B04")
        .groupBy(Dim.Time, Dim.Y, Dim.X)
        .agg(max(when(col(Cube.ValueCol) > 2.0, 1.0).otherwise(0.0))
          .as(Cube.ValueCol)),
      CubeMeta())
    val masked = Filters.mask(data, mask)
    planString(masked.df) should include("BroadcastHashJoin")
  }

  test("element-wise chains stay inside whole-stage codegen") {
    val c = Scan.loadCollection(spark, spec)
    val chained = c.mapValue(v => v * 2.0)
      .mapValue(v => v + 1.0)
      .mapValue(v => greatest(lit(0.0), least(lit(100.0), v)))
    val plan = planString(chained.df)
    // "*(1)" is the WholeStageCodegen stage marker: the whole chain must
    // collapse into ONE fused projection over the scan, no exchange
    plan should include("*(1) Project")
    plan should include("((value")
    plan should not include "Exchange"
  }

  test("dimension reduction is a partial+final hash aggregate (map-side combine)") {
    val c = Scan.loadCollection(spark, spec)
    val plan = planString(
      graft.ops.Reducers.reduceDimension(c, "time", "max").df)
    plan should include("HashAggregate")
    // partial_max proves the map-side combine before the shuffle
    plan.toLowerCase should include("partial_max")
  }

  test("zonal stats compiles to pure expressions — no UDF, no extra shuffle") {
    val c = Scan.loadCollection(spark, spec)
    val df = graft.ops.Reducers.aggregateSpatial(c,
      Seq(Seq((-0.5, -0.5), (1.5, -0.5), (1.5, 3.5), (-0.5, 3.5))), "mean",
      featuresEpsg = 0)
    val plan = planString(df)
    plan should not include "BatchEvalPython"
    plan should not include "ScalaUDF"
    plan.split("Exchange").length - 1 should be <= 2 // agg exchange (+AQE read)
  }
}
