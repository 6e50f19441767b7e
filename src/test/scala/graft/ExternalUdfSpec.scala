package graft

import graft.ops.ExternalUdf
import org.apache.spark.sql.functions._

class ExternalUdfSpec extends SparkSpec {

  private val emaSrc =
    "double[] out = new double[values.length]; double ema = 0.0; " +
      "for (int i = 0; i < values.length; i++) { " +
      "ema = (i == 0) ? values[i] : 0.25 * values[i] + 0.75 * ema; " +
      "out[i] = ema; } return out;"

  private def fixture = cubeOf(
    ("2024-01-01", "B04", 0.0, 0.0, 4.0),
    ("2024-01-02", "B04", 0.0, 0.0, 8.0),
    ("2024-01-03", "B04", 0.0, 0.0, 16.0),
    ("2024-01-01", "B04", 1.0, 0.0, 2.0),
    ("2024-01-01", "B08", 0.0, 0.0, 10.0),
    ("2024-01-05", "B08", 0.0, 0.0, 20.0))

  test("external Java EMA runs per (band, y, x) series in time order") {
    val out = ExternalUdf.runSeriesExternal(fixture, emaSrc)
    val got = out.df.select(
        date_format(col("time"), "yyyy-MM-dd").as("d"),
        col("band"), col("y"), col("x"), col("value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    // series (B04,0,0): 4 → .25*8+.75*4=5 → .25*16+.75*5=7.75
    got shouldBe Set(
      ("2024-01-01", "B04", 0.0, 0.0, 4.0),
      ("2024-01-02", "B04", 0.0, 0.0, 5.0),
      ("2024-01-03", "B04", 0.0, 0.0, 7.75),
      ("2024-01-01", "B04", 1.0, 0.0, 2.0),
      ("2024-01-01", "B08", 0.0, 0.0, 10.0),
      ("2024-01-05", "B08", 0.0, 0.0, 12.5))
  }

  test("chunk_size is a pure parallelism knob — results identical at 1 " +
      "and 512, and duplicate timestamps stay deterministic") {
    val dup = cubeOf(
      ("2024-01-01", "B04", 0.0, 0.0, 3.0),
      ("2024-01-01", "B04", 0.0, 0.0, 1.0), // duplicate label, value tiebreak
      ("2024-01-02", "B04", 0.0, 0.0, 2.0),
      ("2024-01-01", "B04", 5.0, 7.0, 1.0),
      ("2024-01-01", "B04", 600.0, 7.0, 1.0)) // different chunk at size 512
    def run(cs: Int) = ExternalUdf.runSeriesExternal(dup, emaSrc, cs)
      .df.orderBy("band", "y", "x", "time", "value")
      .collect().map(_.toSeq).toSeq
    run(1) shouldBe run(512)
  }

  test("bad source fails at validate (driver), not task time; wrong " +
      "output length fails typed") {
    val e = intercept[ExternalUdf.ExternalUdfError] {
      ExternalUdf.validate("this is not java")
    }
    e.getMessage should include("does not compile")
    val short = "return new double[0];"
    val e2 = intercept[Exception] {
      ExternalUdf.runSeriesExternal(fixture, short).df.count()
    }
    Iterator.iterate(e2: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString should
      include("one value per input")
  }

  test("band-dimension series: ordinals ride the times array, names " +
      "restore from bandOrder, other labels survive") {
    import graft.cube.Dim
    // series along bands per (time, y, x); UDF = cumulative sum, which
    // depends on band ORDER — bandOrder (B08 before B04) must drive it
    val c = cubeOf(
      ("2024-01-01", "B04", 0.0, 0.0, 1.0),
      ("2024-01-01", "B08", 0.0, 0.0, 10.0),
      ("2024-01-02", "B04", 0.0, 0.0, 2.0),
      ("2024-01-02", "B08", 0.0, 0.0, 20.0))
    val reordered = c.copy(meta = c.meta.copy(bandOrder = Seq("B08", "B04")))
    val cumsum = "double[] out = new double[values.length]; double s = 0; " +
      "for (int i = 0; i < values.length; i++) { s += values[i]; out[i] = s; } " +
      "return out;"
    val got = ExternalUdf.runSeriesExternal(reordered, cumsum, dim = Dim.Band)
      .df.select(date_format(col("time"), "yyyy-MM-dd").as("d"),
        col("band"), col("value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSet
    got shouldBe Set(
      ("2024-01-01", "B08", 10.0), ("2024-01-01", "B04", 11.0),
      ("2024-01-02", "B08", 20.0), ("2024-01-02", "B04", 22.0))
  }

  test("a data band missing from a declared bandOrder fails loudly, not " +
      "with an encoder crash") {
    import graft.cube.Dim
    val c = cubeOf(
      ("2024-01-01", "B04", 0.0, 0.0, 1.0),
      ("2024-01-01", "B11", 0.0, 0.0, 2.0)) // B11 not in bandOrder below
    val narrow = c.copy(meta = c.meta.copy(bandOrder = Seq("B04")))
    val idSrc = "return values;"
    val e = intercept[Exception] {
      ExternalUdf.runSeriesExternal(narrow, idSrc, dim = Dim.Band).df.count()
    }
    Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString should
      include("not in bandOrder")
  }

  test("graph surface: run_udf with runtime java dispatches to the " +
      "external seam through apply_dimension") {
    import graft.compile.GraphCompiler
    val dir = java.nio.file.Files.createTempDirectory("extudf").toString
    fixture.df.write.mode("overwrite").parquet(s"$dir/coll")
    val catalog = Map("c" -> graft.ops.Scan.CollectionSpec(s"$dir/coll",
      bandOrder = Seq("B04", "B08"),
      grid = Some(graft.cube.GridRef(0, 0, 1, 1))))
    val graph = s"""{
      "load": {"process_id": "load_collection", "arguments": {"id": "c"}},
      "u": {"process_id": "apply_dimension", "arguments": {
        "data": {"from_node": "load"}, "dimension": "t",
        "process": {"process_graph": {
          "r": {"process_id": "run_udf", "arguments": {
            "data": {"from_parameter": "data"},
            "udf": "$emaSrc", "runtime": "java",
            "context": {"chunk_size": 4}}, "result": true}}}},
        "result": true}}"""
    val out = new GraphCompiler(spark, catalog, s"$dir/res").compile(graph)
      .asInstanceOf[graft.cube.Cube]
    val b04 = out.df.where(col("band") === "B04" && col("y") === 0.0)
      .orderBy("time").select("value").collect().map(_.getDouble(0)).toSeq
    b04 shouldBe Seq(4.0, 5.0, 7.75)
  }
}
