package graft

import graft.ops.{ExternalUdf, PythonUdf}
import org.apache.spark.sql.functions._

class PythonUdfSpec extends SparkSpec {

  private val emaPy =
    "def udf(times, values):\n" +
      "    out = []\n" +
      "    acc = 0.0\n" +
      "    for i, v in enumerate(values):\n" +
      "        acc = v if i == 0 else 0.25 * v + 0.75 * acc\n" +
      "        out.append(acc)\n" +
      "    return out\n"

  private val emaJava =
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

  test("python series UDF runs per (band, y, x) series in time order") {
    val out = PythonUdf.runSeriesPython(fixture, emaPy)
    val got = out.df.select(
        date_format(col("time"), "yyyy-MM-dd").as("d"),
        col("band"), col("y"), col("x"), col("value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    got shouldBe Set(
      ("2024-01-01", "B04", 0.0, 0.0, 4.0),
      ("2024-01-02", "B04", 0.0, 0.0, 5.0),
      ("2024-01-03", "B04", 0.0, 0.0, 7.75),
      ("2024-01-01", "B04", 1.0, 0.0, 2.0),
      ("2024-01-01", "B08", 0.0, 0.0, 10.0),
      ("2024-01-05", "B08", 0.0, 0.0, 12.5))
  }

  test("python and java runtimes agree bit-for-bit on the same " +
      "recurrence (decimal-string pipe is shortest-round-trip)") {
    // awkward doubles: non-terminating binary expansions through the pipe
    val c = cubeOf(
      ("2024-01-01", "B04", 0.0, 0.0, 0.1),
      ("2024-01-02", "B04", 0.0, 0.0, 0.2),
      ("2024-01-03", "B04", 0.0, 0.0, 1.0 / 3.0),
      ("2024-01-04", "B04", 0.0, 0.0, math.Pi),
      ("2024-01-05", "B04", 0.0, 0.0, 1e-300))
    def sorted(out: graft.cube.Cube) = out.df
      .orderBy("time").select("value").collect().map(_.getDouble(0)).toSeq
    sorted(PythonUdf.runSeriesPython(c, emaPy)) shouldBe
      sorted(ExternalUdf.runSeriesExternal(c, emaJava))
  }

  test("NaN and infinities survive the pipe in both directions") {
    val c = cubeOf(
      ("2024-01-01", "B04", 0.0, 0.0, Double.NaN),
      ("2024-01-02", "B04", 0.0, 0.0, Double.PositiveInfinity),
      ("2024-01-03", "B04", 0.0, 0.0, Double.NegativeInfinity),
      ("2024-01-04", "B04", 0.0, 0.0, 1.5))
    val identity = "def udf(times, values):\n    return list(values)\n"
    val got = PythonUdf.runSeriesPython(c, identity)
      .df.orderBy("time").select("value").collect()
      .map(_.getDouble(0)).toSeq
    got(0).isNaN shouldBe true
    got(1) shouldBe Double.PositiveInfinity
    got(2) shouldBe Double.NegativeInfinity
    got(3) shouldBe 1.5
  }

  test("chunk_size is a pure parallelism knob for the python tier too") {
    val dup = cubeOf(
      ("2024-01-01", "B04", 0.0, 0.0, 3.0),
      ("2024-01-01", "B04", 0.0, 0.0, 1.0),
      ("2024-01-02", "B04", 0.0, 0.0, 2.0),
      ("2024-01-01", "B04", 5.0, 7.0, 1.0),
      ("2024-01-01", "B04", 600.0, 7.0, 1.0))
    def run(cs: Int) = PythonUdf.runSeriesPython(dup, emaPy, cs)
      .df.orderBy("band", "y", "x", "time", "value")
      .collect().map(_.toSeq).toSeq
    run(1) shouldBe run(512)
  }

  test("bad python source fails at validate (driver), with the typed error") {
    val e = intercept[ExternalUdf.ExternalUdfError] {
      PythonUdf.runSeriesPython(fixture, "def udf(times values): pass")
    }
    e.getMessage should include("does not load")
    // source loads but defines no udf function → also typed, also driver
    val e2 = intercept[ExternalUdf.ExternalUdfError] {
      PythonUdf.runSeriesPython(fixture, "x = 1\n")
    }
    e2.getMessage should include("does not load")
  }

  test("UDF exceptions and wrong output length surface as typed errors") {
    val boom = "def udf(times, values):\n    raise ValueError('boom')\n"
    val e = intercept[Exception] {
      PythonUdf.runSeriesPython(fixture, boom).df.count()
    }
    Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString should
      include("boom")
    val short = "def udf(times, values):\n    return []\n"
    val e2 = intercept[Exception] {
      PythonUdf.runSeriesPython(fixture, short).df.count()
    }
    Iterator.iterate(e2: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString should
      include("one value per input")
  }

  test("spark.graft.udf.external.enabled=false rejects BOTH external " +
      "runtimes at graph-compile time (multi-tenant guard)") {
    spark.conf.set("spark.graft.udf.external.enabled", "false")
    try {
      val e = intercept[ExternalUdf.ExternalUdfError] {
        PythonUdf.runSeriesPython(fixture, emaPy)
      }
      e.getMessage should include("disabled")
      val e2 = intercept[ExternalUdf.ExternalUdfError] {
        ExternalUdf.runSeriesExternal(fixture, emaJava)
      }
      e2.getMessage should include("disabled")
    } finally spark.conf.set("spark.graft.udf.external.enabled", "true")
  }

  test("graph surface: run_udf with runtime python dispatches through " +
      "apply_dimension") {
    import graft.compile.GraphCompiler
    val dir = java.nio.file.Files.createTempDirectory("pyudf").toString
    fixture.df.write.mode("overwrite").parquet(s"$dir/coll")
    val catalog = Map("c" -> graft.ops.Scan.CollectionSpec(s"$dir/coll",
      bandOrder = Seq("B04", "B08"),
      grid = Some(graft.cube.GridRef(0, 0, 1, 1))))
    // the \n escapes live inside the JSON string literal
    val srcJson = emaPy.replace("\n", "\\n")
    val graph = s"""{
      "load": {"process_id": "load_collection", "arguments": {"id": "c"}},
      "u": {"process_id": "apply_dimension", "arguments": {
        "data": {"from_node": "load"}, "dimension": "t",
        "process": {"process_graph": {
          "r": {"process_id": "run_udf", "arguments": {
            "data": {"from_parameter": "data"},
            "udf": "$srcJson", "runtime": "python",
            "context": {"chunk_size": 4}}, "result": true}}}},
        "result": true}}"""
    val out = new GraphCompiler(spark, catalog, s"$dir/res").compile(graph)
      .asInstanceOf[graft.cube.Cube]
    val b04 = out.df.where(col("band") === "B04" && col("y") === 0.0)
      .orderBy("time").select("value").collect().map(_.getDouble(0)).toSeq
    b04 shouldBe Seq(4.0, 5.0, 7.75)
  }

  test("graph surface: unhosted run_udf runtimes raise the typed " +
      "UnsupportedRuntime error; R beyond the grammar subset names the " +
      "missing interpreter") {
    import graft.compile.GraphCompiler
    val dir = java.nio.file.Files.createTempDirectory("rudf").toString
    fixture.df.write.mode("overwrite").parquet(s"$dir/coll")
    val catalog = Map("c" -> graft.ops.Scan.CollectionSpec(s"$dir/coll",
      bandOrder = Seq("B04", "B08"),
      grid = Some(graft.cube.GridRef(0, 0, 1, 1))))
    def graphFor(udf: String, runtime: String) = s"""{
      "load": {"process_id": "load_collection", "arguments": {"id": "c"}},
      "u": {"process_id": "apply_dimension", "arguments": {
        "data": {"from_node": "load"}, "dimension": "t",
        "process": {"process_graph": {
          "r": {"process_id": "run_udf", "arguments": {
            "data": {"from_parameter": "data"},
            "udf": "$udf", "runtime": "$runtime"},
            "result": true}}}},
        "result": true}}"""
    // a runtime nothing hosts → typed error naming the supported tiers
    val e = intercept[graft.OpenEoError] {
      new GraphCompiler(spark, catalog, s"$dir/res")
        .compile(graphFor("function(x) cumsum(x)", "julia"))
    }
    e.code shouldBe "UnsupportedRuntime"
    e.getMessage should include("'julia' is not available")
    // grammar-subset R still compiles natively (the hosted R tier)
    new GraphCompiler(spark, catalog, s"$dir/res2")
      .compile(graphFor("function(x) cumsum(x)", "R"))
    // R beyond the subset → typed error naming the missing interpreter
    val e2 = intercept[graft.OpenEoError] {
      new GraphCompiler(spark, catalog, s"$dir/res3")
        .compile(graphFor(
          "function(x, context) { lapply(x, mysteryFn) }", "R"))
    }
    e2.code shouldBe "UnsupportedRuntime"
    e2.getMessage should include("full R interpreter")
  }

  test("band-dimension python series: ordinals ride `times`, names restore") {
    import graft.cube.Dim
    val c = cubeOf(
      ("2024-01-01", "B04", 0.0, 0.0, 1.0),
      ("2024-01-01", "B08", 0.0, 0.0, 10.0),
      ("2024-01-02", "B04", 0.0, 0.0, 2.0),
      ("2024-01-02", "B08", 0.0, 0.0, 20.0))
    val reordered = c.copy(meta = c.meta.copy(bandOrder = Seq("B08", "B04")))
    val cumsum = "def udf(times, values):\n" +
      "    out = []\n    s = 0.0\n" +
      "    for v in values:\n        s += v\n        out.append(s)\n" +
      "    return out\n"
    val got = PythonUdf.runSeriesPython(reordered, cumsum, dim = Dim.Band)
      .df.select(date_format(col("time"), "yyyy-MM-dd").as("d"),
        col("band"), col("value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSet
    got shouldBe Set(
      ("2024-01-01", "B08", 10.0), ("2024-01-01", "B04", 11.0),
      ("2024-01-02", "B08", 20.0), ("2024-01-02", "B04", 22.0))
  }
}
