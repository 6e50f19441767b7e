package graft

import graft.ops.RunUdf
import graft.ops.RunUdf.TilePoint
import org.apache.spark.sql.functions._

class RunUdfSpec extends SparkSpec {
  import graft.compile.UdfCompiler

  test("UdfCompiler compiles R and Python lambda forms to expressions") {
    import spark.implicits._
    val df = Seq(2.0, 5.0).toDF("v")
    def eval(src: String): Seq[Double] =
      df.select(UdfCompiler.compile(src, col("v")).as("r"))
        .collect().map(_.getDouble(0)).toSeq
    eval("function(x, context) { x * 2 + 1 }") shouldBe Seq(5.0, 11.0)
    eval("function(x) return(x ^ 2)") shouldBe Seq(4.0, 25.0)
    eval("lambda x: x ** 2 - 1") shouldBe Seq(3.0, 24.0)
    eval("\\(x) sqrt(x) * sqrt(x)").zip(Seq(2.0, 5.0)).foreach {
      case (got, want) => got shouldBe want +- 1e-12
    }
    eval("log(exp(x))").zip(Seq(2.0, 5.0)).foreach {
      case (got, want) => got shouldBe want +- 1e-12
    }
    eval("pmax(x, 3)") shouldBe Seq(3.0, 5.0)
    eval("x %% 3") shouldBe Seq(2.0, 2.0)
  }

  test("UdfCompiler operator precedence and unary minus match R") {
    import spark.implicits._
    val df = Seq(4.0).toDF("v")
    def eval(src: String): Double =
      df.select(UdfCompiler.compile(src, col("v")).as("r")).head().getDouble(0)
    eval("2 + 3 * x") shouldBe 14.0
    eval("(2 + 3) * x") shouldBe 20.0
    eval("-x ^ 2 + 1") shouldBe -15.0 // ^ binds tighter than unary minus in R
    eval("2 ^ 3 ^ 2") shouldBe 512.0  // right-assoc
  }

  test("UdfCompiler rejects non-expression source with a parse error") {
    an[UdfCompiler.UdfParseError] should be thrownBy
      UdfCompiler.compile("function(x) { for (i in 1:10) x <- x + i; x }",
        lit(0.0))
    an[UdfCompiler.UdfParseError] should be thrownBy
      UdfCompiler.compile("library(stars); read_stars(x)", lit(0.0))
    UdfCompiler.supported("x + 1") shouldBe true
    UdfCompiler.supported("install.packages('evil')") shouldBe false
  }

  test("UdfCompiler keeps malformed number literals inside the typed error") {
    // '1.2.3' / trailing '2e' must raise UdfParseError (→ typed 400), not
    // escape as a raw NumberFormatException (→ 500)
    an[UdfCompiler.UdfParseError] should be thrownBy
      UdfCompiler.compile("x + 1.2.3", lit(0.0))
    an[UdfCompiler.UdfParseError] should be thrownBy
      UdfCompiler.compile("x * 2e", lit(0.0))
    UdfCompiler.supported("x + 1.2.3") shouldBe false
    UdfCompiler.supported("2e + x") shouldBe false
  }

  test("compileSeries: cummax/cumsum/lag/rollmean over an ordered window") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq(("a", 1, 3.0), ("a", 2, 1.0), ("a", 3, 5.0), ("a", 4, 2.0),
      ("b", 1, 10.0)).toDF("k", "t", "v")
    val w = Window.partitionBy("k").orderBy("t")
    def eval(src: String): Map[(String, Int), Double] =
      df.select(col("k"), col("t"),
          UdfCompiler.compileSeries(src, col("v"), w).as("r"))
        .collect().collect { case r if !r.isNullAt(2) =>
          (r.getString(0), r.getInt(1)) -> r.getDouble(2)
        }.toMap
    val cm = eval("function(x, context) { cummax(x) }")
    cm(("a", 1)) shouldBe 3.0; cm(("a", 2)) shouldBe 3.0
    cm(("a", 3)) shouldBe 5.0; cm(("a", 4)) shouldBe 5.0
    cm(("b", 1)) shouldBe 10.0 // windows are per group
    val cs = eval("cumsum(x)")
    cs(("a", 4)) shouldBe 11.0
    val lagged = eval("x - lag(x, 1)") // null lag → null → NaN on getDouble
    lagged(("a", 2)) shouldBe -2.0
    val rm = eval("rollmean(x, 3)")
    rm(("a", 2)) shouldBe 3.0 +- 1e-12      // (3+1+5)/3
    rm(("a", 1)) shouldBe 2.0 +- 1e-12      // edge: partial window (3+1)/2
    // series functions mix with the element-wise grammar
    val mixed = eval("cummax(x) - x * 2")
    mixed(("a", 2)) shouldBe 1.0
  }

  test("compileSeries: ties on the order key aggregate together (range frame)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq((1, 1.0), (1, 9.0), (2, 2.0)).toDF("t", "v")
    val w = Window.partitionBy(lit(1)).orderBy("t")
    val r = df.select(col("t"),
        UdfCompiler.compileSeries("cummax(x)", col("v"), w).as("r"))
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    // both t=1 rows see max over BOTH tied rows — deterministic
    r.filter(_._1 == 1).map(_._2).toSet shouldBe Set(9.0)
    r.filter(_._1 == 2).map(_._2).toSet shouldBe Set(9.0)
  }

  test("compileSeries ROW-frame functions are deterministic under " +
      "duplicate order labels (value tiebreak)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // duplicate t=1 / t=2 labels — the rename_labels-with-ordinals shape
    // (openeo_odc_driver.py:1118-1121). A bare ROW frame would see an
    // arbitrary intra-tie order; the wRows spec orders ties by the value
    // itself, so lag/lead/rollmean are pure functions of the row multiset.
    val rows = Seq((1, 9.0), (1, 1.0), (2, 5.0), (2, 4.0), (3, 7.0))
    val w = Window.partitionBy(lit(1)).orderBy("t")
    val wRows = Window.partitionBy(lit(1)).orderBy(col("t"), col("v"))
    def run(src: String, parts: Int): Seq[(Int, Double, Option[Double])] =
      rows.toDF("t", "v").repartition(parts)
        .select(col("t"), col("v"),
          UdfCompiler.compileSeries(src, col("v"), w, wRows).as("r"))
        .collect().map(r => (r.getInt(0), r.getDouble(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
        .sortBy(x => (x._1, x._2)).toSeq
    // tie-sorted series order: (1,1) (1,9) (2,4) (2,5) (3,7)
    val lagExp = Seq((1, 1.0, None), (1, 9.0, Some(1.0)),
      (2, 4.0, Some(9.0)), (2, 5.0, Some(4.0)), (3, 7.0, Some(5.0)))
    run("lag(x, 1)", 1) shouldBe lagExp
    run("lag(x, 1)", 7) shouldBe lagExp // stable under any partitioning
    val rmExp = Seq((1, 1.0, Some(5.0)), (1, 9.0, Some(14.0 / 3)),
      (2, 4.0, Some(6.0)), (2, 5.0, Some(16.0 / 3)), (3, 7.0, Some(6.0)))
    run("rollmean(x, 3)", 1) shouldBe rmExp
    run("rollmean(x, 3)", 5) shouldBe rmExp
    // cum* keeps RANGE tie semantics (ties aggregate together) — the
    // tiebreak spec must NOT leak into the range-frame family
    val cm = run("cummax(x)", 3)
    cm.filter(_._1 == 1).flatMap(_._3).toSet shouldBe Set(9.0)
  }

  test("compileSeries rejects bad series source with the typed error") {
    an[UdfCompiler.UdfParseError] should be thrownBy
      UdfCompiler.compileSeries("rollmean(x, 4)", lit(0.0), // even width
        org.apache.spark.sql.expressions.Window.partitionBy(lit(1)).orderBy(lit(1)))
    an[UdfCompiler.UdfParseError] should be thrownBy
      UdfCompiler.compileSeries("lag(x, x)", lit(0.0), // non-literal offset
        org.apache.spark.sql.expressions.Window.partitionBy(lit(1)).orderBy(lit(1)))
    // series names stay unknown in the element-wise grammar
    UdfCompiler.supported("cummax(x)") shouldBe false
    UdfCompiler.supportedSeries("cummax(x)") shouldBe true
    // nested series = window-in-window: typed error at PARSE time, not a
    // Spark AnalysisException after the graph was accepted
    UdfCompiler.supportedSeries("cummax(cumsum(x))") shouldBe false
    UdfCompiler.supportedSeries("cummax(lag(x, 1))") shouldBe false
    UdfCompiler.supportedSeries("cummax(sqrt(x)) - lag(x, 1)") shouldBe true
  }

  test("apply_dimension + run_udf compiles through the graph compiler") {
    import graft.compile.GraphCompiler
    import graft.cube.Cube
    import graft.ops.Scan
    val dir = java.nio.file.Files.createTempDirectory("graft-udfdim").toString
    cubeOf(
      ("2024-01-01", "A", 0, 0, 3.0), ("2024-01-02", "A", 0, 0, 1.0),
      ("2024-01-03", "A", 0, 0, 5.0))
      .df.write.mode("overwrite").parquet(s"$dir/c")
    val catalog = Map("c" -> Scan.CollectionSpec(s"$dir/c",
      bandOrder = Seq("A")))
    val graph = """{
      "load": {"process_id": "load_collection", "arguments": {"id": "c"}},
      "ad": {"process_id": "apply_dimension", "arguments": {
        "data": {"from_node": "load"}, "dimension": "t",
        "process": {"process_graph": {
          "u": {"process_id": "run_udf", "arguments": {
            "data": {"from_parameter": "data"},
            "udf": "function(x, context) { cummax(x) }",
            "runtime": "R"}, "result": true}}}},
        "result": true}
    }"""
    val out = new GraphCompiler(spark, catalog, dir)
      .compile(graph).asInstanceOf[Cube]
    val got = out.df.orderBy("time").collect().map(_.getAs[Double]("value"))
    got.toSeq shouldBe Seq(3.0, 3.0, 5.0)
  }

  test("compileReduce: aggregates compose with element-wise math") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0), ("b", 30.0)).toDF("g", "v")
    def eval(src: String): Map[String, Double] =
      df.groupBy("g")
        .agg(UdfCompiler.compileReduce(src, col("v")).cast("double").as("r"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    eval("function(x, context) { mean(x) }") shouldBe Map("a" -> 2.5, "b" -> 20.0)
    // RMS: aggregate of an element-wise transform, then scalar math on top
    val rms = eval("sqrt(mean(x^2))")
    rms("a") shouldBe math.sqrt(30.0 / 4) +- 1e-12
    // scalar combination of two aggregates
    eval("max(x) - min(x)") shouldBe Map("a" -> 3.0, "b" -> 20.0)
    // R semantics: min over the series AND a scalar
    eval("min(x, 2)") shouldBe Map("a" -> 1.0, "b" -> 2.0)
    eval("median(x)") shouldBe Map("a" -> 2.5, "b" -> 20.0)
    eval("quantile(x, 0.25)") shouldBe Map("a" -> 1.75, "b" -> 15.0)
    eval("length(x)") shouldBe Map("a" -> 4.0, "b" -> 2.0)
    eval("prod(x)") shouldBe Map("a" -> 24.0, "b" -> 300.0)
    val sd = eval("sd(x)")
    sd("b") shouldBe math.sqrt(200.0) +- 1e-9 // sample sd like R
  }

  test("compileReduce rejects invalid reduce sources with the typed error") {
    def bad(src: String): Unit =
      an[UdfCompiler.UdfParseError] should be thrownBy
        UdfCompiler.compileReduce(src, lit(0.0))
    bad("x + 1")                 // bare series variable, no aggregate
    bad("mean(x) + x")           // series variable outside the aggregate
    bad("mean(max(x))")          // nested aggregates
    bad("42")                    // no aggregate at all
    bad("quantile(x, 1.5)")      // probability out of range
    bad("quantile(x, x)")        // non-literal probability
    bad("frobnicate(x)")         // unknown function
    UdfCompiler.supportedReduce("sqrt(mean(x^2))") shouldBe true
    UdfCompiler.supportedReduce("cummax(x)") shouldBe false // series-only fn
  }

  test("reduce_dimension + run_udf compiles through the graph compiler") {
    import graft.compile.GraphCompiler
    import graft.cube.Cube
    import graft.ops.Scan
    val dir = java.nio.file.Files.createTempDirectory("graft-udfred").toString
    cubeOf(
      ("2024-01-01", "A", 0, 0, 3.0), ("2024-01-02", "A", 0, 0, 1.0),
      ("2024-01-03", "A", 0, 0, 5.0),
      ("2024-01-01", "A", 1, 1, 2.0), ("2024-01-02", "A", 1, 1, 8.0))
      .df.write.mode("overwrite").parquet(s"$dir/c")
    val catalog = Map("c" -> Scan.CollectionSpec(s"$dir/c",
      bandOrder = Seq("A")))
    val graph = """{
      "load": {"process_id": "load_collection", "arguments": {"id": "c"}},
      "rd": {"process_id": "reduce_dimension", "arguments": {
        "data": {"from_node": "load"}, "dimension": "t",
        "reducer": {"process_graph": {
          "u": {"process_id": "run_udf", "arguments": {
            "data": {"from_parameter": "data"},
            "udf": "function(x, context) { max(x) - min(x) }",
            "runtime": "R"}, "result": true}}}},
        "result": true}
    }"""
    val out = new GraphCompiler(spark, catalog, dir)
      .compile(graph).asInstanceOf[Cube]
    out.has(graft.cube.Dim.Time) shouldBe false
    val got = out.df.orderBy("y").collect().map(_.getAs[Double]("value"))
    got.toSeq shouldBe Seq(4.0, 6.0)
  }

  test("multi-node reducer subgraph feeding run_udf is rejected, not silently truncated") {
    import graft.compile.GraphCompiler
    import graft.ops.Scan
    val dir = java.nio.file.Files.createTempDirectory("graft-udfred2").toString
    cubeOf(("2024-01-01", "A", 0, 0, -3.0), ("2024-01-02", "A", 0, 0, 1.0))
      .df.write.mode("overwrite").parquet(s"$dir/c")
    val catalog = Map("c" -> Scan.CollectionSpec(s"$dir/c", bandOrder = Seq("A")))
    // absolute() stage before run_udf: compiling just the UDF over the raw
    // column would yield max(-3,1)=1 instead of max(3,1)=3 — must raise
    val graph = """{
      "load": {"process_id": "load_collection", "arguments": {"id": "c"}},
      "rd": {"process_id": "reduce_dimension", "arguments": {
        "data": {"from_node": "load"}, "dimension": "t",
        "reducer": {"process_graph": {
          "a": {"process_id": "absolute", "arguments": {
            "x": {"from_parameter": "data"}}},
          "u": {"process_id": "run_udf", "arguments": {
            "data": {"from_node": "a"},
            "udf": "function(x, context) { max(x) }",
            "runtime": "R"}, "result": true}}}},
        "result": true}
    }"""
    an[IllegalArgumentException] should be thrownBy
      new GraphCompiler(spark, catalog, dir).compile(graph)
  }

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

  test("runOnTiles with chunk_size bounds tiles and matches unchunked output") {
    import graft.cube.{Cube, CubeMeta, GridRef}
    import spark.implicits._
    // 6×6 grid, chunk 2 → 9 spatial tiles; a per-point fn must give the
    // same result chunked and unchunked, and the fn must never see a tile
    // larger than chunkSize²
    val rows = for { y <- 0 until 6; x <- 0 until 6 }
      yield (y.toDouble, x.toDouble, (y * 6 + x).toDouble)
    val df = rows.toDF("y", "x", "value")
    val c = Cube(df, CubeMeta(grid = Some(GridRef(0, 0, 1, 1))))
    val chunked = RunUdf.runOnTiles(c,
      (_, _, pts) => pts.map(p => TilePoint(p.y, p.x, p.value * 2)),
      chunkSize = Some(2))
      .df.collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    chunked((3.0, 4.0)) shouldBe (3 * 6 + 4) * 2.0
    chunked.size shouldBe 36
    // tile-size bound: have the fn WRITE its tile size into the values
    // (the closure is serialized per task, so a driver-side queue would
    // stay empty); the 6×6 grid at chunk 2 must give exactly 2×2 tiles
    val sizes = RunUdf.runOnTiles(c,
      (_, _, pts) => pts.map(p => TilePoint(p.y, p.x, pts.length.toDouble)),
      chunkSize = Some(2))
      .df.select("value").collect().map(_.getDouble(0))
    sizes.max shouldBe 4.0
    sizes.min shouldBe 4.0
    val whole = RunUdf.runOnTiles(c, (_, _, pts) =>
      pts.map(p => TilePoint(p.y, p.x, p.value * 2)))
      .df.collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    whole shouldBe chunked
  }

  test("runOnValues applies a scalar function per cell") {
    val c = cubeOf(("2024-01-01", "A", 0, 0, 9.0))
    RunUdf.runOnValues(c, math.sqrt).df.head()
      .getAs[Double]("value") shouldBe 3.0
  }
}
