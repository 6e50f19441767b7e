package graft

import graft.cube.{Cube, CubeMeta}
import graft.ops.Sinks
import org.apache.spark.sql.functions._

class NetcdfSourceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("ncsrc").toString
    // two job outputs: 2 times × 2 bands × 2×2 grid each, one NaN hole
    def cube(dayOffset: Int) = {
      val rows = for {
        t <- 1 to 2; b <- Seq("B04", "B08"); y <- 0 to 1; x <- 0 to 1
        if !(t == 1 && b == "B04" && y == 0 && x == 1) // absent cell
      } yield (ts(f"2024-01-0${t + dayOffset}%d 00:00:00"), b,
        y.toDouble, x.toDouble, (t * 100 + y * 10 + x).toDouble + dayOffset)
      Cube(rows.toDF("time", "band", "y", "x", "value"),
        CubeMeta(bandOrder = Seq("B04", "B08")))
    }
    Sinks.writeNetcdf(cube(0), s"$d/a.nc")
    Sinks.writeNetcdf(cube(2), s"$d/b.nc")
    d
  }

  test("graft-netcdf reads a directory of .nc files with one partition " +
      "per (file, time, band) plane") {
    val df = spark.read.format("graft-netcdf").load(dir)
    df.columns.toSeq shouldBe Seq("time", "band", "y", "x", "value")
    // 2 files × 2 times × 2 bands = 8 planes
    df.rdd.getNumPartitions shouldBe 8
    df.count() shouldBe 2 * (16 - 1) // one NaN hole per file
    // values round-trip (float32)
    df.where(col("band") === "B08" && col("y") === 1.0 && col("x") === 0.0 &&
        col("time") === ts("2024-01-01 00:00:00"))
      .select("value").head().getFloat(0) shouldBe 110.0f
  }

  test("band and time filters prune input partitions at planning time") {
    val df = spark.read.format("graft-netcdf").load(dir)
    val band = df.where(col("band") === "B04")
    band.rdd.getNumPartitions shouldBe 4 // half the planes gone
    band.select("band").distinct().collect().map(_.getString(0)).toSeq shouldBe
      Seq("B04")
    val time = df.where(col("time") >= ts("2024-01-03 00:00:00"))
    time.rdd.getNumPartitions shouldBe 4 // only file b's times survive
    val both = df.where(col("band") === "B08" &&
      col("time") === ts("2024-01-02 00:00:00"))
    both.rdd.getNumPartitions shouldBe 1
    both.count() shouldBe 4
    // y/x predicates are NOT plane constants — they stay with Spark and
    // never prune planes (row-level filtering still applies)
    val yf = df.where(col("y") === 0.0)
    yf.rdd.getNumPartitions shouldBe 8
    // per file: 2 bands × 2 times × 2 x-cells = 8, minus its y=0 hole
    yf.count() shouldBe 2 * (8 - 1)
  }

  test("column pruning reaches the reader: value-only scan skips " +
      "band/time materialization and aggregates correctly") {
    val df = spark.read.format("graft-netcdf").load(dir)
    val scan = df.select("value")
    scan.queryExecution.executedPlan.toString should include("value")
    // sum over both files: full grid sums minus the two holes (101, 103)
    val expect = (for {
      off <- Seq(0, 2); t <- 1 to 2; y <- 0 to 1; x <- 0 to 1; _ <- 1 to 2
    } yield (t * 100 + y * 10 + x).toDouble + off).sum - (101.0 + 103.0)
    scan.agg(sum("value")).head().getDouble(0) shouldBe expect
  }

  test("streaming: new .nc files in the directory arrive as micro-batches, " +
      "exactly once, arrival-order independent") {
    val sd = java.nio.file.Files.createTempDirectory("ncstream").toString
    def write(name: String, day: Int): Unit = {
      val rows = Seq((ts(f"2024-02-0$day%d 00:00:00"), "B04", 0.0, 0.0,
        day.toDouble))
      Sinks.writeNetcdf(Cube(rows.toDF("time", "band", "y", "x", "value"),
        CubeMeta(bandOrder = Seq("B04"))), s"$sd/$name")
    }
    write("b.nc", 1) // schema inference needs one file up front
    val q = spark.readStream.format("graft-netcdf").load(sd)
      .writeStream.format("memory").queryName("nc_stream_sink")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table("nc_stream_sink").count() shouldBe 1
      // a file that sorts BEFORE the consumed one still arrives (offset
      // is the seen-file set, not a count)
      write("a.nc", 2)
      q.processAllAvailable()
      spark.table("nc_stream_sink").count() shouldBe 2
      write("c.nc", 3)
      q.processAllAvailable()
      val got = spark.table("nc_stream_sink")
        .select("value").collect().map(_.getFloat(0)).toSet
      got shouldBe Set(1.0f, 2.0f, 3.0f)
    } finally q.stop()
  }

  test("MULTIPLE pushed band filters intersect — the second predicate " +
      "is not silently dropped") {
    val df = spark.read.format("graft-netcdf").load(dir)
    val both = df.where(col("band").isin("B04", "B08"))
      .where(col("band").isin("B08"))
    both.select("band").distinct().collect().map(_.getString(0)).toSeq shouldBe
      Seq("B08")
    both.rdd.getNumPartitions shouldBe 4 // only B08 planes survive
    // contradictory predicates yield empty, not the union
    df.where(col("band") === "B04").where(col("band") === "B08")
      .count() shouldBe 0
  }

  test("requireFloatPlane rejects an NC_DOUBLE value variable instead of " +
      "reinterpreting its bytes as float32") {
    val m = graft.sources.Netcdf.readMeta(s"$dir/a.nc")
    m.requireFloatPlane() // the real file passes
    val doctored = m.copy(vars = m.vars.updated("value",
      m.vars("value").copy(ncType = 6)))
    intercept[IllegalArgumentException] { doctored.requireFloatPlane() }
  }

  test("driver reader and V2 source agree at MICROSECOND precision on " +
      "sub-millisecond time coordinates") {
    // patch a written file's first time coordinate to x.0005 seconds
    val src = java.nio.file.Paths.get(s"$dir/a.nc")
    val patched = java.nio.file.Files.createTempDirectory("ncus")
      .resolve("p.nc")
    val bytes = java.nio.file.Files.readAllBytes(src)
    val m = graft.sources.Netcdf.readMeta(s"$dir/a.nc", bytes)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.putDouble(m.vars("time").begin, 1700000000.000500)
    java.nio.file.Files.write(patched, bytes)
    val viaDriver = graft.ops.Scan.loadResultNetcdf(spark, patched.toString)
      .df.select(unix_micros(col("time"))).distinct()
      .collect().map(_.getLong(0)).toSet
    val viaSource = spark.read.format("graft-netcdf").load(patched.toString)
      .select(unix_micros(col("time"))).distinct()
      .collect().map(_.getLong(0)).toSet
    viaDriver shouldBe viaSource
    viaDriver should contain(1700000000000500L)
  }

  test("the scan is VECTORIZED: batches feed whole-stage codegen through " +
      "ColumnarToRow, like parquet") {
    val df = spark.read.format("graft-netcdf").load(dir)
    df.queryExecution.executedPlan.toString should include("ColumnarToRow")
    // values identical through the columnar path (it is the default path)
    df.agg(sum("value")).head().getDouble(0) shouldBe
      df.collect().map(_.getFloat(4).toDouble).sum
  }

  test("matches loadResultNetcdf row-for-row on a single file") {
    val viaSource = spark.read.format("graft-netcdf").load(s"$dir/a.nc")
      .select("time", "band", "y", "x", "value")
      .collect().map(_.toSeq).toSet
    val viaDriver = graft.ops.Scan.loadResultNetcdf(spark, s"$dir/a.nc")
      .df.select("time", "band", "y", "x", "value")
      .collect().map(_.toSeq).toSet
    viaSource shouldBe viaDriver
  }
}
