package graft.ops

import graft.cube.{Cube, Dim}
import org.apache.spark.sql.functions._

/** `run_udf` with EXTERNAL user source — the escape hatch for UDFs the
  * expression grammar ([[graft.compile.UdfCompiler]]) cannot express
  * (per-series recurrences, data-dependent loops).
  *
  * The reference ships cube chunks to an R worker pool through NetCDF
  * files and reassembles with open_mfdataset
  * (openeo_odc_driver.py:282-339, chunked by `context.chunk_size`,
  * default 512). The Spark-first equivalent keeps the same architectural
  * slot — opaque user source, chunked parallel execution — but hosts the
  * source ON the executors: the UDF is a Java method body compiled
  * per-JVM by janino (the exact compiler Spark's own codegen uses, so it
  * adds no dependency), with signature
  *
  * {{{ (long[] times, double[] values) -> double[] }}}
  *
  * over one time-ordered series. Shipping SOURCE and compiling lazily in
  * each executor JVM (cached per source text) is what makes this work on
  * a real cluster: a driver-compiled closure would live in a
  * driver-local classloader that executors cannot deserialize from.
  *
  * Chunking mirrors the reference: rows shuffle ONCE keyed by
  * `chunk_size`²-pixel spatial tile (every band and timestamp of a tile
  * reaches the same task, like each joblib worker's chunk), each group
  * sorts in memory — bounded by the tile extent — and the compiled
  * method runs per (band, y, x) series. Series order is (time, value),
  * the value tiebreak making duplicate-timestamp series deterministic.
  *
  * R source is out of scope in v1 (zero-egress container; rpy2 has no
  * JVM analogue) — this seam is where a worker-pool bridge would plug
  * in, with the same chunked shuffle shape.
  */
object ExternalUdf {

  final case class ExternalUdfError(reason: String) extends RuntimeException(
    s"run_udf(runtime=java): $reason")

  /** Per-JVM compile cache: source text → cooked evaluator. Executors
    * hit this lazily on first use; the driver hits it at graph-compile
    * time for fail-fast validation. */
  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String,
      org.codehaus.janino.ScriptEvaluator]()

  private def compiled(source: String): org.codehaus.janino.ScriptEvaluator =
    cache.computeIfAbsent(source, src => {
      val se = new org.codehaus.janino.ScriptEvaluator()
      se.setReturnType(classOf[Array[Double]])
      se.setParameters(Array("times", "values"),
        Array[Class[_]](classOf[Array[Long]], classOf[Array[Double]]))
      try se.cook(src)
      catch { case e: org.codehaus.commons.compiler.CompileException =>
        throw ExternalUdfError(s"source does not compile: ${e.getMessage}")
      }
      se
    })

  /** Validate source on the caller (driver) — same janino cook the
    * executors will run, so a bad UDF fails at graph-compile time, not
    * task time. */
  def validate(source: String): Unit = { compiled(source); () }

  /** Apply an external Java series UDF along the time dimension, per
    * (band?, y, x) series, chunk-parallel. The UDF must return exactly
    * one output per input (apply_dimension contract with unchanged
    * labels); anything else raises [[ExternalUdfError]] at task time. */
  def runSeriesExternal(c: Cube, source: String,
      chunkSize: Int = 512): Cube = {
    require(chunkSize > 0, s"chunk_size must be positive, got $chunkSize")
    require(c.has(Dim.Time), "external series UDF needs a time dimension")
    validate(source)
    val hasBand = c.has(Dim.Band)
    val spark = c.df.sparkSession
    import spark.implicits._
    // spatial chunk key in PIXEL units when the cube carries a grid
    // (reference chunk semantics), raw coordinate units otherwise — the
    // key only steers shuffle granularity, never the result (law-tested)
    val (yIdx, xIdx) = c.meta.grid match {
      case Some(g) => (g.yIdx(col(Dim.Y)).cast("double"),
        g.xIdx(col(Dim.X)).cast("double"))
      case None => (col(Dim.Y), col(Dim.X))
    }
    val keyed = c.df.select(
      floor(yIdx / chunkSize).cast("long").as("_cy"),
      floor(xIdx / chunkSize).cast("long").as("_cx"),
      (if (hasBand) col(Dim.Band) else lit("")).as("_b"),
      col(Dim.Y), col(Dim.X),
      unix_micros(col(Dim.Time)).as("_t"),
      col(Cube.ValueCol).cast("double"))
      .as[(Long, Long, String, Double, Double, Long, Double)]
    val out = keyed.groupByKey(r => (r._1, r._2))
      .flatMapGroups { (_: (Long, Long),
          rows: Iterator[(Long, Long, String, Double, Double, Long, Double)]) =>
        // one chunk in memory (≤ chunkSize² cells × times × bands — the
        // reference materializes exactly the same tile per worker)
        val chunk = rows.toArray
        java.util.Arrays.sort(chunk, Ordering.by(
          (r: (Long, Long, String, Double, Double, Long, Double)) =>
            (r._3, r._4, r._5, r._6, r._7)))
        val se = compiled(source)
        val res = Iterator.unfold(0) { start =>
          if (start >= chunk.length) None
          else {
            var end = start
            while (end < chunk.length && chunk(end)._3 == chunk(start)._3 &&
              chunk(end)._4 == chunk(start)._4 &&
              chunk(end)._5 == chunk(start)._5) end += 1
            val times = Array.tabulate(end - start)(i => chunk(start + i)._6)
            val values = Array.tabulate(end - start)(i => chunk(start + i)._7)
            val outVals =
              try se.evaluate(Array[AnyRef](times, values): _*)
                .asInstanceOf[Array[Double]]
              catch { case e: java.lang.reflect.InvocationTargetException =>
                throw ExternalUdfError(s"UDF threw: ${e.getCause}")
              }
            if (outVals == null || outVals.length != values.length)
              throw ExternalUdfError(
                s"UDF must return one value per input, got " +
                  s"${Option(outVals).map(_.length).getOrElse(-1)} for " +
                  s"${values.length}")
            val rowsOut = Array.tabulate(end - start)(i =>
              (chunk(start)._3, chunk(start)._4, chunk(start)._5,
                times(i), outVals(i)))
            Some((rowsOut, end))
          }
        }
        res.flatten
      }
    val df0 = out.toDF("_b", Dim.Y, Dim.X, "_t", Cube.ValueCol)
      .withColumn(Dim.Time, timestamp_micros(col("_t")))
    val withBand = if (hasBand) df0.withColumn(Dim.Band, col("_b")) else df0
    c.withDF(withBand.select(c.dims.map(col) :+ col(Cube.ValueCol): _*))
  }
}
