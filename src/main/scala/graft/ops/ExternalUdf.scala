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
  * default 512; the parent's dimension selects the series axis — time
  * or `variable` i.e. bands, 292-296). The Spark-first equivalent keeps
  * the same architectural slot — opaque user source, chunked parallel
  * execution, either series axis — but hosts the source ON the
  * executors: the UDF is a Java method body compiled per-JVM by janino
  * (the exact compiler Spark's own codegen uses, so it adds no
  * dependency), with signature
  *
  * {{{ (long[] times, double[] values) -> double[] }}}
  *
  * over one ordered series. Along time, `times` carries the label
  * micros; along bands it carries the band ORDINALS (0..n-1 in
  * bandOrder) — the axis a recurrence needs. Shipping SOURCE and
  * compiling lazily in each executor JVM (cached per source text) is
  * what makes this work on a real cluster: a driver-compiled closure
  * would live in a driver-local classloader executors cannot
  * deserialize from.
  *
  * Chunking mirrors the reference: rows shuffle ONCE keyed by
  * `chunk_size`²-pixel spatial tile (every band and timestamp of a tile
  * reaches the same task, like each joblib worker's chunk), each group
  * sorts in memory — bounded by the tile extent — and the compiled
  * method runs per series. Series order carries a value tiebreak, so
  * duplicate labels stay deterministic.
  *
  * '''Trust boundary''': the UDF body is arbitrary user code running
  * unsandboxed in the executor JVMs — full file/network/System.exit
  * access, exactly the trust model of the reference (whose R worker
  * executes the graph's UDF source verbatim,
  * openeo_odc_driver.py:282-339). Process graphs must therefore come
  * only from trusted callers. Multi-tenant deployments should disable
  * the runtime (`spark.graft.udf.external.enabled=false` rejects every
  * external UDF at graph-compile time with a typed error) or front it
  * with their own review/allowlist.
  *
  * A Python runtime rides the same chunked seam via a piped worker
  * process per executor (see [[PythonUdf]]); R source remains out of
  * scope in v1 (no R interpreter in scope) — [[PythonUdf]]'s
  * line-protocol bridge is where an R worker pool would plug in, with
  * the same chunked shuffle shape.
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

  /** Has the deployment disabled the external-UDF escape hatch?
    * (`spark.graft.udf.external.enabled=false` — the multi-tenant
    * guard documented in the class scaladoc.) */
  def requireEnabled(c: Cube, runtime: String): Unit = {
    val enabled = c.df.sparkSession.conf
      .get("spark.graft.udf.external.enabled", "true").toBoolean
    if (!enabled) throw ExternalUdfError(
      s"external runtime '$runtime' is disabled by " +
        "spark.graft.udf.external.enabled=false (multi-tenant guard); " +
        "use the expression grammar, or re-enable for trusted callers")
  }

  /** Apply an external Java series UDF along `dim` (time or bands), per
    * remaining-dims series, chunk-parallel. The UDF must return exactly
    * one output per input (apply_dimension contract with unchanged
    * labels); anything else raises [[ExternalUdfError]] at task time. */
  def runSeriesExternal(c: Cube, source: String,
      chunkSize: Int = 512, dim: String = Dim.Time): Cube = {
    requireEnabled(c, "java")
    validate(source)
    runSeriesWith(c, chunkSize, dim) { batch =>
      val se = compiled(source)
      batch.map { case (ords, values) =>
        try se.evaluate(Array[AnyRef](ords, values): _*)
          .asInstanceOf[Array[Double]]
        catch { case e: java.lang.reflect.InvocationTargetException =>
          throw ExternalUdfError(s"UDF threw: ${e.getCause}")
        }
      }
    }
  }

  /** The shared chunked seam: shuffle once by `chunk_size`²-pixel tile,
    * sort each chunk in memory, slice into per-series (ordinals, values)
    * arrays, and hand ALL series of the chunk to `batchEval` in one call
    * (so a piped-worker runtime pays one round trip per chunk, not per
    * series). `batchEval` must return one output array per series, each
    * the same length as its input. */
  private[ops] def runSeriesWith(c: Cube, chunkSize: Int, dim: String)(
      batchEval: Array[(Array[Long], Array[Double])] => Array[Array[Double]])
      : Cube = {
    require(chunkSize > 0, s"chunk_size must be positive, got $chunkSize")
    require(dim == Dim.Time || dim == Dim.Band,
      s"external series UDF supports time|bands, got $dim")
    require(c.has(dim), s"external series UDF: cube lacks dimension $dim")
    val hasBand = c.has(Dim.Band)
    val hasTime = c.has(Dim.Time)
    val spark = c.df.sparkSession
    import spark.implicits._
    // band ordinals: bandOrder when declared, else sorted distinct (a
    // tiny axis); the inverse map restores names after the UDF
    val bandNames: Seq[String] =
      if (!hasBand) Nil
      else if (c.meta.bandOrder.nonEmpty) c.meta.bandOrder
      else c.df.select(Dim.Band).distinct()
        .collect().map(_.getString(0)).sorted.toSeq
    val bandOrd: Map[String, Long] =
      bandNames.zipWithIndex.map { case (b, i) => b -> i.toLong }.toMap
    val ordToBand: Map[Long, String] = bandOrd.map(_.swap)
    // spatial chunk key in PIXEL units when the cube carries a grid
    // (reference chunk semantics), raw coordinate units otherwise — the
    // key only steers shuffle granularity, never the result (law-tested)
    val (yIdx, xIdx) = c.meta.grid match {
      case Some(g) => (g.yIdx(col(Dim.Y)).cast("double"),
        g.xIdx(col(Dim.X)).cast("double"))
      case None => (col(Dim.Y), col(Dim.X))
    }
    // a data band missing from a declared bandOrder must fail LOUDLY:
    // element_at's null would otherwise surface as an opaque
    // null-in-non-nullable-field encoder crash deep in the task
    val bandOrdCol = if (!hasBand) lit(0L) else coalesce(
      element_at(typedLit(bandOrd), col(Dim.Band)).cast("long"),
      raise_error(concat(
        lit("run_udf(runtime=java): band "), col(Dim.Band),
        lit(" not in bandOrder"))).cast("long"))
    // _ord is the series axis (micros or band ordinal); (_ks, _kt) are
    // the series identity's OTHER labels
    val (ordCol, ksCol, ktCol) =
      if (dim == Dim.Time)
        (unix_micros(col(Dim.Time)),
          if (hasBand) col(Dim.Band) else lit(""), lit(0L))
      else
        (bandOrdCol, lit(""),
          if (hasTime) unix_micros(col(Dim.Time)) else lit(0L))
    val keyed = c.df.select(
      floor(yIdx / chunkSize).cast("long").as("_cy"),
      floor(xIdx / chunkSize).cast("long").as("_cx"),
      ksCol.as("_ks"), ktCol.cast("long").as("_kt"),
      col(Dim.Y), col(Dim.X),
      ordCol.cast("long").as("_ord"),
      col(Cube.ValueCol).cast("double"))
      .as[(Long, Long, String, Long, Double, Double, Long, Double)]
    val out = keyed.groupByKey(r => (r._1, r._2))
      .flatMapGroups { (_: (Long, Long),
          rows: Iterator[(Long, Long, String, Long, Double, Double, Long,
            Double)]) =>
        // one chunk in memory (≤ chunkSize² cells × series axis — the
        // reference materializes exactly the same tile per worker)
        val chunk = rows.toArray
        java.util.Arrays.sort(chunk, Ordering.by(
          (r: (Long, Long, String, Long, Double, Double, Long, Double)) =>
            (r._3, r._4, r._5, r._6, r._7, r._8)))
        // slice into series: [start, end) ranges sharing the identity key
        val starts = scala.collection.mutable.ArrayBuffer[Int]()
        var i = 0
        while (i < chunk.length) {
          starts += i
          var end = i
          while (end < chunk.length && chunk(end)._3 == chunk(i)._3 &&
            chunk(end)._4 == chunk(i)._4 &&
            chunk(end)._5 == chunk(i)._5 &&
            chunk(end)._6 == chunk(i)._6) end += 1
          i = end
        }
        val bounds = (starts :+ chunk.length).toArray
        val batch = Array.tabulate(starts.length) { s =>
          val (from, to) = (bounds(s), bounds(s + 1))
          (Array.tabulate(to - from)(k => chunk(from + k)._7),
            Array.tabulate(to - from)(k => chunk(from + k)._8))
        }
        val outs = batchEval(batch)
        if (outs == null || outs.length != batch.length)
          throw ExternalUdfError(
            s"runtime returned ${Option(outs).map(_.length).getOrElse(-1)} " +
              s"series for ${batch.length}")
        Iterator.tabulate(starts.length) { s =>
          val (from, to) = (bounds(s), bounds(s + 1))
          val outVals = outs(s)
          if (outVals == null || outVals.length != to - from)
            throw ExternalUdfError(
              s"UDF must return one value per input, got " +
                s"${Option(outVals).map(_.length).getOrElse(-1)} for " +
                s"${to - from}")
          Array.tabulate(to - from)(k =>
            (chunk(from)._3, chunk(from)._4, chunk(from)._5,
              chunk(from)._6, chunk(from + k)._7, outVals(k)))
        }.flatten
      }
    val df0 = out.toDF("_ks", "_kt", Dim.Y, Dim.X, "_ord", Cube.ValueCol)
    val restored =
      if (dim == Dim.Time) {
        val withTime = df0.withColumn(Dim.Time, timestamp_micros(col("_ord")))
        if (hasBand) withTime.withColumn(Dim.Band, col("_ks")) else withTime
      } else {
        val nameMap = typedLit(ordToBand)
        val withBand = df0.withColumn(Dim.Band,
          element_at(nameMap, col("_ord")))
        if (hasTime) withBand.withColumn(Dim.Time,
          timestamp_micros(col("_kt")))
        else withBand
      }
    c.withDF(restored.select(c.dims.map(col) :+ col(Cube.ValueCol): _*))
  }
}
