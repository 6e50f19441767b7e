package graft.ops

import graft.cube.{Cube, Dim}
import graft.ops.ExternalUdf.ExternalUdfError

/** `run_udf(runtime="python")` — the reference's actual external-UDF
  * surface (its R/Python worker pool, openeo_odc_driver.py:282-339)
  * realized Spark-first: the SAME chunked series seam as the Java tier
  * ([[ExternalUdf.runSeriesWith]] — one shuffle keyed by
  * `context.chunk_size`²-pixel tile, in-memory per-chunk sort), with
  * evaluation delegated to a long-lived `python3` worker PROCESS per
  * executor task thread, talking a line protocol over stdin/stdout.
  *
  * The user source must define `def udf(times, values)` returning one
  * output per input (apply_dimension contract with unchanged labels) —
  * `times` carries label micros along time, band ordinals along bands,
  * exactly like the Java tier's `times` parameter. Only the Python
  * standard library is available to the UDF body (the workers import
  * nothing else), which matches the reference's chunk-level model: the
  * engine does the distribution, the UDF sees one plain series.
  *
  * Worker-pool mechanics (the scale story):
  *  - one worker per (source, task thread), cached per JVM — with N
  *    executor cores that is at most N processes per source, the same
  *    shape as the reference's joblib pool; workers are reused across
  *    chunks and groups, and destroyed on JVM exit.
  *  - one protocol round trip per CHUNK, not per series: the seam hands
  *    all series of a chunk in one batch, so pipe latency amortizes over
  *    chunkSize² pixels.
  *  - values cross the pipe as shortest-round-trip decimal strings
  *    (Java `Double.toString` → Python `float` → Python `repr` → Java
  *    `parseDouble`), which is bit-exact in both directions — the
  *    correctness oracle replays the UDF in SQL and hash-compares.
  *  - the worker binary is `spark.graft.udf.python.exec` (default
  *    `python3`) and must be on PATH on every executor; a missing
  *    interpreter raises a typed [[ExternalUdfError]] at graph-compile
  *    time (driver-side validate), not task time.
  *
  * Trust boundary: same as the Java tier (see [[ExternalUdf]]) —
  * arbitrary user code on executors, trusted callers only, disable via
  * `spark.graft.udf.external.enabled=false`.
  */
object PythonUdf {

  /** Worker-side loop. Protocol (all lines UTF-8, '\n'-terminated):
    *   in:  SRC <nBytes>        then nBytes of source, then '\n'
    *   out: READY | ERR <msg>
    *   in:  BATCH <k>           then per series: '<n>' line, times line
    *                            (n space-sep longs), values line (n
    *                            space-sep doubles, Java spellings)
    *   out: per series: 'OK' + one line of n doubles, or ERR <msg>
    * Java's NaN/Infinity/-Infinity spellings parse via float(); the
    * worker answers with the same spellings. */
  private val WorkerScript =
    """import sys
      |def _fmt(v):
      |    v = float(v)
      |    if v != v: return 'NaN'
      |    if v == float('inf'): return 'Infinity'
      |    if v == float('-inf'): return '-Infinity'
      |    return repr(v)
      |def _read(): return sys.stdin.readline()
      |line = _read()
      |if not line.startswith('SRC '):
      |    sys.stdout.write('ERR protocol: expected SRC\n'); sys.stdout.flush(); sys.exit(1)
      |n = int(line[4:])
      |src = sys.stdin.read(n); sys.stdin.read(1)
      |env = {}
      |try:
      |    exec(src, env)
      |    fn = env['udf']
      |    if not callable(fn): raise TypeError('udf is not callable')
      |    sys.stdout.write('READY\n')
      |except Exception as e:
      |    sys.stdout.write('ERR %s: %s\n' % (type(e).__name__, str(e).replace('\n', ' ')))
      |    sys.stdout.flush(); sys.exit(1)
      |sys.stdout.flush()
      |while True:
      |    line = _read()
      |    if not line: break
      |    k = int(line.split()[1])
      |    out = []
      |    for _ in range(k):
      |        cnt = int(_read())
      |        times = [int(t) for t in _read().split()]
      |        values = [float(v) for v in _read().split()]
      |        assert len(times) == cnt and len(values) == cnt
      |        try:
      |            res = list(fn(times, values))
      |            out.append('OK\n' + ' '.join(_fmt(v) for v in res) + '\n')
      |        except Exception as e:
      |            out.append('ERR %s: %s\n' % (type(e).__name__, str(e).replace('\n', ' ')))
      |    sys.stdout.write(''.join(out))
      |    sys.stdout.flush()
      |""".stripMargin

  /** One live worker process + its streams. */
  private final class Worker(exec: String, source: String) {
    val proc: Process = {
      val pb = new ProcessBuilder(exec, "-u", "-c", WorkerScript)
      pb.redirectErrorStream(false)
      try pb.start()
      catch { case e: java.io.IOException =>
        throw ExternalUdfError(
          s"cannot start python worker '$exec': ${e.getMessage} " +
            "(set spark.graft.udf.python.exec, or disable the runtime)")
      }
    }
    val in = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      proc.getOutputStream, "UTF-8"))
    val out = new java.io.BufferedReader(new java.io.InputStreamReader(
      proc.getInputStream, "UTF-8"))
    // ship the source once; the worker exec()s it and reports
    val srcBytes = source.getBytes("UTF-8")
    in.write(s"SRC ${srcBytes.length}\n"); in.write(source); in.write("\n")
    in.flush()
    private val hello = out.readLine()
    if (hello == null) throw ExternalUdfError(
      "python worker died before READY (is the interpreter functional?)")
    if (hello.startsWith("ERR ")) {
      destroy()
      throw ExternalUdfError(
        s"python source does not load: ${hello.drop(4)}")
    }
    require(hello == "READY", s"python worker protocol: $hello")

    def eval(batch: Array[(Array[Long], Array[Double])])
        : Array[Array[Double]] = {
      in.write(s"BATCH ${batch.length}\n")
      val sb = new java.lang.StringBuilder
      batch.foreach { case (ords, values) =>
        sb.setLength(0)
        sb.append(ords.length).append('\n')
        var i = 0
        while (i < ords.length) {
          if (i > 0) sb.append(' '); sb.append(ords(i)); i += 1
        }
        sb.append('\n')
        i = 0
        while (i < values.length) {
          if (i > 0) sb.append(' '); sb.append(values(i)); i += 1
        }
        sb.append('\n')
        in.write(sb.toString)
      }
      in.flush()
      batch.map { case (_, values) =>
        val status = out.readLine()
        if (status == null) throw ExternalUdfError(
          "python worker died mid-batch")
        if (status.startsWith("ERR ")) throw ExternalUdfError(
          s"UDF threw: ${status.drop(4)}")
        require(status == "OK", s"python worker protocol: $status")
        val line = out.readLine()
        if (line == null) throw ExternalUdfError(
          "python worker died mid-batch")
        val parts =
          if (line.isEmpty) Array.empty[String] else line.split(' ')
        if (parts.length != values.length) throw ExternalUdfError(
          s"UDF must return one value per input, got ${parts.length} " +
            s"for ${values.length}")
        parts.map(java.lang.Double.parseDouble)
      }
    }

    def alive: Boolean = proc.isAlive
    def destroy(): Unit = {
      try in.close() catch { case _: Exception => () }
      proc.destroyForcibly(); ()
    }
  }

  /** Per-JVM worker cache, keyed by (source, thread): at most one
    * process per executor task thread per source — the joblib-pool
    * shape. Dead workers (UDF crashed the interpreter) are replaced. */
  @transient private lazy val workers =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Worker]()

  @transient private lazy val shutdownHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      workers.values.forEach(_.destroy())))
  }

  private def workerFor(exec: String, source: String): Worker = {
    shutdownHook
    val key = (source, Thread.currentThread().getId)
    val w = workers.computeIfAbsent(key, _ => new Worker(exec, source))
    if (w.alive) w
    else {
      workers.remove(key, w)
      workers.computeIfAbsent(key, _ => new Worker(exec, source))
    }
  }

  private def execOf(c: Cube): String =
    c.df.sparkSession.conf.get("spark.graft.udf.python.exec", "python3")

  /** Driver-side fail-fast: spawn (or reuse) a worker and load the
    * source — a syntax error or missing `udf` function fails at
    * graph-compile time, exactly like the Java tier's janino cook. */
  def validate(exec: String, source: String): Unit = {
    workerFor(exec, source); ()
  }

  /** Apply an external Python series UDF along `dim` — see class doc. */
  def runSeriesPython(c: Cube, source: String,
      chunkSize: Int = 512, dim: String = Dim.Time): Cube = {
    ExternalUdf.requireEnabled(c, "python")
    val exec = execOf(c)
    validate(exec, source)
    ExternalUdf.runSeriesWith(c, chunkSize, dim) { batch =>
      workerFor(exec, source).eval(batch)
    }
  }
}
