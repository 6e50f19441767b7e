package graft.sources

/** Shared CDF-1 (NetCDF-3 classic) structure parser — the single
  * implementation behind both the driver-side reader
  * ([[graft.ops.Scan.loadResultNetcdf]]) and the DataSource V2 source
  * ([[NetcdfTableProvider]]). Parses the public spec's header (magic,
  * dim list, attribute lists, var list with fixed begin offsets) plus
  * the small coordinate variables; the DATA plane is NOT materialized
  * here — readers index into the file bytes themselves, which is what
  * lets the V2 source hand each (time, band) plane to its own input
  * partition. */
object Netcdf {

  final case class Var(name: String, dimIds: Seq[Int], ncType: Int,
      vsize: Int, begin: Int)

  /** Parsed file structure: dims, vars, decoded coordinate axes. */
  final case class Meta(path: String, dims: Seq[(String, Int)],
      vars: Map[String, Var],
      times: Option[Array[Double]], // seconds since epoch
      bands: Option[Seq[String]],
      ys: Array[Double], xs: Array[Double]) {
    def nT: Int = times.map(_.length).getOrElse(1)
    def nB: Int = bands.map(_.length).getOrElse(1)
    val value: Var = vars.getOrElse("value",
      throw new IllegalArgumentException(s"$path: no `value` variable"))
    /** Byte offset of cell (t, b, y, x) in the float32 data plane.
      * Computed in Long: the linear index times 4 can exceed Int range
      * for a plane approaching the CDF-1 2 GB limit, and an Int overflow
      * here would seek to a wrong (negative) offset instead of failing. */
    def cellOffset(t: Int, b: Int, y: Int, x: Int): Long =
      value.begin.toLong +
        4L * (((t.toLong * nB + b) * ys.length + y) * xs.length + x)
    def timeMicros(t: Int): Long = (times.get(t) * 1e6).round
    /** Guard before any plane read: silently reinterpreting an
      * NC_DOUBLE value variable (or a record-dim layout) as float32
      * planes would return garbage, not an error. */
    def requireFloatPlane(): Unit = {
      require(value.ncType == 5, s"$path: value: expected NC_FLOAT")
      require(value.dimIds.map(dims(_)._2).product ==
        nT * nB * ys.length * xs.length,
        s"$path: value dims disagree with coordinates")
    }
  }

  def typeSize(t: Int): Int = t match {
    case 1 | 2 => 1; case 3 => 2; case 4 | 5 => 4; case 6 => 8
    case other => throw new IllegalArgumentException(s"nc_type $other")
  }

  /** Parse header + coordinate variables from the file's bytes. */
  def readMeta(path: String, bytes: Array[Byte]): Meta = {
    val b = java.nio.ByteBuffer.wrap(bytes) // big-endian by default
    require(b.get() == 'C' && b.get() == 'D' && b.get() == 'F',
      s"$path: not a NetCDF classic file")
    val version = b.get()
    require(version == 1, s"$path: CDF-$version unsupported (CDF-1 only)")
    b.getInt() // numrecs (no record vars in our layout)
    def readName(): String = {
      val n = b.getInt()
      val s = new Array[Byte](n); b.get(s)
      b.position(b.position() + ((4 - n % 4) % 4)) // 4-byte padding
      new String(s, "UTF-8")
    }
    // tagged list header: (tag, n) with (0, 0) for ABSENT
    def listCount(expectTag: Int): Int = {
      val tag = b.getInt(); val n = b.getInt()
      require(tag == expectTag || (tag == 0 && n == 0),
        s"$path: bad list tag $tag (want $expectTag)")
      n
    }
    val dims = (0 until listCount(0x0A)).map(_ => (readName(), b.getInt()))
    def skipAtts(): Unit = (0 until listCount(0x0C)).foreach { _ =>
      readName()
      val t = b.getInt(); val n = b.getInt()
      val len = n * typeSize(t)
      b.position(b.position() + len + ((4 - len % 4) % 4))
    }
    skipAtts() // global
    val vars = (0 until listCount(0x0B)).map { _ =>
      val name = readName()
      val dimIds = (0 until b.getInt()).map(_ => b.getInt())
      skipAtts()
      Var(name, dimIds, b.getInt(), b.getInt(), b.getInt())
    }
    val byName = vars.map(v => v.name -> v).toMap
    def doubles(v: Var): Array[Double] = {
      require(v.ncType == 6, s"${v.name}: expected NC_DOUBLE")
      val n = v.dimIds.map(dims(_)._2).product
      val bb = java.nio.ByteBuffer.wrap(bytes, v.begin, n * 8)
      Array.fill(n)(bb.getDouble())
    }
    val bands = byName.get("band").map { v =>
      require(v.ncType == 2 && v.dimIds.length == 2,
        "band: expected NC_CHAR matrix")
      val n = dims(v.dimIds.head)._2; val strlen = dims(v.dimIds(1))._2
      (0 until n).map { i =>
        new String(bytes, v.begin + i * strlen, strlen, "UTF-8")
          .takeWhile(_ != '\u0000') // writer zero-pads
      }
    }
    Meta(path, dims, byName, byName.get("time").map(doubles), bands,
      doubles(byName("y")), doubles(byName("x")))
  }

  def readMeta(path: String): Meta =
    readMeta(path, java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))

  /** Parse header + coordinates from a bounded file PREFIX (doubling on
    * underflow) — the header and coordinate variables precede the data
    * plane, so metadata never needs the whole file in memory. */
  def readMetaPrefix(path: String): Meta = {
    val size = java.nio.file.Files.size(java.nio.file.Paths.get(path))
    var n = math.min(size, 65536L).toInt
    var result: Option[Meta] = None
    while (result.isEmpty) {
      val buf = new Array[Byte](n)
      val raf = new java.io.RandomAccessFile(path, "r")
      try raf.readFully(buf, 0, n) finally raf.close()
      try result = Some(readMeta(path, buf))
      catch {
        case e @ (_: java.nio.BufferUnderflowException |
                  _: IndexOutOfBoundsException) =>
          if (n.toLong >= size) throw e
          n = math.min(size, n.toLong * 4).toInt
      }
    }
    result.get
  }

  /** Per-JVM metadata cache keyed by (path, size, mtime) — planning
    * re-resolves metadata on every batch (and every streaming
    * micro-batch); the key invalidates on any rewrite. */
  private val metaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), Meta]()

  def cachedMeta(path: String): Meta = {
    val f = new java.io.File(path)
    metaCache.computeIfAbsent((path, f.length, f.lastModified),
      _ => readMetaPrefix(path))
  }
}
