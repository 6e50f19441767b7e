package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for our CDF-1 NetCDF renditions —
  * `spark.read.format("graft-netcdf").load(path)` (a `.nc` file or a
  * directory of them), the cluster-grade read path that the driver-side
  * [[graft.ops.Scan.loadResultNetcdf]] collect cannot be:
  *
  *  - '''plane-level parallelism''': each (file, time, band) plane is
  *    its own [[InputPartition]] — a directory of job outputs fans out
  *    across the cluster, and each task reads ONLY its plane's byte
  *    range (offsets from the header, never the whole file into rows).
  *  - '''partition-pruning filter pushdown''': `band = / IN` and
  *    `time` comparisons prune whole planes at PLANNING time (band and
  *    time are per-plane constants, so the pushdown is exact and the
  *    filters never need re-evaluation). The pin is physical:
  *    `df.rdd.getNumPartitions` drops with the filter.
  *  - '''column pruning''': the reader materializes only the pruned
  *    schema — a `value`-only aggregation never decodes band strings
  *    or builds timestamp columns.
  *
  * The openEO surface consumes cubes as long-form rows, which is
  * exactly this table's shape: time?, band?, y, x, value(float) with
  * NaN fill cells dropped (the writer's absent-cell encoding).
  *
  * '''Filesystem scope''': listing and reads go through `java.io.File`
  * / `RandomAccessFile`, so the load path must be a LOCAL or shared
  * POSIX mount (NFS/Lustre/local disk) visible under the same path on
  * the driver (planning) and every executor (partition reads). HDFS/S3
  * URIs are not supported by this source — stage such files to a mount,
  * or use the parquet cube stores, whose reads go through the Hadoop
  * FileSystem API. This matches the deployment shape of the reference,
  * whose job outputs live on a shared result volume. */
final class NetcdfTableProvider extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-netcdf"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val raw = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-netcdf: missing path"))
    NetcdfTable.schemaOf(Netcdf.readMeta(
      NetcdfTable.listFiles(raw).headOption.getOrElse(
        throw new IllegalArgumentException("graft-netcdf: no .nc files"))))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new NetcdfTable(new CaseInsensitiveStringMap(properties).get("path"),
      schema)

  override def supportsExternalMetadata(): Boolean = false
}

object NetcdfTable {
  /** Resolve the load path to .nc files — re-evaluated per streaming
    * micro-batch so newly arrived files are discovered.
    * `listFiles()` returns null for an unreadable or vanished directory
    * (a race a streaming re-list can hit) — treat that as a typed error,
    * not an NPE from deep inside planning. */
  def listFiles(rawPath: String): Seq[String] = {
    val f = new java.io.File(rawPath)
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(throw new IllegalArgumentException(
          s"graft-netcdf: cannot list directory $rawPath " +
            "(unreadable or removed)"))
        .filter(_.getName.endsWith(".nc")).map(_.getPath)
        .sorted.toSeq
    else if (f.isFile) Seq(rawPath)
    else throw new IllegalArgumentException(
      s"graft-netcdf: path $rawPath does not exist")
  }

  def schemaOf(m: Netcdf.Meta): StructType = StructType(
    m.times.map(_ => StructField("time", TimestampType)).toSeq ++
      m.bands.map(_ => StructField("band", StringType)).toSeq ++ Seq(
      StructField("y", DoubleType), StructField("x", DoubleType),
      StructField("value", FloatType)))
}

final class NetcdfTable(rawPath: String, schema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graft-netcdf($rawPath)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NetcdfScanBuilder(rawPath, schema)
}

final class NetcdfScanBuilder(rawPath: String, full: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = full

  /** Accept exactly the filters that prune whole planes: band equality
    * and time comparisons (both per-plane constants — pruning is exact,
    * so accepted filters need no post-scan re-evaluation). Everything
    * else (y/x/value predicates) stays with Spark. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accept, residual) = filters.partition {
      case EqualTo("band", _: String) => true
      case In("band", vs) => vs.forall(_.isInstanceOf[String])
      case EqualTo("time", _) | GreaterThan("time", _) |
           GreaterThanOrEqual("time", _) | LessThan("time", _) |
           LessThanOrEqual("time", _) => true
      case _ => false
    }
    pushed = accept
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new NetcdfScan(rawPath, required, pushed)
}

final class NetcdfScan(rawPath: String, required: StructType,
    pushed: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(
      checkpointLocation: String): org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new NetcdfMicroBatchStream(rawPath, required, pushed, this)
  override def description(): String =
    s"graft-netcdf PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  private def timeBoundMicros(v: Any): Long = v match {
    case t: java.sql.Timestamp => t.getTime * 1000 + (t.getNanos / 1000) % 1000
    case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000
    case other => throw new IllegalArgumentException(
      s"graft-netcdf: time literal $other")
  }

  /** Plane partitions for a file set, after pushed-filter pruning —
    * shared by the batch path (current listing) and each streaming
    * micro-batch (that batch's new files). */
  def planesFor(files: Seq[String]): Array[InputPartition] = {
    // intersect ALL pushed band predicates: pushFilters accepted every
    // one of them (none re-evaluated post-scan), so honoring only the
    // first would silently widen the result
    val bandEq: Option[Set[String]] = pushed.collect {
      case EqualTo("band", v: String) => Set(v)
      case In("band", vs) => vs.map(_.toString).toSet
    }.reduceOption(_ intersect _)
    files.iterator.flatMap { p =>
      val m = Netcdf.cachedMeta(p)
      m.requireFloatPlane() // fail at PLANNING, not mid-task
      for {
        t <- (0 until m.nT).iterator
        if m.times.isEmpty || pushed.forall {
          case EqualTo("time", v) => m.timeMicros(t) == timeBoundMicros(v)
          case GreaterThan("time", v) => m.timeMicros(t) > timeBoundMicros(v)
          case GreaterThanOrEqual("time", v) =>
            m.timeMicros(t) >= timeBoundMicros(v)
          case LessThan("time", v) => m.timeMicros(t) < timeBoundMicros(v)
          case LessThanOrEqual("time", v) =>
            m.timeMicros(t) <= timeBoundMicros(v)
          case _ => true
        }
        b <- 0 until m.nB
        if m.bands.isEmpty || bandEq.forall(_.contains(m.bands.get(b)))
      } yield NetcdfInputPartition(p, t, b): InputPartition
    }.toArray
  }

  override def planInputPartitions(): Array[InputPartition] =
    planesFor(NetcdfTable.listFiles(rawPath))

  override def createReaderFactory(): PartitionReaderFactory =
    new NetcdfReaderFactory(required)
}

final case class NetcdfInputPartition(path: String, t: Int, b: Int)
  extends InputPartition

final class NetcdfReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[NetcdfInputPartition]
    new NetcdfPartitionReader(part, required)
  }

  // vectorized path: the scan emits ColumnarBatch, so Spark plans a
  // ColumnarToRow boundary and whole-stage codegen consumes the vectors
  // exactly as it does for Parquet — no per-cell InternalRow allocation
  override def supportColumnarReads(p: InputPartition): Boolean = true

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    val part = p.asInstanceOf[NetcdfInputPartition]
    new NetcdfColumnarReader(part, required)
  }
}

/** Columnar plane reader: the plane's non-NaN cells stream into
  * on-heap column vectors in batches of up to 4096 rows. Per-plane
  * constants (time micros, band name) fill via putLongs/putByteArray;
  * coordinates and values are primitive puts — nothing boxes. */
final class NetcdfColumnarReader(part: NetcdfInputPartition,
    required: StructType)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.ColumnarBatch

  private val meta = Netcdf.cachedMeta(part.path)
  meta.requireFloatPlane()
  private val nY = meta.ys.length; private val nX = meta.xs.length
  private val buf = {
    val plane = new Array[Byte](nY * nX * 4)
    val raf = new java.io.RandomAccessFile(part.path, "r")
    try {
      raf.seek(meta.cellOffset(part.t, part.b, 0, 0).toLong)
      raf.readFully(plane)
    } finally raf.close()
    java.nio.ByteBuffer.wrap(plane)
  }
  private val timeMicros: Long =
    if (meta.times.isDefined) meta.timeMicros(part.t) else 0L
  private val bandBytes: Array[Byte] =
    meta.bands.map(_(part.b).getBytes("UTF-8")).getOrElse(Array.emptyByteArray)
  private val BatchSize = 4096

  private var idx = 0 // next plane cell to inspect
  private var batch: ColumnarBatch = null

  override def next(): Boolean = {
    if (batch != null) { batch.close(); batch = null }
    if (idx >= nY * nX) return false
    val vectors = OnHeapColumnVector.allocateColumns(BatchSize, required)
    var n = 0
    while (n < BatchSize && idx < nY * nX) {
      val v = buf.getFloat(idx * 4)
      if (!v.isNaN) {
        val y = idx / nX; val x = idx % nX
        var c = 0
        while (c < required.fields.length) {
          required.fields(c).name match {
            case "time" => vectors(c).putLong(n, timeMicros)
            case "band" =>
              vectors(c).putByteArray(n, bandBytes, 0, bandBytes.length)
            case "y" => vectors(c).putDouble(n, meta.ys(y))
            case "x" => vectors(c).putDouble(n, meta.xs(x))
            case "value" => vectors(c).putFloat(n, v)
            case other => throw new IllegalArgumentException(
              s"graft-netcdf: unknown column $other")
          }
          c += 1
        }
        n += 1
      }
      idx += 1
    }
    if (n == 0) { vectors.foreach(_.close()); false }
    else {
      batch = new ColumnarBatch(
        vectors.map(v2 => v2: org.apache.spark.sql.vectorized.ColumnVector),
        n)
      true
    }
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = if (batch != null) { batch.close() }
}

/** Reads ONE (time, band) plane: a bounded header/coordinate prefix
  * parse (cached per JVM) plus ONE positioned read of exactly the
  * plane's nY×nX×4 bytes — never the whole file — skipping NaN fills
  * and materializing only the pruned columns. */
final class NetcdfPartitionReader(part: NetcdfInputPartition,
    required: StructType) extends PartitionReader[InternalRow] {

  private val meta = Netcdf.cachedMeta(part.path)
  meta.requireFloatPlane()
  private val nY = meta.ys.length; private val nX = meta.xs.length
  private val buf = {
    val plane = new Array[Byte](nY * nX * 4)
    val raf = new java.io.RandomAccessFile(part.path, "r")
    try {
      raf.seek(meta.cellOffset(part.t, part.b, 0, 0).toLong)
      raf.readFully(plane)
    } finally raf.close()
    java.nio.ByteBuffer.wrap(plane)
  }
  // pruned-column emitters resolved ONCE per partition, not per row
  private val emitters: Array[(Int, Int, Float) => Any] =
    required.fields.map(_.name match {
      case "time" =>
        val tm = meta.timeMicros(part.t); (_: Int, _: Int, _: Float) => tm
      case "band" =>
        val bn = UTF8String.fromString(meta.bands.get(part.b))
        (_: Int, _: Int, _: Float) => bn
      case "y" => (y: Int, _: Int, _: Float) => meta.ys(y)
      case "x" => (_: Int, x: Int, _: Float) => meta.xs(x)
      case "value" => (_: Int, _: Int, v: Float) => v
      case other => throw new IllegalArgumentException(
        s"graft-netcdf: unknown column $other")
    })

  private var idx = -1
  private var curY = 0; private var curX = 0; private var curV = 0f

  override def next(): Boolean = {
    var found = false
    while (!found && idx + 1 < nY * nX) {
      idx += 1
      val v = buf.getFloat(idx * 4) // plane-local offsets
      if (!v.isNaN) { curY = idx / nX; curX = idx % nX; curV = v; found = true }
    }
    found
  }

  override def get(): InternalRow =
    InternalRow.fromSeq(emitters.toSeq.map(_(curY, curX, curV)))

  override def close(): Unit = ()
}

/** Streaming offset: the SET of consumed files, JSON-encoded. New `.nc`
  * files appearing in the directory form the next micro-batch (set
  * difference) — arrival-order-independent, so a file that sorts before
  * already-consumed names is still picked up exactly once. Spark's own
  * FileStreamSource keeps the same kind of seen-files log; at this
  * source's scale (job outputs, not event streams) the offset stays
  * small. */
final case class NetcdfFilesOffset(files: Seq[String])
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.createArrayNode()
    files.sorted.foreach(arr.add)
    mapper.writeValueAsString(arr)
  }
}

object NetcdfFilesOffset {
  def fromJson(json: String): NetcdfFilesOffset = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    NetcdfFilesOffset((0 until node.size()).map(node.get(_).asText()))
  }
}

/** Micro-batch stream over a directory of CDF-1 files: each batch is
  * the newly arrived files' (time, band) planes, pruned by the same
  * pushed filters as the batch path. */
final class NetcdfMicroBatchStream(rawPath: String, required: StructType,
    pushed: Array[Filter], scan: NetcdfScan)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {

  import org.apache.spark.sql.connector.read.streaming.Offset

  override def initialOffset(): Offset = NetcdfFilesOffset(Nil)

  override def latestOffset(): Offset =
    NetcdfFilesOffset(NetcdfTable.listFiles(rawPath))

  override def deserializeOffset(json: String): Offset =
    NetcdfFilesOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[NetcdfFilesOffset].files.toSet
    val now = end.asInstanceOf[NetcdfFilesOffset].files
    scan.planesFor(now.filterNot(seen).sorted)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NetcdfReaderFactory(required)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
