package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned parquet table with a transaction LOG — the
  * store-management layer a 100 TB corpus needs on top of raw directory
  * stores (the Delta/Iceberg shape, minimal and self-contained).
  *
  * Why a log instead of directory listing:
  *   - ATOMIC commits. A plain `df.write.parquet(dir, append)` exposes
  *     readers to half-written file sets; here data files land first
  *     (invisible — readers only see what a manifest lists) and ONE
  *     manifest create publishes them. A reader never sees a partial
  *     commit.
  *   - SNAPSHOT ISOLATION + TIME TRAVEL. Every commit writes a complete
  *     file listing under a monotonically increasing version; a reader
  *     pins a version and is immune to concurrent appends, overwrites,
  *     even vacuum (until its horizon passes). `read(path, Some(v))`
  *     reproduces any retained historical state bit-for-bit.
  *   - O(1) READ PLANNING. The scan reads exactly the manifest's file
  *     list — no recursive directory listing, which at 100 TB (millions
  *     of objects) dominates planning time on object stores.
  *   - INCREMENTAL CONSUMPTION. `changes(from, to)` reads only the files
  *     ADDED in that version range — a downstream incremental job (index
  *     append, aggregate maintenance — see [[Incremental]]) consumes a
  *     day's commits without rescanning the table.
  *
  * Layout under the table root:
  * {{{
  *   _graft_log/v000000000001.json   one manifest per committed version
  *   data/c-<uuid>/part-*.parquet    one data directory per commit
  * }}}
  *
  * Manifest = complete relative file list (`files`) + this commit's
  * additions (`adds`) + `op` (append|overwrite) + `parent`. Complete
  * lists keep read planning O(1) manifest reads; at extreme commit
  * counts a production format would checkpoint + delta-encode (Delta's
  * `_last_checkpoint`), which changes encoding, not this API.
  *
  * Commit protocol (optimistic concurrency): data files are written
  * UNDER AN UNCOMMITTED directory first, then the writer claims version
  * `latest+1` via `FileSystem.create(path, overwrite=false)` — atomic
  * create-if-absent on HDFS and local filesystems. A lost race throws
  * `FileAlreadyExistsException`; the writer re-reads the new latest,
  * recomputes the merged file list (its data files need no rewrite) and
  * retries the claim. Readers tolerate an in-flight/aborted claim (zero
  * or partial bytes) by stepping down to the newest PARSEABLE manifest,
  * so a crashed writer never wedges the table — its claim file is dead
  * weight the next vacuum sweeps. S3-style stores without atomic create
  * need a CAS commit service (the documented Delta-on-S3 model); same
  * trust scope as the rest of the store tier.
  */
object Snapshots {

  final case class Manifest(version: Long, parent: Long, op: String,
      files: Seq[String], adds: Seq[String])

  private val LogDir = "_graft_log"
  private def manifestName(v: Long): String = f"v$v%012d.json"

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // -------------------------------------------------------------- manifest IO

  /** Tiny driver-side JSON; jackson-databind ships in Spark's jars. */
  private def renderManifest(m: Manifest): Array[Byte] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    root.put("version", m.version)
    root.put("parent", m.parent)
    root.put("op", m.op)
    val fl = root.putArray("files"); m.files.foreach(fl.add)
    val ad = root.putArray("adds"); m.adds.foreach(ad.add)
    om.writeValueAsBytes(root)
  }

  private def parseManifest(bytes: Array[Byte]): Option[Manifest] =
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val n = om.readTree(bytes)
      if (n == null || !n.has("version") || !n.has("files")) None
      else Some(Manifest(
        n.get("version").asLong(), n.get("parent").asLong(-1L),
        n.get("op").asText("append"),
        (0 until n.get("files").size()).map(n.get("files").get(_).asText()),
        if (n.has("adds"))
          (0 until n.get("adds").size()).map(n.get("adds").get(_).asText())
        else Nil))
    } catch { case scala.util.control.NonFatal(_) => None }

  private def readManifest(fs: FileSystem, root: Path,
      v: Long): Option[Manifest] = {
    val p = new Path(new Path(root, LogDir), manifestName(v))
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        parseManifest(out.toByteArray)
      } finally in.close()
    }
  }

  /** All claimed version numbers in the log, committed or not. */
  private def claimedVersions(fs: FileSystem, root: Path): Seq[Long] = {
    val log = new Path(root, LogDir)
    if (!fs.exists(log)) Nil
    else Option(fs.listStatus(log)).getOrElse(Array.empty).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json") }
      .flatMap(s => scala.util.Try(s.toLong).toOption)
  }

  /** Newest PARSEABLE manifest — skips in-flight/aborted claims. */
  def latestManifest(spark: SparkSession, path: String): Option[Manifest] = {
    val fs = fsFor(spark, path); val root = new Path(path)
    claimedVersions(fs, root).sorted.reverse.iterator
      .flatMap(v => readManifest(fs, root, v)).take(1).toSeq.headOption
  }

  /** Committed (version, op, fileCount) history, oldest first. */
  def versions(spark: SparkSession, path: String): Seq[(Long, String, Int)] = {
    val fs = fsFor(spark, path); val root = new Path(path)
    claimedVersions(fs, root).sorted
      .flatMap(v => readManifest(fs, root, v))
      .map(m => (m.version, m.op, m.files.size))
  }

  // ------------------------------------------------------------------ commits

  /** Append `df` as a new version; returns the committed version. */
  def append(df: DataFrame, path: String): Long = commit(df, path, "append")

  /** Replace the table contents with `df` as a new version (prior
    * versions stay time-travel-readable until vacuumed). */
  def overwrite(df: DataFrame, path: String): Long =
    commit(df, path, "overwrite")

  /** Maintenance OPTIMIZE, inside the log: rewrite the current snapshot
    * into `numFiles` files — optionally Z-ORDER clustered over
    * `zorderBy` dims via [[graft.functions.ZOrder]]'s codegen Morton
    * key, so every clustered dim's min/max span is bounded per file and
    * later scans data-skip — committed as a NEW version with
    * `op = "optimize"`. Readers of prior versions are untouched (their
    * files only retire at vacuum), a concurrent reader of the log never
    * sees a half-rewritten table, and [[changes]] SKIPS optimize commits
    * (same rows, new layout — an incremental consumer must not re-ingest
    * the whole table because maintenance ran). Quantization steps for
    * the Z-key: each entry is (column, min, max) on `zBits`-bit grids,
    * `ZOrder.quantize`'s IEEE-portable mapping. */
  def optimize(spark: SparkSession, path: String, numFiles: Int,
      zorderBy: Seq[(String, Double, Double)] = Nil, zBits: Int = 16): Long = {
    require(numFiles > 0, "numFiles must be positive")
    val cur = read(spark, path)
    val rewritten =
      if (zorderBy.isEmpty) cur.repartition(numFiles)
      else graft.functions.ZOrder.clusterByZ(cur, zorderBy, zBits,
        numFiles)
    commit(rewritten, path, "optimize")
  }

  private def commit(df: DataFrame, path: String, op: String,
      maxRetries: Int = 20): Long = {
    require(op == "append" || op == "overwrite" || op == "optimize",
      s"unknown op $op")
    val spark = df.sparkSession
    val fs = fsFor(spark, path); val root = new Path(path)
    // 1) data files land in an uncommitted per-commit directory: the
    //    DISTRIBUTED part of the commit, paid once even across retries.
    val commitDir = s"data/c-${java.util.UUID.randomUUID().toString.take(12)}"
    df.write.parquet(new Path(root, commitDir).toString)
    val adds = Option(fs.listStatus(new Path(root, commitDir)))
      .getOrElse(Array.empty).toSeq
      .collect { case s if s.isFile && s.getPath.getName.endsWith(".parquet")
        => s"$commitDir/${s.getPath.getName}" }
      .sorted
    // 2) claim the next version with an atomic create-if-absent; on a
    //    lost race, re-read latest and retry (driver-side only).
    var attempt = 0
    while (true) {
      val parent = latestManifest(spark, path)
      val claimed = claimedVersions(fs, root)
      val next = math.max(parent.map(_.version).getOrElse(0L),
        if (claimed.isEmpty) 0L else claimed.max) + 1
      // overwrite AND optimize replace the snapshot's file list; only
      // append extends it (optimize = same rows, new layout)
      val files =
        if (op == "append") parent.map(_.files).getOrElse(Nil) ++ adds
        else adds
      val m = Manifest(next, parent.map(_.version).getOrElse(0L), op,
        files, adds)
      val dest = new Path(new Path(root, LogDir), manifestName(next))
      fs.mkdirs(new Path(root, LogDir))
      try {
        // atomic claim: HDFS create(overwrite=false) is atomic; the local
        // FS one is check-then-create, so route local through O_EXCL
        val out: java.io.OutputStream = fs match {
          case _: org.apache.hadoop.fs.LocalFileSystem |
               _: org.apache.hadoop.fs.RawLocalFileSystem =>
            java.nio.file.Files.newOutputStream(
              java.nio.file.Paths.get(dest.toUri.getPath),
              java.nio.file.StandardOpenOption.CREATE_NEW,
              java.nio.file.StandardOpenOption.WRITE)
          case _ => fs.create(dest, false)
        }
        try out.write(renderManifest(m)) finally out.close()
        return next
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: java.io.IOException =>
          attempt += 1
          if (attempt > maxRetries) throw new IllegalStateException(
            s"snapshot commit lost $maxRetries races at $path; giving up")
      }
    }
    -1L // unreachable
  }

  // -------------------------------------------------------------------- reads

  private def requireManifest(spark: SparkSession, path: String,
      version: Option[Long]): Manifest = version match {
    case Some(v) =>
      readManifest(fsFor(spark, path), new Path(path), v).getOrElse(
        throw new IllegalArgumentException(
          s"snapshot version $v does not exist (or was vacuumed) at $path"))
    case None => latestManifest(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $path"))
  }

  /** Read a pinned version (default: latest). The scan's file list IS the
    * manifest — no data-directory listing, stable under concurrent
    * commits. An empty snapshot needs a schema to make a DataFrame, so
    * empty manifests raise (callers of time-travel know their v ≥ 1). */
  def read(spark: SparkSession, path: String,
      version: Option[Long] = None): DataFrame = {
    val m = requireManifest(spark, path, version)
    require(m.files.nonEmpty,
      s"snapshot version ${m.version} at $path lists no files")
    val root = new Path(path)
    spark.read.parquet(m.files.map(f => new Path(root, f).toString): _*)
  }

  /** Rows ADDED in versions (fromExclusive, toInclusive] — the
    * incremental-consumption read. Overwrite commits contribute their
    * adds too (their retirements are a delete signal this append-level
    * CDC does not carry; pair with [[TableJoins.applyChangelog]] for
    * row-level merge semantics). OPTIMIZE commits are SKIPPED: their
    * adds are the whole table in a new layout, and an incremental
    * consumer must not re-ingest everything because maintenance ran. */
  def changes(spark: SparkSession, path: String, fromExclusive: Long,
      toInclusive: Long): DataFrame = {
    require(fromExclusive < toInclusive, "empty version range")
    val fs = fsFor(spark, path); val root = new Path(path)
    val adds = (fromExclusive + 1 to toInclusive).flatMap { v =>
      val m = readManifest(fs, root, v).getOrElse(
        throw new IllegalArgumentException(
          s"snapshot version $v does not exist (or was vacuumed) at $path"))
      if (m.op == "optimize") Nil else m.adds
    }
    require(adds.nonEmpty,
      s"no data-changing files added in ($fromExclusive, $toInclusive]")
    spark.read.parquet(adds.map(f => new Path(root, f).toString): _*)
  }

  // ------------------------------------------------------------------- vacuum

  /** Retention sweep: drop manifests with version < keepFromVersion and
    * delete every data file no RETAINED manifest references (aborted
    * claims too). Time travel to vacuumed versions then raises; retained
    * reads are untouched. Returns deleted data-file count. Run from a
    * maintenance window like [[Compaction.compactDirectory]]: a reader
    * pinned to a version older than the horizon loses its files. */
  def vacuum(spark: SparkSession, path: String, keepFromVersion: Long): Long = {
    val fs = fsFor(spark, path); val root = new Path(path)
    val all = claimedVersions(fs, root).sorted
    val retained = all.filter(_ >= keepFromVersion)
    require(retained.exists(v => readManifest(fs, root, v).isDefined),
      s"vacuum would retire every committed version at $path")
    val referenced: Set[String] = retained
      .flatMap(v => readManifest(fs, root, v)).flatMap(_.files).toSet
    // delete unreferenced data files (listing data/ is the one full
    // listing vacuum pays — it is the op whose JOB is the full sweep)
    var deleted = 0L
    val dataDir = new Path(root, "data")
    if (fs.exists(dataDir)) {
      Option(fs.listStatus(dataDir)).getOrElse(Array.empty).foreach { cd =>
        if (cd.isDirectory) {
          val files = Option(fs.listStatus(cd.getPath)).getOrElse(Array.empty)
          var kept = false
          files.foreach { f =>
            val rel = s"data/${cd.getPath.getName}/${f.getPath.getName}"
            if (f.isFile && f.getPath.getName.endsWith(".parquet") &&
                !referenced.contains(rel)) {
              fs.delete(f.getPath, false); deleted += 1
            } else kept = true
          }
          if (!kept) fs.delete(cd.getPath, true)
        }
      }
    }
    all.filter(_ < keepFromVersion).foreach { v =>
      fs.delete(new Path(new Path(root, LogDir), manifestName(v)), false) }
    deleted
  }
}
