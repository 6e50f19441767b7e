package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  *   - DATA SKIPPING. Each commit records per-file column MIN/MAX stats
  *     (one column-pruned pass over just the new files, Spark ordering
  *     semantics — see [[scanWhere]]); a filtered scan prunes files
  *     whose stats cannot satisfy the predicate BEFORE any data I/O,
  *     and the exact predicate stays on the surviving scan (safe
  *     superset, the same contract as the tile-pruned cube stores).
  *   - ROW-LEVEL MERGE/DELETE, copy-on-write. [[merge]] (upsert by key)
  *     and [[delete]] (predicate) rewrite ONLY the files that contain
  *     affected rows — stats pre-prune the candidate set, an exact
  *     match pass picks the touched files, untouched files carry over
  *     into the new manifest unmoved.
  *
  * Layout under the table root:
  * {{{
  *   _graft_log/v000000000001.json            one DELTA manifest per commit
  *   _graft_log/v000000000010.checkpoint.json derived full snapshot, every
  *                                            CheckpointInterval versions
  *   data/c-<uuid>/part-*.parquet             one data directory per commit
  * }}}
  *
  * Manifests are DELTAS (this commit's `adds`, `removes`, per-ADD
  * stats, schema, txn marks, `op`, `parent`), so commit METADATA is
  * O(change) — a single-file append to a million-file table writes a
  * few hundred bytes of log, not a million-entry listing. Reads resolve
  * the full snapshot by folding from the newest CHECKPOINT at-or-below
  * the pinned version (Delta's log-compaction shape): the fold is
  * bounded by the checkpoint interval, so planning stays O(interval)
  * small log reads no matter how many commits the table has seen.
  * Checkpoints are DERIVED, deterministic files — any writer may
  * (re)create one, deleting one only lengthens the next fold, and
  * vacuum materializes one at the horizon before retiring the manifests
  * a retained version's chain would otherwise need.
  *
  * Commit protocol (optimistic concurrency): data files are written
  * UNDER AN UNCOMMITTED directory first; the manifest is then fully
  * written to a hidden temp file and PUBLISHED by one atomic
  * create-if-absent primitive (hard link on local filesystems, where
  * `link(2)` fails if the destination exists; no-overwrite rename on
  * HDFS) — so a visible manifest is ALWAYS complete, and a concurrent
  * writer can never observe (and jump past) a half-written claim,
  * which would orphan its rows. A lost race re-reads the new latest,
  * recomputes the delta (its data files need no rewrite) and retries
  * the publish; a failure BEFORE the publish retries safely because
  * the claim never became visible. APPEND and OVERWRITE commute with
  * any concurrent commit and always retry; MERGE, DELETE, UPDATE, and
  * OPTIMIZE read the snapshot they rewrite, so they carry the expected
  * parent version and FAIL with `ConcurrentModificationException` if
  * another data change landed first (Delta's conflict-detection rule).
  * An unparseable vNNN.json can only mean external corruption: writers
  * skip past it and readers step down to the newest PARSEABLE
  * manifest, so a corrupted claim never wedges the table — it is dead
  * weight the next vacuum sweeps. S3-style stores without atomic
  * create/link need a CAS commit service (the documented Delta-on-S3
  * model); same trust scope as the rest of the store tier.
  */
object Snapshots extends org.apache.spark.internal.Logging {

  /** Per-column min/max for one file. `t` is "n" (numeric — longs,
    * doubles, timestamps as epoch micros, dates as epoch days, all
    * compared as Double with >2^53 longs widened one ulp outward) or
    * "s" (string, compared by UTF-8 bytes like Spark). A `None` bound is
    * unknown/unbounded (e.g. a >64-char string max, where a truncated
    * prefix would be an INVALID upper bound) and never prunes. */
  final case class ColStat(t: String, min: Option[String], max: Option[String])

  /** Per-file stats. `parts` records EXACT partition values for files
    * written by a partitioned commit ([[append(df,path,partitionBy)*]]):
    * every row in the file has column c == parts(c) (path-rendered,
    * unescaped). Unlike min/max ranges this is set-membership, so
    * `c = v` / `c IN (...)` predicates prune files exactly — the
    * min/max-range weakness for high-cardinality categorical columns
    * (an IN-list collapses to [min,max] and keeps everything in
    * between) does not apply. Because partitionBy is TABLE metadata
    * inherited by every commit, CoW/optimize rewrites of a partitioned
    * table DO re-record exact partition values (they write __gp_ dirs
    * under the inherited layout); only files of an unpartitioned table
    * and rows in the null partition lack them — those never part-prune,
    * conservative superset, as with all stats here. */
  /** `bytes` is the file's on-disk length (0 = unknown, pre-r9
    * manifests): real byte sizes feed the V2 planner statistics
    * (broadcast decisions) and size-targeted OPTIMIZE without a single
    * filesystem stat at plan time. */
  /** `blooms`: per-column BLOOM FILTER for equality file-skipping on
    * columns min/max cannot prune (unsorted high-cardinality keys —
    * the point-lookup story). Value is `<tag>:<base64>` where tag is
    * `l` (integral, hashed as LONG) or `s` (string) and the payload is
    * a [[graft.functions.BitmapExprs.LongBitmap]] over k=2 double-
    * hashed positions mod 2^16 — compressed, canonical, and mergeable
    * with the same machinery as the sketch tier. Opt-in per session
    * via [[BloomColumnsKey]]; ~KBs per (file, column). */
  final case class FileStats(rows: Long, cols: Map[String, ColStat],
      parts: Map[String, String] = Map.empty, bytes: Long = 0L,
      blooms: Map[String, String] = Map.empty)

  /** Merge-on-read DELETION VECTOR reference for one data file (the
    * Delta/Iceberg v2 position-delete shape): `path` is the
    * table-relative parquet dataset holding deleted ROW POSITIONS
    * (columns `__gfile` = data-file relative path, `__gpos` = 0-based
    * row index within that file, laid out one `__gb=<basename>`
    * partition directory per covered file so a single file's positions
    * read without scanning the whole commit's vector), `n` that file's
    * deleted-position count — recorded in the LOG so metadata COUNT(*)
    * and LIMIT planning stay exact without reading any vector. One
    * delete-dv commit writes ONE dataset covering every file it
    * touched; a later deleteMor on the same file writes a new
    * superseding vector carrying the union, so the newest entry per
    * file is always authoritative and complete. */
  final case class Dv(path: String, n: Long)

  /** One log record. Manifests are DELTAS: `adds`/`removes` against the
    * parent (append-family ops), or a whole-snapshot replacement
    * (overwrite/optimize — `adds` IS the new file list, nothing else
    * survives), so commit metadata is O(change), never O(table). A
    * manifest that carries `files` (pre-delta format, or a log whose
    * writer chose to inline) is self-checkpointing. `stats` covers the
    * `adds` only. */
  final case class Manifest(version: Long, parent: Long, op: String,
      adds: Seq[String], removes: Seq[String] = Nil,
      files: Option[Seq[String]] = None,
      stats: Map[String, FileStats] = Map.empty,
      schemaJson: Option[String] = None,
      txns: Map[String, Long] = Map.empty,
      partitionBy: Seq[String] = Nil,
      dvs: Map[String, Dv] = Map.empty,
      ts: Long = 0L,
      constraints: Map[String, String] = Map.empty,
      // row-level CDC sidecar (the Delta `_change_data` model): parquet
      // files under _change_data/ carrying the commit's exact row
      // changes (data columns + `_change_type`), written BY THE WRITER
      // where both sides of a CoW rewrite are already in the plan —
      // the feed then reads O(change) with no diffing. `fullRemoves`
      // lists removed files whose EVERY live row is a delete
      // (replaceWhere's metadata-only partition drops): the reader
      // synthesizes their rows as deletes per-file, so the write-side
      // fast path never has to read bytes it otherwise wouldn't.
      cdc: Seq[String] = Nil,
      fullRemoves: Seq[String] = Nil)

  /** A RESOLVED snapshot: the complete file list + stats at a version,
    * folded from the newest checkpoint at-or-below it plus the delta
    * manifests after. This is what reads plan from. */
  final case class Snapshot(version: Long, op: String,
      files: Seq[String], stats: Map[String, FileStats],
      schemaJson: Option[String], txns: Map[String, Long],
      dvs: Map[String, Dv] = Map.empty)

  private val LogDir = "_graft_log"
  /** Write a full checkpoint every this many versions: resolution folds
    * at most this many delta manifests, commit metadata stays O(change),
    * and the periodic checkpoint is O(table) paid 1/interval of the
    * time (Delta's log-compaction ratio). Checkpoint files are DERIVED,
    * deterministic data — any writer may (re)create one, losing one is
    * only a fold-length regression. */
  private val CheckpointInterval = 10L
  /** Session override for the checkpoint cadence (round-13: the 10⁴-
    * commit probe showed planning cost is bounded by the interval, so
    * high-frequency streaming writers can trade checkpoint write
    * amplification against fold length). Values < 1 fall back to the
    * default. */
  val CheckpointIntervalKey = "spark.graft.snapshot.checkpointInterval"
  private def checkpointIntervalOf(spark: SparkSession): Long =
    spark.conf.getOption(CheckpointIntervalKey)
      .flatMap(v => scala.util.Try(v.toLong).toOption)
      .filter(_ >= 1L).getOrElse(CheckpointInterval)
  private def manifestName(v: Long): String = f"v$v%012d.json"
  private def checkpointName(v: Long): String = f"v$v%012d.checkpoint.json"
  private val ManifestRe = """v(\d{12})\.json""".r
  private val CheckpointRe = """v(\d{12})\.checkpoint\.json""".r

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // -------------------------------------------------------------- manifest IO

  private type JNode = com.fasterxml.jackson.databind.JsonNode
  private type JObj = com.fasterxml.jackson.databind.node.ObjectNode

  private def putStats(root: JObj, stats: Map[String, FileStats]): Unit =
    if (stats.nonEmpty) {
      val st = root.putObject("stats")
      stats.foreach { case (f, fs) =>
        val fn = st.putObject(f)
        fn.put("rows", fs.rows)
        val cols = fn.putObject("cols")
        fs.cols.foreach { case (c, cs) =>
          val cn = cols.putObject(c)
          cn.put("t", cs.t)
          cs.min.foreach(cn.put("min", _))
          cs.max.foreach(cn.put("max", _))
        }
        if (fs.parts.nonEmpty) {
          val pn = fn.putObject("parts")
          fs.parts.foreach { case (c, v) => pn.put(c, v) }
        }
        if (fs.bytes > 0) fn.put("bytes", fs.bytes)
        if (fs.blooms.nonEmpty) {
          val bn = fn.putObject("blooms")
          fs.blooms.foreach { case (c, v) => bn.put(c, v) }
        }
      }
    }

  private def getStats(n: JNode): Map[String, FileStats] =
    if (!n.has("stats")) Map.empty
    else {
      val st = n.get("stats")
      val it = st.fieldNames()
      val b = Map.newBuilder[String, FileStats]
      while (it.hasNext) {
        val f = it.next(); val fn = st.get(f)
        val cols = Map.newBuilder[String, ColStat]
        if (fn.has("cols")) {
          val cit = fn.get("cols").fieldNames()
          while (cit.hasNext) {
            val c = cit.next(); val cn = fn.get("cols").get(c)
            cols += c -> ColStat(cn.get("t").asText(),
              if (cn.has("min")) Some(cn.get("min").asText()) else None,
              if (cn.has("max")) Some(cn.get("max").asText()) else None)
          }
        }
        val parts = Map.newBuilder[String, String]
        if (fn.has("parts")) {
          val pit = fn.get("parts").fieldNames()
          while (pit.hasNext) {
            val c = pit.next(); parts += c -> fn.get("parts").get(c).asText()
          }
        }
        val blooms = Map.newBuilder[String, String]
        if (fn.has("blooms")) {
          val bit = fn.get("blooms").fieldNames()
          while (bit.hasNext) {
            val c = bit.next()
            blooms += c -> fn.get("blooms").get(c).asText()
          }
        }
        b += f -> FileStats(fn.get("rows").asLong(0L), cols.result(),
          parts.result(),
          if (fn.has("bytes")) fn.get("bytes").asLong(0L) else 0L,
          blooms.result())
      }
      b.result()
    }

  private def putDvs(root: JObj, dvs: Map[String, Dv]): Unit =
    if (dvs.nonEmpty) {
      val dn = root.putObject("dvs")
      dvs.foreach { case (f, dv) =>
        val e = dn.putObject(f)
        e.put("p", dv.path); e.put("n", dv.n)
      }
    }

  private def getDvs(n: JNode): Map[String, Dv] =
    if (!n.has("dvs")) Map.empty
    else {
      val dn = n.get("dvs"); val it = dn.fieldNames()
      val b = Map.newBuilder[String, Dv]
      while (it.hasNext) {
        val f = it.next(); val e = dn.get(f)
        b += f -> Dv(e.get("p").asText(), e.get("n").asLong(0L))
      }
      b.result()
    }

  private def getStrings(n: JNode, field: String): Seq[String] =
    if (!n.has(field)) Nil
    else (0 until n.get(field).size()).map(n.get(field).get(_).asText())

  private def getStringMap(n: JNode, field: String): Map[String, String] =
    if (!n.has(field)) Map.empty
    else {
      val o = n.get(field); val it = o.fieldNames()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) {
        val k = it.next(); b += k -> o.get(k).asText()
      }
      b.result()
    }

  private def getTxns(n: JNode): Map[String, Long] =
    if (!n.has("txns")) Map.empty
    else {
      val tx = n.get("txns"); val it = tx.fieldNames()
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) {
        val app = it.next(); b += app -> tx.get(app).asLong()
      }
      b.result()
    }

  /** Tiny driver-side JSON; jackson-databind ships in Spark's jars. */
  private def renderManifest(m: Manifest): Array[Byte] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    root.put("version", m.version)
    root.put("parent", m.parent)
    root.put("op", m.op)
    val ad = root.putArray("adds"); m.adds.foreach(ad.add)
    if (m.removes.nonEmpty) {
      val rm = root.putArray("removes"); m.removes.foreach(rm.add)
    }
    m.files.foreach { fl =>
      val f = root.putArray("files"); fl.foreach(f.add)
    }
    m.schemaJson.foreach(root.put("schema", _))
    if (m.txns.nonEmpty) {
      val tx = root.putObject("txns")
      m.txns.foreach { case (app, id) => tx.put(app, id) }
    }
    if (m.partitionBy.nonEmpty) {
      val pb = root.putArray("partitionBy"); m.partitionBy.foreach(pb.add)
    }
    putStats(root, m.stats)
    putDvs(root, m.dvs)
    if (m.ts > 0L) root.put("ts", m.ts)
    if (m.constraints.nonEmpty) {
      val cn = root.putObject("constraints")
      m.constraints.foreach { case (k, v) => cn.put(k, v) }
    }
    if (m.cdc.nonEmpty) {
      val cd = root.putArray("cdc"); m.cdc.foreach(cd.add)
    }
    if (m.fullRemoves.nonEmpty) {
      val fr = root.putArray("fullRemoves"); m.fullRemoves.foreach(fr.add)
    }
    om.writeValueAsBytes(root)
  }

  private def parseManifest(bytes: Array[Byte]): Option[Manifest] =
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val n = om.readTree(bytes)
      if (n == null || !n.has("version") ||
          !(n.has("adds") || n.has("files"))) None
      else Some(Manifest(
        n.get("version").asLong(), n.get("parent").asLong(-1L),
        n.get("op").asText("append"),
        getStrings(n, "adds"),
        getStrings(n, "removes"),
        if (n.has("files")) Some(getStrings(n, "files")) else None,
        getStats(n),
        if (n.has("schema")) Some(n.get("schema").asText()) else None,
        getTxns(n),
        getStrings(n, "partitionBy"),
        getDvs(n),
        if (n.has("ts")) n.get("ts").asLong(0L) else 0L,
        getStringMap(n, "constraints"),
        getStrings(n, "cdc"),
        getStrings(n, "fullRemoves")))
    } catch { case scala.util.control.NonFatal(_) => None }

  private def renderCheckpoint(s: Snapshot): Array[Byte] = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = om.createObjectNode()
    root.put("version", s.version)
    root.put("op", s.op)
    val fl = root.putArray("files"); s.files.foreach(fl.add)
    s.schemaJson.foreach(root.put("schema", _))
    if (s.txns.nonEmpty) {
      val tx = root.putObject("txns")
      s.txns.foreach { case (app, id) => tx.put(app, id) }
    }
    putStats(root, s.stats)
    putDvs(root, s.dvs)
    om.writeValueAsBytes(root)
  }

  private def parseCheckpoint(bytes: Array[Byte]): Option[Snapshot] =
    try {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val n = om.readTree(bytes)
      if (n == null || !n.has("version") || !n.has("files")) None
      else Some(Snapshot(
        n.get("version").asLong(), n.get("op").asText("append"),
        getStrings(n, "files"), getStats(n),
        if (n.has("schema")) Some(n.get("schema").asText()) else None,
        getTxns(n),
        getDvs(n)))
    } catch { case scala.util.control.NonFatal(_) => None }

  private def readLogBytes(fs: FileSystem, p: Path): Option[Array[Byte]] =
    try {
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try {
          val out = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
          Some(out.toByteArray)
        } finally in.close()
      }
    } catch {
      // exists/open TOCTOU: a concurrent vacuum may retire the file in
      // between — absent, not an error (readers step down/skip, the
      // documented contract)
      case _: java.io.FileNotFoundException => None
    }

  private def readManifest(fs: FileSystem, root: Path,
      v: Long): Option[Manifest] =
    readLogBytes(fs, new Path(new Path(root, LogDir), manifestName(v)))
      .flatMap(parseManifest)

  private def listLog(fs: FileSystem, root: Path): Seq[String] = {
    val log = new Path(root, LogDir)
    if (!fs.exists(log)) Nil
    else Option(fs.listStatus(log)).getOrElse(Array.empty).toSeq
      .map(_.getPath.getName)
  }

  /** All claimed version numbers in the log, committed or not. */
  private def claimedVersions(fs: FileSystem, root: Path): Seq[Long] =
    listLog(fs, root).collect { case ManifestRe(v) => v.toLong }

  private def checkpointVersions(fs: FileSystem, root: Path): Seq[Long] =
    listLog(fs, root).collect { case CheckpointRe(v) => v.toLong }

  private def readCheckpoint(fs: FileSystem, root: Path,
      v: Long): Option[Snapshot] =
    readLogBytes(fs, new Path(new Path(root, LogDir), checkpointName(v)))
      .flatMap(parseCheckpoint)

  /** Newest PARSEABLE manifest — skips in-flight/aborted claims. */
  def latestManifest(spark: SparkSession, path: String): Option[Manifest] = {
    val fs = fsFor(spark, path); val root = new Path(path)
    claimedVersions(fs, root).sorted.reverse.iterator
      .flatMap(v => readManifest(fs, root, v)).take(1).toSeq.headOption
  }

  /** Resolve the complete snapshot at `v`: start from the newest
    * checkpoint at-or-below `v` (or empty), fold the delta manifests
    * after it. Fold length is bounded by the checkpoint interval, so a
    * read plans from O(interval) small log reads no matter how many
    * commits the table has seen. */
  private def resolveSnapshot(fs: FileSystem, root: Path,
      v: Long): Option[Snapshot] = {
    // ITERATIVE walk (a log whose checkpoint writes kept failing must
    // degrade to a long fold, not a StackOverflowError): collect the
    // delta chain down to the nearest base, then fold forward.
    var chain = List.empty[Manifest]
    var base: Snapshot = null
    var cur = v
    while (base == null) {
      readCheckpoint(fs, root, cur) match {
        case Some(s) => base = s
        case None =>
          val m = readManifest(fs, root, cur).getOrElse {
            if (chain.isEmpty) return None // v itself absent/corrupt
            else throw new IllegalStateException(
              s"snapshot log at $root is missing version $cur needed " +
                s"to resolve $v (vacuumed past a live chain?)")
          }
          m.files match {
            case Some(full) => // self-checkpointing (pre-delta logs,
              // and RESTORE commits, which inline the target's listing)
              base = Snapshot(cur, m.op, full, m.stats, m.schemaJson,
                m.txns, m.dvs)
            case None if m.op == "overwrite" || m.op == "optimize" =>
              // whole-snapshot replacement: the delta IS the snapshot
              base = Snapshot(cur, m.op, m.adds, m.stats, m.schemaJson,
                m.txns, m.dvs)
            case None if m.parent <= 0 =>
              chain ::= m
              base = Snapshot(0L, "append", Nil, Map.empty, None,
                Map.empty)
            case None =>
              chain ::= m
              cur = m.parent
          }
      }
    }
    Some(chain.foldLeft(base) { (acc, m) =>
      val rm = m.removes.toSet
      // a removed file's deletion vector retires with it (the CoW
      // rewrite materialized it); this commit's dv entries SUPERSEDE
      // the parent's for the files they cover (each new vector carries
      // the union of old + new positions)
      Snapshot(m.version, m.op,
        acc.files.filterNot(rm) ++ m.adds,
        (acc.stats -- rm) ++ m.stats,
        m.schemaJson.orElse(acc.schemaJson), m.txns,
        (acc.dvs -- rm) ++ m.dvs)
    })
  }

  /** Write the derived checkpoint for a resolved snapshot — content is
    * deterministic, so overwriting is always safe and losing one only
    * lengthens the next fold. */
  private def writeCheckpoint(fs: FileSystem, root: Path,
      s: Snapshot): Unit = {
    val p = new Path(new Path(root, LogDir), checkpointName(s.version))
    val out = fs.create(p, true)
    try out.write(renderCheckpoint(s)) finally out.close()
  }

  /** The resolved snapshot at a pinned version (None = latest). */
  def snapshotAt(spark: SparkSession, path: String,
      version: Option[Long] = None): Option[Snapshot] = {
    val fs = fsFor(spark, path); val root = new Path(path)
    version match {
      case Some(v) => resolveSnapshot(fs, root, v)
      case None => claimedVersions(fs, root).sorted.reverse.iterator
        .flatMap(v => resolveSnapshot(fs, root, v)).take(1).toSeq.headOption
    }
  }

  /** Forward fold over every parseable manifest, oldest first: the
    * manifest plus the IN-FORCE file and vector-covered-file counts at
    * that version — the one shared walk behind the diagnostic
    * listings ([[history]], [[versions]]). Mirrors
    * [[resolveSnapshot]]'s fold rules. */
  private def logFold(fs: FileSystem, root: Path)
      : Seq[(Manifest, Int, Int)] = {
    var files: Seq[String] = Nil
    var dvFiles: Set[String] = Set.empty
    claimedVersions(fs, root).sorted
      .flatMap(v => readManifest(fs, root, v))
      .map { m =>
        m.files match {
          case Some(full) => files = full; dvFiles = m.dvs.keySet
          case None if m.op == "overwrite" || m.op == "optimize" =>
            files = m.adds; dvFiles = m.dvs.keySet
          case None =>
            val rm = m.removes.toSet
            files = files.filterNot(rm) ++ m.adds
            dvFiles = (dvFiles -- rm) ++ m.dvs.keySet
        }
        (m, files.size, dvFiles.size)
      }
  }

  /** Commit HISTORY as a DataFrame (the Delta DESCRIBE HISTORY shape):
    * one row per parseable manifest, oldest first — version, op,
    * in-commit timestamp (millis), files added/removed by the commit,
    * plus the IN-FORCE state after it (file count, vector-covered file
    * count, constraint names) so a table owner planning a
    * restore/vacuum reads live state, not just deltas. One forward log
    * walk, zero data I/O. */
  def history(spark: SparkSession, path: String): DataFrame = {
    val fs = fsFor(spark, path); val root = new Path(path)
    import spark.implicits._
    logFold(fs, root).map { case (m, nFiles, nDv) =>
      (m.version, m.op, m.ts, m.adds.size.toLong,
        m.removes.size.toLong, nFiles.toLong, nDv.toLong,
        m.constraints.keys.toSeq.sorted.mkString(","))
    }.toDF("version", "op", "commit_ts", "n_added", "n_removed",
      "n_files", "n_dv_files", "constraints")
  }

  /** Committed (version, op, fileCount) history, oldest first — one
    * forward fold over the whole log (a diagnostic listing, not a read
    * path). */
  def versions(spark: SparkSession, path: String): Seq[(Long, String, Int)] = {
    val fs = fsFor(spark, path); val root = new Path(path)
    logFold(fs, root).map { case (m, nFiles, _) =>
      (m.version, m.op, nFiles) }
  }

  // -------------------------------------------------------------- file stats

  private def statType(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | TimestampType | DateType => true
    case _ => false
  }

  private def statExpr(c: Column, dt: DataType): Column = dt match {
    case TimestampType => unix_micros(c)
    case DateType => datediff(c, to_date(lit("1970-01-01")))
    case _ => c
  }

  private val MaxStatString = 64

  /** Longs beyond 2^53 round when compared as Double — widen one ulp
    * outward so the stored bound stays a conservative superset. */
  private def renderNum(v: Any, isMin: Boolean): String = {
    def widened(d: Double, exact: Boolean): Double =
      if (exact) d else if (isMin) math.nextDown(d) else math.nextUp(d)
    val d = v match {
      case n: java.lang.Double => n.doubleValue
      case n: java.lang.Float => n.doubleValue // float→double is exact
      case n: java.math.BigDecimal =>
        val dd = n.doubleValue
        widened(dd, !dd.isInfinite &&
          new java.math.BigDecimal(dd).compareTo(n) == 0)
      case n: Number =>
        val l = n.longValue
        widened(l.toDouble, l.toDouble.toLong == l &&
          math.abs(l) <= (1L << 53))
      case other => other.toString.toDouble
    }
    java.lang.Double.toString(d)
  }

  /** Per-file min/max + row counts for one commit's files: ONE
    * column-pruned distributed pass over just the new files (the scan
    * reads only stat-typed columns), grouped by `input_file_name`. Min/
    * max use SPARK's comparison semantics (UTF8-byte strings, IEEE
    * numerics), so pruning decisions later agree exactly with the
    * `.where` the survivors still run. Production formats harvest the
    * same bounds from parquet footers for free; the explicit pass keeps
    * the ordering semantics identical to the query engine's and costs
    * one read of the commit's delta, not the table. */
  private def computeStats(spark: SparkSession, root: Path,
      commitDir: String, adds: Seq[String], schema: StructType,
      sizes: Map[String, Long] = Map.empty): Map[String, FileStats] = {
    if (adds.isEmpty) return Map.empty
    // r14 optimization (guide §1.2/§5): a commit used to pay a SECOND
    // distributed job to read its own files back for min/max/rowcount.
    // The parquet FOOTERS the write just produced carry the same bounds
    // — harvest them driver-side (a few ms per file) whenever the
    // schema's stat columns are footer-faithful, and keep the
    // distributed pass for the cases where footer semantics diverge
    // from Spark's (see [[footerStatSafe]]) or when per-file bloom
    // filters are configured (those need a real value pass). Footer
    // bounds are Spark-exact for the safe set — validated in
    // tools/FooterProbe and pinned by SnapshotsSpec's pruning-safety
    // laws; where parquet omits stats (NaN-containing double chunks,
    // all-null chunks, >4 KB string bounds) the column is simply
    // absent, which the pruning layer already treats as unprunable —
    // a conservative superset, never a wrong result.
    val bloomConfigured = spark.conf.getOption(BloomColumnsKey)
      .exists(_.split(',').map(_.trim).exists(_.nonEmpty))
    // LEGACY datetime rebase writes Julian-rebased INT64-micros/INT32-day
    // values, so footer min/max live in rebased storage space while the
    // read-back values (and pruning comparisons) are proleptic Gregorian
    // — divergent for pre-1582/1900 values. Only harvest footers for
    // date/timestamp columns under CORRECTED/EXCEPTION (the default),
    // mirroring the bloom/INT96 guards (r14 advice).
    val rebaseSafe = !schema.fields.exists(f =>
        f.dataType == TimestampType || f.dataType == DateType) || {
      val m = spark.conf.get(
        "spark.sql.parquet.datetimeRebaseModeInWrite", "EXCEPTION")
      m.equalsIgnoreCase("EXCEPTION") || m.equalsIgnoreCase("CORRECTED")
    }
    if (!bloomConfigured && rebaseSafe && schema.fields.forall(f =>
        !statType(f.dataType) || footerStatSafe(f.dataType))) {
      try return computeStatsFromFooters(spark, root, adds, schema, sizes)
      catch { case scala.util.control.NonFatal(_) =>
        // unexpected footer shape (e.g. externally-written INT96
        // timestamps) — fall through to the distributed pass, which
        // handles every file Spark can read
      }
    }
    computeStatsDistributed(spark, root, commitDir, adds, schema, sizes)
  }

  /** Spark-dt → can parquet footer statistics reproduce the Spark
    * aggregate bounds EXACTLY (same total order, same rendered value)?
    *   - int8/16/32/64 + date: signed int stats, exact.
    *   - string: unsigned byte order == UTF8String order.
    *   - timestamp: exact IF written as INT64 micros (commit writes pin
    *     `outputTimestampType=TIMESTAMP_MICROS`; INT96 footers have no
    *     usable stats and trip the fallback).
    *   - float/double: IEEE order; parquet omits the bounds entirely
    *     when a chunk saw NaN (conservative), and ±0.0 is normalized to
    *     0.0 on read to match Spark's aggregate normalization.
    *   - decimal ≤ 18 digits: int-backed unscaled values, exact.
    * Everything else (wider decimals, exotic types) keeps the
    * distributed pass. */
  private def footerStatSafe(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         StringType | TimestampType | FloatType | DoubleType => true
    case d: DecimalType => d.precision <= 18
    case _ => false
  }

  private def computeStatsFromFooters(spark: SparkSession, root: Path,
      adds: Seq[String], schema: StructType,
      sizes: Map[String, Long]): Map[String, FileStats] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import scala.jdk.CollectionConverters._
    val hconf = spark.sessionState.newHadoopConf()
    val fields = schema.fields.filter(f => statType(f.dataType)).toSeq
    adds.map { rel =>
      val rdr = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(root, rel), hconf))
      try {
        val blocks = rdr.getFooter.getBlocks.asScala.toSeq
        val rows = blocks.map(_.getRowCount).sum
        val cols = fields.flatMap { f =>
          val chunks = blocks.flatMap(_.getColumns.asScala.find(c =>
            c.getPath.size == 1 && c.getPath.toArray.head == f.name))
          // the column must be present in every block with usable
          // stats, else record nothing (conservative)
          if (chunks.size != blocks.size || chunks.isEmpty) None
          else {
            val pt = chunks.head.getPrimitiveType
            // timestamps are only footer-faithful as INT64 micros
            f.dataType match {
              case TimestampType =>
                val ok = pt.getPrimitiveTypeName == PrimitiveTypeName.INT64 &&
                  (pt.getLogicalTypeAnnotation match {
                    case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                      t.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS
                    case _ => false
                  })
                if (!ok) throw new IllegalStateException(
                  s"non-micros timestamp footer for ${f.name}: $pt")
              case _ => ()
            }
            val stats = chunks.map(_.getStatistics)
            if (stats.exists(s => s == null || s.isEmpty)) None
            else {
              // merge across row groups with parquet's own typed
              // comparator (copy first: mergeStatistics mutates)
              val merged = stats.head.copy()
              stats.tail.foreach(s => merged.mergeStatistics(
                s.asInstanceOf[merged.type]))
              if (!merged.hasNonNullValue) None // all-null column
              else statFromFooter(f,
                merged.genericGetMin.asInstanceOf[AnyRef],
                merged.genericGetMax.asInstanceOf[AnyRef])
                .map(f.name -> _)
            }
          }
        }.toMap[String, ColStat]
        rel -> FileStats(rows, cols, partsFromPath(rel),
          sizes.getOrElse(rel, 0L))
      } finally rdr.close()
    }.toMap
  }

  /** One footer (min, max) → the exact ColStat the distributed pass
    * would have recorded (same renderNum widening, same string
    * truncation rule, ±0.0 normalized to Spark's aggregate form). */
  private def statFromFooter(f: StructField, mn: AnyRef,
      mx: AnyRef): Option[ColStat] = {
    def zeroNorm(v: Double): java.lang.Double =
      if (v == 0.0) 0.0 else v // -0.0 == 0.0; Spark aggregates store +0.0
    f.dataType match {
      case StringType =>
        val minS = new String(
          mn.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes,
          java.nio.charset.StandardCharsets.UTF_8)
        val maxS = new String(
          mx.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes,
          java.nio.charset.StandardCharsets.UTF_8)
        Some(ColStat("s", Some(minS.take(MaxStatString)),
          if (maxS.length > MaxStatString) None else Some(maxS)))
      case d: DecimalType =>
        def dec(v: AnyRef) = new java.math.BigDecimal(
          java.math.BigInteger.valueOf(v.asInstanceOf[Number].longValue),
          d.scale)
        Some(ColStat("n", Some(renderNum(dec(mn), isMin = true)),
          Some(renderNum(dec(mx), isMin = false))))
      case DoubleType | FloatType =>
        val lo = zeroNorm(mn.asInstanceOf[Number].doubleValue)
        val hi = zeroNorm(mx.asInstanceOf[Number].doubleValue)
        Some(ColStat("n", Some(renderNum(lo, isMin = true)),
          Some(renderNum(hi, isMin = false))))
      case _ => // int8/16/32/64, date (int32 days), timestamp (int64 µs)
        Some(ColStat("n", Some(renderNum(mn, isMin = true)),
          Some(renderNum(mx, isMin = false))))
    }
  }

  private def computeStatsDistributed(spark: SparkSession, root: Path,
      commitDir: String, adds: Seq[String], schema: StructType,
      sizes: Map[String, Long] = Map.empty): Map[String, FileStats] = {
    val fields = schema.fields.filter(f => statType(f.dataType)).toSeq
    // read the EXPLICIT file list (a partitioned commit dir would
    // otherwise trigger Spark's partition discovery on the __gp_ dirs).
    // Attribution back from input_file_name anchors on the commit
    // directory's UUID name — a partitioned commit writes the SAME
    // basename into every partition directory (same job UUID + task
    // id), so no fixed segment-count tail is collision-free once the
    // layout nests (multi-column partitionBy).
    val marker = s"/$commitDir/"
    val addSet = adds.toSet
    val df = spark.read.schema(schema)
      .parquet(adds.map(f => new Path(root, f).toString): _*)
    val aggs = fields.flatMap { f =>
      val c = statExpr(col(f.name), f.dataType)
      Seq(min(c).as(s"__min_${f.name}"), max(c).as(s"__max_${f.name}"))
    }
    // opt-in per-file bloom filters ride the SAME attribution pass —
    // two extra map-side bitmap aggregates per configured column, no
    // second read of the batch
    val bloomCols: Seq[(String, String)] = spark.conf
      .getOption(BloomColumnsKey)
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
      .flatMap(c => schema.fields.find(_.name == c)
        .flatMap(f => bloomHashable(f.dataType).map(tag => c -> tag)))
    val bloomBits = bloomBitsOf(spark)
    val bloomMod = 1L << bloomBits
    val bloomAggs = bloomCols.map { case (name, tag) =>
      import graft.functions.BitmapExprs.{bitmapAgg, bitmapOr}
      val base = if (tag == "l") col(name).cast("long") else col(name)
      val p1 = when(col(name).isNotNull,
        pmod(xxhash64(base), lit(bloomMod)))
      val p2 = when(col(name).isNotNull,
        pmod(xxhash64(base, lit(BloomSalt)), lit(bloomMod)))
      bitmapOr(bitmapAgg(p1), bitmapAgg(p2)).as(s"__bloom_$name")
    }
    val rows = df.groupBy(input_file_name().as("__f"))
      .agg(count(lit(1)).as("__n"), aggs ++ bloomAggs: _*).collect()
    // attribution runs ONCE per row; the zero-row coverage set below
    // reuses these rel keys rather than re-deriving them
    val relRows = rows.map { r =>
      // input_file_name yields a URI — decode it so escaped partition
      // values (%XX in the dir name) match the raw listing
      val fname = r.getString(0)
      val decoded = try new java.net.URI(fname).getPath
        catch { case _: java.net.URISyntaxException => fname }
      val at = decoded.indexOf(marker)
      require(at >= 0, s"stats pass cannot place $fname under $commitDir")
      (s"$commitDir/${decoded.substring(at + marker.length)}", r)
    }
    relRows.map { case (rel, r) =>
      require(addSet.contains(rel),
        s"stats pass resolved unknown file $rel")
      val cols = fields.zipWithIndex.flatMap { case (f, i) =>
        val lo = r.get(2 + 2 * i); val hi = r.get(3 + 2 * i)
        if (lo == null || hi == null) None // all-null file column
        else f.dataType match {
          case StringType =>
            val minS = lo.asInstanceOf[String].take(MaxStatString)
            val maxS = hi.asInstanceOf[String]
            Some(f.name -> ColStat("s", Some(minS),
              if (maxS.length > MaxStatString) None else Some(maxS)))
          case _ =>
            Some(f.name -> ColStat("n", Some(renderNum(lo, isMin = true)),
              Some(renderNum(hi, isMin = false))))
        }
      }.toMap
      val blooms = bloomCols.zipWithIndex.flatMap {
        case ((name, tag), j) =>
          // tag format `t:<bits>:<b64>` — the writer's modulus rides
          // with the filter (legacy `t:<b64>` reads as 16)
          Option(r.get(2 + 2 * fields.size + j)).map(bytes =>
            name -> (tag + ":" + bloomBits + ":" +
              java.util.Base64.getEncoder
                .encodeToString(bytes.asInstanceOf[Array[Byte]])))
      }.toMap
      rel -> FileStats(r.getLong(1), cols, partsFromPath(rel),
        sizes.getOrElse(rel, 0L), blooms)
    }.toMap ++ {
      // a ZERO-ROW file contributes no group to the attribution pass
      // (CREATE TABLE's schema-recording file; empty tasks of a skewed
      // write) — it still needs a stats entry, or its byte size is
      // unknown forever (optimizeToSize fails, maxBytesPerTrigger
      // treats the version as over-budget) and rowCount-based pruning
      // can't drop it
      val covered = relRows.map(_._1).toSet
      adds.filterNot(covered).map(f =>
        f -> FileStats(0L, Map.empty, partsFromPath(f),
          sizes.getOrElse(f, 0L))).toMap
    }
  }

  // -------------------------------------------------------- predicate bounds

  private sealed trait BVal
  /** Numeric predicate literal as a DOUBLE INTERVAL [lo, hi]: the two
    * differ only when the exact value is not double-representable
    * (longs past 2^53, high-precision decimals) — the literal-side
    * twin of renderNum's stored-bound ulp widening. Round-to-nearest
    * alone could move a literal ACROSS a file's exact bound and prune
    * a file that contains matching rows. */
  private final case class BNum(lo: Double, hi: Double) extends BVal
  private object BNum {
    def exact(d: Double): BNum = BNum(d, d)
    /** Enclose an exact decimal value in the tightest double pair. */
    def enclose(v: java.math.BigDecimal): BNum = {
      val d = v.doubleValue()
      if (d.isInfinite)
        return if (d > 0) BNum(Double.MaxValue, Double.PositiveInfinity)
        else BNum(Double.NegativeInfinity, Double.MinValue)
      val c = new java.math.BigDecimal(d).compareTo(v)
      if (c == 0) BNum(d, d)
      else if (c < 0) BNum(d, Math.nextUp(d)) // rounded down → widen hi
      else BNum(Math.nextDown(d), d)
    }
    def encloseLong(l: Long): BNum =
      if (l >= -(1L << 53) && l <= (1L << 53)) exact(l.toDouble)
      else enclose(java.math.BigDecimal.valueOf(l))
  }
  private final case class BStr(v: String) extends BVal
  /** Partition set-membership (op "pin"): the file survives iff its
    * recorded partition value for `col` is in the set (or none is
    * recorded). Path-rendered comparison, so only literal types whose
    * `toString` matches Spark's partition-path rendering produce one
    * (string/integral/boolean — see [[partPinLit]]). */
  private final case class BSet(vals: Set[String]) extends BVal
  private final case class Bound(col: String, op: String, v: BVal)

  /** Render a literal for partition-pin comparison, or None when the
    * type's path rendering is not byte-identical to toString (doubles,
    * timestamps, dates stay range-pruned only). */
  private def partPinLit(dt: DataType, v: Any): Option[String] = dt match {
    case StringType | ByteType | ShortType | IntegerType | LongType |
         BooleanType => Option(v).map(_.toString)
    case _ => None
  }

  private def cmpUtf8(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  private def litVal(l: Literal): Option[BVal] = l.dataType match {
    case StringType =>
      Option(l.value).map(v => BStr(v.toString))
    case ByteType | ShortType | IntegerType | FloatType | DoubleType =>
      // all exact in double (float widens losslessly)
      Option(l.value).map(v => BNum.exact(v.asInstanceOf[Number].doubleValue))
    case LongType =>
      Option(l.value).map(v => BNum.encloseLong(v.asInstanceOf[Long]))
    case _: DecimalType =>
      Option(l.value).map(v => BNum.enclose(
        v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal))
    case TimestampType =>
      Option(l.value).map(v => BNum.encloseLong(v.asInstanceOf[Long]))
    case DateType =>
      Option(l.value).map(v => BNum.exact(v.asInstanceOf[Int].toDouble))
    case _ => None
  }

  /** Unwrap PURE-NUMERIC widenings the analyzer inserts (e.g. int
    * column vs double literal) — those keep the stored-stat unit.
    * Temporal casts (date→timestamp) CHANGE the unit (stats store days,
    * the cast compares micros), so they must block pruning on that
    * conjunct rather than compare across units. */
  private def attrOf(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case Cast(a: AttributeReference, dt, _, _)
        if pureNumeric(a.dataType) && pureNumeric(dt) => Some(a.name)
    case _ => None
  }

  private def pureNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  private def foldLit(e: Expression): Option[Literal] = e match {
    case l: Literal => Some(l)
    case c @ Cast(_: Literal, _, _, _) => Some(Literal(c.eval(null), c.dataType))
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case CAnd(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def flip(op: String): String = op match {
    case ">" => "<"; case ">=" => "<="; case "<" => ">"; case "<=" => ">="
    case other => other
  }

  /** Analyze a filter into prunable (col, op, literal) bounds by running
    * it through the ANALYZER against the snapshot schema — the same
    * resolution the real scan gets, so implicit casts and column
    * resolution match exactly. Unrecognized conjuncts prune nothing. */
  /** Resolve `filter` through the REAL analyzer against `schema` (so
    * implicit casts match the scan's) and return the filter condition —
    * the one probe shared by every predicate-analysis entry point. */
  private def analyzedCondition(spark: SparkSession, schema: StructType,
      filter: Column): Option[Expression] =
    spark.createDataFrame(new java.util.ArrayList[Row](), schema)
      .where(filter).queryExecution.analyzed.collectFirst {
        case f: LFilter => f.condition
      }

  private def analyzeBounds(spark: SparkSession, schema: StructType,
      filter: Column): Seq[Bound] = {
    val cond = analyzedCondition(spark, schema, filter)
      .getOrElse(return Nil)
    conjuncts(cond).flatMap {
      case EqualTo(a, b) =>
        bound(a, b, "=") ++ pinEq(a, b) ++ pinEq(b, a)
      case GreaterThan(a, b) => bound(a, b, ">")
      case GreaterThanOrEqual(a, b) => bound(a, b, ">=")
      case LessThan(a, b) => bound(a, b, "<")
      case LessThanOrEqual(a, b) => bound(a, b, "<=")
      case In(a, vs) if attrOf(a).isDefined &&
          vs.forall(foldLit(_).isDefined) =>
        val bvs = vs.flatMap(v => foldLit(v).flatMap(litVal))
        val range =
          if (bvs.size != vs.size) Nil
          else collapseIn(attrOf(a).get, bvs)
        range ++ pinIn(a, vs)
      case _ => Nil
    }
  }

  /** Partition-pin bound for `attr = literal` — only for a BARE
    * attribute (a cast changes the rendering) and a pin-renderable
    * literal type. */
  private def pinEq(a: Expression, b: Expression): Seq[Bound] = a match {
    case attr: AttributeReference =>
      foldLit(b).toSeq.flatMap(l =>
        partPinLit(l.dataType, l.value)
          .map(v => Bound(attr.name, "pin", BSet(Set(v)))))
    case _ => Nil
  }

  /** Partition-pin bound for `attr IN (...)` — ALL values must render,
    * else no pin (the range bound still applies). */
  private def pinIn(a: Expression, vs: Seq[Expression]): Seq[Bound] = a match {
    case attr: AttributeReference =>
      val lits = vs.flatMap(foldLit)
      if (lits.size != vs.size) Nil
      else {
        val rendered = lits.flatMap(l => partPinLit(l.dataType, l.value))
        if (rendered.size != lits.size) Nil
        else Seq(Bound(attr.name, "pin", BSet(rendered.toSet)))
      }
    case _ => Nil
  }

  private def bound(a: Expression, b: Expression, op: String): Seq[Bound] =
    (attrOf(a), foldLit(b), attrOf(b), foldLit(a)) match {
      case (Some(c), Some(l), _, _) => litVal(l).map(Bound(c, op, _)).toSeq
      case (_, _, Some(c), Some(l)) =>
        litVal(l).map(Bound(c, flip(op), _)).toSeq
      case _ => Nil
    }

  /** Can a file with these stats contain a row satisfying the bound?
    * Unknown stats (missing column, missing side, type mismatch) always
    * survive — pruning is a conservative superset. */
  private def survives(cs: ColStat, b: Bound): Boolean = (cs.t, b.v) match {
    case ("n", BNum(vlo, vhi)) =>
      // Spark orders NaN GREATER than any double while Java comparisons
      // with NaN are all false — a NaN bound (a file containing NaNs)
      // or a NaN literal must therefore never prune, only widen.
      // The literal interval [vlo, vhi] encloses the EXACT value, so
      // each comparison uses its conservative end: a file prunes only
      // when NO value inside the interval could be satisfied.
      if (vlo.isNaN || vhi.isNaN) return true
      val lo = cs.min.map(_.toDouble).filterNot(_.isNaN)
      val hi = cs.max.map(_.toDouble).filterNot(_.isNaN)
      b.op match {
        case "=" => lo.forall(_ <= vhi) && hi.forall(_ >= vlo)
        case ">" => hi.forall(_ > vlo)
        case ">=" => hi.forall(_ >= vlo)
        case "<" => lo.forall(_ < vhi)
        case "<=" => lo.forall(_ <= vhi)
        case _ => true
      }
    case ("s", BStr(v)) =>
      val lo = cs.min; val hi = cs.max
      b.op match {
        case "=" => lo.forall(cmpUtf8(_, v) <= 0) && hi.forall(cmpUtf8(_, v) >= 0)
        case ">" => hi.forall(cmpUtf8(_, v) > 0)
        case ">=" => hi.forall(cmpUtf8(_, v) >= 0)
        case "<" => lo.forall(cmpUtf8(_, v) < 0)
        case "<=" => lo.forall(cmpUtf8(_, v) <= 0)
        case _ => true
      }
    case _ => true
  }

  // ---- V2-source seam: manifest access + pruning over sources.Filter ----

  private[graft] def manifestAt(spark: SparkSession, path: String,
      v: Long): Option[Manifest] =
    readManifest(fsFor(spark, path), new Path(path), v)

  /** Does a claim FILE exist for `v` (parseable or not)? Distinguishes a
    * dead claim (file present, skip it) from a VACUUMED version (file
    * absent — a streaming consumer resuming from a pre-vacuum offset
    * must fail loudly, not silently skip committed data). */
  private[graft] def claimExists(spark: SparkSession, path: String,
      v: Long): Boolean = {
    val root = new Path(path)
    fsFor(spark, path).exists(
      new Path(new Path(root, LogDir), manifestName(v)))
  }

  private[graft] def latestVersion(spark: SparkSession, path: String): Long =
    latestManifest(spark, path).map(_.version).getOrElse(0L)

  /** Oldest version whose manifest still exists — the post-vacuum
    * horizon. The batch change-feed defaults its range start here, so
    * the no-options read means "full AVAILABLE history" instead of
    * permanently failing on version 1 after any vacuum. */
  private[graft] def oldestAvailableVersion(spark: SparkSession,
      path: String): Long = {
    val fs = fsFor(spark, path); val root = new Path(path)
    claimedVersions(fs, root).sorted.iterator
      .find(v => readManifest(fs, root, v).isDefined).getOrElse(1L)
  }

  /** The table's current partition layout — TABLE metadata inherited by
    * every commit; Nil if unpartitioned or not yet created. Used by the
    * V2 overwrite face so a catalog writer's mode("overwrite") keeps
    * the layout instead of silently stripping exact partition pruning. */
  private[graft] def tablePartitionBy(spark: SparkSession,
      path: String): Seq[String] =
    latestManifest(spark, path).map(_.partitionBy).getOrElse(Nil)

  /** The table's active CHECK constraints (name → predicate SQL) —
    * surfaced on the V2 Table face. */
  private[graft] def tableConstraints(spark: SparkSession,
      path: String): Map[String, String] =
    latestManifest(spark, path).map(_.constraints).getOrElse(Map.empty)

  /** The latest manifest, for the procedures' one-read summaries. */
  private[graft] def tableDetailManifest(spark: SparkSession,
      path: String): Option[Manifest] = latestManifest(spark, path)

  /** FILE-level metadata listing (the Iceberg `files` metadata-table
    * shape): one row per live data file at the given (or latest)
    * version — relative path, recorded rows and bytes (null when a
    * pre-stats-era commit left them unknown), partition values, and
    * whether a live deletion vector covers the file. Driver-side over
    * the resolved snapshot (bounded by the manifest, like history). */
  def tableFiles(spark: SparkSession, path: String,
      version: Option[Long] = None): DataFrame = {
    val snap = snapshotAt(spark, path, version).getOrElse(
      throw new IllegalArgumentException(
        s"no committed snapshot at $path" +
          version.map(v => s" (version $v)").getOrElse("")))
    import spark.implicits._
    snap.files.sorted.map { f =>
      val st = snap.stats.get(f)
      (f, st.map(_.rows), st.map(_.bytes).filter(_ > 0),
        st.map(_.parts.toSeq.sorted.map { case (k, v) => s"$k=$v" }
          .mkString(",")).getOrElse(""),
        snap.dvs.contains(f))
    }.toDF("file", "rows", "bytes", "partition_values", "has_dv")
  }

  /** File pruning from DataSource V2 pushed filters — used by
    * [[graft.sources.SnapshotTableProvider]] at PLANNING time. Pruning
    * is a conservative superset, so the caller must keep every filter
    * as a residual (Spark re-evaluates them on the surviving rows). */
  private[graft] def pruneByFilters(snap: Snapshot,
      filters: Array[org.apache.spark.sql.sources.Filter]): Seq[String] =
    pruneFiles(snap, filters.toSeq.flatMap(boundsFromFilter))

  /** `x IN (v1..vn)` survives if ANY value can be in the file — encode
    * as one [min, max] range over the value list. ONE implementation
    * for both the core (Catalyst-literal) and V2 (sources.Filter)
    * paths so their pruning can never diverge. Mixed or non-comparable
    * value kinds collapse to nothing (no pruning). */
  private def collapseIn(c: String, bvs: Seq[BVal]): Seq[Bound] =
    bvs.headOption match {
      case Some(_: BNum) =>
        val ds = bvs.collect { case n: BNum => n }
        if (ds.size != bvs.size) Nil
        else {
          val r = BNum(ds.map(_.lo).min, ds.map(_.hi).max)
          Seq(Bound(c, ">=", r), Bound(c, "<=", r))
        }
      case Some(_: BStr) =>
        val ord = Ordering.fromLessThan[String](cmpUtf8(_, _) < 0)
        val ss = bvs.collect { case BStr(s) => s }
        if (ss.size != bvs.size) Nil
        else Seq(Bound(c, ">=", BStr(ss.min(ord))),
          Bound(c, "<=", BStr(ss.max(ord))))
      case _ => Nil
    }

  private def bvalOf(v: Any): Option[BVal] = v match {
    case null => None
    case s: String => Some(BStr(s))
    case t: java.sql.Timestamp =>
      Some(BNum.encloseLong(t.getTime * 1000 + (t.getNanos / 1000) % 1000))
    case i: java.time.Instant =>
      Some(BNum.encloseLong(i.getEpochSecond * 1000000L + i.getNano / 1000))
    case d: java.sql.Date =>
      Some(BNum.exact(d.toLocalDate.toEpochDay.toDouble))
    case d: java.time.LocalDate => Some(BNum.exact(d.toEpochDay.toDouble))
    case l: java.lang.Long => Some(BNum.encloseLong(l))
    case b: java.math.BigDecimal => Some(BNum.enclose(b))
    case b: scala.math.BigDecimal => Some(BNum.enclose(b.bigDecimal))
    case b: java.math.BigInteger =>
      Some(BNum.enclose(new java.math.BigDecimal(b)))
    case n: Number => Some(BNum.exact(n.doubleValue))
    case _ => None
  }

  private def boundsFromFilter(
      f: org.apache.spark.sql.sources.Filter): Seq[Bound] = {
    import org.apache.spark.sql.{sources => sf}
    f match {
      case sf.EqualTo(c, v) =>
        bvalOf(v).map(Bound(c, "=", _)).toSeq ++ pinV2(c, Seq(v))
      case sf.GreaterThan(c, v) => bvalOf(v).map(Bound(c, ">", _)).toSeq
      case sf.GreaterThanOrEqual(c, v) =>
        bvalOf(v).map(Bound(c, ">=", _)).toSeq
      case sf.LessThan(c, v) => bvalOf(v).map(Bound(c, "<", _)).toSeq
      case sf.LessThanOrEqual(c, v) => bvalOf(v).map(Bound(c, "<=", _)).toSeq
      case sf.In(c, vs) if vs.nonEmpty =>
        val bs = vs.toSeq.flatMap(bvalOf)
        val range = if (bs.size != vs.length) Nil else collapseIn(c, bs)
        range ++ pinV2(c, vs.toSeq)
      case sf.And(l, r) => boundsFromFilter(l) ++ boundsFromFilter(r)
      case _ => Nil
    }
  }

  /** V2-side partition pin: every value must be a type whose toString
    * matches Spark's partition-path rendering. */
  private def pinV2(c: String, vs: Seq[Any]): Seq[Bound] = {
    val rendered = vs.flatMap {
      case s: String => Some(s)
      case b: java.lang.Boolean => Some(b.toString)
      case n @ (_: java.lang.Byte | _: java.lang.Short |
                _: java.lang.Integer | _: java.lang.Long) => Some(n.toString)
      case _ => None
    }
    if (rendered.size != vs.size || vs.isEmpty) Nil
    else Seq(Bound(c, "pin", BSet(rendered.toSet)))
  }

  /** Bloom membership for an EQUALITY bound against a file's recorded
    * filter: false means the file provably holds no row with that
    * value. Conservative everywhere the exact typed literal cannot be
    * reconstructed (interval literals, type-tag mismatch, undecodable
    * payload). */
  private def bloomSurvives(fs: FileStats, b: Bound): Boolean = {
    if (b.op != "=") return true
    fs.blooms.get(b.col) match {
      case None => true
      case Some(tagged) =>
        import org.apache.spark.sql.catalyst.expressions.Literal
        val sep = tagged.indexOf(':')
        if (sep <= 0) return true
        // `t:<bits>:<b64>` (r13) or legacy `t:<b64>` (bits = 16). A
        // width we cannot parse EXACTLY into the supported range must
        // fail OPEN (read the file): testing with any substituted
        // modulus against a filter built mod 2^other can return a
        // false "absent" and silently drop rows.
        val rest = tagged.substring(sep + 1)
        val sep2 = rest.indexOf(':')
        val (bits, b64) =
          if (sep2 > 0 && rest.substring(0, sep2).forall(_.isDigit)) {
            val parsed = scala.util.Try(rest.substring(0, sep2).toInt)
              .toOption
            parsed match {
              case Some(b) if b == clampBloomBits(b) =>
                (b, rest.substring(sep2 + 1))
              case _ => return true // future/corrupt width: never skip
            }
          } else (BloomBitsDefault, rest)
        val lit: Option[Literal] = (tagged.substring(0, sep), b.v) match {
          case ("s", BStr(v)) =>
            Some(Literal(org.apache.spark.unsafe.types.UTF8String
              .fromString(v), StringType))
          case ("l", BNum(lo, hi))
              // only an EXACT integral literal can test membership —
              // the interval is a point, whole, and double-exact
              // STRICTLY below 2^53: at exactly 2^53 the neighbouring
              // long 2^53+1 widens to the same double, so a file
              // holding only the neighbour would be falsely skipped
              if lo == hi && lo.isWhole &&
                math.abs(lo) < (1L << 53).toDouble =>
            Some(Literal(lo.toLong, LongType))
          case _ => None
        }
        lit match {
          case None => true
          case Some(l) =>
            try {
              val bm = graft.functions.BitmapExprs.LongBitmap.deserialize(
                java.util.Base64.getDecoder.decode(b64))
              val (p1, p2) = bloomPositions(l, bits)
              bm.contains(p1) && bm.contains(p2)
            } catch { case scala.util.control.NonFatal(_) => true }
        }
    }
  }

  private def pruneFiles(m: Snapshot, bounds: Seq[Bound]): Seq[String] =
    if (bounds.isEmpty) m.files
    else m.files.filter { f =>
      m.stats.get(f) match {
        case None => true // no stats recorded — never prune blind
        case Some(fs) => bounds.forall { b =>
          b.v match {
            // exact partition membership: a recorded value outside the
            // predicate's accepted set can contain NO matching row; a
            // file with no recorded value never part-prunes
            case BSet(vals) => fs.parts.get(b.col).forall(vals.contains)
            case _ => (fs.cols.get(b.col) match {
              case None => true
              case Some(cs) => survives(cs, b)
            }) && bloomSurvives(fs, b)
          }
        }
      }
    }

  private def snapshotSchema(spark: SparkSession, path: String,
      m: Snapshot): StructType = m.schemaJson match {
    case Some(j) => DataType.fromJson(j).asInstanceOf[StructType]
    case None =>
      require(m.files.nonEmpty,
        s"snapshot version ${m.version} at $path lists no files and no schema")
      spark.read.parquet(new Path(new Path(path), m.files.head).toString)
        .schema
  }

  // ------------------------------------------------------------------ commits

  /** Append `df` as a new version; returns the committed version. */
  def append(df: DataFrame, path: String): Long = commit(df, path, "append")

  /** PARTITIONED append (the Delta `partitionBy`-at-commit shape): the
    * batch writes one file set per distinct partition-column tuple
    * (`data/c-X/__gp_col=val/...`), the manifest records the exact value
    * per file, and `col = v` / `col IN (...)` predicates in
    * [[scanWhere]]/the V2 source prune those files EXACTLY — no min/max
    * range weakness for high-cardinality categorical columns. The
    * partition columns stay present in the data files, so reads are
    * unchanged, and min/max stats skipping still composes on top for
    * the non-partition columns. partitionBy is TABLE metadata: later
    * plain appends, CoW rewrites, and optimize all inherit and
    * preserve it (overwrite with an explicit list redefines it). */
  def append(df: DataFrame, path: String, partitionBy: Seq[String]): Long =
    commit(df, path, "append", partitionBy = partitionBy)

  /** Replace the table contents with `df` as a new version (prior
    * versions stay time-travel-readable until vacuumed). */
  def overwrite(df: DataFrame, path: String): Long =
    commit(df, path, "overwrite")

  /** Partitioned overwrite — see [[append(df,path,partitionBy)*]]. */
  def overwrite(df: DataFrame, path: String,
      partitionBy: Seq[String]): Long =
    commit(df, path, "overwrite", partitionBy = partitionBy)

  /** IDEMPOTENT append (the Delta txnAppId/txnVersion idiom): every
    * manifest carries the latest committed `txnId` per `appId`, and a
    * replay with `txnId` ≤ that is a NO-OP returning the current
    * version — re-checked under each claim attempt, so even a racing
    * duplicate cannot double-commit. This is what makes
    * [[streamAppend]] an EXACTLY-ONCE streaming sink: Structured
    * Streaming re-runs a foreachBatch after a crash with the SAME
    * batchId, and the replayed write deduplicates here instead of
    * appending twice. */
  def appendIdempotent(df: DataFrame, path: String, appId: String,
      txnId: Long): Long = {
    require(appId.nonEmpty, "appendIdempotent needs an application id")
    // fast path: skip the (distributed) data write for a known replay;
    // the in-loop guard stays authoritative under races
    latestManifest(df.sparkSession, path) match {
      case Some(m) if m.txns.get(appId).exists(_ >= txnId) => m.version
      case _ => commit(df, path, "append", txn = Some((appId, txnId)))
    }
  }

  /** foreachBatch-shaped exactly-once streaming SINK:
    * {{{
    *   stream.writeStream
    *     .foreachBatch(Snapshots.streamAppend(path, "my-job"))
    *     .start()
    * }}}
    * Each micro-batch lands as one atomic snapshot commit keyed by its
    * batchId; crash-replays of a committed batch are no-ops. Downstream
    * consumers tail the same table with `format("graft-snapshot")` —
    * log-to-log pipelines with exactly-once on both ends. */
  def streamAppend(path: String,
      appId: String): (DataFrame, Long) => Unit =
    (df, batchId) => { appendIdempotent(df, path, appId, batchId); () }

  /** IDEMPOTENT overwrite — [[appendIdempotent]]'s twin for sinks whose
    * batch output REPLACES derived state rather than appending to it:
    * a replay with `txnId` ≤ the recorded high-water mark is a no-op
    * returning the current version. */
  def overwriteIdempotent(df: DataFrame, path: String, appId: String,
      txnId: Long, partitionBy: Seq[String] = Nil): Long = {
    require(appId.nonEmpty, "overwriteIdempotent needs an application id")
    latestManifest(df.sparkSession, path) match {
      case Some(m) if m.txns.get(appId).exists(_ >= txnId) => m.version
      case _ => commit(df, path, "overwrite", txn = Some((appId, txnId)),
        partitionBy = partitionBy)
    }
  }

  /** foreachBatch-shaped exactly-once CDC MIRROR sink — the full
    * production loop a derived table runs forever:
    * {{{
    *   spark.readStream.format("graft-snapshot")
    *     .option("readChangeFeed", "true").load(src)
    *     .writeStream
    *     .foreachBatch(Snapshots.streamMirror(mirror, "my-job", keys))
    *     .start()
    * }}}
    * Each micro-batch lands as ONE idempotent commit keyed by batchId:
    * the steady state is [[mergeChanges]] — a file-pruned copy-on-write
    * merge applying the batch's inserts and row-level deletes (newest
    * commit wins per key), so a sync costs O(touched files + batch),
    * never the mirror's size and never a source re-read. A
    * crash-replayed batch deduplicates on the txn mark, so the mirror
    * tracks the source exactly-once. The first batch bootstraps the
    * mirror from the feed's own data columns. */
  def streamMirror(mirrorPath: String, appId: String,
      keys: Seq[String]): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val spark = batch.sparkSession
      latestManifest(spark, mirrorPath) match {
        case Some(_) =>
          // steady state: ONE atomic file-pruned CoW commit — cost is
          // O(touched files + batch), never the mirror's size
          mergeChanges(spark, mirrorPath, batch, keys,
            txn = Some((appId, batchId)))
        case None =>
          // bootstrap: the first batch folds into an empty base — with
          // the SAME NULL-key contract as the steady state, or a
          // pipeline would bootstrap fine and wedge on its second batch
          val nullKey = keys.map(k => col(k).isNull).reduce(_ || _)
          val nullRows = batch.where(nullKey).count()
          if (nullRows > 0) throw new MergeSourceConflict(
            s"streamMirror at $mirrorPath: $nullRows change row(s) " +
              s"have NULL in a key column (${keys.mkString(",")})")
          val dataCols = batch.columns.filterNot(
            Set("_change_type", "_commit_version", "_commit_timestamp")
              .contains).toSeq
          overwriteIdempotent(
            applyChangeFeed(batch.select(dataCols.map(col): _*).limit(0),
              batch, keys),
            mirrorPath, appId, batchId)
      }
      ()
    }

  /** Maintenance OPTIMIZE, inside the log: rewrite the current snapshot
    * into `numFiles` files — optionally Z-ORDER clustered over
    * `zorderBy` dims via [[graft.functions.ZOrder]]'s codegen Morton
    * key, so every clustered dim's min/max span is bounded per file and
    * later [[scanWhere]] scans data-skip — committed as a NEW version
    * with `op = "optimize"`. Readers of prior versions are untouched
    * (their files only retire at vacuum), a concurrent reader of the log
    * never sees a half-rewritten table, and [[changes]] SKIPS optimize
    * commits (same rows, new layout — an incremental consumer must not
    * re-ingest the whole table because maintenance ran). Quantization
    * steps for the Z-key: each entry is (column, min, max) on
    * `zBits`-bit grids, `ZOrder.quantize`'s IEEE-portable mapping.
    * Fails with `ConcurrentModificationException` if another data
    * change lands first (the rewrite would lose it). */
  def optimize(spark: SparkSession, path: String, numFiles: Int,
      zorderBy: Seq[(String, Double, Double)] = Nil, zBits: Int = 16,
      expectVersion: Option[Long] = None): Long = {
    require(numFiles > 0, "numFiles must be positive")
    val m = snapshotAt(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $path"))
    checkExpected(m, expectVersion, "optimize", path)
    val cur = read(spark, path, Some(m.version))
    // a partitioned table keeps its layout: cluster WITHIN partitions
    // (the partition columns prefix the range key), so the rewrite
    // cannot explode into one file per (task × partition value) and the
    // exact partition pruning survives maintenance
    val pb = latestManifest(spark, path).map(_.partitionBy).getOrElse(Nil)
    val rewritten =
      if (zorderBy.isEmpty) {
        if (pb.isEmpty) cur.repartition(numFiles)
        else cur.repartition(numFiles, pb.map(col): _*)
      } else graft.functions.ZOrder.clusterByZ(cur, zorderBy, zBits,
        numFiles, prefixCols = pb)
    commit(rewritten, path, "optimize", expectParent = Some(m.version))
  }

  /** Size-targeted OPTIMIZE (the Delta target-file-size shape): file
    * count derives from the manifest's recorded byte sizes — no
    * filesystem stat — as ceil(total / targetFileBytes). Requires the
    * snapshot's files to carry sizes (any current-writer commit does;
    * a pre-sizes manifest fails typed rather than guessing). */
  /** Predicate-SCOPED optimize (Delta's `OPTIMIZE ... WHERE`, the
    * routine-maintenance shape for a partitioned 100 TB table): only
    * files the stats say may hold predicate-matching rows rewrite —
    * bin-packed into `numFiles` (optionally z-ordered like
    * [[optimize]]); every other file carries into the new manifest
    * unmoved. The predicate selects FILES, not rows: content is
    * preserved exactly (a file straddling the predicate boundary
    * rewrites in full). Rewritten files materialize their deletion
    * vectors on the way. Commits as `op = "compact"` (incremental
    * consumers skip it, like optimize). Returns the current version
    * unchanged when fewer than two files qualify. */
  def optimizeWhere(spark: SparkSession, path: String, predicate: Column,
      numFiles: Int, zorderBy: Seq[(String, Double, Double)] = Nil,
      zBits: Int = 16, expectVersion: Option[Long] = None): Long = {
    require(numFiles > 0, "numFiles must be positive")
    val m = snapshotAt(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $path"))
    checkExpected(m, expectVersion, "optimize-where", path)
    val schema = snapshotSchema(spark, path, m)
    val bounds = analyzeBounds(spark, schema, predicate)
    // an unanalyzable predicate (modulo, OR, UDF, ...) would silently
    // select EVERY file — the full-table rewrite the caller explicitly
    // tried to scope. Fail typed instead (Delta's OPTIMIZE ... WHERE
    // rejects non-partition predicates the same way).
    if (bounds.isEmpty) throw new IllegalArgumentException(
      s"optimize-where at $path: the predicate has no stats-analyzable " +
        "bounds (use comparisons/IN over table columns) — it would " +
        "select every file; use optimize() for a full rewrite")
    val candidates = pruneFiles(m, bounds)
    if (candidates.size < 2) return m.version
    val root = new Path(path)
    val pb = latestManifest(spark, path).map(_.partitionBy).getOrElse(Nil)
    val rows = readFiles(spark, root, candidates, schema, m.dvs)
    val rewritten =
      if (zorderBy.isEmpty) {
        if (pb.isEmpty) rows.repartition(numFiles)
        else rows.repartition(numFiles, pb.map(col): _*)
      } else graft.functions.ZOrder.clusterByZ(rows, zorderBy, zBits,
        numFiles, prefixCols = pb)
    commit(rewritten, path, "compact", removed = candidates.toSet,
      expectParent = Some(m.version))
  }

  def optimizeToSize(spark: SparkSession, path: String,
      targetFileBytes: Long,
      zorderBy: Seq[(String, Double, Double)] = Nil,
      zBits: Int = 16): Long = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val m = snapshotAt(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $path"))
    val known = m.files.flatMap(f => m.stats.get(f).map(_.bytes))
    require(known.size == m.files.size && known.forall(_ > 0),
      s"optimizeToSize needs recorded file sizes at $path — rewrite " +
        "with a current commit (or use optimize(numFiles))")
    val n = math.max(1L, (known.sum + targetFileBytes - 1) /
      targetFileBytes).toInt
    // pin the version the file count was computed FROM: a commit
    // landing in between would otherwise be silently rewritten into a
    // count derived from stale byte totals
    optimize(spark, path, n, zorderBy, zBits,
      expectVersion = Some(m.version))
  }

  /** Copy-on-write UPSERT by key: rows of `updates` replace current rows
    * with equal `keyCols`; unmatched update rows are inserts. Only the
    * files that CONTAIN a matched key are rewritten — candidates come
    * from per-file key-column stats against the updates' key range (the
    * nightly-batch shape: a day's updates touch a bounded key band, so
    * a 100 TB table rewrites a sliver), then one exact semi-join pass
    * over the candidates picks the truly touched files; untouched files
    * carry into the new manifest unmoved. [[changes]] granularity is
    * FILE-level: a merge's adds re-emit rows co-located with matches —
    * pair with [[TableJoins.applyChangelog]] when a consumer needs
    * row-level deltas. Fails with `ConcurrentModificationException` if
    * another data change lands between read and claim.
    *
    * Source-batch contract (Delta's multiple-match rule): each key may
    * appear AT MOST ONCE in `updates`, and no key column may be NULL.
    * Duplicate keys would all survive the rewrite (the table ends up
    * with duplicate key rows); a NULL key never equi-matches the
    * left_anti, so the old row would be kept AND the update inserted.
    * Both silently diverge from upsert semantics, so both are rejected
    * with a typed [[MergeSourceConflict]] — one O(batch) aggregate over
    * the updates, never a table scan. */
  def merge(spark: SparkSession, path: String, updates: DataFrame,
      keyCols: Seq[String], expectVersion: Option[Long] = None): Long = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val m = snapshotAt(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $path"))
    checkExpected(m, expectVersion, "merge", path)
    val schema = snapshotSchema(spark, path, m)
    require(keyCols.forall(k => schema.fieldNames.contains(k)),
      s"key columns ${keyCols.mkString(",")} must exist in the table")
    // align to the TABLE schema with explicit casts (the same rule as
    // update's SET): otherwise unionByName's type coercion would let a
    // mistyped update batch silently rewrite the table schema and brick
    // the next well-typed append on enforcement
    val aligned = updates.select(schema.fields.toSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*)
    checkMergeSource(aligned, keyCols, path)
    val root = new Path(path)
    val touched = touchedFiles(spark, root, m, schema,
      aligned.select(keyCols.map(col): _*).distinct(), keyCols)
    val alignedKeys = aligned.select(keyCols.map(col): _*).distinct()
    val newData =
      if (touched.isEmpty) aligned
      else {
        val touchedRows = readFiles(spark, root, touched, schema, m.dvs)
        touchedRows.join(alignedKeys, keyCols, "left_anti")
          .unionByName(aligned)
      }
    // CDC sidecar: the writer knows the key pairing, so matched keys
    // get BOTH images and unmatched batch rows record as inserts —
    // O(batch + matched rows), scans confined to the touched sliver
    val cdc =
      if (!cdcEnabled(spark)) None
      else if (touched.isEmpty)
        Some(aligned.withColumn(ChangeTypeCol, lit("insert")))
      else {
        val touchedRows = readFiles(spark, root, touched, schema, m.dvs)
        val liveKeys = touchedRows
          .select(keyCols.map(col): _*).distinct()
        val pre = touchedRows.join(alignedKeys, keyCols, "left_semi")
          .withColumn(ChangeTypeCol, lit("update_preimage"))
        val post = aligned.join(liveKeys, keyCols, "left_semi")
          .withColumn(ChangeTypeCol, lit("update_postimage"))
        val ins = aligned.join(liveKeys, keyCols, "left_anti")
          .withColumn(ChangeTypeCol, lit("insert"))
        Some(pre.unionByName(post).unionByName(ins))
      }
    commit(newData, path, "merge", removed = touched.toSet,
      expectParent = Some(m.version), cdc = cdc)
  }

  /** Copy-on-write MERGE of a CHANGE BATCH (the Delta
    * `MERGE ... WHEN MATCHED [AND _change_type='delete'] THEN DELETE /
    * UPDATE / INSERT` shape): `changes` carries the table's data
    * columns plus `_change_type` ('insert' | 'delete') and
    * `_commit_version` — exactly [[changeFeed]]'s output. Per key the
    * NEWEST change wins (a delete-then-reinsert batch keeps the row);
    * winning inserts upsert, winning deletes remove. ONE atomic commit
    * rewriting only the files that contain a matched key ([[merge]]'s
    * planning), so a change batch costs O(touched files + batch) — the
    * sync primitive a 100 TB derived mirror needs, where rewriting the
    * whole mirror per batch ([[overwrite]]) would be catastrophic.
    * `txn` carries an idempotence mark: a crash-replayed batch with
    * `txnId` ≤ the recorded high-water mark no-ops, which is what makes
    * [[streamMirror]] exactly-once in one commit. NULL keys are
    * rejected like [[merge]] (duplicates are legal here — the winner
    * pick resolves them deterministically). */
  def mergeChanges(spark: SparkSession, path: String, changes: DataFrame,
      keyCols: Seq[String], txn: Option[(String, Long)] = None,
      expectVersion: Option[Long] = None): Long = {
    require(keyCols.nonEmpty, "mergeChanges needs at least one key column")
    val m = snapshotAt(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $path"))
    // replay fast path FIRST (appendIdempotent's rule, and its order):
    // a crash-replayed batch must no-op even when the caller also pins
    // expectVersion — the commit it planned against is already durable,
    // and checkExpected would otherwise raise a spurious conflict. The
    // resolved snapshot already carries the txn high-water marks, so
    // this costs no extra log read on the per-micro-batch hot path.
    val replayed = txn.flatMap { case (appId, txnId) =>
      m.txns.get(appId).filter(_ >= txnId).map(_ => m.version)
    }
    if (replayed.isDefined) return replayed.get
    checkExpected(m, expectVersion, "merge", path)
    val schema = snapshotSchema(spark, path, m)
    require(keyCols.forall(k => schema.fieldNames.contains(k)),
      s"key columns ${keyCols.mkString(",")} must exist in the table")
    require(Seq("_change_type", "_commit_version")
        .forall(changes.columns.contains),
      "mergeChanges needs _change_type and _commit_version columns " +
        "(a changeFeed batch)")
    require(!schema.fieldNames.exists(_.startsWith("__gmc_")),
      "mergeChanges reserves the __gmc_ column prefix")
    // update PREIMAGES are informational (the after-value rides the
    // postimage): dropped up front, or the per-key winner pick below
    // would select them over postimages ("update_pre..." sorts ABOVE
    // "update_post...") and apply the OLD values — the Delta-consumer
    // rule. _commit_timestamp is feed metadata, never payload.
    val changesLive =
      changes.where(col("_change_type") =!= lit("update_preimage"))
    // schema EVOLUTION rides the batch (the same widening rule as
    // append): feed columns the table lacks join the payload with the
    // feed's own types, old rows read them as null after the commit
    val metaCols =
      Set("_change_type", "_commit_version", "_commit_timestamp")
    val feedTypes = changes.schema.fields
      .map(f => f.name -> f.dataType).toMap
    val newCols = changes.columns.toSeq
      .filterNot(c => metaCols.contains(c) ||
        schema.fieldNames.contains(c))
    val payload = schema.fieldNames.toSeq.filterNot(keyCols.contains) ++
      newCols
    def typeOf(p: String): org.apache.spark.sql.types.DataType =
      if (schema.fieldNames.contains(p)) schema(p).dataType
      else feedTypes(p)
    // keys AND payload align to the table's types (merge's rule:
    // unionByName coercion must never let a mistyped batch rewrite the
    // recorded schema and brick later reads)
    val alignedChanges = changesLive.select(
      keyCols.map(k => col(k).cast(schema(k).dataType).as(k)) ++
      Seq(col("_commit_version").as("__gmc_v"),
        col("_change_type").as("__gmc_ct")) ++
      payload.map(p =>
        (if (changes.columns.contains(p)) col(p).cast(typeOf(p))
         else lit(null).cast(typeOf(p))).as(p)): _*)
    // winner per key: newest commit, 'insert' beating 'delete' on a
    // same-commit tie (cannot happen in a well-formed feed; the pick
    // just stays deterministic) — one aggregation over the BATCH
    val ordered = struct(col("__gmc_v") +: col("__gmc_ct") +:
      payload.map(col): _*)
    val winners = alignedChanges
      .groupBy(keyCols.map(col): _*)
      .agg(max(ordered).as("__gmc_w"))
      .select(keyCols.map(col) ++ Seq(col("__gmc_w.__gmc_ct").as("__gmc_ct")) ++
        payload.map(p => col(s"__gmc_w.$p").as(p)): _*)
      .localCheckpoint() // consumed three times (guard, plan, rewrite)
    val nullKey = keyCols.map(k => col(k).isNull).reduce(_ || _)
    val nullRows = winners.where(nullKey).count()
    if (nullRows > 0) throw new MergeSourceConflict(
      s"mergeChanges at $path: $nullRows change row(s) have NULL in a " +
        s"key column (${keyCols.mkString(",")})")
    val root = new Path(path)
    val touched = touchedFiles(spark, root, m, schema,
      winners.select(keyCols.map(col): _*), keyCols)
    // evolution-added columns must record NULLABLE (untouched files
    // read them as null — the same widening rule as append-evolution);
    // the else-less `when` forces nullability at analysis time.
    // Output columns keep the TABLE's recorded order (new columns
    // append after, the evolution rule): merge() preserves order via
    // its aligned select and Delta MERGE does too — a keyCols-first
    // order would permanently reorder the persisted schema on the
    // first steady-state mergeChanges commit, silently breaking
    // positional consumers (SELECT *, by-position INSERT/UNION)
    val outCols = (schema.fieldNames.toSeq ++ newCols).map(c =>
      if (newCols.contains(c)) when(lit(true), col(c)).as(c) else col(c))
    val upserts = winners.where(col("__gmc_ct") =!= "delete")
      .select(outCols: _*)
    val newData =
      if (touched.isEmpty) upserts
      else {
        val survivors0 = readFiles(spark, root, touched, schema, m.dvs)
          .join(winners.select(keyCols.map(col): _*), keyCols, "left_anti")
        val survivors = newCols.foldLeft(survivors0)((d, c) =>
          d.withColumn(c, lit(null).cast(typeOf(c))))
        survivors.select(outCols: _*).unionByName(upserts)
      }
    // CDC sidecar: winners are one row per key, so an inner join from
    // the touched rows yields each replaced/deleted row exactly once —
    // pre-images in ONE pass (ct decides delete vs update_preimage),
    // post-images/inserts split the upserts by live-key membership
    val cdc =
      if (!cdcEnabled(spark)) None
      else if (touched.isEmpty)
        Some(upserts.withColumn(ChangeTypeCol, lit("insert")))
      else {
        val touchedRows = readFiles(spark, root, touched, schema, m.dvs)
        val withNew = newCols.foldLeft(touchedRows)((d, c) =>
          d.withColumn(c, lit(null).cast(typeOf(c))))
        val winKeyCt = winners.select(keyCols.map(col) :+
          col("__gmc_ct").as("__gmc_cdc"): _*)
        val pre = withNew.join(winKeyCt, keyCols)
          .withColumn(ChangeTypeCol,
            when(col("__gmc_cdc") === "delete", lit("delete"))
              .otherwise(lit("update_preimage")))
          .select((schema.fieldNames.toSeq ++ newCols).map(col) :+
            col(ChangeTypeCol): _*)
        val liveKeys = touchedRows
          .select(keyCols.map(col): _*).distinct()
        val post = upserts.join(liveKeys, keyCols, "left_semi")
          .withColumn(ChangeTypeCol, lit("update_postimage"))
        val ins = upserts.join(liveKeys, keyCols, "left_anti")
          .withColumn(ChangeTypeCol, lit("insert"))
        Some(pre.unionByName(post).unionByName(ins))
      }
    commit(newData, path, "merge", removed = touched.toSet,
      expectParent = Some(m.version), txn = txn, cdc = cdc)
  }

  // ------------------------------------------------ general MERGE INTO

  /** One action of a general MERGE INTO clause (see [[mergeInto]]).
    * Update/insert assignments map TARGET column names to expressions
    * over the merge's joined row: target columns by their bare names,
    * source columns through [[mergeSource]]. */
  sealed trait MergeAction
  /** UPDATE SET: unassigned target columns keep their current value. */
  final case class MergeUpdate(set: Map[String, Column])
      extends MergeAction
  /** DELETE the target row. */
  case object MergeDelete extends MergeAction
  /** INSERT: unassigned target columns become NULL (SQL MERGE rule). */
  final case class MergeInsert(values: Map[String, Column])
      extends MergeAction

  /** Ordered `WHEN MATCHED [AND condition] THEN UPDATE/DELETE`. */
  final case class WhenMatched(condition: Option[Column],
      action: MergeAction) {
    require(!action.isInstanceOf[MergeInsert],
      "WHEN MATCHED supports UPDATE or DELETE")
  }
  /** Ordered `WHEN NOT MATCHED [AND condition] THEN INSERT`. The
    * condition and values may reference SOURCE columns only (the
    * target side of an unmatched source row is all-NULL). */
  final case class WhenNotMatched(condition: Option[Column],
      values: Map[String, Column])
  /** Ordered `WHEN NOT MATCHED BY SOURCE [AND condition] THEN
    * UPDATE/DELETE`. Condition and assignments may reference TARGET
    * columns only. */
  final case class WhenNotMatchedBySource(condition: Option[Column],
      action: MergeAction) {
    require(!action.isInstanceOf[MergeInsert],
      "WHEN NOT MATCHED BY SOURCE supports UPDATE or DELETE")
  }

  /** Name prefix under which [[mergeInto]] exposes SOURCE columns to
    * clause conditions and assignment expressions. */
  private[graft] val MergeSrcPrefix = "__gmi_src_"

  /** Reference a SOURCE column inside a [[mergeInto]] clause
    * condition or assignment (`mergeSource("v")` ≡ the SQL `s.v`). */
  def mergeSource(name: String): Column = col(MergeSrcPrefix + name)

  /** General copy-on-write MERGE INTO — the full SQL shape
    * (`MERGE INTO t USING s ON t.k = s.k WHEN MATCHED [AND c] THEN
    * UPDATE SET ... | DELETE  WHEN NOT MATCHED [AND c] THEN INSERT ...
    * WHEN NOT MATCHED BY SOURCE [AND c] THEN UPDATE ... | DELETE`),
    * the Delta/Iceberg semantics:
    *
    *  - target and source match on equality of `keyCols` (a NULL
    *    target key never matches — SQL equality);
    *  - per row the FIRST clause (in the given order, within its
    *    family) whose condition evaluates TRUE applies; a matched /
    *    not-matched-by-source row with no applicable clause carries
    *    unchanged, a not-matched source row with no applicable clause
    *    inserts nothing;
    *  - source keys must be unique and non-NULL (the same typed
    *    [[MergeSourceConflict]] as [[merge]] — Delta's
    *    multiple-match rule, enforced up front with one O(batch)
    *    aggregate).
    *
    * PLANNING: without NOT MATCHED BY SOURCE clauses, only files that
    * CONTAIN a matched key rewrite ([[merge]]'s stats-pruned
    * touched-file planning — a 100 TB table rewrites a sliver). NOT
    * MATCHED BY SOURCE can modify ANY target row, so its presence
    * makes every live file a rewrite candidate (the same full-scan
    * cost Delta pays). A merge with ONLY insert actions never
    * rewrites a file at all: it appends the unmatched source rows.
    *
    * The row-exact `_change_data` CDC sidecar records every applied
    * action (delete rows, insert rows, update pre/post image pairs).
    * Clause conditions and assignments must be deterministic — they
    * evaluate once for the rewrite and once for the sidecar.
    *
    * `source` is MATERIALIZED once up front (localCheckpoint — Delta's
    * materializeSource): conflict check, planning, rewrite and the CDC
    * projections all read the same pinned rows, so a non-deterministic
    * source cannot desynchronize the committed data from its own
    * sidecar. Fails with `ConcurrentModificationException` if another
    * data change lands between read and claim. */
  def mergeInto(spark: SparkSession, path: String, source: DataFrame,
      keyCols: Seq[String],
      matched: Seq[WhenMatched] = Nil,
      notMatched: Seq[WhenNotMatched] = Nil,
      notMatchedBySource: Seq[WhenNotMatchedBySource] = Nil,
      expectVersion: Option[Long] = None): Long = {
    require(keyCols.nonEmpty, "mergeInto needs at least one key column")
    require(matched.nonEmpty || notMatched.nonEmpty ||
      notMatchedBySource.nonEmpty, "mergeInto needs at least one clause")
    require(!source.columns.exists(_.startsWith("__gmi_")),
      "mergeInto reserves the __gmi_ column prefix in the source")
    val m = snapshotAt(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $path"))
    checkExpected(m, expectVersion, "mergeInto", path)
    val schema = snapshotSchema(spark, path, m)
    // the TABLE side needs the same reservation as the source (and as
    // mergeChanges' __gmc_ guard on its table schema): a target column
    // named __gmi_t/__gmi_s would be silently replaced by the join
    // markers, __gmi_src_* would collide with the renamed source
    require(!schema.fieldNames.exists(_.startsWith("__gmi_")),
      "mergeInto reserves the __gmi_ column prefix in the table")
    require(keyCols.forall(k => schema.fieldNames.contains(k)),
      s"key columns ${keyCols.mkString(",")} must exist in the table")
    require(keyCols.forall(k => source.columns.contains(k)),
      s"key columns ${keyCols.mkString(",")} must exist in the source")
    val assignedCols = (matched.map(_.action) ++
      notMatchedBySource.map(_.action)).collect {
        case MergeUpdate(set) => set.keys
      }.flatten ++ notMatched.flatMap(_.values.keys)
    assignedCols.find(c => !schema.fieldNames.contains(c)).foreach(c =>
      throw new IllegalArgumentException(
        s"mergeInto assigns unknown target column '$c' at $path — " +
          "MERGE does not evolve the schema; use append for evolution"))
    // MATERIALIZE the source once (Delta's materializeSource): it is
    // read by the conflict check, the touched-file planning, the
    // rewrite, and each CDC projection — a non-deterministic source
    // (rand(), un-ordered limit, a current_timestamp subquery) reaching
    // this surface via SQL MERGE INTO would otherwise commit data whose
    // matched set differs from its own CDC sidecar. Pinning the rows
    // also spares a deterministic-but-expensive source 3-5 re-runs.
    val src = source.localCheckpoint()
    // Delta's multiple-match rule, up front: applied to the KEY
    // projection of the source (general MERGE sources often carry
    // extra columns; only key multiplicity matters)
    checkMergeSource(
      src.select(keyCols.map(col): _*), keyCols, path)
    val root = new Path(path)
    val srcKeys = src.select(keyCols.map(col): _*).distinct()
    // Rewrite-candidate planning. Without NMBS: exactly the files
    // containing a matched key. With NMBS, any target row might
    // change — but when EVERY NMBS clause carries a condition whose
    // bounds the stats understand (partition pins / min-max ranges
    // over target columns), a file that cannot contain a row
    // satisfying ANY clause condition and holds no matched key
    // provably carries over unchanged. This is the difference between
    // a 100 TB dimension sync rewriting the whole table (the
    // documented Delta NMBS cost) and rewriting the touched region.
    // Per-clause pruning unions conservatively: an unanalyzable
    // condition (or a condition-less clause) keeps every file.
    val touched =
      if (notMatchedBySource.isEmpty)
        touchedFiles(spark, root, m, schema, srcKeys, keyCols)
      else {
        val byNmbs = notMatchedBySource.flatMap { cl =>
          cl.condition match {
            case Some(c) => pruneFiles(m, analyzeBounds(spark, schema, c))
            case None => m.files
          }
        }.distinct
        if (byNmbs.size == m.files.size) m.files
        else (touchedFiles(spark, root, m, schema, srcKeys, keyCols)
          ++ byNmbs).distinct
      }
    // the joined merge row: target columns bare, source columns under
    // [[MergeSrcPrefix]], one existence marker per side (key columns
    // alone cannot distinguish "no match" from "matched a NULL")
    val tgt = readFiles(spark, root, touched, schema, m.dvs)
      .withColumn("__gmi_t", lit(true))
    val srcR = src.select(src.columns.toSeq.map(c =>
      col(c).as(MergeSrcPrefix + c)) :+ lit(true).as("__gmi_s"): _*)
    val joinCond = keyCols.map(k =>
      col(k) === col(MergeSrcPrefix + k)).reduce(_ && _)
    val needSrcOnly = notMatched.nonEmpty
    val joined = tgt.join(srcR, joinCond,
      if (needSrcOnly) "full_outer" else "left_outer")
    val isMatched = col("__gmi_t").isNotNull && col("__gmi_s").isNotNull
    val isSrcOnly = col("__gmi_t").isNull
    val isTgtOnly = col("__gmi_s").isNull
    // first-applicable-clause index per family (-1 = none applies); a
    // NULL condition is FALSE (SQL WHEN semantics), which `when`'s
    // three-valued fall-through gives for free
    def firstIdx(conds: Seq[Option[Column]]): Column =
      conds.zipWithIndex.foldRight(lit(-1)) { case ((c, i), els) =>
        when(c.getOrElse(lit(true)), lit(i)).otherwise(els)
      }
    val mIdx = when(isMatched,
      firstIdx(matched.map(_.condition))).otherwise(lit(-1))
    val nIdx = when(isSrcOnly,
      firstIdx(notMatched.map(_.condition))).otherwise(lit(-1))
    val bIdx = when(isTgtOnly,
      firstIdx(notMatchedBySource.map(_.condition))).otherwise(lit(-1))
    def updateCases(fam: Seq[MergeAction], idx: Column,
        c: String): Seq[(Column, Column)] =
      fam.zipWithIndex.collect {
        case (MergeUpdate(set), i) if set.contains(c) =>
          (idx === i, set(c))
      }
    // the rewritten value of target column `c` on the merge row
    def valueFor(c: String): Column = {
      val cases =
        updateCases(matched.map(_.action), mIdx, c) ++
        updateCases(notMatchedBySource.map(_.action), bIdx, c) ++
        notMatched.zipWithIndex.map { case (cl, i) =>
          (nIdx === i, cl.values.getOrElse(c,
            lit(null).cast(schema(c).dataType)))
        }
      cases.foldRight(col(c)) { case ((cond, v), els) =>
        when(cond, v).otherwise(els)
      }.cast(schema(c).dataType).as(c)
    }
    def deleteIdxs(fam: Seq[MergeAction], idx: Column): Seq[Column] =
      fam.zipWithIndex.collect {
        case (MergeDelete, i) => idx === i }
    val dropped = (deleteIdxs(matched.map(_.action), mIdx) ++
      deleteIdxs(notMatchedBySource.map(_.action), bIdx))
      .reduceOption(_ || _).getOrElse(lit(false))
    val keep = when(isSrcOnly, nIdx >= 0).otherwise(!dropped)
    val outCols = schema.fieldNames.toSeq.map(valueFor)
    val insertOnly = matched.isEmpty && notMatchedBySource.isEmpty
    val newData =
      if (insertOnly) joined.where(isSrcOnly && nIdx >= 0)
        .select(outCols: _*)
      else joined.where(keep).select(outCols: _*)
    // CDC sidecar: one classification pass over the SAME joined rows —
    // update pre/post image pairs, deletes, inserts, exactly the
    // applied actions (an inapplicable row contributes nothing)
    def actionIdxs(fam: Seq[MergeAction], idx: Column,
        kind: Class[_]): Seq[Column] =
      fam.zipWithIndex.collect {
        case (a, i) if kind.isInstance(a) => idx === i }
    val isUpd = (actionIdxs(matched.map(_.action), mIdx,
        classOf[MergeUpdate]) ++
      actionIdxs(notMatchedBySource.map(_.action), bIdx,
        classOf[MergeUpdate])).reduceOption(_ || _).getOrElse(lit(false))
    val isDel = dropped
    val isIns = isSrcOnly && nIdx >= 0
    val cdc =
      if (!cdcEnabled(spark)) None
      else {
        val oldCols = schema.fieldNames.toSeq.map(c =>
          col(c).cast(schema(c).dataType).as(c))
        val pre = joined.where(isUpd || isDel)
          .select(oldCols :+ when(isDel, lit("delete"))
            .otherwise(lit("update_preimage")).as(ChangeTypeCol): _*)
        val post = joined.where(isUpd)
          .select(outCols :+ lit("update_postimage")
            .as(ChangeTypeCol): _*)
        val ins = joined.where(isIns)
          .select(outCols :+ lit("insert").as(ChangeTypeCol): _*)
        Some(pre.unionByName(post).unionByName(ins))
      }
    commit(newData, path, "merge",
      removed = if (insertOnly) Set.empty else touched.toSet,
      expectParent = Some(m.version), cdc = cdc)
  }

  /** Copy-on-write DELETE of rows where `predicate` is TRUE (null keeps
    * the row, SQL semantics). Stats pre-prune the candidate files, one
    * exact pass picks the files that actually contain matches, and only
    * those are rewritten without their matching rows; a file whose every
    * row matches simply drops from the manifest. Same conflict and
    * [[changes]]-granularity rules as [[merge]]. */
  def delete(spark: SparkSession, path: String, predicate: Column,
      expectVersion: Option[Long] = None): Long = {
    val m = snapshotAt(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $path"))
    checkExpected(m, expectVersion, "delete", path)
    val schema = snapshotSchema(spark, path, m)
    val root = new Path(path)
    val bounds = analyzeBounds(spark, schema, predicate)
    val candidates = pruneFiles(m, bounds)
    if (candidates.isEmpty) return m.version
    // dv-aware passes: a row already merge-on-read-deleted must neither
    // count a file as touched nor resurrect through the rewrite
    val touched = touchedByPredicate(spark, root, m, schema, candidates,
      predicate, "delete", path)
    if (touched.isEmpty) return m.version
    val kept = readFiles(spark, root, touched, schema, m.dvs)
      .where(not(coalesce(predicate, lit(false))))
    // CDC sidecar: exactly the rows this commit removes — one more
    // predicate-filtered pass over the touched SLIVER, O(deleted rows)
    // of extra bytes, and the feed stays row-exact for any consumer
    val cdc =
      if (!cdcEnabled(spark)) None
      else Some(readFiles(spark, root, touched, schema, m.dvs)
        .where(coalesce(predicate, lit(false)))
        .withColumn(ChangeTypeCol, lit("delete")))
    commit(kept, path, "delete", removed = touched.toSet,
      expectParent = Some(m.version), cdc = cdc)
  }

  /** Predicate-scoped OVERWRITE (Delta's `replaceWhere` — the daily
    * BACKFILL idiom): atomically replace exactly the rows matching
    * `predicate` with `df`, in ONE commit — the standard "re-run one
    * day / one split of a 100 TB table" operation. Planning is
    * [[delete]]'s (stats pre-prune → exact pass picks truly touched
    * files; untouched files carry over unmoved), so cost tracks the
    * REPLACED REGION, never the table. Delta's safety contract is
    * enforced: every row of `df` must itself satisfy `predicate`
    * (a batch leaking rows outside the replaced region fails typed —
    * otherwise a backfill could silently corrupt neighboring
    * partitions). The batch aligns to the table schema with explicit
    * casts like [[merge]]; CHECK constraints validate; conflicts fail
    * like any snapshot rewrite. */
  def replaceWhere(spark: SparkSession, path: String, predicate: Column,
      df: DataFrame, expectVersion: Option[Long] = None): Long = {
    val m = snapshotAt(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $path"))
    checkExpected(m, expectVersion, "replace-where", path)
    val schema = snapshotSchema(spark, path, m)
    // MATERIALIZE the batch once: the containment check below and the
    // commit's write must see the SAME rows — a non-deterministic
    // batch re-evaluated at write time could otherwise slip rows past
    // the check (and a deterministic one would pay double evaluation)
    val aligned = df.select(schema.fields.toSeq.map(f =>
      col(f.name).cast(f.dataType).as(f.name)): _*).localCheckpoint()
    // the replaceWhere contract: the batch must live ENTIRELY inside
    // the replaced region (null predicate = outside, SQL semantics)
    val leaked = aligned.where(not(coalesce(predicate, lit(false))))
      .limit(1).count()
    if (leaked > 0) throw new IllegalArgumentException(
      s"replaceWhere at $path: the replacement batch contains rows NOT " +
        s"matching the predicate — they would land outside the " +
        "replaced region; fix the batch or widen the predicate")
    val root = new Path(path)
    val candidates = pruneFiles(m, analyzeBounds(spark, schema, predicate))
    // PARTITION-ALIGNED fast path (the headline daily backfill): when
    // the predicate is ENTIRELY exact partition pins and a candidate's
    // recorded values satisfy all of them, every row of that file
    // matches — it drops METADATA-ONLY, its bytes never read (its
    // vector retires with it). Sound only via the parts contract
    // (every row has col == parts(c); the null partition records
    // nothing) — min/max ranges cannot prove this because they are
    // blind to nulls.
    val provenDrop: Set[String] = allPinBounds(spark, schema, predicate)
      .map { pins =>
        candidates.filter(f => pins.forall { b =>
          b.v match {
            case BSet(vals) => m.stats.get(f)
              .flatMap(_.parts.get(b.col)).exists(vals.contains)
            case _ => false
          }
        }).toSet
      }.getOrElse(Set.empty)
    val rest = candidates.filterNot(provenDrop)
    val touched = touchedByPredicate(spark, root, m, schema, rest,
      predicate, "replace-where", path)
    val kept =
      if (touched.isEmpty) aligned
      else readFiles(spark, root, touched, schema, m.dvs)
        .where(not(coalesce(predicate, lit(false))))
        .unionByName(aligned)
    // CDC sidecar: partial-file deletes + the replacement batch as
    // inserts. provenDrop files are NOT read here — their bytes were
    // never touched (the metadata-only fast path), so they ride the
    // manifest as fullRemoves and the feed reader synthesizes their
    // rows as deletes per-file (files are immutable, so that is exact)
    val cdc =
      if (!cdcEnabled(spark)) None
      else {
        val ins = aligned.withColumn(ChangeTypeCol, lit("insert"))
        Some(
          if (touched.isEmpty) ins
          else readFiles(spark, root, touched, schema, m.dvs)
            .where(coalesce(predicate, lit(false)))
            .withColumn(ChangeTypeCol, lit("delete"))
            .unionByName(ins))
      }
    commit(kept, path, "replace-where",
      removed = provenDrop ++ touched,
      expectParent = Some(m.version), cdc = cdc,
      fullRemoves = if (cdcEnabled(spark)) provenDrop else Set.empty)
  }

  /** Delete-shaped exact planning, shared by [[delete]] and
    * [[replaceWhere]]: the files among `candidates` containing at
    * least one LIVE (vector-aware) predicate-matching row. */
  private def touchedByPredicate(spark: SparkSession, root: Path,
      m: Snapshot, schema: StructType, candidates: Seq[String],
      predicate: Column, op: String, path: String): Seq[String] =
    if (candidates.isEmpty) Nil
    else collectTouched(
      readFilesWithFileCol(spark, root, candidates, schema, m.dvs)
        .where(predicate).select("__gf").distinct(), candidates, op, path)

  /** The predicate as EXACT partition-pin bounds — Some only when
    * EVERY conjunct is `attr = lit` / `attr IN (lits)` with a bare
    * attribute and pin-renderable literals, so satisfying all pins is
    * a SUFFICIENT condition for a row to match (the full-match proof
    * [[replaceWhere]]'s metadata-only drop needs). Anything else —
    * ranges, expressions, unrenderable types — returns None and the
    * caller takes the exact scanning path. */
  private def allPinBounds(spark: SparkSession, schema: StructType,
      filter: Column): Option[Seq[Bound]] = {
    val cond = analyzedCondition(spark, schema, filter)
      .getOrElse(return None)
    val bounds = conjuncts(cond).map {
      case EqualTo(a, b) =>
        val pins = pinEq(a, b) ++ pinEq(b, a)
        if (pins.size == 1) pins.headOption else None
      case In(a, vs) => pinIn(a, vs).headOption
      case _ => None
    }
    if (bounds.exists(_.isEmpty)) None
    else Some(bounds.flatten)
  }

  /** MERGE-ON-READ delete (the Delta deletion-vector / Iceberg v2
    * position-delete shape): where [[delete]] REWRITES every touched
    * file (copy-on-write — write cost O(touched files' bytes)), this
    * writes the matching ROW POSITIONS as per-file deletion vectors and
    * commits only log metadata — write cost O(matched rows). At 100 TB
    * that is the difference between a GDPR point-delete finishing in
    * seconds and rewriting terabytes for a handful of rows. Readers
    * ([[read]], [[scanWhere]], the V2 source) apply the vectors
    * transparently; metadata COUNT(*) and LIMIT planning stay EXACT via
    * the per-file cardinalities recorded in the log; any later CoW
    * touch of a file — or an [[optimize]] — MATERIALIZES its deletes
    * and retires the vector. A repeat deleteMor covering a file
    * SUPERSEDES its vector with the union of old + new positions, so
    * deletes accumulate and a replay is idempotent. Planning is
    * [[delete]]'s (stats pre-prune → exact pass over live rows only);
    * conflict rules are [[merge]]'s. The append-level [[changes]] feed
    * does NOT carry merge-on-read deletes (the commit adds no files) —
    * the same file-level-CDC caveat as CoW retirements. */
  def deleteMor(spark: SparkSession, path: String, predicate: Column,
      expectVersion: Option[Long] = None): Long = {
    val m = snapshotAt(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $path"))
    checkExpected(m, expectVersion, "delete-dv", path)
    val schema = snapshotSchema(spark, path, m)
    val root = new Path(path)
    val candidates = pruneFiles(m, analyzeBounds(spark, schema, predicate))
    if (candidates.isEmpty) return m.version
    // live rows only: a position already vector-deleted must not
    // re-count (readFiles anti-joins the existing vectors away)
    val touched = collectTouched(
      readFiles(spark, root, candidates, schema, m.dvs, keepPos = true)
        .where(predicate).select(col("__gap").as("__gf")).distinct(),
      candidates, "delete-dv", path)
    if (touched.isEmpty) return m.version
    // the position pass re-reads only the TOUCHED files (the same
    // two-pass shape as CoW delete — the exact pass over candidates
    // must not run twice on a selective predicate)
    val matches = readFiles(spark, root, touched, schema, m.dvs,
        keepPos = true)
      .where(predicate).select(col("__gap"), col("__gpi"))
    // distributed rel-path attribution: a tiny URI-rendered lookup
    // joined on equi basename + path-suffix residual — the same
    // disambiguation rule as relativize(), kept distributed so
    // positions never collect on the driver, and spelled in
    // _metadata.file_path's own URI encoding (escaped partition dirs)
    val relDf = uriLookup(spark, touched)
    val newDel = matches
      .withColumn("__gab", element_at(split(col("__gap"), "/"), -1))
      .join(relDf,
        col("__gab") === relDf("__gbe") &&
          col("__gap").endsWith(concat(lit("/"), relDf("__gfe"))))
      .select(col(DvFileCol), col("__gpi").as(DvPosCol))
    // prior vectors of the touched files carry forward: the new vector
    // is authoritative and COMPLETE for every file it covers
    val touchedSet = touched.toSet
    val priorDirs = m.dvs.filter { case (f, _) => touchedSet(f) }
      .values.map(_.path).toSeq.distinct.sorted
    val allDel =
      if (priorDirs.isEmpty) newDel
      else newDel.unionByName(
        readDvDatasets(spark, root, priorDirs)
          .where(col(DvFileCol).isin(touched: _*))
          .select(col(DvFileCol), col(DvPosCol))).distinct()
    val dvDir = s"dv/d-${java.util.UUID.randomUUID().toString.take(12)}"
    allDel
      .withColumn(DvBaseCol, element_at(split(col(DvFileCol), "/"), -1))
      .write.partitionBy(DvBaseCol)
      .parquet(new Path(root, dvDir).toString)
    // exact per-file cardinalities for the log (what keeps metadata
    // COUNT(*)/LIMIT planning exact); touched is capped, so this
    // collect is ≤ cap rows
    val counts = spark.read.parquet(new Path(root, dvDir).toString)
      .groupBy(DvFileCol).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dvRefs = touched.map(f =>
      f -> Dv(dvDir, counts.getOrElse(f, 0L))).toMap
    val v = commit(readFiles(spark, root, Nil, schema, Map.empty), path,
      "delete-dv", expectParent = Some(m.version), dvs = dvRefs,
      writeData = false)
    // auto-materialize pressure valve (the knob bounding the DV read
    // tax): when a file's accumulated vector coverage exceeds the
    // configured fraction, rewrite it NOW as a follow-up maintenance
    // commit — the delete itself stays metadata-only and CDC-complete
    // (the feed reads v's vectors), and the rewrite is op "compact",
    // which every incremental consumer already skips. Default 1.0 = off.
    // The DELETE's version is returned either way (deletedRows(v) must
    // keep working), and a concurrent-writer conflict in the follow-up
    // is swallowed: the delete is already durably committed, the
    // materialization is best-effort maintenance the next deleteMor or
    // an explicit materializeDeletes retries.
    val frac = spark.conf
      .get("spark.graft.snapshot.dvMaterializeFraction", "1.0").toDouble
    if (frac < 1.0) {
      try materializeDeletes(spark, path, frac)
      catch { case _: java.util.ConcurrentModificationException => () }
    }
    v
  }

  /** Rewrite every file whose LIVE deletion-vector coverage is at least
    * `minFraction` of its rows, dropping the materialized positions and
    * retiring those vectors — the targeted maintenance that bounds the
    * merge-on-read read tax (each covered file pays a per-row anti-join
    * until its vector materializes). Commits as op "compact": same live
    * rows, new layout, skipped by changes()/the change feed/streaming.
    * Cost is proportional to the HOT files, never the table. Returns
    * the current version unchanged when nothing qualifies. */
  def materializeDeletes(spark: SparkSession, path: String,
      minFraction: Double = 0.0): Long = {
    require(minFraction >= 0.0, "minFraction must be >= 0")
    val m = snapshotAt(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $path"))
    if (m.dvs.isEmpty) return m.version
    val hot = m.dvs.keys.toSeq.sorted.filter { f =>
      // unknown row counts (pre-stats manifests) count as HOT: the
      // coverage fraction cannot be computed, and skipping would leave
      // that file's vector (and its read tax) live forever even at
      // minFraction = 0 — rewriting is always safe
      m.stats.get(f).forall(s => s.rows <= 0) ||
        m.dvs(f).n.toDouble / m.stats(f).rows >= minFraction
    }
    if (hot.isEmpty) return m.version
    val schema = snapshotSchema(spark, path, m)
    val root = new Path(path)
    val survivors = readFiles(spark, root, hot, schema,
      m.dvs.filter { case (f, _) => hot.contains(f) })
    commit(survivors, path, "compact", removed = hot.toSet,
      expectParent = Some(m.version))
  }

  /** RESTORE the table to an earlier version as a NEW commit (Delta's
    * RESTORE): METADATA-ONLY — the target's file listing, stats,
    * deletion vectors, schema, and partition layout are re-referenced
    * inline (a self-checkpointing manifest), no data moves or rewrites.
    * History stays intact: the rolled-away versions remain
    * time-travel-readable until vacuumed. Idempotent-txn high-water
    * marks carry FORWARD from the current version — they never roll
    * back, so a replayed streaming batch stays a no-op after the
    * restore. Fails typed if the target's files were vacuumed, and
    * conflicts like any data change if a commit lands concurrently. The
    * append-level [[changes]] feed does NOT carry a restore (adds are
    * empty) — downstream incremental consumers must re-sync, the
    * standard restore caveat. */
  def restore(spark: SparkSession, path: String, toVersion: Long): Long = {
    val cur = snapshotAt(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $path"))
    if (cur.version == toVersion) return cur.version
    val target = snapshotAt(spark, path, Some(toVersion)).getOrElse(
      throw new IllegalArgumentException(s"snapshot version $toVersion " +
        s"does not exist (or was vacuumed) at $path"))
    val fs = fsFor(spark, path); val root = new Path(path)
    // the files must still exist: restoring past a vacuum horizon would
    // commit a manifest pointing at deleted data
    target.files.find(f => !fs.exists(new Path(root, f))).foreach { f =>
      throw new IllegalArgumentException(s"restore to $toVersion at " +
        s"$path impossible: data file $f was vacuumed")
    }
    // the target's deletion-vector datasets too: a dangling dv
    // reference would crash core reads and resurrect rows on the V2
    // face — the same vacuum-horizon guard as the data files
    target.dvs.values.map(_.path).toSeq.distinct
      .find(d => !fs.exists(new Path(root, d))).foreach { d =>
        throw new IllegalArgumentException(s"restore to $toVersion at " +
          s"$path impossible: deletion-vector dataset $d was vacuumed")
      }
    val schema = snapshotSchema(spark, path, target)
    // the target MANIFEST (not just a resolvable checkpoint) is
    // required: partition layout and constraints live there, and
    // silently restoring without them would strip exact pruning and
    // enforcement — fail loudly like the vacuumed-file guards above
    val tm = readManifest(fs, root, toVersion).getOrElse(
      throw new IllegalArgumentException(s"restore to $toVersion at " +
        s"$path impossible: its manifest is unparseable, so the " +
        "partition layout and constraints in force there cannot be " +
        "recovered — read() the version via its checkpoint and " +
        "overwrite instead"))
    commit(spark.createDataFrame(new java.util.ArrayList[Row](), schema),
      path, "restore", expectParent = Some(cur.version),
      partitionBy = tm.partitionBy,
      writeData = false, restoreTo = Some(target),
      setConstraints = Some(tm.constraints))
  }

  /** Maintenance commits rewrite LAYOUT, not content — incremental
    * consumers (changes(), the streaming source) skip their adds, or a
    * routine compaction would re-emit old rows downstream. */
  private[graft] def isMaintenanceOp(op: String): Boolean =
    op == "optimize" || op == "compact"

  /** The rows version `v` DELETED merge-on-read — the row-level DELETE
    * feed that file-level [[changes]] cannot carry (a delete-dv commit
    * adds no files, and CoW retirements surface only as re-emitted
    * survivors). For each file the commit's vectors cover, emits
    * exactly the NEWLY deleted positions (this commit's vector minus
    * the parent's) joined back to their rows. A downstream consumer
    * (search-index retirement, aggregate maintenance, GDPR audit trail)
    * applies deletes incrementally without a table re-sync — the
    * row-level CDC merge-on-read makes possible. Positions resolve
    * against the files as they still exist (vectors never rewrite
    * data), so the feed stays exact until those files are vacuumed. */
  def deletedRows(spark: SparkSession, path: String,
      version: Long): DataFrame = {
    val fs = fsFor(spark, path); val root = new Path(path)
    val m = readManifest(fs, root, version).getOrElse(
      throw new IllegalArgumentException(s"snapshot version $version " +
        s"does not exist (or was vacuumed) at $path"))
    require(m.op == "delete-dv",
      s"version $version at $path is op '${m.op}', not delete-dv — " +
        "the row-level delete feed exists for merge-on-read commits")
    val parent = resolveSnapshot(fs, root, m.parent).getOrElse(
      throw new IllegalArgumentException(
        s"cannot resolve parent version ${m.parent} at $path"))
    val schema = snapshotSchema(spark, path, parent)
    val files = m.dvs.keys.toSeq.sorted
    val newDirs = m.dvs.values.map(_.path).toSeq.distinct.sorted
    val newRows = readDvDatasets(spark, root, newDirs)
      .where(col(DvFileCol).isin(files: _*))
      .select(col(DvFileCol), col(DvPosCol))
    val oldDirs = parent.dvs.filter { case (f, _) => m.dvs.contains(f) }
      .values.map(_.path).toSeq.distinct.sorted
    val fresh =
      if (oldDirs.isEmpty) newRows
      else newRows.except(
        readDvDatasets(spark, root, oldDirs)
          .where(col(DvFileCol).isin(files: _*))
          .select(col(DvFileCol), col(DvPosCol)))
    val data = readFiles(spark, root, files, schema, Map.empty,
        keepPos = true)
      .withColumn("__gab", element_at(split(col("__gap"), "/"), -1))
    // URI-rendered join keys — see readFiles' dv anti-join
    val del = fresh.join(broadcast(uriLookup(spark, files)),
      Seq(DvFileCol))
    data.join(del,
        col("__gab") === del("__gbe") &&
          col("__gpi") === del(DvPosCol) &&
          col("__gap").endsWith(concat(lit("/"), del("__gfe"))),
        "left_semi")
      .drop("__gab", "__gap", "__gpi")
  }

  /** INCREMENTAL compaction — the Delta OPTIMIZE bin-packing shape and
    * the counterpart to the whole-table [[optimize]]: only files
    * SMALLER than `smallBytes` rewrite, bin-packed into
    * ceil(their total bytes / targetFileBytes) files (default target =
    * `smallBytes`); every other file carries into the new manifest
    * unmoved. Routine maintenance after N small streaming commits is
    * therefore BATCH-proportional — a 100 TB table pays for its
    * stragglers, never a full rewrite. Small files with deletion
    * vectors materialize their deletes on the way (they rewrite, the
    * vectors retire). Commits as `op = "compact"`, which incremental
    * consumers skip like optimize. Returns the current version
    * unchanged when fewer than two files qualify. Conflict rules are
    * [[optimize]]'s. */
  def compactSmallFiles(spark: SparkSession, path: String,
      smallBytes: Long, targetFileBytes: Long = 0L): Long = {
    require(smallBytes > 0, "smallBytes must be positive")
    val m = snapshotAt(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $path"))
    val schema = snapshotSchema(spark, path, m)
    // unknown sizes (pre-r9 manifests) count as small: rewriting them
    // upgrades the metadata
    val small = m.files.filter(f =>
      m.stats.get(f).forall(_.bytes < smallBytes))
    if (small.size < 2) return m.version
    val tgt = if (targetFileBytes > 0) targetFileBytes else smallBytes
    val total = small.map(f => m.stats.get(f).map(_.bytes).getOrElse(0L)).sum
    val n = math.max(1L, (total + tgt - 1) / tgt).toInt
    val root = new Path(path)
    val pb = latestManifest(spark, path).map(_.partitionBy).getOrElse(Nil)
    val rows = readFiles(spark, root, small, schema, m.dvs)
    val packed =
      if (pb.isEmpty) rows.repartition(n)
      else rows.repartition(n, pb.map(col): _*)
    commit(packed, path, "compact", removed = small.toSet,
      expectParent = Some(m.version))
  }

  /** Latest committed version whose in-commit timestamp is ≤ `tsMillis`
    * (Delta's timestampAsOf): commit timestamps live in the manifest
    * and are forced strictly monotonic at commit time (max(now,
    * parent + 1)), so the lookup stays well-defined across writer clock
    * skew. Manifests written before timestamps existed carry ts = 0 and
    * sort before any real time. */
  def versionAtTimestamp(spark: SparkSession, path: String,
      tsMillis: Long): Option[Long] = {
    val fs = fsFor(spark, path); val root = new Path(path)
    claimedVersions(fs, root).sorted.reverse.iterator
      .flatMap(v => readManifest(fs, root, v))
      .find(_.ts <= tsMillis).map(_.version)
  }

  /** CREATE TABLE: commit version 1 recording `schema` (and
    * `partitionBy` as table metadata, inherited by every later commit)
    * with zero data rows — the catalog's create face. Fails if the
    * table already exists. */
  def createEmpty(spark: SparkSession, path: String, schema: StructType,
      partitionBy: Seq[String] = Nil): Long = {
    require(latestManifest(spark, path).isEmpty,
      s"table already exists at $path")
    commit(spark.createDataFrame(new java.util.ArrayList[Row](), schema),
      path, "append", partitionBy = partitionBy)
  }

  /** Time travel by WALL CLOCK: read the newest version committed at or
    * before `tsMillis`. */
  def readAsOfTimestamp(spark: SparkSession, path: String,
      tsMillis: Long): DataFrame =
    read(spark, path, Some(versionAtTimestamp(spark, path, tsMillis)
      .getOrElse(throw new IllegalArgumentException(
        s"no commit at or before timestamp $tsMillis at $path"))))

  /** Copy-on-write UPDATE: rows where `predicate` is TRUE get each
    * `set` column replaced by its expression (evaluated against the
    * row — `col("value") * 10` works); all other rows and columns pass
    * through untouched. File handling is [[delete]]'s: stats pre-prune
    * candidates, one exact pass picks files actually containing
    * matches, only those rewrite, and the rest of the manifest carries
    * over unmoved. Same conflict rules. */
  def update(spark: SparkSession, path: String, predicate: Column,
      set: Map[String, Column], expectVersion: Option[Long] = None): Long = {
    require(set.nonEmpty, "update needs at least one SET column")
    val m = snapshotAt(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $path"))
    checkExpected(m, expectVersion, "update", path)
    val schema = snapshotSchema(spark, path, m)
    require(set.keys.forall(schema.fieldNames.contains),
      s"SET columns ${set.keys.mkString(",")} must exist in the table")
    val root = new Path(path)
    val candidates = pruneFiles(m, analyzeBounds(spark, schema, predicate))
    if (candidates.isEmpty) return m.version
    val withFile = readFilesWithFileCol(spark, root, candidates, schema,
      m.dvs)
    val touched = collectTouched(
      withFile.where(predicate).select("__gf").distinct(), candidates,
      "update", path)
    if (touched.isEmpty) return m.version
    val hit = coalesce(predicate, lit(false))
    val rewritten = readFiles(spark, root, touched, schema, m.dvs)
      .select(schema.fieldNames.toSeq.map { c =>
        set.get(c) match {
          case Some(e) => when(hit, e).otherwise(col(c))
            .cast(schema(c).dataType).as(c)
          case None => col(c)
        }
      }: _*)
    // CDC sidecar with BOTH images (the full Delta CDF shape): update
    // pairs pre/post by row identity — the predicate selects the same
    // rows, the SET projection produces their after-values — so
    // downstream aggregate maintenance can subtract the old and add
    // the new without re-reading the table
    val cdc =
      if (!cdcEnabled(spark)) None
      else {
        val hitRows = readFiles(spark, root, touched, schema, m.dvs)
          .where(hit)
        val pre = hitRows
          .withColumn(ChangeTypeCol, lit("update_preimage"))
        val post = hitRows.select(schema.fieldNames.toSeq.map { c =>
            set.get(c) match {
              case Some(e) => e.cast(schema(c).dataType).as(c)
              case None => col(c)
            }
          }: _*)
          .withColumn(ChangeTypeCol, lit("update_postimage"))
        Some(pre.unionByName(post))
      }
    commit(rewritten, path, "update", removed = touched.toSet,
      expectParent = Some(m.version), cdc = cdc)
  }

  /** Transaction pinning (the Delta txn-version idiom): a caller that
    * planned its rewrite against a version it read earlier passes that
    * version; a newer data commit fails the rewrite up front instead of
    * silently merging against state the plan never saw. */
  private def checkExpected(m: Snapshot, expect: Option[Long], op: String,
      path: String): Unit = expect.foreach { v =>
    if (m.version != v)
      throw new java.util.ConcurrentModificationException(
        s"$op at $path prepared against version $v but found " +
          s"${m.version} — re-run the $op")
  }

  /** Copy-on-write planning collects the touched-file path list on the
    * driver (the standard log-store planning cost — Delta does the
    * same). A predicate or key batch that touches millions of files
    * would collect millions of strings and kill the driver with an
    * unattributed OOM; past this cap
    * (`spark.graft.snapshot.maxTouchedFiles`, default 100 000 ≈ a few MB
    * of paths) the plan fails LOUDLY instead, naming the op and the
    * ways out. */
  /** A data batch broke a table CHECK constraint. Raised BEFORE the
    * manifest publishes — the written files stay invisible and the next
    * vacuum sweeps them, so bad data can never become readable. */
  final class ConstraintViolation(name: String, expr: String, op: String,
      path: String)
      extends RuntimeException(
        s"$op at $path violates CHECK constraint '$name' ($expr) — the " +
        "batch was rejected before publish; fix the data or drop the " +
        "constraint")

  /** ADD a CHECK constraint (the Delta invariants/constraints shape):
    * `exprSql` is a boolean SQL expression EVERY row must satisfy. The
    * current table is validated first (one narrow read — adding a
    * constraint the data already breaks fails typed), then a
    * metadata-only commit records it; every later append / overwrite /
    * merge / update batch validates BEFORE its manifest publishes, so
    * a bad batch is rejected atomically (its files stay invisible,
    * vacuum sweeps them). NOT NULL is the special case
    * `col IS NOT NULL`. Constraints are table metadata like
    * partitionBy: inherited by every commit, restored by RESTORE,
    * removable with [[dropConstraint]]. */
  def addConstraint(spark: SparkSession, path: String, name: String,
      exprSql: String, validate: Boolean = true,
      validatedAt: Option[Long] = None): Long = {
    require(name.nonEmpty, "constraint needs a name")
    val m = snapshotAt(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $path"))
    val cur = latestManifest(spark, path).map(_.constraints)
      .getOrElse(Map.empty)
    require(!cur.contains(name),
      s"constraint '$name' already exists at $path — drop it first")
    val schema = snapshotSchema(spark, path, m)
    // the existing rows must satisfy it, or reads and rewrites would
    // disagree about which data is "valid". SQL CHECK semantics: a
    // NULL result PASSES (write `col IS NOT NULL` for null rejection).
    // `validate = false` is for callers that ALREADY scanned (Spark's
    // AddCheckConstraintExec validates before invoking alterTable —
    // re-reading every live file would double the cost of one SQL
    // ADD CONSTRAINT) or that KNOW the table is empty (CREATE TABLE).
    // A skip is only honoured while the table still sits at the version
    // the caller's scan saw (`validatedAt`): a concurrent data commit
    // landing between Spark's validation scan and this metadata commit
    // would otherwise record a constraint live rows may violate. A
    // caller passing validate=false WITHOUT naming the scanned version
    // asserts emptiness/out-of-band validation and keeps the old
    // contract.
    val mustValidate =
      validate || validatedAt.exists(_ != m.version)
    if (mustValidate) {
      val bad = readFiles(spark, new Path(path), m.files, schema, m.dvs)
        .where(not(coalesce(expr(exprSql), lit(true)))).limit(1).count()
      if (bad > 0) throw new ConstraintViolation(name, exprSql,
        "add-constraint", path)
    }
    commit(spark.createDataFrame(new java.util.ArrayList[Row](), schema),
      path, "metadata", expectParent = Some(m.version), writeData = false,
      setConstraints = Some(cur + (name -> exprSql)))
  }

  /** Remove a CHECK constraint (metadata-only commit). */
  def dropConstraint(spark: SparkSession, path: String,
      name: String, ifExists: Boolean = false): Long = {
    val m = snapshotAt(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no committed snapshot at $path"))
    val cur = latestManifest(spark, path).map(_.constraints)
      .getOrElse(Map.empty)
    // `ifExists` decides on the SAME read the drop commits against —
    // a separate caller-side existence probe would be TOCTOU-racy
    // (two concurrent IF EXISTS drops: the loser must no-op, not fail)
    if (!cur.contains(name)) {
      if (ifExists) return m.version
      throw new IllegalArgumentException(
        s"no constraint '$name' at $path (have: ${cur.keys.mkString(",")})")
    }
    val schema = snapshotSchema(spark, path, m)
    commit(spark.createDataFrame(new java.util.ArrayList[Row](), schema),
      path, "metadata", expectParent = Some(m.version), writeData = false,
      setConstraints = Some(cur - name))
  }

  /** The updates batch of a [[merge]] violates the upsert contract —
    * duplicate keys (Delta's "multiple source rows matched" error) or
    * NULL key columns (which can never equi-match a target row). */
  final class MergeSourceConflict(msg: String)
      extends RuntimeException(msg)

  /** One aggregate over the merge source enforcing the contract: no key
    * appears twice, no key column is NULL. Cost is O(batch) — a
    * groupBy on the key columns of the UPDATES only, never the table. */
  private def checkMergeSource(aligned: DataFrame, keyCols: Seq[String],
      path: String): Unit = {
    val nullKey = keyCols.map(k => col(k).isNull).reduce(_ || _)
    val probe = aligned.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__gc"))
      .agg(max(col("__gc")).as("maxPerKey"),
        sum(when(nullKey, col("__gc")).otherwise(lit(0L))).as("nullRows"))
      .head()
    val maxPerKey = if (probe.isNullAt(0)) 0L else probe.getLong(0)
    val nullRows = if (probe.isNullAt(1)) 0L else probe.getLong(1)
    if (nullRows > 0)
      throw new MergeSourceConflict(
        s"merge at $path: $nullRows update row(s) have NULL in a key " +
        s"column (${keyCols.mkString(",")}). NULL keys never match a " +
        "target row — the old row would be kept and the update " +
        "inserted. Filter NULL-key rows out or use append.")
    if (maxPerKey > 1)
      throw new MergeSourceConflict(
        s"merge at $path: a key appears $maxPerKey times in the updates " +
        "batch — multiple source rows would survive as duplicate table " +
        "rows. Deduplicate the batch on " +
        s"(${keyCols.mkString(",")}) first (e.g. keep the latest row " +
        "per key).")
  }

  final class TouchedFilesOverflow(op: String, cap: Int, path: String)
      extends RuntimeException(
        s"$op at $path matches rows in more than $cap data files — the " +
        "copy-on-write planner collects touched-file paths on the driver. " +
        "Tighten the predicate/key batch, OPTIMIZE the table into fewer " +
        "files, or raise spark.graft.snapshot.maxTouchedFiles.")

  private def collectTouched(distinctFiles: DataFrame,
      candidates: Seq[String], op: String, path: String): Seq[String] = {
    val cap = distinctFiles.sparkSession.conf
      .get("spark.graft.snapshot.maxTouchedFiles", "100000").toInt
    // limit(cap+1) bounds what crosses to the driver even when the true
    // count is pathological; one extra row is enough to detect overflow
    val rows = distinctFiles.limit(cap + 1).collect()
    if (rows.length > cap) throw new TouchedFilesOverflow(op, cap, path)
    relativize(rows.map(_.getString(0)).toSeq, candidates)
  }

  /** Files of `m` that contain at least one row whose `keyCols` match a
    * key in `keys`: stats pre-prune (single-key fast path — the key
    * range of the update batch), then an exact semi-join pass over the
    * candidates only. */
  private def touchedFiles(spark: SparkSession, root: Path, m: Snapshot,
      schema: StructType, keys: DataFrame, keyCols: Seq[String]): Seq[String] = {
    if (m.files.isEmpty) return Nil
    val candidates =
      if (keyCols.size == 1 &&
          statType(schema(keyCols.head).dataType)) {
        val k = keyCols.head
        val mm = keys.agg(min(col(k)).as("lo"), max(col(k)).as("hi")).head()
        if (mm.isNullAt(0)) Nil
        else pruneFiles(m, analyzeBounds(spark, schema,
          col(k) >= lit(mm.get(0)) && col(k) <= lit(mm.get(1))))
      } else m.files
    if (candidates.isEmpty) return Nil
    val withFile = readFilesWithFileCol(spark, root, candidates, schema,
      m.dvs)
    collectTouched(
      withFile.join(keys, keyCols, "left_semi").select("__gf").distinct(),
      candidates, "merge", root.toString)
  }

  /** Map `input_file_name` URIs back to manifest-relative paths:
    * URI-DECODE first (escaped partition values reach us %XX-encoded —
    * the same reason computeStats decodes), bucket candidates by
    * basename (near-unique: job UUID + task id; collisions only across
    * one commit's partition dirs), then confirm by full relative-path
    * suffix so nested multi-column layouts can never mis-attribute. */
  private def relativize(uris: Seq[String], rel: Seq[String]): Seq[String] = {
    val byBase = rel.groupBy(_.split('/').last)
    uris.flatMap { u =>
      val p = try new java.net.URI(u).getPath
        catch { case _: java.net.URISyntaxException => u }
      byBase.getOrElse(p.split('/').last, Nil)
        .find(r => p.endsWith("/" + r))
    }.distinct.sorted
  }

  /** Layout prefix for partition directories: the partition column is
    * DUPLICATED under this alias for `partitionBy` so the data files
    * keep the original column (Spark's partitioned write consumes the
    * layout column into the path) — readers of explicit file lists need
    * no partition-value re-attachment, and the path segment still
    * carries the exact value for the manifest. */
  private val PartPrefix = "__gp_"

  /** Inverse of Spark's partition-path escaping (%XX per escaped char);
    * non-escape text passes through. */
  private def unescapePath(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        sb.append(((Character.digit(s.charAt(i + 1), 16) << 4) |
          Character.digit(s.charAt(i + 2), 16)).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Exact partition values of a file from its `__gp_c=v` path
    * segments. The null/empty partition (Hive default dir) records
    * nothing — unknown never prunes. */
  private def partsFromPath(rel: String): Map[String, String] =
    rel.split('/').iterator.filter(_.startsWith(PartPrefix)).flatMap { seg =>
      val eq = seg.indexOf('=')
      if (eq < PartPrefix.length) None
      else {
        val v = seg.substring(eq + 1)
        if (v == "__HIVE_DEFAULT_PARTITION__") None
        else Some(seg.substring(PartPrefix.length, eq) -> unescapePath(v))
      }
    }.toMap

  /** (relative path, byte length) of every parquet file under
    * `commitDir`, one level of partition directories deep per partition
    * column — lengths come free with the listing the commit already
    * pays. */
  private def listParquet(fs: FileSystem, dir: Path,
      rel: String): Seq[(String, Long)] =
    Option(fs.listStatus(dir)).getOrElse(Array.empty).toSeq.flatMap {
      case s if s.isFile && s.getPath.getName.endsWith(".parquet") =>
        Seq(s"$rel/${s.getPath.getName}" -> s.getLen)
      case s if s.isDirectory =>
        listParquet(fs, s.getPath, s"$rel/${s.getPath.getName}")
      case _ => Nil
    }

  /** The type with every NESTED nullability flag forced true — the
    * public-API equivalent of Spark's private asNullable, for
    * nullability-insensitive type equality. */
  private def allNullable(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      StructField(f.name, allNullable(f.dataType), nullable = true,
        f.metadata)))
    case a: ArrayType => ArrayType(allNullable(a.elementType), true)
    case m: MapType =>
      MapType(allNullable(m.keyType), allNullable(m.valueType), true)
    case other => other
  }

  /** Row-level CDC is ON by default: every CoW rewrite persists its
    * exact row changes as a `_change_data/` sidecar (see [[Manifest]]),
    * which is what makes [[changeFeed]] and the V2 streaming feed
    * row-exact for EVERY op — the write amplification is O(changed
    * rows), and the extra read pass covers only the touched sliver.
    * Delta ships the same mechanism opt-in (`delta.enableChangeDataFeed`);
    * here the mirror-convergence law is the default contract, and the
    * conf is the opt-OUT for write-latency-critical tables whose feed
    * is only ever consumed in batch (where a read-time diff fallback
    * keeps exactness). */
  val CdcEnabledKey = "spark.graft.snapshot.cdc.enabled"

  /** Comma-separated column names to record per-file BLOOM FILTERS for
    * at commit time (the Delta bloom-filter-index shape): equality
    * predicates on these columns then FILE-SKIP even where min/max
    * stats are useless (unsorted high-cardinality keys — user ids,
    * document ids, join keys). Integral and string columns only;
    * unknown names and other types are ignored. The filter is a
    * roaring-bitmap over k=2 double-hashed positions mod 2^16 — for a
    * file with n distinct values the false-positive rate is
    * ~(2n/65536)^2 (n=5k → ~2%); a false positive only costs a read,
    * never correctness. */
  val BloomColumnsKey = "spark.graft.snapshot.bloom.columns"
  /** log2 of the per-file bloom position universe (default 16, clamped
    * to [10, 24]), captured at COMMIT time and recorded inside each
    * filter's tag so readers always test with the writer's modulus.
    * The r13 10× probe showed the default 2^16 saturating once a file
    * holds ≳20k distinct values (FP ≈ (1−e^(−2n/m))²) — production
    * 128 MB files want 2^20–2^24. Cost: the roaring bitmap grows with
    * the occupied positions, so the knob trades manifest bytes for
    * skipping power per column. */
  val BloomBitsKey = "spark.graft.snapshot.bloom.bits"
  private val BloomBitsDefault = 16
  private def clampBloomBits(b: Int): Int = math.max(10, math.min(24, b))
  private def bloomBitsOf(spark: SparkSession): Int =
    spark.conf.getOption(BloomBitsKey)
      .flatMap(v => scala.util.Try(v.toInt).toOption)
      .map(clampBloomBits).getOrElse(BloomBitsDefault)
  private val BloomSalt = 0x9E3779B97F4A7C15L

  private def bloomHashable(dt: DataType): Option[String] = dt match {
    case LongType | IntegerType | ShortType | ByteType => Some("l")
    case StringType => Some("s")
    case _ => None
  }

  /** The two bloom positions of a literal value — MUST mirror the
    * write side's `pmod(xxhash64(base[, salt]), 2^bits)` exactly
    * (integrals hash as LONG via the write-side cast); `bits` comes
    * from the filter's own tag, so a table written under any
    * [[BloomBitsKey]] setting reads correctly forever. */
  private def bloomPositions(lit: org.apache.spark.sql.catalyst
      .expressions.Literal, bits: Int): (Long, Long) = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    // callers validate bits ∈ [10,24] (unknown widths fail open
    // upstream); the shift here trusts that contract
    val m = 1L << bits
    def pos(h: Long): Long = ((h % m) + m) % m
    val h1 = XxHash64(Seq(lit), 42L).eval(null).asInstanceOf[Long]
    val h2 = XxHash64(Seq(lit, Literal(BloomSalt)), 42L)
      .eval(null).asInstanceOf[Long]
    (pos(h1), pos(h2))
  }

  private val CdcDir = "_change_data"
  private[graft] val ChangeTypeCol = "_change_type"

  private[graft] def cdcEnabled(spark: SparkSession): Boolean =
    spark.conf.get(CdcEnabledKey, "true").toBoolean

  private def commit(df: DataFrame, path: String, op: String,
      removed: Set[String] = Set.empty,
      expectParent: Option[Long] = None,
      txn: Option[(String, Long)] = None,
      maxRetries: Int = 20,
      partitionBy: Seq[String] = Nil,
      dvs: Map[String, Dv] = Map.empty,
      writeData: Boolean = true,
      restoreTo: Option[Snapshot] = None,
      setConstraints: Option[Map[String, String]] = None,
      cdc: Option[DataFrame] = None,
      fullRemoves: Set[String] = Set.empty): Long = {
    require(Set("append", "overwrite", "optimize", "merge", "delete",
      "update", "delete-dv", "restore", "compact", "metadata",
      "replace-where")(op), s"unknown op $op")
    val spark = df.sparkSession
    // partitionBy is TABLE metadata (the Delta rule): an explicit list
    // (re)defines the layout, every other commit — appends, CoW
    // rewrites, optimize — INHERITS the parent's, so a partitioned
    // table never silently loses its exact partition pruning to a
    // rewrite. Overwrite without a list redefines as unpartitioned.
    // ONE newest-manifest read serves every plan-time inherit below
    // (layout, constraints, validation schema) — on object stores each
    // read is a LIST + GET round-trip; the claim loop re-reads under
    // the race, which stays authoritative
    val parentAtPlan = latestManifest(spark, path)
    val effParts =
      if (partitionBy.nonEmpty) partitionBy
      else if (op == "overwrite" || op == "restore") Nil
      else parentAtPlan.map(_.partitionBy).getOrElse(Nil)
    require(effParts.forall(df.columns.contains),
      s"table at $path is partitioned by ${effParts.mkString(",")} — " +
        "the batch must carry those columns (overwrite with an explicit " +
        "partitionBy to change the layout)")
    // CHECK constraints are table metadata like partitionBy: an
    // explicit set (add/drop/restore) redefines, everything else
    // inherits the parent's
    val effConstraints: Map[String, String] = setConstraints.getOrElse(
      parentAtPlan.map(_.constraints).getOrElse(Map.empty))
    val fs = fsFor(spark, path); val root = new Path(path)
    // 1) data files land in an uncommitted per-commit directory: the
    //    DISTRIBUTED part of the commit, paid once even across retries.
    //    Metadata-only commits (delete-dv, restore) skip it entirely.
    val (adds: Seq[String], addStats: Map[String, FileStats]) =
      if (!writeData) (Nil, Map.empty[String, FileStats])
      else {
        val commitDir =
          s"data/c-${java.util.UUID.randomUUID().toString.take(12)}"
        // store-internal data files pin INT64-micros timestamps: Spark's
        // default INT96 encoding carries NO footer statistics, which
        // would cost timestamp columns their data-skipping bounds under
        // the footer-harvest stats path (r14). Values are identical on
        // read-back (Spark's internal timestamps are micros either way);
        // only the encoding changes, and only for files this log owns.
        // Session conf set/restore: prepareWrite reads it driver-side at
        // job submission, inside this same call. SINGLE-WRITER
        // assumption (r14 advice): a concurrent write on the same
        // SparkSession from another thread could observe the temporary
        // MICROS setting (harmless — values identical) or race the
        // restore; commits on one log are serialized by the commit
        // protocol, and if an embedder ever runs concurrent commits on
        // one session and a file lands INT96 anyway, the footer-harvest
        // path's typed INT96 fallback keeps stats correct.
        val tsKey = "spark.sql.parquet.outputTimestampType"
        val prevTs = spark.conf.getOption(tsKey)
        spark.conf.set(tsKey, "TIMESTAMP_MICROS")
        try {
          if (effParts.isEmpty)
            df.write.parquet(new Path(root, commitDir).toString)
          else
            // duplicate each partition column under the layout alias: the
            // alias is consumed into the directory path, the original stays
            // IN the data files (see [[PartPrefix]])
            df.select(df.columns.map(col).toSeq ++
                effParts.map(c => col(c).as(s"$PartPrefix$c")): _*)
              .write.partitionBy(effParts.map(c => s"$PartPrefix$c"): _*)
              .parquet(new Path(root, commitDir).toString)
        } finally prevTs match {
          case Some(v) => spark.conf.set(tsKey, v)
          case None => spark.conf.unset(tsKey)
        }
        val listed = listParquet(fs, new Path(root, commitDir), commitDir)
        val a = listed.map(_._1).sorted
        (a, computeStats(spark, root, commitDir, a, df.schema,
          listed.toMap))
      }
    // 1b) the row-level CDC sidecar lands next to the data, also paid
    //     once across claim retries: `_commit_version` is never stored
    //     (it is the manifest's version, unknown until the claim wins) —
    //     the feed reader stamps it per-partition
    val cdcFiles: Seq[String] = cdc match {
      case Some(c) =>
        require(c.columns.contains(ChangeTypeCol),
          s"CDC sidecar for $op at $path must carry $ChangeTypeCol")
        val cdcDir =
          s"$CdcDir/c-${java.util.UUID.randomUUID().toString.take(12)}"
        c.write.parquet(new Path(root, cdcDir).toString)
        listParquet(fs, new Path(root, cdcDir), cdcDir).map(_._1).sorted
      case None => Nil
    }
    // CHECK-constraint validation, AFTER the write and BEFORE any claim
    // (a violated batch's files stay invisible; vacuum sweeps them) —
    // only ops that can introduce NEW values validate; layout rewrites
    // (optimize/compact) and delete survivors carry already-valid rows
    if (writeData && effConstraints.nonEmpty && adds.nonEmpty &&
        Set("append", "overwrite", "merge", "update",
          "replace-where")(op)) {
      // resolve against the MERGED table schema, not the batch's: an
      // evolution append omitting a constrained column reads it as
      // null, which SQL CHECK semantics PASS — it must not crash
      // unresolved. A constraint no longer resolvable at all (an
      // overwrite dropping its column) fails typed, naming it.
      val valSchema =
        if (op == "append")
          parentAtPlan.flatMap(_.schemaJson).map { pj =>
            val ps = DataType.fromJson(pj).asInstanceOf[StructType]
            StructType(ps.fields ++ df.schema.fields
              .filterNot(f => ps.fieldNames.contains(f.name)))
          }.getOrElse(df.schema)
        else df.schema
      val checks = effConstraints.toSeq.sortBy(_._1)
      checks.foreach { case (nm, ex) =>
        try {
          spark.createDataFrame(new java.util.ArrayList[Row](), valSchema)
            .where(expr(ex)).queryExecution.analyzed
          ()
        } catch {
          case scala.util.control.NonFatal(e) =>
            throw new IllegalArgumentException(
              s"CHECK constraint '$nm' ($ex) at $path cannot be " +
                s"evaluated against this batch's schema: ${e.getMessage}")
        }
      }
      // ONE combined pass over the written files for all constraints
      // (k separate jobs would re-read the batch k times)
      val written = spark.read.schema(valSchema)
        .parquet(adds.map(f => new Path(root, f).toString): _*)
      val flags = checks.zipWithIndex.map { case ((_, ex), i) =>
        // SQL CHECK: only a FALSE result violates; NULL passes
        coalesce(expr(ex), lit(true)).as(s"__gc$i")
      }
      val bad = written.select(flags: _*)
        .where(checks.indices.map(i => !col(s"__gc$i")).reduce(_ || _))
        .limit(1).collect().headOption
      bad.foreach { r =>
        val i = checks.indices.find(i => !r.getBoolean(i)).get
        throw new ConstraintViolation(checks(i)._1, checks(i)._2, op, path)
      }
    }
    // 2) claim the next version with an atomic create-if-absent; on a
    //    lost race, re-read latest and retry (driver-side only) — except
    //    for snapshot-rewriting ops (merge/delete/optimize), which must
    //    observe the exact parent they rewrote or fail.
    var attempt = 0
    while (true) {
      // ONE log listing per attempt serves both the parent lookup and
      // the next-version computation (each listing is an object-store
      // LIST round-trip; latestManifest would list again)
      val claimed = claimedVersions(fs, root)
      val parentM = claimed.sorted.reverse.iterator
        .flatMap(v => readManifest(fs, root, v)).take(1).toSeq.headOption
      val parentV = parentM.map(_.version).getOrElse(0L)
      expectParent.foreach { exp =>
        if (parentV != exp)
          throw new java.util.ConcurrentModificationException(
            s"$op at $path prepared against version $exp but found " +
              s"$parentV — re-run the $op")
      }
      // idempotent-txn guard, re-checked under every claim attempt: a
      // replayed (appId, txnId) that already committed becomes a no-op
      // even if the duplicate raced us here (its data directory is
      // unreferenced dead weight the next vacuum sweeps)
      txn.foreach { case (app, id) =>
        if (parentM.exists(_.txns.get(app).exists(_ >= id)))
          return parentV
      }
      // layout-race guard: effParts was INHERITED before the data write;
      // if a concurrent overwrite redefined the table's partitionBy in
      // between, publishing the stale layout would silently re-partition
      // the table the other writer just re-laid-out — fail like any
      // other snapshot conflict instead (the data dir becomes vacuum
      // dead weight, same as a lost merge race)
      // constraint-race guard: a concurrent add/drop between our
      // validation pass and this claim would publish data validated
      // against the WRONG constraint set — conflict like any other
      // snapshot race
      if (setConstraints.isEmpty && writeData) {
        val pc = parentM.map(_.constraints).getOrElse(Map.empty)
        if (pc != effConstraints)
          throw new java.util.ConcurrentModificationException(
            s"$op at $path validated under constraints " +
              s"[${effConstraints.keys.mkString(",")}] but the table " +
              s"now has [${pc.keys.mkString(",")}] — re-run the $op")
      }
      if (partitionBy.isEmpty && op != "overwrite" && op != "restore") {
        val parentParts = parentM.map(_.partitionBy).getOrElse(Nil)
        if (parentParts != effParts)
          throw new java.util.ConcurrentModificationException(
            s"$op at $path planned under partitionBy=" +
              s"[${effParts.mkString(",")}] but the table now has " +
              s"[${parentParts.mkString(",")}] — re-run the $op")
      }
      // schema ENFORCEMENT + auto-merge for appends (the Delta rule):
      // a shared column whose TYPE changed is a writer bug — fail typed
      // before the claim; NEW columns evolve the table schema (the
      // manifest records the union, old files read them as null).
      // Replacement/rewrite ops define the schema outright.
      val schemaJson = parentM.flatMap(_.schemaJson) match {
        case Some(pj) if op == "append" =>
          val ps = DataType.fromJson(pj).asInstanceOf[StructType]
          df.schema.fields.foreach { f =>
            ps.fields.find(_.name == f.name).foreach { pf =>
              // compare with NESTED nullability normalized: a
              // batch-built struct<a:int NOT NULL> is type-identical to
              // the table's struct<a:int> (top-level nullability lives
              // on the StructField and was never compared)
              if (allNullable(pf.dataType) != allNullable(f.dataType))
                throw new IllegalArgumentException(
                  s"append at $path changes column ${f.name} from " +
                    s"${pf.dataType.simpleString} to " +
                    s"${f.dataType.simpleString} — cast the batch or " +
                    "overwrite the table to change types")
            }
          }
          // nullability WIDENS on evolution (the Delta read rule): a
          // column one side lacks must merge nullable — old files read
          // a new column as null, and a batch omitting a parent column
          // writes null into it. So does a nullable batch column over a
          // non-nullable table column (no write-side NOT NULL
          // enforcement here — CHECK constraints are the opt-in gate).
          // Recording such a column non-nullable would let codegen
          // elide null checks downstream and NPE on the legitimate
          // nulls.
          val merged = ps.fields.map { pf =>
            df.schema.fields.find(_.name == pf.name) match {
              case Some(f) if f.nullable && !pf.nullable =>
                pf.copy(nullable = true)
              case Some(_) => pf
              case None => pf.copy(nullable = true)
            }
          } ++ df.schema.fields
            .filterNot(f => ps.fieldNames.contains(f.name))
            .map(_.copy(nullable = true))
          StructType(merged).json
        case _ => df.schema.json
      }
      val next = math.max(parentV,
        if (claimed.isEmpty) 0L else claimed.max) + 1
      // the manifest is a DELTA: adds + explicit removes (merge/delete/
      // update) — overwrite/optimize replace the snapshot outright, so
      // their delta IS the new file list and carries no removes
      val m = Manifest(next, parentV, op, adds,
        if (op == "overwrite" || op == "optimize" || op == "restore") Nil
        else removed.toSeq.sorted,
        // a RESTORE inlines the target's full listing + stats + vectors
        // (self-checkpointing manifest): metadata-only, no data moves
        restoreTo.map(_.files),
        restoreTo.map(_.stats).getOrElse(addStats), Some(schemaJson),
        // txn high-water marks carry FORWARD even across restore: a
        // replayed streaming batch must stay a no-op after a rollback
        parentM.map(_.txns).getOrElse(Map.empty) ++ txn,
        partitionBy = effParts,
        dvs = restoreTo.map(_.dvs).getOrElse(dvs),
        // in-commit timestamps, forced strictly monotonic across writer
        // clock skew (the Delta ICT rule) — timestampAsOf stays sane
        ts = math.max(System.currentTimeMillis(),
          parentM.map(_.ts + 1).getOrElse(1L)),
        constraints = effConstraints,
        cdc = cdcFiles,
        fullRemoves = fullRemoves.toSeq.sorted)
      val dest = new Path(new Path(root, LogDir), manifestName(next))
      fs.mkdirs(new Path(root, LogDir))
      // ALL-OR-NOTHING claim: the manifest is fully written to a hidden
      // temp file first, then PUBLISHED by one atomic create-if-absent
      // primitive — hard link on local filesystems (link(2) fails if
      // dest exists), no-overwrite rename on HDFS. A visible manifest is
      // therefore ALWAYS complete: there is no in-flight-unparseable
      // state a concurrent writer could jump over (which would orphan
      // this commit's rows), and a failure anywhere before the publish
      // retries safely — the claim never became visible, so the retry
      // cannot double-commit. An unparseable vNNN.json can now only
      // mean external corruption, which writers skip and readers step
      // over as before.
      val tmpClaim = new Path(new Path(root, LogDir),
        s".tmp-${java.util.UUID.randomUUID().toString.take(12)}")
      val claimOk = try {
        val out = fs.create(tmpClaim, true)
        try out.write(renderManifest(m)) finally out.close()
        val published = fs match {
          case _: org.apache.hadoop.fs.LocalFileSystem |
               _: org.apache.hadoop.fs.RawLocalFileSystem =>
            try {
              java.nio.file.Files.createLink(
                java.nio.file.Paths.get(dest.toUri.getPath),
                java.nio.file.Paths.get(tmpClaim.toUri.getPath))
              true
            } catch {
              case _: java.nio.file.FileAlreadyExistsException => false
            }
          case _ =>
            // HDFS rename does not overwrite an existing destination
            !fs.exists(dest) && fs.rename(tmpClaim, dest)
        }
        if (!published) {
          attempt += 1
          if (attempt > maxRetries) throw new IllegalStateException(
            s"snapshot commit lost $maxRetries races at $path; giving up")
        }
        published
      } finally fs.delete(tmpClaim, false)
      if (claimOk) {
        // periodic derived checkpoint, OUTSIDE the retry scope: it is
        // derived data — a failure here loses nothing but fold length
        if (next % checkpointIntervalOf(df.sparkSession) == 0L)
          try resolveSnapshot(fs, root, next)
            .foreach(writeCheckpoint(fs, root, _))
          catch {
            case scala.util.control.NonFatal(e) =>
              // derived data — but a SYSTEMATIC failure degrades every
              // future read's fold length, so say something
              System.err.println(
                s"[snapshots] checkpoint write at $path v$next failed " +
                  s"(${e.getMessage}); reads fold more deltas until one " +
                  "succeeds")
          }
        return next
      }
    }
    -1L // unreachable
  }

  // -------------------------------------------------------------------- reads

  private def requireSnapshot(spark: SparkSession, path: String,
      version: Option[Long]): Snapshot =
    snapshotAt(spark, path, version).getOrElse(version match {
      case Some(v) => throw new IllegalArgumentException(
        s"snapshot version $v does not exist (or was vacuumed) at $path")
      case None => throw new IllegalArgumentException(
        s"no committed snapshot at $path")
    })

  /** Columns of a deletion-vector dataset (see [[Dv]]). `__gb` is the
    * covered file's basename, the PARTITION column of the dv write, so
    * one file's positions read from one directory. */
  private val DvFileCol = "__gfile"
  private val DvPosCol = "__gpos"
  private val DvBaseCol = "__gb"

  /** URI rendering of a relative path — how `_metadata.file_path`
    * spells it (java.net.URI path quoting: space → %20, '%' → %25,
    * '/' kept). An escaped partition directory renders DIFFERENTLY
    * from the on-disk name the manifest records, so the distributed
    * joins against the scan's file-path column must ENCODE the
    * driver-known side (relativize() does the inverse — decode — for
    * driver-side attribution of collected paths). */
  private def uriEncodePath(rel: String): String =
    new java.net.URI(null, null, "/" + rel, null).getRawPath.substring(1)

  /** Tiny driver-side lookup (relative path → its URI rendering and
    * URI basename) for joining manifest-known files against
    * `_metadata.file_path`. Bounded by the caller's file list (dv'd /
    * touched files — manifest-sized, never table rows). */
  private def uriLookup(spark: SparkSession,
      files: Seq[String]): DataFrame = {
    import spark.implicits._
    files.sorted.map(f => (f, uriEncodePath(f),
      uriEncodePath(f.split('/').last))).toDF(DvFileCol, "__gfe", "__gbe")
  }

  /** Scan an explicit file list under `root` with the manifest schema,
    * applying the snapshot's DELETION VECTORS: files covered by a dv
    * lose their deleted positions via one anti-join on
    * (file basename, `_metadata.row_index`) — equi keys, so Catalyst
    * plans a hash join (broadcast when the vectors are small, the usual
    * case; sort-merge when a mass-delete made them big), with a
    * path-suffix residual disambiguating basename collisions across one
    * commit's partition directories. Dv-free scans skip all of it.
    * `keepPos` retains `__gap` (absolute file path) and `__gpi` (row
    * position in file) for callers that need position attribution
    * (CoW planning, [[deleteMor]]). */
  /** Read one or more deletion-vector DATASETS as one DataFrame. Each
    * dataset root reads SEPARATELY and unions — a single multi-root
    * spark.read over independently-partitioned datasets trips Spark's
    * conflicting-directory-structures check, which would brick every
    * read of a table whose live vectors span two delete-dv commits.
    * Filters on `__gb` push through the Union into each scan, so the
    * partition-directory pruning is unchanged. */
  private def readDvDatasets(spark: SparkSession, root: Path,
      dirs: Seq[String]): DataFrame =
    dirs.map(d => spark.read.parquet(new Path(root, d).toString))
      .reduce(_.unionByName(_))

  private def readFiles(spark: SparkSession, root: Path,
      files: Seq[String], schema: StructType, dvs: Map[String, Dv],
      keepPos: Boolean = false): DataFrame = {
    if (files.isEmpty)
      return spark.createDataFrame(new java.util.ArrayList[Row](), schema)
    // the MANIFEST's schema is authoritative: without it Spark infers
    // from one sampled footer, and a schema-evolved column silently
    // vanishes whenever the sample predates the evolution
    val base = spark.read.schema(schema)
      .parquet(files.map(f => new Path(root, f).toString): _*)
    val fset = files.toSet
    val live = dvs.filter { case (f, _) => fset(f) }
    if (live.isEmpty && !keepPos) return base
    val data = base.select(col("*"),
      col("_metadata.file_path").as("__gap"),
      col("_metadata.row_index").as("__gpi"))
    val out =
      if (live.isEmpty) data
      else {
        val dirs = live.values.map(_.path).toSeq.distinct.sorted
        // prune to the scanned files' partition directories (`__gb` is
        // the dv dataset's partition column — an In filter on it cuts
        // directories at planning time, no row predicate cost)
        val bases = live.keys.map(_.split('/').last).toSeq.distinct
        // join against _metadata.file_path in ITS OWN spelling: the
        // lookup carries the URI rendering of each covered file, so
        // escaped partition directories can never silently resurrect
        // deleted rows through a failed suffix match
        val del = readDvDatasets(spark, root, dirs)
          .where(col(DvBaseCol).isin(bases: _*))
          .select(col(DvFileCol), col(DvPosCol))
          .join(broadcast(uriLookup(spark, live.keys.toSeq)),
            Seq(DvFileCol))
        data.withColumn("__gab",
            element_at(split(col("__gap"), "/"), -1))
          .join(del,
            col("__gab") === del("__gbe") &&
              col("__gpi") === del(DvPosCol) &&
              col("__gap").endsWith(concat(lit("/"), del("__gfe"))),
            "left_anti")
          .drop("__gab")
      }
    if (keepPos) out else out.drop("__gap", "__gpi")
  }

  /** [[readFiles]] keeping only the legacy `__gf` file-attribution
    * column — the CoW planning shape (exact touched-file passes). */
  private def readFilesWithFileCol(spark: SparkSession, root: Path,
      files: Seq[String], schema: StructType,
      dvs: Map[String, Dv]): DataFrame =
    readFiles(spark, root, files, schema, dvs, keepPos = true)
      .drop("__gpi").withColumnRenamed("__gap", "__gf")

  /** Read a pinned version (default: latest). The scan's file list IS
    * the manifest — no data-directory listing, stable under concurrent
    * commits. An empty snapshot (everything deleted) reads as an empty
    * DataFrame with the manifest's schema. Deletion vectors from
    * [[deleteMor]] apply transparently. */
  def read(spark: SparkSession, path: String,
      version: Option[Long] = None): DataFrame = {
    val m = requireSnapshot(spark, path, version)
    val schema = snapshotSchema(spark, path, m)
    readFiles(spark, new Path(path), m.files, schema, m.dvs)
  }

  /** DATA-SKIPPING read: prune the manifest's file list by per-file
    * column stats against `filter`'s analyzable conjuncts (=, <, <=, >,
    * >=, IN over columns vs literals — resolved through the real
    * analyzer, so implicit casts match the scan's), then run the FULL
    * filter on the survivors — pruning is a conservative superset, the
    * predicate stays authoritative (the same two-tier contract as the
    * tile-pruned cube scans). Files or columns without stats never
    * prune. On a 100 TB table a selective key-range scan plans in
    * milliseconds and touches only the matching z-span of files. */
  def scanWhere(spark: SparkSession, path: String, filter: Column,
      version: Option[Long] = None): DataFrame = {
    val m = requireSnapshot(spark, path, version)
    val schema = snapshotSchema(spark, path, m)
    val keep = pruneFiles(m, analyzeBounds(spark, schema, filter))
    readFiles(spark, new Path(path), keep, schema, m.dvs).where(filter)
  }

  /** Rows ADDED in versions (fromExclusive, toInclusive] — the
    * incremental-consumption read. Overwrite/merge/delete commits
    * contribute their adds too (file-level CDC: a merge/delete re-emits
    * rows co-located with the touched rows, and retirements are a
    * delete signal this append-level feed does not carry; pair with
    * [[TableJoins.applyChangelog]] for row-level merge semantics).
    * OPTIMIZE commits are SKIPPED: their adds are the whole table in a
    * new layout, and an incremental consumer must not re-ingest
    * everything because maintenance ran. */
  def changes(spark: SparkSession, path: String, fromExclusive: Long,
      toInclusive: Long): DataFrame = {
    require(fromExclusive < toInclusive, "empty version range")
    val fs = fsFor(spark, path); val root = new Path(path)
    var rangeSchema: Option[String] = None
    val adds = (fromExclusive + 1 to toInclusive).flatMap { v =>
      readManifest(fs, root, v) match {
        case Some(m) =>
          rangeSchema = m.schemaJson.orElse(rangeSchema)
          if (isMaintenanceOp(m.op)) Nil else m.adds
        case None if claimExists(spark, path, v) =>
          // dead claim (file present, unparseable): the writer published
          // nothing at this version — skip it, same rule as the
          // streaming source, so one externally-corrupted claim can't
          // permanently wedge incremental consumption of the range.
          // LOUDLY: under the all-or-nothing claim protocol a visible
          // vNNN.json is always complete, so an unparseable one is
          // external corruption of committed data — its adds vanish
          // from this range, and silence would make that data loss
          // unobservable (r10 advice)
          logWarning(s"graft-snapshot: skipping unparseable manifest " +
            s"v$v at $path during incremental read — if this file was " +
            "externally corrupted (not a dead claim), its changes are " +
            "missing from the range")
          Nil
        case None => throw new IllegalArgumentException(
          s"snapshot version $v does not exist (or was vacuumed) at $path")
      }
    }
    require(adds.nonEmpty,
      s"no data-changing files added in ($fromExclusive, $toInclusive]")
    // the NEWEST manifest's schema governs the range: files from older
    // commits surface late columns as null instead of the sampled-footer
    // lottery (same rule as read())
    val reader = rangeSchema.map(j => spark.read.schema(
      DataType.fromJson(j).asInstanceOf[StructType])).getOrElse(spark.read)
    reader.parquet(adds.map(f => new Path(root, f).toString): _*)
  }

  /** Ops whose commits retire files via copy-on-write rewrite. */
  private[graft] def isCowRemovalOp(op: String): Boolean =
    op == "delete" || op == "merge" || op == "update" ||
      op == "replace-where"

  /** Row-level CHANGE FEED over versions (fromExclusive, toInclusive] —
    * the Delta `readChangeFeed` shape, ROW-EXACT FOR EVERY OP:
    *  - appends contribute their added rows as `_change_type='insert'`;
    *  - merge-on-read delete-dv commits their FRESHLY deleted rows
    *    (this commit's positions minus the parent's) as `'delete'`;
    *  - CoW rewrites (delete/update/merge/replace-where) read their
    *    persisted `_change_data` sidecar (written by the committing op,
    *    see [[CdcEnabledKey]]) — exact deletes, inserts, AND
    *    `update_preimage`/`update_postimage` pairs, O(change) with no
    *    diffing; `fullRemoves` files (replaceWhere's metadata-only
    *    partition drops) synthesize per-file as deletes;
    *  - a CoW commit WITHOUT a sidecar (older writer, or CDC disabled)
    *    falls back to a read-time multiset diff of its removed files
    *    against its added files — still row-exact (net deletes +
    *    inserts, no image pairing), at the cost of re-reading the
    *    touched sliver;
    *  - overwrite emits every parent row as `'delete'` and every added
    *    row as `'insert'` (files are immutable, so whole-file
    *    synthesis is exact — the Delta rule for full replacement);
    *  - a RESTORE in the range fails typed: a rollback has no
    *    row-exact incremental representation, consumers must re-sync.
    * Each row is stamped with `_commit_version` and Delta's
    * `_commit_timestamp` (the manifest's monotonic in-commit ts; null
    * for pre-timestamp manifests). OPTIMIZE/compact commits are
    * skipped like [[changes]] (same rows, new layout), dead
    * (unparseable-but-present) claims too. The NEWEST schema in the
    * range governs: older versions' rows surface late columns as null.
    * The streaming V2 face (`option("readChangeFeed", "true")`) plans
    * the same per-version changes incrementally — which is what makes
    * a [[streamMirror]] mirror converge under ANY writer discipline. */
  def changeFeed(spark: SparkSession, path: String, fromExclusive: Long,
      toInclusive: Long): DataFrame = {
    require(fromExclusive < toInclusive, "empty version range")
    // expiry horizon: change data below it was retired by
    // expire_changes — same typed failure class as a vacuumed range
    val hz = cdcHorizon(spark, path)
    if (fromExclusive + 1 < hz)
      throw new IllegalArgumentException(
        s"change feed range ($fromExclusive, $toInclusive] at $path " +
          s"reaches below the change-data expiry horizon $hz — " +
          "change data for earlier versions was expired " +
          "(CALL system.expire_changes); re-sync the consumer and " +
          s"start the feed at or after fromExclusive=${hz - 1}")
    val fs = fsFor(spark, path); val root = new Path(path)
    // ONE manifest read per version (an object-store log pays a GET per
    // read — the gov lookup and the pieces loop must share), dead
    // claims skipped, vacuumed versions loud
    val manifests: Seq[(Long, Option[Manifest])] =
      (fromExclusive + 1 to toInclusive).map { v =>
        val m = readManifest(fs, root, v)
        if (m.isEmpty && !claimExists(spark, path, v))
          throw new IllegalArgumentException(
            s"snapshot version $v does not exist (or was vacuumed) at $path")
        v -> m
      }
    // governing schema: the newest manifest IN THE RANGE that records one
    val gov = manifests.reverseIterator
      .flatMap(_._2.flatMap(_.schemaJson)).take(1).toSeq.headOption
      .map(j => DataType.fromJson(j).asInstanceOf[StructType])
      .getOrElse(throw new IllegalArgumentException(
        s"no schema-recording manifest in ($fromExclusive, $toInclusive] " +
          s"at $path"))
    def alignData(df: DataFrame): DataFrame =
      df.select(gov.fields.toSeq.map(f =>
        (if (df.columns.contains(f.name)) col(f.name).cast(f.dataType)
         else lit(null).cast(f.dataType)).as(f.name)): _*)
    // ONE select: `ct` may be a literal or a column OF `df` (the cdc
    // sidecar carries _change_type in its files)
    def stamped(df: DataFrame, ct: Column, v: Long, ts: Long): DataFrame =
      df.select(gov.fields.toSeq.map(f =>
        (if (df.columns.contains(f.name)) col(f.name).cast(f.dataType)
         else lit(null).cast(f.dataType)).as(f.name)) ++ Seq(
        ct.as("_change_type"),
        lit(v).as("_commit_version"),
        (if (ts > 0L) lit(new java.sql.Timestamp(ts))
         else lit(null).cast(org.apache.spark.sql.types.TimestampType))
          .as("_commit_timestamp")): _*)
    def parentView(m: Manifest): Snapshot =
      if (m.parent <= 0L) Snapshot(0L, "append", Nil, Map.empty, None,
        Map.empty)
      else resolveSnapshot(fs, root, m.parent).getOrElse(
        throw new IllegalArgumentException(
          s"cannot resolve parent version ${m.parent} at $path — " +
            "vacuumed past the feed range"))
    val pieces = manifests.flatMap {
      case (_, Some(m)) if isMaintenanceOp(m.op) => Nil
      case (v, Some(m)) if m.op == "delete-dv" =>
        Seq(stamped(deletedRows(spark, path, v), lit("delete"), v, m.ts))
      case (v, Some(m)) if m.op == "restore" =>
        throw new IllegalArgumentException(
          s"change feed range at $path contains a RESTORE at version " +
            s"$v — a rollback has no row-exact incremental " +
            "representation; re-sync consumers from read() and resume " +
            "the feed after it")
      case (v, Some(m)) if m.cdc.nonEmpty || m.fullRemoves.nonEmpty =>
        // the writer's persisted sidecar is authoritative: it carries
        // every insert/delete/update image of the commit — adds are
        // NOT re-emitted (they contain co-located survivor rows)
        val cdcPiece =
          if (m.cdc.isEmpty) Nil
          else {
            val reader = m.schemaJson.map { j =>
              val ds = DataType.fromJson(j).asInstanceOf[StructType]
              spark.read.schema(ds.add(ChangeTypeCol,
                org.apache.spark.sql.types.StringType))
            }.getOrElse(spark.read)
            val cdcDf = reader.parquet(
              m.cdc.map(f => new Path(root, f).toString): _*)
            Seq(stamped(cdcDf, col(ChangeTypeCol), v, m.ts))
          }
        val fullPiece =
          if (m.fullRemoves.isEmpty) Nil
          else {
            val p = parentView(m)
            Seq(stamped(
              readFiles(spark, root, m.fullRemoves,
                snapshotSchema(spark, path, p),
                p.dvs.filter { case (f, _) => m.fullRemoves.contains(f) }),
              lit("delete"), v, m.ts))
          }
        cdcPiece ++ fullPiece
      case (v, Some(m)) if m.op == "overwrite" =>
        // parent vacuumed ⇒ the overwrite IS the feed's effective
        // start: inserts only (the V2 face plans identically)
        val p0 =
          if (m.parent <= 0L) None
          else resolveSnapshot(fs, root, m.parent)
        val dels = p0.toSeq.filter(_.files.nonEmpty).map(p =>
          stamped(
            readFiles(spark, root, p.files,
              snapshotSchema(spark, path, p), p.dvs),
            lit("delete"), v, m.ts))
        val ins =
          if (m.adds.isEmpty) Nil
          else {
            val reader = m.schemaJson.map(j => spark.read.schema(
                DataType.fromJson(j).asInstanceOf[StructType]))
              .getOrElse(spark.read)
            Seq(stamped(reader.parquet(
                m.adds.map(f => new Path(root, f).toString): _*),
              lit("insert"), v, m.ts))
          }
        dels ++ ins
      case (v, Some(m)) if isCowRemovalOp(m.op) && m.removes.nonEmpty =>
        // legacy fallback (no sidecar): net multiset diff of the
        // removed files (parent's DV-aware view) vs the added files —
        // unchanged survivor rows cancel, exactly the changed rows
        // emit. Costs one re-read of the touched sliver; commits
        // written with CDC enabled never take this path.
        val p = parentView(m)
        val oldRows = alignData(readFiles(spark, root, m.removes,
          snapshotSchema(spark, path, p),
          p.dvs.filter { case (f, _) => m.removes.contains(f) }))
        val newRows =
          if (m.adds.isEmpty)
            alignData(spark.createDataFrame(
              new java.util.ArrayList[Row](), gov))
          else {
            val reader = m.schemaJson.map(j => spark.read.schema(
                DataType.fromJson(j).asInstanceOf[StructType]))
              .getOrElse(spark.read)
            alignData(reader.parquet(
              m.adds.map(f => new Path(root, f).toString): _*))
          }
        Seq(stamped(oldRows.exceptAll(newRows), lit("delete"), v, m.ts),
          stamped(newRows.exceptAll(oldRows), lit("insert"), v, m.ts))
      case (v, Some(m)) if m.adds.nonEmpty =>
        val reader = m.schemaJson.map(j => spark.read.schema(
            DataType.fromJson(j).asInstanceOf[StructType]))
          .getOrElse(spark.read)
        Seq(stamped(
          reader.parquet(m.adds.map(f => new Path(root, f).toString): _*),
          lit("insert"), v, m.ts))
      case (v, None) =>
        // dead claim — same loud skip as [[changes]]: corruption of a
        // published manifest must not silently drop its rows
        logWarning(s"graft-snapshot: skipping unparseable manifest " +
          s"v$v at $path during change-feed read — if this file was " +
          "externally corrupted (not a dead claim), its changes are " +
          "missing from the range")
        Nil
      case _ => Nil // metadata-only commit
    }
    require(pieces.nonEmpty,
      s"no row-level changes in ($fromExclusive, $toInclusive] at $path")
    pieces.reduce(_.unionByName(_))
  }

  /** Apply a [[changeFeed]] slice to a KEYED MATERIALIZATION of the
    * table — the consumer half of row-level CDC: per key, the
    * newest-commit change wins ('insert' upserts the row, 'delete'
    * removes it), base rows rank below every feed row. The law this
    * buys (spec-pinned): for a unique-key table,
    * `applyChangeFeed(read(v0), changeFeed(v0, v], keys) == read(v)` —
    * a downstream index/aggregate/mirror stays exact by consuming
    * O(changes), never re-syncing O(table). One shuffle on the keys;
    * the winner pick is a max over (commit, change-type) structs, the
    * same shape as [[TableJoins.applyChangelog]]. */
  def applyChangeFeed(base: DataFrame, feed0: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "applyChangeFeed needs at least one key")
    // update PREIMAGES are informational — the postimage carries the
    // after-value. They must drop BEFORE the winner pick: within one
    // commit "update_preimage" sorts above "update_postimage", so the
    // max-struct would otherwise apply the OLD values.
    val feed = feed0.where(col("_change_type") =!= lit("update_preimage"))
    val metaCols =
      Set("_change_type", "_commit_version", "_commit_timestamp")
    // payload = the UNION of both sides' data columns: a feed whose
    // range contains a schema-evolving commit carries columns the v0
    // base lacks, and dropping them would silently violate the
    // state+feed == read(v) law — the missing side reads them as null
    // (exactly what read(v) does for pre-evolution files)
    val feedData = feed.columns.filterNot(metaCols.contains).toSeq
    val payload = (base.columns.toSeq ++ feedData).distinct
      .filterNot(keys.contains)
    val internal = Seq("__gcf_v", "__gcf_ct", "__gcf_w")
    require(!(base.columns ++ feed.columns).exists(internal.contains),
      s"applyChangeFeed reserves columns ${internal.mkString(",")}")
    val typeOf: Map[String, org.apache.spark.sql.types.DataType] =
      (base.schema.fields ++ feed.schema.fields)
        .map(f => f.name -> f.dataType).toMap
    def aligned(df: DataFrame): Seq[Column] = payload.map(p =>
      (if (df.columns.contains(p)) col(p)
       else lit(null).cast(typeOf(p))).as(p))
    val b = base.select(keys.map(col) ++ Seq(lit(0L).as("__gcf_v"),
      lit("insert").as("__gcf_ct")) ++ aligned(base): _*)
    val c = feed.select(keys.map(col) ++ Seq(
      col("_commit_version").as("__gcf_v"),
      col("_change_type").as("__gcf_ct")) ++ aligned(feed): _*)
    val ordered = struct(col("__gcf_v") +: col("__gcf_ct") +:
      payload.map(col): _*)
    b.unionByName(c)
      .groupBy(keys.map(col): _*)
      .agg(max(ordered).as("__gcf_w"))
      .where(col("__gcf_w.__gcf_ct") =!= "delete")
      .select(keys.map(col) ++
        payload.map(p => col(s"__gcf_w.$p").as(p)): _*)
  }

  // ------------------------------------------------------------------- vacuum

  /** Unreferenced data files younger than this survive [[vacuum]]: a
    * concurrent writer's commit writes its data files FIRST (step 1) and
    * publishes the manifest after, so an unreferenced-but-recent file may
    * be an in-flight commit, and deleting it would let the subsequent
    * publish commit a manifest pointing at deleted data — silent table
    * corruption. Delta guards the same race with a modification-time
    * retention threshold; 24 h bounds any realistic write-to-publish gap
    * by orders of magnitude. Override per-call (`graceMs = 0` only when
    * no writer can be live — e.g. tests, or a true single-writer
    * maintenance window). */
  val DefaultVacuumGraceMs: Long = 24L * 3600 * 1000

  /** Retention sweep: drop manifests with version < keepFromVersion and
    * delete every data file no RETAINED manifest references (aborted
    * claims too) — EXCEPT files modified within `graceMs` of now, which
    * may belong to an in-flight commit that has written data but not yet
    * published its manifest (see [[DefaultVacuumGraceMs]]). Time travel
    * to vacuumed versions then raises; retained reads are untouched.
    * Returns deleted data-file count. A reader pinned to a version older
    * than the horizon loses its files, so run from a maintenance window
    * like [[Compaction.compactDirectory]]. */
  def vacuum(spark: SparkSession, path: String, keepFromVersion: Long,
      graceMs: Long = DefaultVacuumGraceMs): Long =
    vacuumImpl(spark, path, keepFromVersion, graceMs, dryRun = false)._1

  /** What [[vacuum]] WOULD remove, removing nothing (Delta's
    * `VACUUM ... DRY RUN`): the same referenced-set computation, grace
    * window and traversal rules, but every delete is recorded instead
    * of executed — including the manifests/checkpoints that would
    * retire. Returns root-relative paths. The one divergence from a
    * real run: no checkpoints are materialized (a dry run must not
    * write), so a later real vacuum may keep strictly MORE resolvable
    * history, never less. */
  def vacuumDryRun(spark: SparkSession, path: String,
      keepFromVersion: Long,
      graceMs: Long = DefaultVacuumGraceMs): Seq[String] =
    vacuumImpl(spark, path, keepFromVersion, graceMs, dryRun = true)._2

  private def vacuumImpl(spark: SparkSession, path: String,
      keepFromVersion: Long, graceMs: Long,
      dryRun: Boolean): (Long, Seq[String]) = {
    val fs = fsFor(spark, path); val root = new Path(path)
    // LinkedHashSet: the sweep may plan a file once per-file and again
    // via its parent directory's recursive removal — the listing must
    // stay one row per path
    val planned = scala.collection.mutable.LinkedHashSet[String]()
    // every removal funnels through here: a dry run records the
    // root-relative path UNIFORMLY PER-FILE (a recursive directory
    // removal is expanded to the files inside it — never a bare
    // directory row, so the listing has one granularity and the
    // parquet-suffixed rows match the real run's deleted count
    // exactly); a real run deletes
    def remove(p: Path, rel: String, recursive: Boolean): Unit =
      if (!dryRun) fs.delete(p, recursive)
      else if (!recursive) planned += rel
      else Option(fs.listStatus(p)).getOrElse(Array.empty).foreach { st =>
        remove(st.getPath, s"$rel/${st.getPath.getName}",
          recursive = st.isDirectory)
      }
    val all = claimedVersions(fs, root).sorted
    val retained = all.filter(_ >= keepFromVersion)
    require(retained.exists(v => readManifest(fs, root, v).isDefined),
      s"vacuum would retire every committed version at $path")
    // materialize a checkpoint at every retained version whose delta
    // chain would otherwise reach BELOW the horizon — after the sweep,
    // resolution must never need a retired manifest
    if (!dryRun) retained.foreach { v =>
      if (readCheckpoint(fs, root, v).isEmpty)
        resolveSnapshot(fs, root, v).foreach { s =>
          val m = readManifest(fs, root, v)
          val chainsDown = m.exists(mm => mm.files.isEmpty &&
            mm.op != "overwrite" && mm.op != "optimize" &&
            mm.parent < keepFromVersion)
          if (chainsDown) writeCheckpoint(fs, root, s)
        }
    }
    val snaps = retained.flatMap(v => resolveSnapshot(fs, root, v))
    val referenced: Set[String] = snaps.flatMap(_.files).toSet
    val referencedDv: Set[String] =
      snaps.flatMap(_.dvs.values.map(_.path)).toSet
    // CDC sidecar files retire with their manifest: only RETAINED
    // manifests' sidecars stay referenced (the feed below the horizon
    // already fails loudly, so nothing can read a swept sidecar) —
    // and a retained manifest below the EXPIRY horizon no longer pins
    // its sidecar either (expire_changes retired it; a crashed expiry
    // run's orphans get reclaimed here)
    val cdcHz = cdcHorizon(spark, path)
    val referencedCdc: Set[String] = retained.filter(_ >= cdcHz)
      .flatMap(v => readManifest(fs, root, v)).flatMap(_.cdc).toSet
    def countParquet(fs: FileSystem, dir: Path): Long =
      Option(fs.listStatus(dir)).getOrElse(Array.empty).map { st =>
        if (st.isDirectory) countParquet(fs, st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) 1L else 0L
      }.sum
    // delete unreferenced data files (listing data/ is the one full
    // listing vacuum pays — it is the op whose JOB is the full sweep)
    var deleted = 0L
    val horizon = System.currentTimeMillis() - math.max(0L, graceMs)
    val dataDir = new Path(root, "data")
    // RECURSIVE sweep: partitioned commits nest their files one
    // __gp_col=val level below the commit directory — a single-level
    // walk would never reclaim them. Returns whether anything survives
    // under `dir`; an emptied subtree is removed by its caller ONLY
    // when the directory itself is older than the grace horizon (a
    // fresh directory may be a concurrent commit's write in progress —
    // _temporary staging, no parquet landed yet — and the grace
    // window's whole promise is that in-flight commits survive).
    def sweep(dir: Path, rel: String,
        refs: Set[String] = referenced): Boolean = {
      var kept = false
      Option(fs.listStatus(dir)).getOrElse(Array.empty).foreach { st =>
        val childRel = s"$rel/${st.getPath.getName}"
        if (st.isDirectory) {
          if (sweep(st.getPath, childRel, refs) ||
              st.getModificationTime >= horizon) kept = true
          else remove(st.getPath, childRel, recursive = true)
        } else if (st.isFile && !refs.contains(childRel) &&
            st.getModificationTime < horizon) {
          // manifests only ever reference .parquet files, so any
          // unreferenced OLD file is garbage — including _SUCCESS
          // markers and crashed writers' _temporary staging, which
          // would otherwise pin their dead commit directory forever
          remove(st.getPath, childRel, recursive = false)
          if (st.getPath.getName.endsWith(".parquet")) deleted += 1
        } else kept = true
      }
      kept
    }
    if (fs.exists(dataDir)) {
      Option(fs.listStatus(dataDir)).getOrElse(Array.empty).foreach { cd =>
        val rel = s"data/${cd.getPath.getName}"
        if (cd.isDirectory && !sweep(cd.getPath, rel) &&
            cd.getModificationTime < horizon)
          remove(cd.getPath, rel, recursive = true)
      }
    }
    // CDC sidecar sweep: same commit-directory layout and in-flight
    // grace rules as data/
    val cdcRoot = new Path(root, CdcDir)
    if (fs.exists(cdcRoot)) {
      Option(fs.listStatus(cdcRoot)).getOrElse(Array.empty).foreach { cd =>
        val rel = s"$CdcDir/${cd.getPath.getName}"
        if (cd.isDirectory && !sweep(cd.getPath, rel, referencedCdc) &&
            cd.getModificationTime < horizon)
          remove(cd.getPath, rel, recursive = true)
      }
    }
    // deletion-vector datasets retire the same way: one dv/d-* dataset
    // per delete-dv commit, unreferenced once every covering snapshot's
    // vectors were superseded, materialized by CoW/optimize, or vacuumed
    // past — same in-flight grace window as data files
    val dvDir = new Path(root, "dv")
    if (fs.exists(dvDir)) {
      Option(fs.listStatus(dvDir)).getOrElse(Array.empty).foreach { d =>
        if (d.isDirectory &&
            !referencedDv.contains(s"dv/${d.getPath.getName}") &&
            d.getModificationTime < horizon) {
          // count the PARQUET FILES inside the dataset, not the
          // directory, so the returned metric stays per-file across
          // both sweep phases (a dv dataset is a partitioned write —
          // one directory, many files). The dry run lists those files
          // too — a directory-only row would under-report vs the real
          // run's per-file count.
          deleted += countParquet(fs, d.getPath)
          // remove() expands the recursive dataset removal to per-file
          // dry-run rows itself — no separate walk, no directory row
          remove(d.getPath, s"dv/${d.getPath.getName}", recursive = true)
        }
      }
    }
    all.filter(_ < keepFromVersion).foreach { v =>
      remove(new Path(new Path(root, LogDir), manifestName(v)),
        s"$LogDir/${manifestName(v)}", recursive = false) }
    checkpointVersions(fs, root).filter(_ < keepFromVersion).foreach { v =>
      remove(new Path(new Path(root, LogDir), checkpointName(v)),
        s"$LogDir/${checkpointName(v)}", recursive = false) }
    // orphaned claim temp files: a JVM killed between create(tmpClaim)
    // and its finally leaves .tmp-* in the log dir that nothing else
    // ever deletes — reclaim past the grace horizon
    Option(fs.listStatus(new Path(root, LogDir))).getOrElse(Array.empty)
      .foreach { st =>
        if (st.isFile && st.getPath.getName.startsWith(".tmp-") &&
            st.getModificationTime < horizon)
          remove(st.getPath, s"$LogDir/${st.getPath.getName}",
            recursive = false)
      }
    (deleted, planned.toSeq)
  }

  // ------------------------- CDC sidecar expiry (independent of vacuum)

  private val CdcHorizonFile = "_cdc_horizon"

  /** First version whose row-level change data is still AVAILABLE to
    * the change feed (1 = never expired). Advanced monotonically by
    * [[expireChanges]]. TWO-TIER persistence: the well-known
    * `_cdc_horizon` file is the O(1) fast path every reader (batch
    * feed, streaming micro-batch, TVF) takes — one tiny read, never a
    * directory listing on the hot path; value-suffixed markers
    * (`_cdc_horizon.<v>`, atomic create-new-file) are the crash
    * anchors: if a writer died inside its delete+rename republish
    * window the fast file is MISSING and readers fall back to the
    * marker max, so the horizon can never regress to 1. Concurrent
    * expires are last-writer-wins on the fast file (administrative
    * op — callers serialize), but the marker max still bounds the
    * regression to the smaller of the two published values. */
  def cdcHorizon(spark: SparkSession, path: String): Long = {
    val fs = fsFor(spark, path); val root = new Path(path)
    val logDir = new Path(root, LogDir)
    readLogBytes(fs, new Path(logDir, CdcHorizonFile))
      .flatMap(b => scala.util.Try(new String(b,
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong).toOption)
      .getOrElse {
        val markers: Seq[Long] =
          if (!fs.exists(logDir)) Nil
          else fs.listStatus(logDir).toSeq.map(_.getPath.getName)
            .filter(_.startsWith(CdcHorizonFile + "."))
            .flatMap(n => scala.util.Try(
              n.substring(CdcHorizonFile.length + 1).toLong).toOption)
        (markers :+ 1L).max
      }
  }

  /** Expire the row-level CDC sidecars of every version BELOW
    * `keepFromVersion`, independent of manifest vacuum — the Delta
    * change-data-retention knob. Sidecars are the write-amplification
    * cost center (every CoW rewrite persists its pre/post images); a
    * table whose history must stay time-travelable can still cap feed
    * storage by expiring old change data while keeping every manifest
    * and data file. After expiry, any feed range touching a version
    * below the horizon fails with the same typed error a vacuumed
    * range raises; time travel and table reads are untouched. Returns
    * the number of sidecar parquet files removed. Monotonic and
    * idempotent: re-running with an older bound is a no-op. */
  def expireChanges(spark: SparkSession, path: String,
      keepFromVersion: Long): Long = {
    val fs = fsFor(spark, path); val root = new Path(path)
    val latest = latestVersion(spark, path)
    require(latest > 0L, s"no committed snapshot at $path")
    require(keepFromVersion <= latest + 1,
      s"expire_changes keep_from_version=$keepFromVersion is beyond " +
        s"the latest version $latest at $path")
    val cur = cdcHorizon(spark, path)
    if (keepFromVersion <= cur) return 0L
    var removed = 0L
    // the horizon is published FIRST: readers step down to the typed
    // below-horizon error before any sidecar byte disappears, so a
    // feed can never half-read an expiring version. Publish order:
    // (1) atomic CREATE of the value-suffixed crash anchor — from this
    // instant the horizon survives any crash (readers fall back to
    // the marker max when the fast file is missing); (2) republish
    // the O(1) fast file by delete+rename — a reader in that window
    // hits the marker fallback, never a regressed value; (3) sweep
    // markers STRICTLY below the new value (the current one stays as
    // the standing anchor).
    val logDir = new Path(root, LogDir)
    val marker = new Path(logDir, s"$CdcHorizonFile.$keepFromVersion")
    // TRUE create-new semantics (matches the "atomic create-new-file"
    // contract in cdcHorizon's doc): the marker name embeds its value, so
    // a concurrent creator wrote the identical content — already-exists
    // is success, not an error (round-13 advice).
    try {
      val mo = fs.create(marker, false)
      try mo.write(keepFromVersion.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally mo.close()
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => ()
      case _: java.io.IOException if fs.exists(marker) => ()
    }
    val tmp = new Path(logDir,
      s".tmp-horizon-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(keepFromVersion.toString
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new Path(logDir, CdcHorizonFile)
    // Regression guard for concurrent expires (round-13 advice): if a
    // racing expire already published a HIGHER horizon — and may already
    // have deleted sidecars up to it — republishing ours would step the
    // fast file back below durable markers and send readers into raw
    // missing-file territory instead of the typed below-horizon error.
    // Re-read the fast file at the last instant and keep the max. (Admin
    // ops are documented callers-serialize; this bounds the damage when
    // they don't.)
    val fastNow = readLogBytes(fs, dst).flatMap(b => scala.util.Try(
      new String(b, java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
      .toOption)
    if (fastNow.exists(_ >= keepFromVersion)) {
      fs.delete(tmp, false)
    } else {
      fs.delete(dst, false)
      if (!fs.rename(tmp, dst))
        throw new IllegalStateException(
          s"expire_changes at $path: cannot publish horizon file " +
            "(the marker anchor is durable; re-run to republish)")
    }
    fs.listStatus(logDir).foreach { st =>
      val n = st.getPath.getName
      val superseded = n.startsWith(CdcHorizonFile + ".") &&
        scala.util.Try(n.substring(CdcHorizonFile.length + 1).toLong)
          .toOption.exists(_ < keepFromVersion)
      if (superseded) fs.delete(st.getPath, false)
    }
    // sweep from the OLDEST still-manifested version, not the previous
    // horizon: a run that crashed between publishing its horizon and
    // finishing its deletes leaves sidecars below `cur` that a
    // cur-anchored loop would never revisit — re-scanning the (already
    // bounded) below-horizon range makes every advance reclaim them
    val sweepFrom = math.min(cur, oldestAvailableVersion(spark, path))
    (sweepFrom until keepFromVersion).foreach { v =>
      readManifest(fs, root, v).foreach { m =>
        m.cdc.foreach { f =>
          if (fs.delete(new Path(root, f), false)) removed += 1
        }
        // prune the commit's sidecar directory once no parquet is left
        // (sidecars are written one directory per commit; _SUCCESS
        // markers alone must not pin a drained directory forever)
        m.cdc.headOption.foreach { f =>
          val dir = new Path(root, f).getParent
          if (fs.exists(dir) && !fs.listStatus(dir).exists(
              _.getPath.getName.endsWith(".parquet")))
            fs.delete(dir, true)
        }
      }
    }
    removed
  }
}
