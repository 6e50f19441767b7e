package graft.sources

import graft.ops.Snapshots
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL stored procedures for the `graft-snapshot` lakehouse — the
  * maintenance surface as `CALL` statements (the Iceberg
  * `CALL cat.system.proc(...)` convention, on Spark 4's
  * `ProcedureCatalog` API):
  *
  * {{{
  * CALL graft.system.optimize(`table` => 'db.t', num_files => 4)
  * CALL graft.system.optimize(`table` => 'db.t', num_files => 4,
  *                            zorder => 'x,y')
  * CALL graft.system.optimize_to_size(`table` => 'db.t',
  *                                    target_file_bytes => 134217728)
  * CALL graft.system.vacuum(`table` => 'db.t', keep_from_version => 3)
  * CALL graft.system.vacuum_dry_run(`table` => 'db.t',
  *                                  keep_from_version => 3)
  * CALL graft.system.expire_changes(`table` => 'db.t',
  *                                  keep_from_version => 3)
  * CALL graft.system.restore(`table` => 'db.t', version => 2)
  * CALL graft.system.history(`table` => 'db.t')
  * }}}
  *
  * Each routes through the engine op and therefore the full commit
  * protocol; results come back as rows (new version, removal counts,
  * the history listing), so a pure-SQL operator can run the whole
  * maintenance lifecycle — the reference exposes maintenance only
  * through its Python API. Procedures live under the `system`
  * namespace; `table` is a catalog-relative identifier (`db.t`),
  * resolved through the same segment validation as the table surface
  * (no path escape). */
private[sources] object SnapshotProcedures {

  private def inParam(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  private def inParamDefault(name: String, dt: DataType,
      defaultSql: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(defaultSql).build()

  /** One self-binding procedure: fixed parameter list, fixed output
    * schema, driver-side body over the engine ops (maintenance is
    * metadata work — the heavy lifting happens in the Spark jobs the
    * engine op launches, never in this row materialization). */
  private final class P(
      override val name: String,
      override val description: String,
      params: Array[ProcedureParameter],
      out: StructType,
      body: (SparkSession, InternalRow) => Seq[InternalRow])
      extends UnboundProcedure with BoundProcedure {
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false // side-effecting
    override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val spark = SparkSession.active
      val resultRows = body(spark, input).toArray
      val scan: Scan = new LocalScan {
        override def rows(): Array[InternalRow] = resultRows
        override def readSchema(): StructType = out
      }
      java.util.Collections.singletonList(scan).iterator()
    }
  }

  private def row(vals: Any*): InternalRow =
    new GenericInternalRow(vals.toArray)

  private val versionOut = StructType(Seq(StructField("version", LongType)))

  /** `table => 'db.t'` → warehouse path, through the catalog's own
    * segment validation (a backticked '..' must not escape). */
  private def tablePath(warehouse: String, checkSegment: String => String,
      input: InternalRow): String = {
    require(!input.isNullAt(0), "procedure argument `table` is required")
    val ident = input.getUTF8String(0).toString
    (warehouse +: ident.split('.').toSeq.map(checkSegment))
      .mkString("/")
  }

  def all(warehouse: String,
      checkSegment: String => String): Seq[UnboundProcedure] = Seq(
    new P("optimize",
      "Rewrite the table into num_files files (optionally z-order " +
        "clustered by the given comma-separated columns; optionally " +
        "SCOPED by `where`, a SQL predicate selecting the files to " +
        "rewrite by their stats — Delta's OPTIMIZE ... WHERE) as one " +
        "maintenance commit; returns the new version.",
      Array(inParam("table", StringType),
        inParam("num_files", IntegerType),
        inParamDefault("zorder", StringType, "''"),
        inParamDefault("z_bits", IntegerType, "16"),
        inParamDefault("where", StringType, "''")),
      versionOut,
      (spark, in) => {
        val p = tablePath(warehouse, checkSegment, in)
        val zcols = Option(in.getUTF8String(2)).map(_.toString)
          .getOrElse("").split(',').map(_.trim).filter(_.nonEmpty).toSeq
        val zorderBy =
          if (zcols.isEmpty) Nil
          else {
            // bounds for the z-curve come from the table itself: one
            // min/max aggregate over exactly the named columns
            val agg = Snapshots.read(spark, p).agg(
              org.apache.spark.sql.functions
                .min(col(zcols.head)).cast("double"),
              (zcols.flatMap(c => Seq(
                org.apache.spark.sql.functions.min(col(c)).cast("double"),
                org.apache.spark.sql.functions.max(col(c)).cast("double")))
                .drop(1)): _*).head()
            zcols.zipWithIndex.map { case (c, i) =>
              // empty table / all-NULL / non-numeric (string casts to
              // null) → typed error naming the column, never an NPE
              // out of Row unboxing — this surface serves pure-SQL
              // operators
              if (agg.isNullAt(2 * i) || agg.isNullAt(2 * i + 1))
                throw new IllegalArgumentException(
                  s"optimize zorder: column '$c' has no numeric " +
                    "min/max (empty table, all NULL, or non-numeric " +
                    "type) — z-order needs numeric bounds")
              (c, agg.getDouble(2 * i), agg.getDouble(2 * i + 1)) }
          }
        val whereSql = Option(in.getUTF8String(4)).map(_.toString)
          .getOrElse("").trim
        val v =
          if (whereSql.isEmpty)
            Snapshots.optimize(spark, p, in.getInt(1), zorderBy,
              in.getInt(3))
          else Snapshots.optimizeWhere(spark, p,
            org.apache.spark.sql.functions.expr(whereSql), in.getInt(1),
            zorderBy, in.getInt(3))
        Seq(row(v))
      }),
    new P("optimize_to_size",
      "Rewrite the table targeting target_file_bytes per file " +
        "(file count from recorded manifest sizes); returns the new " +
        "version.",
      Array(inParam("table", StringType),
        inParam("target_file_bytes", LongType)),
      versionOut,
      (spark, in) => Seq(row(Snapshots.optimizeToSize(spark,
        tablePath(warehouse, checkSegment, in), in.getLong(1))))),
    new P("vacuum",
      "Retire versions below keep_from_version and sweep unreferenced " +
        "data/CDC/DV files older than grace_ms; returns the number of " +
        "files removed.",
      Array(inParam("table", StringType),
        inParam("keep_from_version", LongType),
        inParamDefault("grace_ms", LongType,
          Snapshots.DefaultVacuumGraceMs.toString)),
      StructType(Seq(StructField("files_removed", LongType))),
      (spark, in) => Seq(row(Snapshots.vacuum(spark,
        tablePath(warehouse, checkSegment, in), in.getLong(1),
        in.getLong(2))))),
    new P("compact_small_files",
      "Incremental bin-packing compaction: only files smaller than " +
        "small_bytes rewrite (into ceil(total/target_file_bytes) " +
        "files; target defaults to small_bytes); everything else " +
        "carries unmoved. Returns the new version (unchanged when " +
        "fewer than two files qualify).",
      Array(inParam("table", StringType),
        inParam("small_bytes", LongType),
        inParamDefault("target_file_bytes", LongType, "0")),
      versionOut,
      (spark, in) => Seq(row(Snapshots.compactSmallFiles(spark,
        tablePath(warehouse, checkSegment, in), in.getLong(1),
        in.getLong(2))))),
    new P("vacuum_dry_run",
      "List everything vacuum(keep_from_version, grace_ms) WOULD " +
        "remove — one row per root-relative path — deleting nothing " +
        "(Delta's VACUUM ... DRY RUN).",
      Array(inParam("table", StringType),
        inParam("keep_from_version", LongType),
        inParamDefault("grace_ms", LongType,
          Snapshots.DefaultVacuumGraceMs.toString)),
      StructType(Seq(StructField("path", StringType))),
      (spark, in) => Snapshots.vacuumDryRun(spark,
        tablePath(warehouse, checkSegment, in), in.getLong(1),
        in.getLong(2)).map(p => row(UTF8String.fromString(p)))),
    new P("expire_changes",
      "Expire the row-level CDC sidecars of every version below " +
        "keep_from_version, independent of manifest vacuum (the " +
        "change-data retention knob — sidecars are the " +
        "write-amplification cost center). Feeds touching expired " +
        "versions fail typed; time travel and reads are untouched. " +
        "Returns the number of sidecar files removed.",
      Array(inParam("table", StringType),
        inParam("keep_from_version", LongType)),
      StructType(Seq(StructField("files_removed", LongType))),
      (spark, in) => Seq(row(Snapshots.expireChanges(spark,
        tablePath(warehouse, checkSegment, in), in.getLong(1))))),
    new P("restore",
      "Roll the table back to an earlier state as a NEW commit " +
        "(time travel + every later version stay intact); target by " +
        "version OR by timestamp_ms (epoch millis — resolves to the " +
        "newest commit at or before it, Delta's RESTORE TIMESTAMP AS " +
        "OF). Returns the new version.",
      Array(inParam("table", StringType),
        inParamDefault("version", LongType, "0"),
        inParamDefault("timestamp_ms", LongType, "0")),
      versionOut,
      (spark, in) => {
        val p = tablePath(warehouse, checkSegment, in)
        val v = in.getLong(1); val ts = in.getLong(2)
        require((v > 0) ^ (ts > 0),
          "restore takes exactly one of version / timestamp_ms, " +
            s"and it must be positive (got version=$v, timestamp_ms=$ts)")
        val target =
          if (v > 0) v
          else Snapshots.versionAtTimestamp(spark, p, ts).getOrElse(
            throw new IllegalArgumentException(
              s"no commit at or before timestamp $ts at $p"))
        Seq(row(Snapshots.restore(spark, p, target)))
      }),
    new P("detail",
      "One operational summary row for the table: current version, op, " +
        "live file/DV counts, recorded bytes and rows (file-level — " +
        "before deletion-vector subtraction), partition layout, active " +
        "constraints (Delta's DESCRIBE DETAIL shape).",
      Array(inParam("table", StringType)),
      StructType(Seq(
        StructField("version", LongType),
        StructField("op", StringType),
        StructField("n_files", LongType),
        StructField("n_dv_files", LongType),
        StructField("total_bytes", LongType),
        StructField("total_rows", LongType),
        StructField("partition_by", StringType),
        StructField("constraints", StringType))),
      (spark, in) => {
        val p = tablePath(warehouse, checkSegment, in)
        // ONE manifest read anchors the whole row: version, layout and
        // constraints come from the same manifest, and the file list
        // resolves AT that version — a concurrent commit cannot mix
        // two versions' state into one summary
        val m = Snapshots.tableDetailManifest(spark, p).getOrElse(
          throw new IllegalArgumentException(
            s"no committed snapshot at $p"))
        val snap = Snapshots.snapshotAt(spark, p, Some(m.version)).get
        // totals report ONLY when every live file has a stats entry
        // (pre-stats-era commits): summing a covered subset would
        // silently under-report — the COUNT(*) pushdown refuses the
        // same way; null says "unknown", never a wrong number
        val full = snap.files.forall(snap.stats.contains)
        val stats = snap.files.flatMap(f => snap.stats.get(f))
        Seq(row(snap.version,
          UTF8String.fromString(snap.op),
          snap.files.size.toLong,
          snap.dvs.size.toLong,
          if (full) stats.map(_.bytes).sum else null,
          if (full) stats.map(_.rows).sum else null,
          UTF8String.fromString(m.partitionBy.mkString(",")),
          UTF8String.fromString(
            m.constraints.keys.toSeq.sorted.mkString(","))))
      }),
    new P("history",
      "The table's commit log, oldest first: version, op, commit " +
        "timestamp, files added/removed, live file and DV counts, " +
        "active constraints.",
      Array(inParam("table", StringType)),
      StructType(Seq(
        StructField("version", LongType),
        StructField("op", StringType),
        StructField("commit_ts", LongType),
        StructField("n_added", LongType),
        StructField("n_removed", LongType),
        StructField("n_files", LongType),
        StructField("n_dv_files", LongType),
        StructField("constraints", StringType))),
      (spark, in) => {
        val p = tablePath(warehouse, checkSegment, in)
        // O(log) rows — the same driver-side fold history() wraps
        Snapshots.history(spark, p).collect().toSeq.map(r =>
          row(r.getLong(0), UTF8String.fromString(r.getString(1)),
            r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
            r.getLong(6), UTF8String.fromString(r.getString(7))))
      }))

  def load(warehouse: String, checkSegment: String => String,
      ident: Identifier): UnboundProcedure = {
    val ns = ident.namespace().toSeq
    if (ns != Seq("system"))
      throw new IllegalArgumentException(
        s"unknown procedure namespace ${ns.mkString(".")} — " +
          "graft procedures live under `system`")
    all(warehouse, checkSegment)
      .find(_.name == ident.name().toLowerCase(java.util.Locale.ROOT))
      .getOrElse(throw new IllegalArgumentException(
        s"unknown procedure system.${ident.name()} — available: " +
          all(warehouse, checkSegment).map(_.name).mkString(", ")))
  }
}
