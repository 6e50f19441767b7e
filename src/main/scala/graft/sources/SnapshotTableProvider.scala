package graft.sources

import graft.ops.Snapshots
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 face of the [[graft.ops.Snapshots]] transaction-log
  * store — `format("graft-snapshot")`:
  *
  *  - '''batch''': `spark.read.format("graft-snapshot")
  *    .option("versionAsOf", v).load(path)` — the scan's file list IS
  *    the pinned manifest (no directory listing), and pushed filters
  *    prune files by the manifest's per-file column stats at PLANNING
  *    time. Pruning is a conservative superset, so every filter stays
  *    RESIDUAL (Spark re-evaluates on the survivors) — pushedFilters
  *    advertises what pruned, never what was consumed.
  *  - '''streaming''': `spark.readStream.format("graft-snapshot")
  *    .load(path)` tails the LOG — offsets are committed VERSION
  *    numbers, each micro-batch reads exactly the files ADDED by the
  *    versions in (start, end], and OPTIMIZE commits are skipped (same
  *    rows, new layout — a consumer must not re-ingest the table
  *    because maintenance ran). Deterministic replay from the log gives
  *    exactly-once; `option("startingVersion", v)` begins at commit v
  *    (default 1). This is the incremental-consumption face a
  *    downstream index/aggregate maintenance job runs forever against
  *    a 100 TB table that keeps committing.
  *
  * The partition reader is VECTORIZED: [[SnapshotColumnarReader]]
  * decodes parquet pages column-at-a-time straight into on-heap column
  * vectors (projection pushed via `setRequestedSchema`, one file per
  * partition), so Spark plans a ColumnarToRow boundary and whole-stage
  * codegen consumes the vectors exactly as it does for its native
  * parquet scan — no per-row Group materialization, no per-cell boxing
  * on the hot path. A zero-column projection (count(*) over a file
  * lacking every requested column) never touches pages at all: row
  * counts come straight from the footer blocks. The row-based
  * [[SnapshotGroupReader]] remains as the non-columnar fallback.
  * Files written before a schema-evolving commit read their missing
  * columns as null. Supported leaf types: integral, float, double,
  * boolean, string, timestamp (INT64 millis/micros/nanos and INT96),
  * date. */
final class SnapshotTableProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister
    with org.apache.spark.sql.sources.StreamSinkProvider {

  override def shortName(): String = "graft-snapshot"

  /** NATIVE streaming sink — `df.writeStream.format("graft-snapshot")
    * .start(path)`, no foreachBatch needed (the Delta `DeltaSink`
    * architecture: a V1 `StreamSinkProvider` behind the V2 table,
    * which is exactly how Delta ships its own streaming write).
    * Exactly-once by construction: each micro-batch lands as ONE
    * idempotent commit keyed (streaming query id, batchId) — a
    * restarted query replays its last batch as a no-op. Append mode
    * appends; Complete mode overwrites per batch (the aggregation-
    * result mirror); Update is rejected typed (no key contract on
    * this face — use foreachBatch + mergeChanges). `partitionBy(...)`
    * on the writer defines the layout when the sink CREATES the
    * table, and must match an existing table's layout. */
  override def createSink(sqlContext: org.apache.spark.sql.SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft-snapshot sink needs a path — .start(path) or " +
          "option(\"path\", ...)"))
    if (outputMode == org.apache.spark.sql.streaming.OutputMode.Update())
      throw new IllegalArgumentException(
        "graft-snapshot sink supports Append and Complete output " +
          "modes — Update has no key contract on this face; use " +
          "foreachBatch with Snapshots.mergeChanges for keyed upserts")
    new SnapshotSink(path, partitionColumns,
      outputMode == org.apache.spark.sql.streaming.OutputMode.Complete())
  }

  /** Manifest → table schema, with the reader-support guard. */
  private def manifestSchema(m: graft.ops.Snapshots.Manifest,
      path: String): StructType = {
    val schema = m.schemaJson.map(j =>
      DataType.fromJson(j).asInstanceOf[StructType]).getOrElse(
      throw new IllegalArgumentException(
        s"graft-snapshot: manifest ${m.version} at $path predates schema " +
          "tracking — rewrite it with a current commit"))
    schema.fields.foreach { f =>
      if (!SnapshotGroupReader.supported(f.dataType))
        throw new IllegalArgumentException(
          s"graft-snapshot: column ${f.name} has type ${f.dataType} — " +
            "unsupported in the streaming reader; read this table with " +
            "Snapshots.read instead")
    }
    schema
  }

  /** One "latest" resolution shared by inferSchema and getTable. */
  private def resolveManifest(options: CaseInsensitiveStringMap,
      path: String): Option[graft.ops.Snapshots.Manifest] = {
    val spark = SparkSession.active
    Option(options.get("versionAsOf")) match {
      case Some(v) => Some(Snapshots.manifestAt(spark, path, v.toLong)
        .getOrElse(throw new IllegalArgumentException(
          s"graft-snapshot: version $v does not exist at $path")))
      case None => Snapshots.latestManifest(spark, path)
    }
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-snapshot: missing path"))
    val m = resolveManifest(options, path).getOrElse(
      throw new IllegalArgumentException(
        s"graft-snapshot: no committed snapshot at $path"))
    val base = manifestSchema(m, path)
    // CDF advertises the meta columns here too: Spark round-trips this
    // result into getTable's schema parameter
    if (Option(options.get("readChangeFeed")).exists(_.toBoolean))
      SnapshotCdf.withMetaCols(base, path)
    else base
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val path = opts.get("path")
    // resolve the manifest ONCE and derive BOTH the schema and the
    // version pin from it: a schema-evolving commit landing between a
    // "latest schema" lookup and a separate "latest version" lookup
    // would otherwise pin the new version under the old schema (the
    // evolved column silently absent). Every action on the returned
    // DataFrame then reads this one version — a concurrent commit
    // between count() and collect() cannot split one DataFrame across
    // two snapshots. Streaming ignores the pin (its offsets ARE
    // versions).
    val manifest = resolveManifest(opts, path)
    val pinned = manifest.map(_.version).filter(_ > 0)
    val cdf = Option(opts.get("readChangeFeed")).exists(_.toBoolean)
    // the MANIFEST schema is authoritative whenever the table exists:
    // with supportsExternalMetadata a user-specified READ schema would
    // otherwise pass through verbatim — a typo'd column silently reads
    // all-null and the unsupported-type guard is skipped. The passed
    // schema only bootstraps a WRITE to a not-yet-created table. A
    // user .schema(...) that DISAGREES with the manifest is not
    // silently ignored either: the conflict is carried into the table
    // and thrown at scan-build time (writes still proceed — append/
    // overwrite re-enforce against the real manifest schema, and the
    // DataFrame's schema legitimately differs on schema evolution).
    val base = manifest match {
      case Some(m) => manifestSchema(m, path)
      case None if schema.nonEmpty => schema
      case None => throw new IllegalArgumentException(
        s"graft-snapshot: no committed snapshot at $path")
    }
    // the CHANGE-FEED face appends the Delta-CDF meta columns; rows then
    // carry what changed ('insert' adds / 'delete' = freshly dv-deleted)
    // and in which commit
    val tschema =
      if (!cdf) base else SnapshotCdf.withMetaCols(base, path)
    val readConflict =
      if (manifest.isDefined && schema.nonEmpty &&
          !sameShape(schema, tschema))
        Some(s"graft-snapshot: the read schema passed via .schema(...) " +
          s"does not match the table schema at $path (version " +
          s"${pinned.getOrElse(0L)}). Passed: ${schema.simpleString}; " +
          s"table: ${tschema.simpleString}. Drop .schema(...) — the " +
          "manifest schema is authoritative for reads.")
      else None
    new SnapshotTable(path, tschema, pinned,
      Option(opts.get("startingVersion")).map(_.toLong),
      Option(opts.get("maxVersionsPerTrigger")).map(_.toLong),
      Option(opts.get("maxBytesPerTrigger")).map(_.toLong),
      readConflict, cdf,
      Option(opts.get("endingVersion")).map(_.toLong),
      // constraints pin to the SAME manifest as the schema and version
      // (a versionAsOf table must not surface constraints added later,
      // and analyzer calls must not re-fold the log)
      manifest.map(_.constraints).getOrElse(Map.empty))
  }

  /** Same field names and types in order (nullability and metadata are
    * not contract — Spark widens them freely on round-trips). */
  private def sameShape(a: StructType, b: StructType): Boolean =
    a.fields.length == b.fields.length &&
      a.fields.zip(b.fields).forall { case (x, y) =>
        x.name == y.name && x.dataType == y.dataType }

  // TRUE so the WRITE path works on not-yet-created tables: Spark then
  // hands getTable the DATAFRAME's schema for writes (first commit
  // bootstraps from it; the insert itself re-enforces against the real
  // manifest schema inside append/overwrite). Reads without a user
  // schema still resolve through inferSchema (the manifest).
  override def supportsExternalMetadata(): Boolean = true
}

final class SnapshotTable(path: String, tschema: StructType,
    versionAsOf: Option[Long], startingVersion: Option[Long],
    maxVersionsPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None,
    readSchemaConflict: Option[String] = None,
    cdf: Boolean = false,
    endingVersion: Option[Long] = None,
    pinnedConstraints: Map[String, String] = Map.empty)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete {
  /** The log root — the SQL UPDATE/MERGE analyzer bridge routes
    * row-level DML against it ([[graft.plans.SnapshotDmlRule]]). */
  private[graft] def tablePath: String = path

  /** The CHECK constraints of the manifest this table was LOADED from
    * — pinned like the schema and version, so a versionAsOf table
    * never surfaces constraints added later, and repeated analyzer
    * calls never re-fold the log. Every recorded constraint IS
    * enforced — the commit protocol validates each data-changing
    * write (and Spark 4.1 additionally enforces these in the write
    * plan). */
  override def constraints()
      : Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    pinnedConstraints.toSeq.sortBy(_._1).map {
      case (name, sql) =>
        org.apache.spark.sql.connector.catalog.constraints.Constraint
          .check(name).predicateSql(sql).build()
          : org.apache.spark.sql.connector.catalog.constraints.Constraint
    }.toArray
  override def name(): String = s"graft-snapshot($path)"
  /** The pinned manifest version this table reads (null before the
    * first commit — the write-bootstrap table). Spark's
    * AddCheckConstraintExec stamps this into
    * `TableChange.AddConstraint.validatedTableVersion`, which lets the
    * catalog skip re-validation ONLY when the table has not advanced
    * past the version the validation scan actually read. */
  override def version(): String =
    versionAsOf.map(_.toString).orNull
  override def schema(): StructType = tschema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      // BATCH_WRITE is the planner gate; V1_BATCH_WRITE declares the
      // execution shape (build() returns a V1Write)
      TableCapability.BATCH_WRITE, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE,
      // MERGE WITH SCHEMA EVOLUTION: Spark's analyzer computes the
      // widening TableChanges and routes them through the catalog's
      // alterTable (this store's append-evolution ADD COLUMN commit),
      // then re-resolves the merge against the widened table
      TableCapability.AUTOMATIC_SCHEMA_EVOLUTION)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // a user .schema(...) disagreeing with the manifest fails HERE (the
    // read path) rather than being silently replaced; the write path
    // never builds a scan, so evolving-schema writes are unaffected
    readSchemaConflict.foreach(msg =>
      throw new IllegalArgumentException(msg))
    new SnapshotScanBuilder(path, tschema, versionAsOf, startingVersion,
      maxVersionsPerTrigger, maxBytesPerTrigger, cdf, endingVersion)
  }
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new SnapshotWriteBuilder(path,
      Option(info.options.get("replaceWhere")))

  /** `DELETE FROM <catalog>.db.t WHERE ...` — the SQL face of the
    * copy-on-write delete. Spark asks canDeleteWhere first; any filter
    * this source cannot translate exactly refuses the push (Spark then
    * raises its standard cannot-translate error instead of silently
    * deleting the wrong rows). TRUNCATE TABLE arrives as the
    * always-true filter set. */
  override def canDeleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    filters.forall(f => SnapshotFilters.toColumn(f).isDefined)

  override def deleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    val spark = SparkSession.active
    // re-check translatability here, not just in canDeleteWhere: a
    // silently dropped filter would widen the predicate toward
    // delete-everything — the one direction a delete must never err
    val cols = filters.toSeq.map(f => SnapshotFilters.toColumn(f)
      .getOrElse(throw new UnsupportedOperationException(
        s"graft-snapshot: cannot translate delete filter $f exactly")))
    val cond = cols.reduceOption(_ && _)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    Snapshots.delete(spark, path, cond)
    ()
  }
}

/** Exact sources.Filter → Column translation for the SQL DELETE face.
  * Returns None for anything without a lossless equivalent — the
  * caller must then REFUSE the operation (a conservative-superset
  * translation is fine for pruning but catastrophic for a delete). */
private[sources] object SnapshotFilters {
  import org.apache.spark.sql.sources._
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.Column

  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a && b
    case Or(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a || b
    case Not(c) => toColumn(c).map(!_)
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}

/** WRITE face of the V2 source — `df.write.format("graft-snapshot")
  * .mode("append"|"overwrite").save(path)` — through Spark's V1Write
  * fallback (the JDBC-V2 pattern): the whole batch routes into
  * [[Snapshots.append]]/[[Snapshots.overwrite]], so EVERY commit-
  * protocol guarantee applies unchanged — atomic manifest publish,
  * schema enforcement + auto-merge, CHECK-constraint validation,
  * per-file stats, partitionBy inheritance, optimistic-concurrency
  * retries. Per-executor DataWriters would re-implement exactly that
  * protocol for no gain: the data write inside append() is already the
  * distributed part. */
final class SnapshotWriteBuilder(path: String,
    replaceWhere: Option[String] = None)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var overwrite = false
  override def truncate()
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    overwrite = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.V1Write {
      override def toInsertableRelation
          : org.apache.spark.sql.sources.InsertableRelation =
        new org.apache.spark.sql.sources.InsertableRelation {
          override def insert(data: org.apache.spark.sql.DataFrame,
              ow: Boolean): Unit = {
            // predicate-scoped overwrite (Delta's write option):
            // mode("overwrite").option("replaceWhere", p) atomically
            // replaces exactly the rows matching p — the daily-backfill
            // idiom through the catalog face, with the same containment
            // check and partition-aligned fast path as the Scala API
            if (replaceWhere.isDefined) {
              if (!(overwrite || ow)) throw new IllegalArgumentException(
                "graft-snapshot: option(\"replaceWhere\", ...) requires " +
                  "mode(\"overwrite\")")
              Snapshots.replaceWhere(data.sparkSession, path,
                org.apache.spark.sql.functions.expr(replaceWhere.get),
                data)
            } else if (overwrite || ow) {
              // inherit the parent manifest's partition layout: the core
              // API's rule is "overwrite redefines the layout", but a V2
              // catalog writer doing mode("overwrite") has no partitionBy
              // channel — without inheritance a routine overwrite would
              // silently strip exact partition pruning from the table
              // (Delta guards the same case)
              val parts = Snapshots.tablePartitionBy(
                data.sparkSession, path)
              Snapshots.overwrite(data, path, parts)
            } else Snapshots.append(data, path)
            ()
          }
        }
    }
}

/** The streaming SINK behind `writeStream.format("graft-snapshot")` —
  * see [[SnapshotTableProvider.createSink]]. Each `addBatch` re-anchors
  * the micro-batch plan as a batch DataFrame (the ForeachBatchSink
  * technique) and lands it as one idempotent commit keyed by
  * (query id, batchId), so crash-replayed batches are no-ops — the
  * same exactly-once contract as [[graft.ops.Snapshots.streamAppend]],
  * without the user writing a foreachBatch. */
final class SnapshotSink(path: String, partitionColumns: Seq[String],
    complete: Boolean)
    extends org.apache.spark.sql.execution.streaming.Sink {

  override def addBatch(batchId: Long,
      data: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row])
      : Unit = {
    val spark = data.sparkSession
    val batchDf = org.apache.spark.sql.graft.Bridge.rebatch(data)
    // the engine's txn idempotence key: unique per STREAMING QUERY
    // (the checkpoint's identity), stable across restarts — set by
    // StreamExecution on the session's local properties
    val queryId = Option(spark.sparkContext
      .getLocalProperty("sql.streaming.queryId")).getOrElse(
      throw new IllegalStateException(
        "graft-snapshot sink: no streaming query id on this thread — " +
          "addBatch called outside a streaming query?"))
    val appId = s"stream-sink:$queryId"
    val existing = Snapshots.latestManifest(spark, path)
    existing match {
      case Some(m) if partitionColumns.nonEmpty &&
          m.partitionBy != partitionColumns =>
        throw new IllegalArgumentException(
          s"graft-snapshot sink: table at $path is partitioned by " +
            s"(${m.partitionBy.mkString(",")}) but the writer asked " +
            s"for (${partitionColumns.mkString(",")}) — layout changes " +
            "need an explicit batch overwrite")
      case None if partitionColumns.nonEmpty && !complete =>
        // first batch CREATES the table with the writer's layout;
        // appends then inherit it (Complete mode passes partitionBy
        // straight through its per-batch overwrite instead)
        Snapshots.createEmpty(spark, path, batchDf.schema,
          partitionColumns)
      case _ => ()
    }
    if (complete) {
      // a Complete overwrite REDEFINES the layout (the engine's
      // overwrite rule), so a writer without partitionBy must INHERIT
      // an existing table's layout rather than silently stripping it —
      // the same guard the V2 batch overwrite applies
      val effParts =
        if (partitionColumns.nonEmpty) partitionColumns
        else existing.map(_.partitionBy).getOrElse(Nil)
      Snapshots.overwriteIdempotent(batchDf, path, appId, batchId,
        effParts)
    } else
      Snapshots.appendIdempotent(batchDf, path, appId, batchId)
  }

  override def toString: String = s"SnapshotSink[$path]"
}

final class SnapshotScanBuilder(path: String, full: StructType,
    versionAsOf: Option[Long], startingVersion: Option[Long],
    maxVersionsPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None,
    cdf: Boolean = false,
    endingVersion: Option[Long] = None)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates
    with SupportsPushDownLimit {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = full
  private var pushedCount: Option[Long] = None
  private var limit: Option[Int] = None

  /** LIMIT prunes the FILE LIST: any `n` rows satisfy an unfiltered
    * LIMIT, so planning keeps manifest-order files only until their
    * exact row counts cover it — `df.limit(10)` on a million-file table
    * plans one partition. Partial push: Spark keeps its own Limit
    * above (it only offers the push when no residual filter sits
    * between, and all our filters stay residual, so the cut can never
    * hide matching rows). */
  override def pushLimit(n: Int): Boolean =
    // a change feed's row set is version-ordered semantics, not "any n
    // rows" — no file cut
    if (cdf) false else { limit = Some(n); true }
  override def isPartiallyPushed(): Boolean = true

  /** Keep EVERY filter residual (stats pruning is a superset, never a
    * substitute for evaluation); remember them all for planning-time
    * file pruning. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** COUNT(*) answered from the LOG: every manifest already carries
    * exact per-file row counts, so an unfiltered, ungrouped count needs
    * ZERO data-file reads — the classic log-store trick (Delta answers
    * the same query from metadata). Only complete pushdown is offered,
    * and only when every file has recorded stats; anything else —
    * filters (all of ours stay residual, so Spark won't even ask),
    * group-bys, other aggregates — falls back to the normal scan. */
  // one log resolution per builder: supportCompletePushDown and
  // pushAggregation both ask, and each fold is checkpoint+delta reads —
  // object-store round-trips worth paying once (the batch pins its
  // version at getTable, so the content cannot move under the cache)
  private lazy val resolved: Option[Snapshots.Snapshot] =
    Snapshots.snapshotAt(SparkSession.active, path, versionAsOf)

  private def countFromLog(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[Long] = {
    import org.apache.spark.sql.connector.expressions.aggregate.CountStar
    if (cdf) return None // feed cardinality is not the table's
    if (agg.groupByExpressions.nonEmpty || pushed.nonEmpty) return None
    if (agg.aggregateExpressions.length != 1 ||
        !agg.aggregateExpressions.head.isInstanceOf[CountStar]) return None
    resolved
      .filter(m => m.files.forall(m.stats.contains))
      // deletion vectors subtract exactly: the log records each file's
      // deleted-position cardinality, so the count stays metadata-only
      // even on a merge-on-read table
      .map(m => m.files.map(f => m.stats(f).rows).sum -
        m.dvs.values.map(_.n).sum)
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = countFromLog(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Boolean = {
    countFromLog(agg) match {
      case Some(n) => pushedCount = Some(n); true
      case None => false
    }
  }

  override def build(): Scan = pushedCount match {
    case Some(n) => new SnapshotCountScan(path, n)
    case None =>
      new SnapshotScan(path, full, required, pushed, versionAsOf,
        startingVersion, limit, maxVersionsPerTrigger, maxBytesPerTrigger,
        cdf, endingVersion)
  }
}

/** The metadata-only COUNT(*) scan: one partition, one row, zero file
  * I/O. */
final class SnapshotCountScan(path: String, n: Long)
    extends Scan with Batch {
  override def readSchema(): StructType =
    new StructType().add("count", org.apache.spark.sql.types.LongType,
      false)
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-snapshot COUNT(*) from log metadata ($path)"
  override def planInputPartitions(): Array[InputPartition] =
    Array(SnapshotCountPartition(n))
  override def createReaderFactory(): PartitionReaderFactory =
    SnapshotCountReaderFactory
}

final case class SnapshotCountPartition(n: Long) extends InputPartition

object SnapshotCountReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val n = p.asInstanceOf[SnapshotCountPartition].n
      private var done = false
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](n))
      override def close(): Unit = ()
    }
}

/** One data file. `dvDirAbs`/`relPath` are set when the file carries a
  * merge-on-read deletion vector: the reader loads its positions from
  * the vector dataset's `__gb=<basename>` partition directory and skips
  * them during iteration. In CHANGE-FEED mode `changeType` is set:
  * "insert" partitions read the whole file (a version's add);
  * "delete" partitions read ONLY the freshly deleted positions —
  * `dvDirAbs` then holds the commit's vector dataset and `oldDvDirAbs`
  * the parent's (subtracted, so re-deletes never re-emit). */
/** One file's worth of work. `changeType` selects the read mode:
  *  - null            → plain snapshot read (dvDirAbs positions skip)
  *  - "insert"        → whole file, stamped insert
  *  - "delete" + dvDirAbs → dv-diff delete (fresh positions =
  *                      dvDirAbs minus oldDvDirAbs EMIT)
  *  - "delete" (no dvDirAbs) → WHOLE-FILE delete synthesis (an
  *                      overwrite-retired or fullRemoves file; rows in
  *                      oldDvDirAbs — the parent's vector — skip)
  *  - "cdc"           → a `_change_data` sidecar file: `_change_type`
  *                      comes from the FILE, not a constant
  * `commitTs` is the manifest's in-commit timestamp (0 = pre-ts log,
  * surfaces as null `_commit_timestamp`). */
final case class SnapshotInputPartition(absPath: String,
    dvDirAbs: String = null, relPath: String = null,
    changeType: String = null, commitVersion: Long = -1L,
    oldDvDirAbs: String = null, commitTs: Long = 0L)
    extends InputPartition

/** Shared CHANGE-FEED planning: one version → its row-level change
  * partitions. Used identically by the batch scan (a (start, end]
  * range) and the micro-batch stream (each trigger's admitted range),
  * so the two faces can never diverge. */
private[sources] object SnapshotCdf
    extends org.apache.spark.internal.Logging {
  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"
  val CommitTimestampCol = "_commit_timestamp"
  val MetaCols: Seq[String] =
    Seq(ChangeTypeCol, CommitVersionCol, CommitTimestampCol)

  private[sources] def warn(msg: String): Unit = logWarning(msg)

  /** ONE place that appends (and collision-guards) the meta columns —
    * inferSchema and getTable must advertise the identical shape. */
  def withMetaCols(base: StructType, path: String): StructType = {
    MetaCols.foreach { c =>
      require(!base.fieldNames.contains(c),
        s"graft-snapshot: table at $path already has a column named " +
          s"$c — cannot read as a change feed") }
    base.add(ChangeTypeCol, org.apache.spark.sql.types.StringType,
        nullable = false)
      .add(CommitVersionCol, org.apache.spark.sql.types.LongType,
        nullable = false)
      // nullable: manifests written before in-commit timestamps
      // existed carry ts = 0 and surface null (Delta's column is
      // non-null because its log always had timestamps)
      .add(CommitTimestampCol, org.apache.spark.sql.types.TimestampType,
        nullable = true)
  }

  def partitionsFor(spark: SparkSession, path: String, v: Long,
      streaming: Boolean, horizon: Long = -1L)
      : Seq[SnapshotInputPartition] = {
    // change-data expiry horizon (CALL system.expire_changes): a
    // version below it has no readable change representation anymore —
    // the same typed failure class as a vacuumed version. Callers
    // planning a RANGE resolve the horizon once and pass it down;
    // -1 = resolve here (single-version callers).
    val hz = if (horizon >= 0L) horizon
             else Snapshots.cdcHorizon(spark, path)
    if (v < hz) {
      if (streaming) throw new IllegalStateException(
        s"graft-snapshot: change data for version $v at $path was " +
          "expired (CALL system.expire_changes) before this stream " +
          "consumed it — reset the checkpoint (or use startingVersion) " +
          s"at or past version $hz")
      else throw new IllegalArgumentException(
        s"graft-snapshot: change data for version $v at $path was " +
          s"expired (CALL system.expire_changes) — start the feed at " +
          s"or past version $hz")
    }
    val root = new org.apache.hadoop.fs.Path(path)
    def abs(f: String): String =
      new org.apache.hadoop.fs.Path(root, f).toString
    def parentDvs(parent: Long): Map[String, Snapshots.Dv] =
      if (parent <= 0L) Map.empty
      else Snapshots.snapshotAt(spark, path, Some(parent))
        .map(_.dvs).getOrElse(Map.empty)
    Snapshots.manifestAt(spark, path, v) match {
      case Some(m) if Snapshots.isMaintenanceOp(m.op) => Nil
      case Some(m) if m.op == "delete-dv" =>
        // parent vectors subtract so only FRESH positions emit
        val pdvs = parentDvs(m.parent)
        m.dvs.toSeq.sortBy(_._1).map { case (f, dv) =>
          SnapshotInputPartition(abs(f), abs(dv.path), f,
            changeType = "delete", commitVersion = v,
            oldDvDirAbs = pdvs.get(f).map(d => abs(d.path)).orNull,
            commitTs = m.ts)
        }
      case Some(m) if m.op == "restore" =>
        throw new IllegalStateException(
          s"graft-snapshot: change feed at $path hit a RESTORE at " +
            s"version $v — a rollback has no row-exact incremental " +
            "representation; re-sync the consumer from a full read and " +
            "restart the feed past it")
      case Some(m) if m.cdc.nonEmpty || m.fullRemoves.nonEmpty =>
        // the writer's persisted sidecar is authoritative — adds are
        // NOT emitted (they contain co-located survivor rows)
        val pdvs =
          if (m.fullRemoves.isEmpty) Map.empty[String, Snapshots.Dv]
          else parentDvs(m.parent)
        m.cdc.map(f => SnapshotInputPartition(abs(f), null, f,
          changeType = "cdc", commitVersion = v, commitTs = m.ts)) ++
        m.fullRemoves.map(f => SnapshotInputPartition(abs(f), null, f,
          changeType = "delete", commitVersion = v,
          oldDvDirAbs = pdvs.get(f).map(d => abs(d.path)).orNull,
          commitTs = m.ts))
      case Some(m) if m.op == "overwrite" =>
        // full replacement: whole-file synthesis is row-exact (every
        // parent file fully retired, every add fully fresh)
        val parent =
          if (m.parent <= 0L) None
          else Snapshots.snapshotAt(spark, path, Some(m.parent))
        val dels = parent.toSeq.flatMap(p => p.files.map { f =>
          SnapshotInputPartition(abs(f), null, f,
            changeType = "delete", commitVersion = v,
            oldDvDirAbs = p.dvs.get(f).map(d => abs(d.path)).orNull,
            commitTs = m.ts)
        })
        dels ++ m.adds.map(f => SnapshotInputPartition(abs(f), null, f,
          changeType = "insert", commitVersion = v, commitTs = m.ts))
      case Some(m) if Snapshots.isCowRemovalOp(m.op) &&
          m.removes.nonEmpty =>
        // no sidecar (older writer, or CDC disabled at write time):
        // per-file partitions cannot express the removed-minus-readded
        // diff, and emitting the adds alone would silently diverge any
        // downstream mirror — fail typed (batch changeFeed() still
        // reads such a commit exactly via its read-time diff)
        throw new IllegalStateException(
          s"graft-snapshot: change feed at $path hit a copy-on-write " +
            s"'${m.op}' at version $v with no persisted change data — " +
            s"written with ${Snapshots.CdcEnabledKey}=false or by an " +
            "older writer. Use batch changeFeed() for this range, or " +
            "re-write with CDC enabled")
      case Some(m) => m.adds.map(f => SnapshotInputPartition(
        abs(f), null, f,
        changeType = "insert", commitVersion = v, commitTs = m.ts))
      case None if Snapshots.claimExists(spark, path, v) =>
        Nil // dead claim: published nothing
      case None =>
        if (streaming) throw new IllegalStateException(
          s"graft-snapshot: version $v at $path was vacuumed before " +
            "this stream consumed it — reset the checkpoint (or use " +
            "startingVersion) past the vacuum horizon")
        else throw new IllegalArgumentException(
          s"graft-snapshot: version $v does not exist (or was vacuumed) " +
            s"at $path")
    }
  }
}

final class SnapshotScan(path: String, full: StructType,
    required: StructType, pushed: Array[Filter],
    versionAsOf: Option[Long], startingVersion: Option[Long],
    limit: Option[Int] = None,
    maxVersionsPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None,
    cdf: Boolean = false,
    endingVersion: Option[Long] = None)
    extends Scan with Batch with SupportsRuntimeFiltering
    with SupportsReportStatistics {

  /** Planner statistics from the LOG: row count = exact Σ per-file rows
    * over the stats-PRUNED file list; size = the manifest's recorded
    * byte lengths when every pruned file carries one (scaled to the
    * projected width fraction), else rows × the pruned schema's default
    * width. Without this a V2 scan defaults to "unknown = huge", and a
    * small snapshot dim would never broadcast — the wrong plan for the
    * fact⋈dim shape this store serves. */
  // one log resolution per scan, shared by estimateStatistics (which
  // CBO may call repeatedly) and planInputPartitions — safe because a
  // batch read pins its version at getTable. @transient: the Scan plans
  // on the driver; a resolved Snapshot (full stats map) must never ride
  // a task closure.
  @transient private lazy val resolved: Option[Snapshots.Snapshot] =
    Snapshots.snapshotAt(SparkSession.active, path, versionAsOf)

  override def estimateStatistics(): Statistics = {
    if (cdf) return new Statistics {
      // a feed's cardinality is range- not table-shaped; unknown keeps
      // the planner conservative (no accidental broadcast of a feed)
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
    val agg = resolved.flatMap { m =>
      val keep = Snapshots.pruneByFilters(m, pushed)
      if (keep.forall(m.stats.contains))
        // rows are LIVE rows: per-file deletion-vector cardinalities
        // subtract exactly (bytes stay the on-disk size — a safe
        // over-estimate for broadcast decisions)
        Some((keep.map(f => m.stats(f).rows -
            m.dvs.get(f).map(_.n).getOrElse(0L)).sum,
          keep.map(f => m.stats(f).bytes).sum,
          keep.forall(f => m.stats(f).bytes > 0)))
      else None
    }
    val width = math.max(1, required.map(_.dataType.defaultSize).sum)
    val fullWidth = math.max(width, full.map(_.dataType.defaultSize).sum)
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong = agg match {
        case Some((_, bytes, true)) =>
          // real bytes, scaled by the projection's width share
          java.util.OptionalLong.of(
            math.max(1L, bytes * width / fullWidth))
        case Some((rows, _, false)) =>
          java.util.OptionalLong.of(rows * width)
        case None => java.util.OptionalLong.empty()
      }
      override def numRows(): java.util.OptionalLong =
        agg.map(a => java.util.OptionalLong.of(a._1))
          .getOrElse(java.util.OptionalLong.empty())
    }
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new SnapshotMicroBatchStream(path, required,
      startingVersion.getOrElse(1L),
      maxVersionsPerTrigger, maxBytesPerTrigger, cdf)
  override def description(): String =
    s"graft-snapshot StatsPrunedBy: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  // ---- dynamic runtime filtering (DPP for the log store): at
  // execution time Spark hands over join-key filters (e.g. the IN-set
  // a broadcasted dim resolved to) and replans this scan's partitions —
  // the big-fact-join-small-dim shape at 100 TB skips every file whose
  // stats/partition values the dim's keys cannot hit. Any OUTPUT column
  // can carry stats, so all are advertised (Spark resolves the
  // advertised names against the scan output, so pruned-away columns
  // must not appear); pruning stays a conservative superset and every
  // filter remains residual, so a filter Spark hands us can only
  // SHRINK the file list, never change results.
  private var runtimeFilters: Array[Filter] = Array.empty

  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    if (cdf) Array.empty // CDF plans per-version, not by stats pruning
    else required.fieldNames.map(
      org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(filters: Array[Filter]): Unit =
    runtimeFilters = filters

  override def planInputPartitions(): Array[InputPartition] = {
    if (cdf) {
      // batch CHANGE FEED over [start, endingVersion]: the end defaults
      // to the version pinned at getTable, so one DataFrame's actions
      // all see the same range; the start defaults to the oldest
      // still-available version — "full AVAILABLE history" — so the
      // no-options read keeps working after a vacuum retired early
      // manifests (an EXPLICIT startingVersion below the horizon still
      // fails loudly, as it names versions whose changes are gone)
      val spark = SparkSession.active
      val hz = Snapshots.cdcHorizon(spark, path)
      val start = startingVersion.getOrElse {
        val oldest = math.max(
          Snapshots.oldestAvailableVersion(spark, path), hz)
        // a no-options feed after a vacuum (or change-data expiry) is
        // "full AVAILABLE history", not full history — say so, or a
        // consumer mistakes a truncated feed for a complete one (r10
        // advice; Delta goes further and requires an explicit start)
        if (oldest > 1L)
          SnapshotCdf.warn(
            s"graft-snapshot: readChangeFeed at $path without " +
              s"startingVersion begins at v$oldest — earlier change " +
              "data was vacuumed or expired; pass startingVersion to " +
              "pin the range explicitly")
        oldest
      }
      val end = endingVersion
        .orElse(versionAsOf)
        .getOrElse(Snapshots.latestVersion(spark, path))
      return (start to end).flatMap(v =>
        SnapshotCdf.partitionsFor(spark, path, v, streaming = false, hz))
        .map(p => p: InputPartition).toArray
    }
    val m = resolved.getOrElse(
      throw new IllegalArgumentException(versionAsOf match {
        case Some(v) => s"graft-snapshot: version $v does not exist at $path"
        case None => s"graft-snapshot: no committed snapshot at $path"
      }))
    val pruned = Snapshots.pruneByFilters(m, pushed ++ runtimeFilters)
    // pushed-LIMIT file cut: only with NO filters anywhere (a residual
    // filter could need rows from any file) and complete stats. LIVE
    // rows (minus deletion-vector cardinality) — counting deleted
    // positions would stop the cut too early and lose rows.
    val kept = limit match {
      case Some(n) if pushed.isEmpty && runtimeFilters.isEmpty &&
          pruned.forall(m.stats.contains) =>
        var acc = 0L
        pruned.takeWhile { f =>
          val need = acc < n
          acc += m.stats(f).rows - m.dvs.get(f).map(_.n).getOrElse(0L)
          need
        }
      case _ => pruned
    }
    val root = new org.apache.hadoop.fs.Path(path)
    kept.map { f =>
      val abs = new org.apache.hadoop.fs.Path(root, f).toString
      m.dvs.get(f) match {
        case Some(dv) => SnapshotInputPartition(abs,
          new org.apache.hadoop.fs.Path(root, dv.path).toString, f)
        case None => SnapshotInputPartition(abs)
      }
    }.map(p => p: InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // a snapshot with ANY deletion vector reads row-based throughout:
    // Spark requires every partition of one scan to agree on columnar
    // vs row mode, and position-skipping inside ColumnarBatch would
    // need selective vector copies — OPTIMIZE materializes the deletes
    // and restores the vectorized path (the Delta-ish contract: DV
    // tables pay a read tax until maintenance compacts them)
    SnapshotReaderFactory.fromSession(required,
      // CDF reads row-based: the meta-column append wraps each row
      columnar = !cdf && resolved.forall(_.dvs.isEmpty))
}

object SnapshotReaderFactory {
  /** Driver-side capture of the session's effective Hadoop conf — the
    * executors' readers must see the same credentials/nameservice
    * settings the planner used (a bare `new Configuration()` on the
    * executor has none of the spark.hadoop.* overrides). */
  def fromSession(required: StructType,
      columnar: Boolean = true): SnapshotReaderFactory = {
    val c = SparkSession.active.sessionState.newHadoopConf()
    val b = Map.newBuilder[String, String]
    val it = c.iterator()
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    new SnapshotReaderFactory(required, b.result(), columnar)
  }
}

final class SnapshotReaderFactory(required: StructType,
    hadoopConf: Map[String, String], columnar: Boolean = true)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val sp = p.asInstanceOf[SnapshotInputPartition]
    if (sp.changeType != null) return cdfReader(sp)
    new SnapshotGroupReader(sp.absPath, required, hadoopConf,
      Option(sp.dvDirAbs).map(d => (d, sp.relPath)))
  }

  /** CHANGE-FEED reader: the data columns come from the file (insert =
    * every row of a version's add; delete = only the commit's FRESH
    * vector positions), the meta columns are per-partition constants
    * appended around the inner row. */
  private def cdfReader(sp: SnapshotInputPartition)
      : PartitionReader[InternalRow] = {
    val dataFields = required.fields.filterNot(f =>
      SnapshotCdf.MetaCols.contains(f.name))
    val dataSchema = StructType(dataFields)
    // "cdc" partitions read `_change_type` FROM THE FILE (a sidecar
    // written by the committing CoW op) — appended to the inner
    // projection after the data columns
    val isCdcFile = sp.changeType == "cdc"
    val innerSchema =
      if (isCdcFile) dataSchema.add(SnapshotCdf.ChangeTypeCol,
        org.apache.spark.sql.types.StringType)
      else dataSchema
    val inner = sp.changeType match {
      case "delete" if sp.dvDirAbs != null =>
        // dv-diff delete: EMIT exactly this commit's fresh positions
        val c = new org.apache.hadoop.conf.Configuration(false)
        hadoopConf.foreach { case (k, v) => c.set(k, v) }
        val newPos = SnapshotGroupReader.loadDvPositions(
          sp.dvDirAbs, sp.relPath, c)
        val oldPos =
          if (sp.oldDvDirAbs == null) Array.emptyLongArray
          else SnapshotGroupReader.loadDvPositions(
            sp.oldDvDirAbs, sp.relPath, c)
        val fresh = SnapshotGroupReader.subtractSorted(newPos, oldPos)
        new SnapshotGroupReader(sp.absPath, innerSchema, hadoopConf,
          None, emitOnly = fresh)
      case "delete" =>
        // whole-file delete synthesis (overwrite-retired / fullRemoves
        // file): every LIVE row — the parent's vector positions SKIP
        new SnapshotGroupReader(sp.absPath, innerSchema, hadoopConf,
          Option(sp.oldDvDirAbs).map(d => (d, sp.relPath)))
      case _ =>
        new SnapshotGroupReader(sp.absPath, innerSchema, hadoopConf)
    }
    // output slot i ← data slot (>=0) or meta constant
    // (-1 change type, -2 version, -3 timestamp)
    val slots: Array[Int] = required.fields.map { f =>
      if (f.name == SnapshotCdf.ChangeTypeCol) -1
      else if (f.name == SnapshotCdf.CommitVersionCol) -2
      else if (f.name == SnapshotCdf.CommitTimestampCol) -3
      else dataFields.indexWhere(_.name == f.name)
    }
    val types = dataFields.map(_.dataType)
    val ctSlot = dataFields.length // file column, cdc partitions only
    val ct = org.apache.spark.unsafe.types.UTF8String
      .fromString(sp.changeType)
    // TimestampType internal representation: micros since epoch
    val tsMicros: Any =
      if (sp.commitTs > 0L) java.lang.Long.valueOf(sp.commitTs * 1000L)
      else null
    new PartitionReader[InternalRow] {
      override def next(): Boolean = inner.next()
      override def get(): InternalRow = {
        val in = inner.get()
        val arr = new Array[Any](slots.length)
        var i = 0
        while (i < slots.length) {
          arr(i) = slots(i) match {
            case -1 =>
              if (!isCdcFile) ct
              else if (in.isNullAt(ctSlot)) null
              else in.get(ctSlot, org.apache.spark.sql.types.StringType)
            case -2 => sp.commitVersion
            case -3 => tsMicros
            case d => if (in.isNullAt(d)) null else in.get(d, types(d))
          }
          i += 1
        }
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(arr)
      }
      override def close(): Unit = inner.close()
    }
  }

  // vectorized path: the scan emits ColumnarBatch, so Spark plans a
  // ColumnarToRow boundary and whole-stage codegen consumes the vectors
  // as it does for its native parquet scan (r8 advice #2 — the V2 face
  // is the catalog-integration path a 100 TB consumer actually uses).
  // Snapshots with live deletion vectors read row-based (the mode must
  // be uniform across a scan's partitions — see createReaderFactory).
  override def supportColumnarReads(p: InputPartition): Boolean = columnar

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new SnapshotColumnarReader(
      p.asInstanceOf[SnapshotInputPartition].absPath, required, hadoopConf)
}

object SnapshotColumnarReader {
  // parquet-mr's ColumnReadStoreImpl wants a converter tree, but the
  // typed getters (getLong/getBinary/...) never route through it — only
  // writeCurrentValueToConverter would, and we never call that. A
  // converter WITHOUT dictionary support also keeps page decode eager.
  private val NoopPrim = new org.apache.parquet.io.api.PrimitiveConverter {}
  private[sources] val Root: org.apache.parquet.io.api.GroupConverter =
    new org.apache.parquet.io.api.GroupConverter {
      override def getConverter(i: Int): org.apache.parquet.io.api.Converter =
        NoopPrim
      override def start(): Unit = ()
      override def end(): Unit = ()
    }
}

/** Vectorized single-file reader: each row group's pages decode
  * column-at-a-time into [[OnHeapColumnVector]]s in chunks of up to
  * 4096 rows. Definition levels drive per-value null bits (our schemas
  * are flat, so maxDef ∈ {0, 1}); a required column absent from the
  * file (schema evolution) fills with nulls; a projection matching NO
  * file column short-circuits to footer block row counts with zero page
  * reads. Type handling (timestamp units, INT96) matches
  * [[SnapshotGroupReader]] exactly. */
final class SnapshotColumnarReader(absPath: String, required: StructType,
    hadoopConf: Map[String, String])
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.parquet.column.ColumnReader
  import org.apache.parquet.column.impl.ColumnReadStoreImpl
  import org.apache.parquet.hadoop.ParquetFileReader
  import org.apache.parquet.hadoop.util.HadoopInputFile
  import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType}
  import org.apache.spark.sql.execution.vectorized.{OnHeapColumnVector, WritableColumnVector}
  import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}
  import scala.jdk.CollectionConverters._

  private val conf = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    hadoopConf.foreach { case (k, v) => c.set(k, v) }
    if (hadoopConf.isEmpty) new org.apache.hadoop.conf.Configuration()
    else c
  }
  private val reader = ParquetFileReader.open(
    HadoopInputFile.fromPath(new org.apache.hadoop.fs.Path(absPath), conf))
  private val fileMeta = reader.getFooter.getFileMetaData
  private val fileSchema: MessageType = fileMeta.getSchema
  private val present: Array[Boolean] =
    required.fields.map(f => fileSchema.containsField(f.name))
  private val projFields = required.fields.zip(present)
    .collect { case (f, true) =>
      fileSchema.getType(fileSchema.getFieldIndex(f.name)) }
  private val proj: Option[MessageType] =
    if (projFields.nonEmpty)
      Some(new MessageType(fileSchema.getName, projFields.toSeq: _*))
    else None
  proj.foreach(reader.setRequestedSchema)

  // zero-projection fast path: row counts from the footer, no page I/O
  private val blockIter: Iterator[Long] =
    if (proj.isEmpty)
      reader.getFooter.getBlocks.asScala.iterator.map(_.getRowCount)
    else Iterator.empty

  /** Per-present-field page fill loop, resolved once: reads `n` values
    * off the row group's [[ColumnReader]] into vector slots 0..n-1 with
    * definition-level null handling. */
  private val fillers: Array[(ColumnReader, WritableColumnVector, Int) => Unit] =
    required.fields.zip(present).map {
      case (_, false) => null
      case (f, true) =>
        val idx = proj.get.getFieldIndex(f.name)
        val maxDef = proj.get.getColumns.get(idx).getMaxDefinitionLevel
        val ptype = proj.get.getType(idx).asPrimitiveType()
        val putOne: (ColumnReader, WritableColumnVector, Int) => Unit =
          f.dataType match {
            case ByteType => (cr, v, i) => v.putByte(i, cr.getInteger.toByte)
            case ShortType => (cr, v, i) => v.putShort(i, cr.getInteger.toShort)
            case IntegerType | DateType => (cr, v, i) => v.putInt(i, cr.getInteger)
            case LongType => (cr, v, i) => v.putLong(i, cr.getLong)
            case FloatType => (cr, v, i) => v.putFloat(i, cr.getFloat)
            case DoubleType => (cr, v, i) => v.putDouble(i, cr.getDouble)
            case BooleanType => (cr, v, i) => v.putBoolean(i, cr.getBoolean)
            case StringType | BinaryType => (cr, v, i) => {
              val b = cr.getBinary.getBytes
              v.putByteArray(i, b, 0, b.length); ()
            }
            case TimestampType => ptype.getPrimitiveTypeName match {
              case PrimitiveType.PrimitiveTypeName.INT96 =>
                (cr, v, i) => v.putLong(i,
                  SnapshotGroupReader.int96Micros(cr.getBinary.getBytes))
              case _ =>
                val unit = Option(ptype.getLogicalTypeAnnotation).collect {
                  case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                    t.getUnit
                }
                unit match {
                  case Some(LogicalTypeAnnotation.TimeUnit.MILLIS) =>
                    (cr, v, i) => v.putLong(i, cr.getLong * 1000L)
                  case Some(LogicalTypeAnnotation.TimeUnit.NANOS) =>
                    // floorDiv, not /: pre-epoch nanos must round toward
                    // -inf to match Spark's native reader on negatives
                    (cr, v, i) => v.putLong(i, Math.floorDiv(cr.getLong, 1000L))
                  case _ => (cr, v, i) => v.putLong(i, cr.getLong)
                }
            }
            case other => throw new IllegalArgumentException(
              s"graft-snapshot: unsupported column type $other")
          }
        (cr: ColumnReader, v: WritableColumnVector, n: Int) => {
          var i = 0
          while (i < n) {
            if (cr.getCurrentDefinitionLevel < maxDef) v.putNull(i)
            else putOne(cr, v, i)
            cr.consume()
            i += 1
          }
        }
    }

  private val BatchSize = 4096
  private var cols: Array[ColumnReader] = null // per required field; null=absent
  private var rowsLeft: Long = 0
  private var batch: ColumnarBatch = null

  private def advanceRowGroup(): Boolean = {
    val pages = reader.readNextRowGroup()
    if (pages == null) return false
    val store = new ColumnReadStoreImpl(pages, SnapshotColumnarReader.Root,
      proj.get, fileMeta.getCreatedBy)
    // flat schema: the projection's column descriptors are in field order
    val descs = proj.get.getColumns
    cols = required.fields.zip(present).map {
      case (f, true) => store.getColumnReader(descs.get(proj.get.getFieldIndex(f.name)))
      case (_, false) => null
    }
    rowsLeft = pages.getRowCount
    true
  }

  override def next(): Boolean = {
    if (batch != null) { batch.close(); batch = null }
    if (proj.isEmpty) {
      while (rowsLeft == 0) {
        if (!blockIter.hasNext) return false
        rowsLeft = blockIter.next()
      }
      val n = math.min(BatchSize.toLong, rowsLeft).toInt
      rowsLeft -= n
      val vecs = OnHeapColumnVector.allocateColumns(n, required)
      vecs.foreach(_.putNulls(0, n))
      batch = new ColumnarBatch(vecs.map(v => v: ColumnVector), n)
      return true
    }
    while (rowsLeft == 0) {
      if (!advanceRowGroup()) return false
    }
    val n = math.min(BatchSize.toLong, rowsLeft).toInt
    rowsLeft -= n
    val vecs = OnHeapColumnVector.allocateColumns(n, required)
    var c = 0
    while (c < vecs.length) {
      if (cols(c) == null) vecs(c).putNulls(0, n)
      else fillers(c)(cols(c), vecs(c), n)
      c += 1
    }
    batch = new ColumnarBatch(vecs.map(v => v: ColumnVector), n)
    true
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    if (batch != null) { batch.close(); batch = null }
    reader.close()
  }
}

object SnapshotGroupReader {
  private[sources] def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | BooleanType | StringType | BinaryType |
         TimestampType | DateType => true
    case _ => false
  }

  /** INT96 timestamp: 8 LE bytes nanos-of-day + 4 LE bytes Julian day. */
  private[sources] def int96Micros(b: Array[Byte]): Long = {
    val buf = java.nio.ByteBuffer.wrap(b)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nanosOfDay = buf.getLong
    val julianDay = buf.getInt
    (julianDay - 2440588L) * 86400000000L + nanosOfDay / 1000L
  }

  /** Sorted deleted row positions for `relPath`, read from the vector
    * dataset's `__gb=<basename>` partition directory — one small
    * directory per covered file, so loading a file's vector never scans
    * the commit's whole delete set. The `__gfile` equality filter
    * disambiguates basename collisions (the same rule as the core
    * reader's path-suffix residual). */
  private[sources] def loadDvPositions(dvDirAbs: String, relPath: String,
      conf: org.apache.hadoop.conf.Configuration): Array[Long] = {
    import org.apache.parquet.hadoop.ParquetReader
    import org.apache.parquet.hadoop.example.GroupReadSupport
    val base = relPath.split('/').last
    val dir = new org.apache.hadoop.fs.Path(dvDirAbs, s"__gb=$base")
    val fs = dir.getFileSystem(conf)
    // a dv entry always covers >= 1 position, so a missing partition
    // directory is CORRUPTION (vacuumed-away vector, partial copy) —
    // fail loudly like the core face; silently skipping nothing would
    // resurrect every deleted row
    if (!fs.exists(dir)) throw new IllegalStateException(
      s"graft-snapshot: deletion-vector directory $dir is missing for " +
        s"$relPath — the vector dataset was removed (vacuum past a " +
        "referencing version, or a partial table copy)")
    val parts = Option(fs.listStatus(dir)).getOrElse(Array.empty)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
    val buf = scala.collection.mutable.ArrayBuffer.empty[Long]
    parts.foreach { f =>
      // fresh conf copy WITHOUT the caller's data-schema projection —
      // the vector dataset has its own (__gfile, __gpos) schema
      val dvConf = new org.apache.hadoop.conf.Configuration(conf)
      dvConf.unset(
        org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA)
      val r = ParquetReader.builder(new GroupReadSupport(), f)
        .withConf(dvConf).build()
      try {
        var g = r.read()
        while (g != null) {
          if (g.getFieldRepetitionCount("__gfile") > 0 &&
              g.getBinary("__gfile", 0).toStringUsingUTF8 == relPath)
            buf += g.getLong("__gpos", 0)
          g = r.read()
        }
      } finally r.close()
    }
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    arr
  }

  /** a \ b over sorted long arrays (merge walk) — the fresh positions a
    * change-feed delete partition emits. */
  private[sources] def subtractSorted(a: Array[Long],
      b: Array[Long]): Array[Long] = {
    if (b.isEmpty) return a
    val out = new scala.collection.mutable.ArrayBuilder.ofLong
    var i = 0; var j = 0
    while (i < a.length) {
      while (j < b.length && b(j) < a(i)) j += 1
      if (j >= b.length || b(j) != a(i)) out += a(i)
      i += 1
    }
    out.result()
  }
}

/** Reads ONE manifest file through parquet-mr's Group API with a pushed
  * column projection; emits only the pruned schema. A column absent
  * from the file (written before a schema-evolving commit) emits
  * null. `dv` = (vector dataset abs path, this file's rel path) when
  * the file carries a merge-on-read deletion vector: the sorted
  * positions load once and a sequential two-pointer walk skips them —
  * O(1) amortized per row, matching `_metadata.row_index` semantics
  * because both this reader and the vector writer count rows in file
  * order. */
final class SnapshotGroupReader(absPath: String, required: StructType,
    hadoopConf: Map[String, String] = Map.empty,
    dv: Option[(String, String)] = None,
    emitOnly: Array[Long] = null)
    extends PartitionReader[InternalRow] {
  import org.apache.parquet.example.data.Group
  import org.apache.parquet.hadoop.{ParquetFileReader, ParquetReader}
  import org.apache.parquet.hadoop.example.GroupReadSupport
  import org.apache.parquet.hadoop.util.HadoopInputFile
  import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType}

  private val conf = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    hadoopConf.foreach { case (k, v) => c.set(k, v) }
    if (hadoopConf.isEmpty) new org.apache.hadoop.conf.Configuration()
    else c
  }
  private val hPath = new org.apache.hadoop.fs.Path(absPath)

  private val fileSchema: MessageType = {
    val fr = ParquetFileReader.open(HadoopInputFile.fromPath(hPath, conf))
    try fr.getFooter.getFileMetaData.getSchema finally fr.close()
  }

  private val present: Array[Boolean] =
    required.fields.map(f => fileSchema.containsField(f.name))

  // projection: the file's own types for exactly the requested fields
  // that exist in it; a zero-field projection (count(*) over a file
  // lacking every requested column) keeps one narrow carrier column so
  // parquet-mr still iterates the row count
  private val projFields = required.fields.zip(present)
    .collect { case (f, true) =>
      fileSchema.getType(fileSchema.getFieldIndex(f.name)) }
  private val proj = new MessageType(fileSchema.getName,
    (if (projFields.nonEmpty) projFields.toSeq
     else Seq(fileSchema.getFields.get(0))): _*)

  private val reader: ParquetReader[Group] = {
    conf.set(org.apache.parquet.hadoop.api.ReadSupport.PARQUET_READ_SCHEMA,
      proj.toString)
    ParquetReader.builder(new GroupReadSupport(), hPath).withConf(conf)
      .build()
  }

  /** Per-field extractors resolved once: (group) => Catalyst value. */
  private val emitters: Array[Group => Any] =
    required.fields.zip(present).map {
      case (_, false) => (_: Group) => null
      case (f, true) =>
        val idx = proj.getFieldIndex(f.name)
        val ptype = proj.getType(idx).asPrimitiveType()
        val get: Group => Any = f.dataType match {
          case ByteType => g => g.getInteger(idx, 0).toByte
          case ShortType => g => g.getInteger(idx, 0).toShort
          case IntegerType => g => g.getInteger(idx, 0)
          case LongType => g => g.getLong(idx, 0)
          case FloatType => g => g.getFloat(idx, 0)
          case DoubleType => g => g.getDouble(idx, 0)
          case BooleanType => g => g.getBoolean(idx, 0)
          case StringType =>
            g => UTF8String.fromBytes(g.getBinary(idx, 0).getBytes)
          case BinaryType => g => g.getBinary(idx, 0).getBytes
          case DateType => g => g.getInteger(idx, 0)
          case TimestampType =>
            ptype.getPrimitiveTypeName match {
              case PrimitiveType.PrimitiveTypeName.INT96 =>
                g => SnapshotGroupReader.int96Micros(
                  g.getInt96(idx, 0).getBytes)
              case _ =>
                val unit = Option(ptype.getLogicalTypeAnnotation).collect {
                  case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                    t.getUnit
                }
                unit match {
                  case Some(LogicalTypeAnnotation.TimeUnit.MILLIS) =>
                    g => g.getLong(idx, 0) * 1000L
                  case Some(LogicalTypeAnnotation.TimeUnit.NANOS) =>
                    // floorDiv: see the columnar twin — pre-epoch nanos
                    g => Math.floorDiv(g.getLong(idx, 0), 1000L)
                  case _ => g => g.getLong(idx, 0) // micros (default)
                }
            }
          case other => throw new IllegalArgumentException(
            s"graft-snapshot: unsupported column type $other")
        }
        (g: Group) =>
          if (g.getFieldRepetitionCount(idx) == 0) null else get(g)
    }

  private var cur: Group = _

  private val dvPositions: Array[Long] = dv match {
    case Some((dirAbs, rel)) =>
      SnapshotGroupReader.loadDvPositions(dirAbs, rel, conf)
    case None => Array.emptyLongArray
  }
  private var rowPos: Long = -1L
  private var dvIdx: Int = 0
  private var emitIdx: Int = 0

  override def next(): Boolean = {
    while (true) {
      // emit-only mode (change-feed deletes): done once the sorted
      // wanted-position list is exhausted — no tail read
      if (emitOnly != null && emitIdx >= emitOnly.length) return false
      cur = reader.read()
      if (cur == null) return false
      rowPos += 1
      if (emitOnly != null) {
        if (emitOnly(emitIdx) == rowPos) { emitIdx += 1; return true }
      } else {
        if (dvPositions.length == 0) return true
        while (dvIdx < dvPositions.length && dvPositions(dvIdx) < rowPos)
          dvIdx += 1
        if (dvIdx >= dvPositions.length || dvPositions(dvIdx) != rowPos)
          return true
      }
    }
    false // unreachable
  }

  private val width = required.fields.length

  override def get(): InternalRow = {
    // one array per row, no Seq wrapper/closure per cell (hot path)
    val arr = new Array[Any](width)
    var i = 0
    while (i < width) { arr(i) = emitters(i)(cur); i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(arr)
  }

  override def close(): Unit = reader.close()
}

/** Streaming offset: the newest CONSUMED committed version. */
final case class SnapshotVersionOffset(version: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = version.toString
}

/** Micro-batch stream tailing the transaction log: each batch is the
  * files ADDED by versions in (start, end], skipping optimize commits.
  * Replay is deterministic from the log → exactly-once under retries
  * and restarts. `option("maxVersionsPerTrigger", n)` and
  * `option("maxBytesPerTrigger", b)` are ADMISSION CONTROL (the
  * maxFilesPerTrigger/maxBytesPerTrigger idiom): a consumer resuming
  * behind a 10 000-commit backlog catches up in bounded per-trigger
  * batches instead of planning one giant all-history batch — the bytes
  * form walks the backlog's manifests and admits whole versions until
  * their recorded add-bytes exceed the budget (always ≥ 1 version so
  * the stream cannot stall on one oversized commit). */
final class SnapshotMicroBatchStream(path: String, required: StructType,
    startingVersion: Long, maxVersionsPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None,
    cdf: Boolean = false)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {

  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  require(maxVersionsPerTrigger.forall(_ > 0),
    "maxVersionsPerTrigger must be positive")
  require(maxBytesPerTrigger.forall(_ > 0),
    "maxBytesPerTrigger must be positive")

  override def initialOffset(): Offset =
    SnapshotVersionOffset(math.max(0L, startingVersion - 1))

  private def committedLatest(): Long = math.max(
    Snapshots.latestVersion(SparkSession.active, path),
    startingVersion - 1)

  override def latestOffset(): Offset =
    SnapshotVersionOffset(committedLatest())

  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.map(n => ReadLimit.maxFiles(n.toInt))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, readLimit: ReadLimit): Offset = {
    val cur = committedLatest()
    val s = start.asInstanceOf[SnapshotVersionOffset].version
    val byVersions = maxVersionsPerTrigger match {
      case Some(n) => math.min(cur, s + n)
      case None => cur
    }
    val end = maxBytesPerTrigger match {
      case Some(budget) =>
        val spark = SparkSession.active
        var v = s; var bytes = 0L
        var stop = false
        while (!stop && v < byVersions) {
          // a version whose adds lack recorded byte sizes (pre-bytes
          // manifest, bytes = 0) costs the WHOLE budget, not zero —
          // otherwise a backlog of upgraded-table commits admits in
          // one unbounded batch. Unknown = over-budget = one such
          // version per trigger.
          val add = Snapshots.manifestAt(spark, path, v + 1)
            .map { m =>
              if (Snapshots.isMaintenanceOp(m.op)) 0L
              else {
                val sizes = m.adds.map(f =>
                  m.stats.get(f).map(_.bytes).getOrElse(0L))
                if (m.adds.nonEmpty && sizes.exists(_ <= 0L)) Long.MaxValue
                else sizes.sum
              }
            }
            .getOrElse(0L)
          // always admit at least one version; stop once the budget is
          // exceeded by the NEXT version's bytes
          if (v > s && (add == Long.MaxValue || bytes + add > budget))
            stop = true
          else {
            v += 1
            // an admitted unknown-size version consumed the whole
            // budget: nothing else rides along in this trigger
            if (add == Long.MaxValue) stop = true else bytes += add
          }
        }
        v
      case None => byVersions
    }
    SnapshotVersionOffset(end)
  }

  override def reportLatestOffset(): Offset =
    SnapshotVersionOffset(committedLatest())

  override def deserializeOffset(json: String): Offset =
    SnapshotVersionOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val spark = SparkSession.active
    val s = start.asInstanceOf[SnapshotVersionOffset].version
    val e = end.asInstanceOf[SnapshotVersionOffset].version
    if (cdf) {
      // row-level change feed: same per-version planning as the batch
      // CDF face (inserts from adds, deletes from fresh dv positions);
      // the expiry horizon resolves ONCE per admitted range
      val hz = Snapshots.cdcHorizon(spark, path)
      return (s + 1 to e).flatMap(v =>
        SnapshotCdf.partitionsFor(spark, path, v, streaming = true, hz))
        .map(p => p: InputPartition).toArray
    }
    val root = new org.apache.hadoop.fs.Path(path)
    (s + 1 to e).flatMap { v =>
      Snapshots.manifestAt(spark, path, v) match {
        case Some(m) if !Snapshots.isMaintenanceOp(m.op) => m.adds
        case Some(_) => Nil // optimize/compact: same rows, new layout — skip
        case None if Snapshots.claimExists(spark, path, v) =>
          Nil // dead claim (file present, unparseable): published nothing
        case None =>
          // the manifest FILE is gone: vacuum retired a version this
          // stream never consumed — silently skipping would drop its
          // committed rows from the feed forever
          throw new IllegalStateException(
            s"graft-snapshot: version $v at $path was vacuumed before " +
              "this stream consumed it — reset the checkpoint (or use " +
              "startingVersion) past the vacuum horizon")
      }
    }.map(f => SnapshotInputPartition(
      new org.apache.hadoop.fs.Path(root, f).toString): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    SnapshotReaderFactory.fromSession(required, columnar = !cdf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
