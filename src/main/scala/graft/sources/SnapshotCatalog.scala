package graft.sources

import graft.ops.Snapshots
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL-surface catalog for the `graft-snapshot` lakehouse store — the
  * integration a catalog-managed deployment actually uses: register
  * once (`spark.sql.catalog.graft = graft.sources.SnapshotCatalog`,
  * `spark.sql.catalog.graft.warehouse = /data/graft`) and the whole
  * tier drives by IDENTIFIER instead of path:
  *
  *   - `spark.table("graft.db.t")` / `SELECT ... FROM graft.db.t`
  *   - `CREATE TABLE graft.db.t (id BIGINT) PARTITIONED BY (lang)`
  *   - `INSERT INTO graft.db.t ...` (full commit protocol — atomic
  *     publish, schema enforcement, CHECK constraints, stats)
  *   - `SELECT ... FROM graft.db.t VERSION AS OF 3` /
  *     `TIMESTAMP AS OF ...` (Spark routes both through the
  *     time-travel loadTable overloads)
  *
  * Identifiers map to the filesystem: `graft.db.t` lives at
  * `<warehouse>/db/t`, a table is any directory holding a `_graft_log`.
  * There is deliberately NO separate metastore: the transaction log IS
  * the table metadata (the path-based Delta model), so catalog and
  * direct-path access can never disagree. */
final class SnapshotCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _
  private val provider = new SnapshotTableProvider

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog $name needs spark.sql.catalog.$name.warehouse"))
  }

  override def name(): String = catalogName

  /** Identifier segments become PATH segments — validate them so a
    * backticked name carrying '/' or '..' can never escape the
    * warehouse (dropTable recursively deletes the resolved path; an
    * escaped one would delete an unrelated table). */
  private def checkSegment(s: String): String = {
    require(s.nonEmpty && s != "." && s != ".." &&
        !s.exists(c => c == '/' || c == '\\' || c == ':'),
      s"invalid identifier segment '$s' — names must not contain path " +
        "separators or be relative path tokens")
    s
  }

  private def pathOf(ident: Identifier): String =
    (warehouse +: ident.namespace().toSeq.map(checkSegment) :+
      checkSegment(ident.name())).mkString("/")

  private def fs = new org.apache.hadoop.fs.Path(warehouse)
    .getFileSystem(SparkSession.active.sessionState.newHadoopConf())

  private def isTableDir(p: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(p, "_graft_log"))

  // ------------------------------------------------------------- tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new org.apache.hadoop.fs.Path(
      (warehouse +: namespace.toSeq.map(checkSegment)).mkString("/"))
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(
      catalogName +: namespace.toSeq)
    Option(fs.listStatus(dir)).getOrElse(Array.empty)
      .filter(s => s.isDirectory && isTableDir(s.getPath))
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    isTableDir(new org.apache.hadoop.fs.Path(pathOf(ident)))

  private def load(ident: Identifier,
      extra: Map[String, String]): Table = {
    val props = new java.util.HashMap[String, String]()
    props.put("path", pathOf(ident))
    extra.foreach { case (k, v) => props.put(k, v) }
    try provider.getTable(new StructType(), Array.empty, props)
    catch {
      case e: IllegalArgumentException
          if e.getMessage != null &&
            e.getMessage.contains("no committed snapshot") =>
        throw new NoSuchTableException(ident)
    }
  }

  override def loadTable(ident: Identifier): Table =
    load(ident, Map.empty)

  /** `VERSION AS OF v` — the SQL face of versionAsOf. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, Map("versionAsOf" ->
      (try version.toLong.toString
       catch { case _: NumberFormatException =>
         throw new IllegalArgumentException(
           s"graft-snapshot versions are numeric; got '$version'") })))

  /** `TIMESTAMP AS OF t` — Spark hands MICROseconds since epoch; the
    * log's in-commit timestamps are millis. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val v = Snapshots.versionAtTimestamp(SparkSession.active,
        pathOf(ident), Math.floorDiv(timestamp, 1000L))
      .getOrElse(throw new IllegalArgumentException(
        s"no commit at or before timestamp $timestamp at ${pathOf(ident)}"))
    load(ident, Map("versionAsOf" -> v.toString))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val partitionBy = partitions.toSeq.map { t =>
      t.references() match {
        case refs if t.name() == "identity" && refs.length == 1 =>
          refs.head.fieldNames().mkString(".")
        case _ => throw new UnsupportedOperationException(
          s"graft-snapshot supports identity partitioning only; got $t")
      }
    }
    Snapshots.createEmpty(SparkSession.active, pathOf(ident), schema,
      partitionBy)
    load(ident, Map.empty)
  }

  /** CREATE TABLE with inline constraints (`CONSTRAINT c CHECK (...)`)
    * — the `TableInfo` overload Spark routes to when the catalog
    * advertises `SUPPORT_TABLE_CONSTRAINT`. The DEFAULT implementation
    * forwards only columns/partitions/properties and silently DROPS
    * the constraints; this override records them (non-CHECK shapes
    * reject typed BEFORE the table is created, so a failed statement
    * leaves nothing behind). Validation is skipped: the table is empty
    * by construction. */
  override def createTable(ident: Identifier,
      info: org.apache.spark.sql.connector.catalog.TableInfo): Table = {
    val checks = info.constraints().toSeq.map {
      case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
        c.name().toLowerCase(java.util.Locale.ROOT) -> c.predicateSql()
      case other => throw new UnsupportedOperationException(
        s"graft-snapshot supports CHECK constraints only; got " +
          s"${other.toDDL}")
    }
    // every reason a constraint commit could fail must be checked
    // BEFORE the table commit (names colliding after lowercasing was
    // the one addConstraint-time failure left) — otherwise a failed
    // CREATE TABLE statement leaves a table behind with a partial
    // constraint set
    checks.map(_._1).groupBy(identity).collectFirst {
      case (n, hits) if hits.size > 1 => throw new IllegalArgumentException(
        s"CREATE TABLE ${ident.name()}: duplicate constraint name '$n' " +
          "(names are case-insensitive)")
    }
    val t = createTable(ident, info.schema(), info.partitions(),
      info.properties())
    // belt-and-braces: should a constraint commit still fail (exotic
    // predicate SQL the engine rejects), roll the CREATE back so the
    // statement leaves nothing behind. validatedAt pins each skip to
    // the version the previous commit produced — a concurrent append
    // sneaking between createEmpty and a constraint commit forces
    // re-validation instead of recording a constraint live rows
    // violate (the same anchoring alterTable's skip gets).
    try {
      var at = 1L // createEmpty committed version 1
      checks.foreach { case (n, sql) =>
        at = Snapshots.addConstraint(SparkSession.active, pathOf(ident),
          n, sql, validate = false, validatedAt = Some(at))
      }
    } catch { case e: Throwable =>
      try dropTable(ident)
      catch { case scala.util.control.NonFatal(_) => }
      throw e
    }
    if (checks.isEmpty) t else load(ident, Map.empty)
  }

  /** `ALTER TABLE ... ADD COLUMN(S)` — an alias for the engine's
    * append-evolution rule: a zero-row commit carrying the widened
    * schema (new columns record NULLABLE; old files read them as
    * null, exactly as an evolving append would). Every other change
    * class keeps the documented rejection: types never mutate in
    * place, and CHECK constraints have their own API
    * (Snapshots.addConstraint/dropConstraint). */
  /** SQL catalog capabilities: CHECK constraints ride `ALTER TABLE
    * ADD/DROP CONSTRAINT` into the engine's own constraint commits. */
  override def capabilities()
      : java.util.Set[TableCatalogCapability] =
    java.util.EnumSet.of(
      TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val spark0 = SparkSession.active
    // constraint changes route into the engine's constraint commits
    // (full validation of EXISTING rows inside addConstraint, typed
    // violation error) — CHECK only: Unique/PK/FK are informational
    // in Spark's model and this store enforces what it records
    val constraintChanges = changes.collect {
      case a: TableChange.AddConstraint => a
      case d: TableChange.DropConstraint => d
    }
    if (constraintChanges.nonEmpty) {
      if (constraintChanges.size != changes.size)
        throw new UnsupportedOperationException(
          "graft-snapshot ALTER TABLE: mix of constraint and " +
            "non-constraint changes is not supported in one statement")
      constraintChanges.foreach {
        case a: TableChange.AddConstraint => a.constraint() match {
          case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
            // SQL identifiers are case-insensitive by default — names
            // normalize to lowercase so ADD V_Pos / DROP v_pos agree
            // (the Delta rule). validatedTableVersion is non-null when
            // Spark's AddCheckConstraintExec already scanned existing
            // rows (it carries SnapshotTable.version(), the pinned
            // manifest version that scan read) — re-validating would
            // read the whole table twice per ADD CONSTRAINT. The skip
            // is honoured only while the table still sits at that
            // version: addConstraint compares it against the manifest
            // the metadata commit anchors on and re-validates if a
            // concurrent data commit advanced the table (an
            // unparseable version string also forces re-validation).
            val vstr = Option(a.validatedTableVersion())
            val vnum = vstr.flatMap(v =>
              scala.util.Try(v.toLong).toOption)
            Snapshots.addConstraint(spark0, pathOf(ident),
              c.name().toLowerCase(java.util.Locale.ROOT),
              c.predicateSql(),
              validate = vstr.isEmpty || vnum.isEmpty,
              validatedAt = vnum)
          case other => throw new UnsupportedOperationException(
            s"graft-snapshot supports CHECK constraints only; got " +
              s"${other.toDDL}")
        }
        case d: TableChange.DropConstraint =>
          // the existence check and the drop must share ONE log read
          // (concurrent IF EXISTS drops: the loser no-ops, not fails)
          Snapshots.dropConstraint(spark0, pathOf(ident),
            d.name().toLowerCase(java.util.Locale.ROOT),
            ifExists = d.ifExists())
      }
      return load(ident, Map.empty)
    }
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    if (adds.isEmpty || adds.size != changes.size)
      throw new UnsupportedOperationException(
        "graft-snapshot ALTER TABLE supports ADD COLUMN(S) and " +
          "ADD/DROP CONSTRAINT (CHECK) — evolve other shapes by " +
          "appending (new columns merge nullable)")
    val spark = SparkSession.active
    val path = pathOf(ident)
    val cur = Snapshots.read(spark, path).schema
    val widened = adds.foldLeft(cur) { (s, a) =>
      require(a.fieldNames().length == 1,
        "graft-snapshot ADD COLUMN supports top-level columns only; " +
          s"got ${a.fieldNames().mkString(".")}")
      val name = a.fieldNames().head
      require(!s.fieldNames.exists(_.equalsIgnoreCase(name)),
        s"column $name already exists in ${ident.name()}")
      s.add(name, a.dataType(), nullable = true)
    }
    Snapshots.append(
      SparkSession.active.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), widened),
      path)
    load(ident, Map.empty)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = new org.apache.hadoop.fs.Path(pathOf(ident))
    if (!isTableDir(p)) false
    else fs.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent))
      throw new TableAlreadyExistsException(newIdent)
    val dst = new org.apache.hadoop.fs.Path(pathOf(newIdent))
    fs.mkdirs(dst.getParent)
    if (!fs.rename(new org.apache.hadoop.fs.Path(pathOf(oldIdent)), dst))
      throw new IllegalStateException(
        s"rename ${pathOf(oldIdent)} -> ${pathOf(newIdent)} failed")
  }

  // --------------------------------------------------------- namespaces

  override def listNamespaces(): Array[Array[String]] = {
    val root = new org.apache.hadoop.fs.Path(warehouse)
    if (!fs.exists(root)) return Array.empty
    Option(fs.listStatus(root)).getOrElse(Array.empty)
      .filter(s => s.isDirectory && !isTableDir(s.getPath))
      .map(s => Array(s.getPath.getName))
  }

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException(
      catalogName +: namespace.toSeq)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || fs.exists(new org.apache.hadoop.fs.Path(
      (warehouse +: namespace.toSeq.map(checkSegment)).mkString("/")))

  override def loadNamespaceMetadata(namespace: Array[String])
      : java.util.Map[String, String] =
    if (namespaceExists(namespace)) new java.util.HashMap[String, String]()
    else throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    fs.mkdirs(new org.apache.hadoop.fs.Path(
      (warehouse +: namespace.toSeq.map(checkSegment)).mkString("/")))
    ()
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "namespace properties are not supported")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    val p = new org.apache.hadoop.fs.Path(
      (warehouse +: namespace.toSeq.map(checkSegment)).mkString("/"))
    if (!fs.exists(p)) false
    else {
      if (!cascade &&
          Option(fs.listStatus(p)).exists(_.nonEmpty))
        // the TableCatalog/SupportsNamespaces contract: SQL DROP
        // NAMESPACE surfaces the typed error, and callers that catch
        // it (e.g. CASCADE fallbacks) behave correctly
        throw new org.apache.spark.sql.catalyst.analysis
          .NonEmptyNamespaceException(namespace)
      fs.delete(p, true)
    }
  }

  // --------------------------------------------------------- procedures

  /** SQL maintenance surface: `CALL <cat>.system.optimize/
    * optimize_to_size/vacuum/restore/history(table => 'db.t', ...)` —
    * see [[SnapshotProcedures]]. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    SnapshotProcedures.load(warehouse, checkSegment, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.toSeq == Seq("system"))
      SnapshotProcedures.all(warehouse, checkSegment)
        .map(p => Identifier.of(Array("system"), p.name)).toArray
    else Array.empty
}
