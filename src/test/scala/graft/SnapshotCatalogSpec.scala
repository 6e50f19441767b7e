package graft

import graft.ops.Snapshots
import org.apache.spark.sql.functions._

/** The SQL-surface catalog: identifier-driven create / insert / read /
  * time travel / drop over the snapshot store. */
class SnapshotCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val wh: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_cat_").toString
    spark.conf.set("spark.sql.catalog.gtest",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.gtest.warehouse", d)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.db")
    d
  }

  test("create, insert, read by identifier, time travel, drop") {
    wh
    spark.sql(
      "CREATE TABLE gtest.db.t (id BIGINT, name STRING, v DOUBLE)")
    // v1 = empty create; two INSERTs drive the full commit protocol
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "v")
      .createOrReplaceTempView("src1")
    Seq((3L, "c", 3.0)).toDF("id", "name", "v")
      .createOrReplaceTempView("src2")
    spark.sql("INSERT INTO gtest.db.t SELECT * FROM src1")
    spark.sql("INSERT INTO gtest.db.t SELECT * FROM src2")
    spark.table("gtest.db.t").select("id")
      .as[Long].collect().sorted shouldBe Seq(1L, 2L, 3L)
    // SQL time travel routes through loadTable(ident, version)
    spark.sql("SELECT id FROM gtest.db.t VERSION AS OF 2")
      .as[Long].collect().sorted shouldBe Seq(1L, 2L)
    spark.sql("SELECT id FROM gtest.db.t VERSION AS OF 1")
      .count() shouldBe 0L
    // the log IS the metadata: the path face sees the same table
    Snapshots.read(spark, s"$wh/db/t").count() shouldBe 3L
    spark.sql("SHOW TABLES IN gtest.db").collect()
      .map(_.getString(1)) should contain("t")
    spark.sql("DROP TABLE gtest.db.t")
    spark.catalog.tableExists("gtest.db.t") shouldBe false
  }

  test("CREATE TABLE PARTITIONED BY records the layout; inserts " +
      "re-record exact partition values") {
    wh
    spark.sql("CREATE TABLE gtest.db.pt (id BIGINT, lang STRING) " +
      "PARTITIONED BY (lang)")
    Seq((1L, "en"), (2L, "de"), (3L, "en")).toDF("id", "lang")
      .createOrReplaceTempView("psrc")
    spark.sql("INSERT INTO gtest.db.pt SELECT * FROM psrc")
    Snapshots.tablePartitionBy(spark, s"$wh/db/pt") shouldBe Seq("lang")
    val m = Snapshots.snapshotAt(spark, s"$wh/db/pt").get
    m.files.foreach(f => m.stats(f).parts.keySet shouldBe Set("lang"))
    spark.table("gtest.db.pt").where(col("lang") === "en")
      .count() shouldBe 2L
    spark.sql("DROP TABLE gtest.db.pt")
  }

  test("timestamp time travel by identifier") {
    wh
    spark.sql("CREATE TABLE gtest.db.tt (id BIGINT)")
    Seq(Tuple1(1L)).toDF("id").createOrReplaceTempView("tt1")
    spark.sql("INSERT INTO gtest.db.tt SELECT * FROM tt1")
    val ts2 = Snapshots.history(spark, s"$wh/db/tt")
      .where(col("version") === 2L)
      .select("commit_ts").as[Long].head()
    Seq(Tuple1(2L)).toDF("id").createOrReplaceTempView("tt2")
    spark.sql("INSERT INTO gtest.db.tt SELECT * FROM tt2")
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss.SSS")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    spark.sql(s"SELECT id FROM gtest.db.tt TIMESTAMP AS OF " +
        s"'${fmt.format(new java.util.Date(ts2))}'")
      .as[Long].collect().sorted shouldBe Seq(1L)
    spark.sql("DROP TABLE gtest.db.tt")
  }

  test("DELETE FROM by identifier: exact filter translation, refusal " +
      "on untranslatable predicates, TRUNCATE TABLE") {
    wh
    spark.sql("CREATE TABLE gtest.db.del (id BIGINT, name STRING)")
    (1L to 20L).map(i => (i, s"n$i")).toDF("id", "name")
      .createOrReplaceTempView("dsrc")
    spark.sql("INSERT INTO gtest.db.del SELECT * FROM dsrc")
    spark.sql("DELETE FROM gtest.db.del WHERE id <= 5 OR name = 'n20'")
    spark.table("gtest.db.del").select("id")
      .as[Long].collect().sorted shouldBe (6L to 19L)
    // null semantics: WHERE on a null predicate keeps the row
    spark.sql("DELETE FROM gtest.db.del WHERE name LIKE 'n1%'")
    spark.table("gtest.db.del").select("id")
      .as[Long].collect().sorted shouldBe (6L to 9L)
    spark.sql("TRUNCATE TABLE gtest.db.del")
    spark.table("gtest.db.del").count() shouldBe 0L
    // history survives: truncate is one more commit, not an rm -rf
    Snapshots.read(spark, s"$wh/db/del", Some(2L)).count() shouldBe 20L
    spark.sql("DROP TABLE gtest.db.del")
  }

  test("replaceWhere write option: predicate-scoped overwrite through " +
      "the V2 face; append mode rejects it") {
    wh
    val p = s"$wh/db/rw"
    (1L to 10L).map(i => (i, i * 1.0)).toDF("id", "v")
      .write.format("graft-snapshot").mode("append").save(p)
    // backfill ids 1..3 with tripled values, atomically, only that region
    (1L to 3L).map(i => (i, i * 3.0)).toDF("id", "v")
      .write.format("graft-snapshot").mode("overwrite")
      .option("replaceWhere", "id <= 3").save(p)
    val out = Snapshots.read(spark, p).as[(Long, Double)].collect().toMap
    out(1L) shouldBe 3.0
    out(3L) shouldBe 9.0
    out(10L) shouldBe 10.0
    out.size shouldBe 10
    val e = intercept[Exception] {
      (1L to 3L).map(i => (i, 0.0)).toDF("id", "v")
        .write.format("graft-snapshot").mode("append")
        .option("replaceWhere", "id <= 3").save(p)
    }
    e.getMessage should include("overwrite")
  }

  test("errors are typed: missing table, duplicate create, rename") {
    wh
    // the analyzer surfaces our NoSuchTableException as its own
    // TABLE_OR_VIEW_NOT_FOUND AnalysisException
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM gtest.db.nope").collect()
    }
    spark.sql("CREATE TABLE gtest.db.dup (id BIGINT)")
    intercept[org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException] {
      spark.sql("CREATE TABLE gtest.db.dup (id BIGINT)")
    }
    spark.sql("ALTER TABLE gtest.db.dup RENAME TO db.dup2")
    spark.catalog.tableExists("gtest.db.dup2") shouldBe true
    spark.sql("DROP TABLE gtest.db.dup2")
  }

  test("identifiers cannot escape the warehouse: path-separator and " +
      "dot-dot segments are rejected before any filesystem action") {
    wh
    val e = intercept[Exception] {
      spark.sql("DROP TABLE gtest.db.`../../escape`")
    }
    e.getMessage should include("invalid identifier segment")
    intercept[Exception] {
      spark.sql("CREATE TABLE gtest.db.`a/b` (id BIGINT)")
    }.getMessage should include("invalid identifier segment")
  }

  test("SQL UPDATE by identifier: copy-on-write commit, WHERE scoped, " +
      "explain side-effect-free, and the CDC sidecar carries images") {
    wh
    spark.sql("CREATE TABLE gtest.db.ut (id BIGINT, name STRING, " +
      "v DOUBLE)")
    Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("id", "name", "v").createOrReplaceTempView("usrc")
    spark.sql("INSERT INTO gtest.db.ut SELECT * FROM usrc")
    // EXPLAIN must not execute the command
    spark.sql("EXPLAIN UPDATE gtest.db.ut SET v = v * 10 WHERE id <= 2")
      .collect()
    spark.table("gtest.db.ut").agg(sum("v")).as[Double].head() shouldBe 6.0
    spark.sql("UPDATE gtest.db.ut SET v = v * 10, name = 'upd' " +
      "WHERE id <= 2")
    spark.table("gtest.db.ut").orderBy("id")
      .as[(Long, String, Double)].collect() shouldBe Array(
      (1L, "upd", 10.0), (2L, "upd", 20.0), (3L, "c", 3.0))
    // the commit is a real CoW update with paired CDC images
    val p = s"$wh/db/ut"
    val v = Snapshots.latestVersion(spark, p)
    Snapshots.manifestAt(spark, p, v).get.op shouldBe "update"
    Snapshots.changeFeed(spark, p, v - 1, v)
      .groupBy("_change_type").count().as[(String, Long)]
      .collect().toMap shouldBe
      Map("update_preimage" -> 2L, "update_postimage" -> 2L)
    spark.sql("DROP TABLE gtest.db.ut")
  }

  test("SQL MERGE INTO by identifier: the canonical upsert routes into " +
      "Snapshots.merge; general shapes route into mergeInto; " +
      "non-equi conditions fail typed") {
    wh
    spark.sql("CREATE TABLE gtest.db.mt (id BIGINT, name STRING, " +
      "v DOUBLE)")
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "v")
      .createOrReplaceTempView("mbase")
    spark.sql("INSERT INTO gtest.db.mt SELECT * FROM mbase")
    Seq((2L, "B", 22.0), (9L, "i", 9.0)).toDF("id", "name", "v")
      .createOrReplaceTempView("msrc")
    spark.sql("""MERGE INTO gtest.db.mt t USING msrc s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    spark.table("gtest.db.mt").orderBy("id")
      .as[(Long, String, Double)].collect() shouldBe Array(
      (1L, "a", 1.0), (2L, "B", 22.0), (9L, "i", 9.0))
    Snapshots.manifestAt(spark, s"$wh/db/mt",
      Snapshots.latestVersion(spark, s"$wh/db/mt")).get.op shouldBe "merge"
    // a WHEN MATCHED THEN DELETE shape routes into the GENERAL
    // mergeInto (r11) — it executes instead of rejecting
    spark.sql("""MERGE INTO gtest.db.mt t USING msrc s ON t.id = s.id
      WHEN MATCHED THEN DELETE""")
    spark.table("gtest.db.mt").select("id").as[Long]
      .collect().sorted shouldBe Array(1L)
    // non-equi merge conditions reject typed too
    intercept[UnsupportedOperationException] {
      spark.sql("""MERGE INTO gtest.db.mt t USING msrc s ON t.id > s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *""")
    }.getMessage should include("equi-condition")
    spark.sql("DROP TABLE gtest.db.mt")
  }

  test("ALTER TABLE ADD COLUMN = append-evolution: new column records " +
      "nullable, old rows read null; other ALTER shapes stay rejected") {
    wh
    spark.sql("CREATE TABLE gtest.db.at (id BIGINT)")
    Seq(1L, 2L).toDF("id").createOrReplaceTempView("asrc")
    spark.sql("INSERT INTO gtest.db.at SELECT * FROM asrc")
    spark.sql("ALTER TABLE gtest.db.at ADD COLUMN lang STRING")
    val t = spark.table("gtest.db.at")
    t.schema.fieldNames shouldBe Array("id", "lang")
    t.schema("lang").nullable shouldBe true
    t.where(col("lang").isNull).count() shouldBe 2L
    // later inserts can carry it
    Seq((3L, "en")).toDF("id", "lang").createOrReplaceTempView("asrc2")
    spark.sql("INSERT INTO gtest.db.at SELECT * FROM asrc2")
    spark.table("gtest.db.at").where(col("lang") === "en")
      .count() shouldBe 1L
    intercept[UnsupportedOperationException] {
      spark.sql("ALTER TABLE gtest.db.at RENAME COLUMN lang TO l2")
    }.getMessage should include("ADD COLUMN")
    spark.sql("DROP TABLE gtest.db.at")
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT (CHECK) routes into the " +
      "engine's constraint commits: existing rows validate, violating " +
      "inserts reject, DESCRIBE sees the constraint") {
    wh
    spark.sql("CREATE TABLE gtest.db.ck (id BIGINT, v DOUBLE)")
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
      .createOrReplaceTempView("cksrc")
    spark.sql("INSERT INTO gtest.db.ck SELECT * FROM cksrc")
    spark.sql(
      "ALTER TABLE gtest.db.ck ADD CONSTRAINT v_pos CHECK (v > 0)")
    // the constraint is recorded in the log and on the V2 face
    graft.ops.Snapshots.tableConstraints(spark, s"$wh/db/ck")
      .keySet shouldBe Set("v_pos")
    // a violating INSERT rejects through the commit protocol
    Seq((3L, -1.0)).toDF("id", "v").createOrReplaceTempView("ckbad")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gtest.db.ck SELECT * FROM ckbad")
    }
    e.getMessage.toLowerCase should include("constraint")
    spark.table("gtest.db.ck").count() shouldBe 2L
    // adding a constraint EXISTING rows violate rejects
    intercept[Exception] {
      spark.sql(
        "ALTER TABLE gtest.db.ck ADD CONSTRAINT v_big CHECK (v > 1.5)")
    }
    // DROP CONSTRAINT re-opens the gate
    spark.sql("ALTER TABLE gtest.db.ck DROP CONSTRAINT v_pos")
    spark.sql("INSERT INTO gtest.db.ck SELECT * FROM ckbad")
    spark.table("gtest.db.ck").count() shouldBe 3L
    spark.sql("DROP TABLE gtest.db.ck")
  }

  test("CREATE TABLE with an inline CHECK constraint RECORDS it (the " +
      "TableInfo overload — the default silently drops constraints); " +
      "names normalize case-insensitively; IF EXISTS no-ops") {
    wh
    spark.sql("CREATE TABLE gtest.db.cki (id BIGINT, v DOUBLE, " +
      "CONSTRAINT V_Pos CHECK (v > 0))")
    // recorded (lowercased) and enforced from the first insert
    graft.ops.Snapshots.tableConstraints(spark, s"$wh/db/cki")
      .keySet shouldBe Set("v_pos")
    Seq((1L, -1.0)).toDF("id", "v").createOrReplaceTempView("ckibad")
    intercept[Exception] {
      spark.sql("INSERT INTO gtest.db.cki SELECT * FROM ckibad")
    }
    spark.table("gtest.db.cki").count() shouldBe 0L
    // DROP with different case resolves the same constraint
    spark.sql("ALTER TABLE gtest.db.cki DROP CONSTRAINT v_POS")
    spark.sql("INSERT INTO gtest.db.cki SELECT * FROM ckibad")
    spark.table("gtest.db.cki").count() shouldBe 1L
    // IF EXISTS on an absent constraint is a no-op, not an error
    spark.sql(
      "ALTER TABLE gtest.db.cki DROP CONSTRAINT IF EXISTS nope")
    // non-CHECK inline constraints reject BEFORE creating the table
    intercept[Exception] {
      spark.sql("CREATE TABLE gtest.db.cki2 (id BIGINT, " +
        "CONSTRAINT pk PRIMARY KEY (id))")
    }
    spark.catalog.tableExists("gtest.db.cki2") shouldBe false
    spark.sql("DROP TABLE gtest.db.cki")
  }

  test("constraints() pins to the LOADED version: a versionAsOf table " +
      "does not surface constraints added later") {
    wh
    spark.sql("CREATE TABLE gtest.db.ckp (id BIGINT, v DOUBLE)")
    Seq((1L, 1.0)).toDF("id", "v").createOrReplaceTempView("ckpsrc")
    spark.sql("INSERT INTO gtest.db.ckp SELECT * FROM ckpsrc")
    spark.sql(
      "ALTER TABLE gtest.db.ckp ADD CONSTRAINT v_pos CHECK (v > 0)")
    val p = s"$wh/db/ckp"
    def consOf(versionAsOf: Option[Long]) = {
      // resolve the table exactly as a read would; its constraints are
      // what DESCRIBE and the write planner see
      val provider = new graft.sources.SnapshotTableProvider
      val opts = new java.util.HashMap[String, String]()
      opts.put("path", p)
      versionAsOf.foreach(v => opts.put("versionAsOf", v.toString))
      provider.getTable(new org.apache.spark.sql.types.StructType,
        Array.empty, opts).constraints().map(_.name()).toSeq
    }
    consOf(Some(2L)) shouldBe Nil          // pre-constraint version
    consOf(None) shouldBe Seq("v_pos")     // latest
    spark.sql("DROP TABLE gtest.db.ckp")
  }

  test("ADD CONSTRAINT with a STALE validatedTableVersion re-validates " +
      "instead of trusting the skip: a data commit landing between " +
      "Spark's validation scan and the constraint commit cannot record " +
      "a constraint live rows violate") {
    wh
    import org.apache.spark.sql.connector.catalog.{Identifier, TableChange}
    import org.apache.spark.sql.connector.catalog.constraints.Constraint
    spark.sql("CREATE TABLE gtest.db.ckstale (id BIGINT, v DOUBLE)")
    Seq((1L, 1.0)).toDF("id", "v").createOrReplaceTempView("cks1")
    spark.sql("INSERT INTO gtest.db.ckstale SELECT * FROM cks1") // v2
    Seq((2L, -5.0)).toDF("id", "v").createOrReplaceTempView("cks2")
    spark.sql("INSERT INTO gtest.db.ckstale SELECT * FROM cks2") // v3
    val cat = spark.sessionState.catalogManager.catalog("gtest")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val ident = Identifier.of(Array("db"), "ckstale")
    def addAt(validatedAt: String) = cat.alterTable(ident,
      TableChange.addConstraint(
        Constraint.check("v_pos").predicateSql("v > 0").build(),
        validatedAt))
    // "validated at v2" is STALE (v3 added a violating row after the
    // scan) — the catalog must re-validate and fail typed, NOT record
    val e = intercept[Exception] { addAt("2") }
    e.getMessage.toLowerCase should include("constraint")
    graft.ops.Snapshots.tableConstraints(spark, s"$wh/db/ckstale")
      .keySet shouldBe Set.empty
    // SnapshotTable.version() reports the pinned manifest version —
    // what Spark stamps into validatedTableVersion after its scan
    val provider = new graft.sources.SnapshotTableProvider
    val opts = new java.util.HashMap[String, String]()
    opts.put("path", s"$wh/db/ckstale")
    provider.getTable(new org.apache.spark.sql.types.StructType,
      Array.empty, opts).version() shouldBe "3"
    // at the CURRENT version the skip is honoured (valid rows first)
    spark.sql("DELETE FROM gtest.db.ckstale WHERE v < 0") // v4
    addAt("4")
    graft.ops.Snapshots.tableConstraints(spark, s"$wh/db/ckstale")
      .keySet shouldBe Set("v_pos")
    spark.sql("DROP TABLE gtest.db.ckstale")
  }

  test("CREATE TABLE with inline constraint names colliding after " +
      "lowercasing rejects typed and leaves NO table behind") {
    wh
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gtest.db.ckdup (id BIGINT, v DOUBLE, " +
        "CONSTRAINT V_Pos CHECK (v > 0), " +
        "CONSTRAINT v_pos CHECK (v > 1))")
    }
    e.getMessage.toLowerCase should include("v_pos")
    spark.catalog.tableExists("gtest.db.ckdup") shouldBe false
  }

  test("DROP NAMESPACE on a non-empty namespace raises the typed " +
      "NonEmptyNamespaceException, which Spark surfaces as its " +
      "SCHEMA_NOT_EMPTY error (the SupportsNamespaces contract)") {
    wh
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gtest.ns1")
    spark.sql("CREATE TABLE gtest.ns1.t1 (id BIGINT)")
    // DropNamespaceExec catches the catalog's typed
    // NonEmptyNamespaceException and rethrows the SQL-standard
    // SCHEMA_NOT_EMPTY AnalysisException — the r10-advice
    // IllegalStateException would have surfaced as an UNTYPED error
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DROP NAMESPACE gtest.ns1")
    }
    e.getCondition should include("SCHEMA_NOT_EMPTY")
    spark.sql("DROP NAMESPACE gtest.ns1 CASCADE")
    spark.catalog.tableExists("gtest.ns1.t1") shouldBe false
  }
}
