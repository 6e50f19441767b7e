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
}
