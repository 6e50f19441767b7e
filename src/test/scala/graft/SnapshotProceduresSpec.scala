package graft

import graft.ops.Snapshots
import org.apache.spark.sql.functions._

/** SQL stored-procedure surface (`CALL cat.system.proc(...)` on
  * Spark 4's ProcedureCatalog) — the maintenance lifecycle as plain
  * SQL: optimize (+ z-order), optimize_to_size, vacuum, restore,
  * history. */
class SnapshotProceduresSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat(): (String, String) = {
    val slug = System.nanoTime().toString
    val cat = s"gproc_$slug"
    val wh = java.nio.file.Files
      .createTempDirectory("graft_proc_").toString
    new java.io.File(wh).deleteOnExit()
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.SnapshotCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE $cat.db")
    (cat, wh)
  }

  private def seed(cat: String, wh: String): String = {
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v DOUBLE)")
    val df = (1 to 100).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .repartition(8)
    df.createOrReplaceTempView(s"proc_seed_$cat")
    spark.sql(s"INSERT INTO $cat.db.t SELECT * FROM proc_seed_$cat")
    s"$wh/db/t"
  }

  test("CALL system.optimize rewrites into num_files and returns the " +
      "new version; content identical") {
    val (cat, wh) = freshCat()
    val p = seed(cat, wh)
    val before = spark.table(s"$cat.db.t").as[(Long, Double)]
      .collect().toSet
    // CREATE TABLE is v1 (schema-recording commit), INSERT v2 — the
    // optimize commit is v3
    val out = spark.sql(
      s"CALL $cat.system.optimize(`table` => 'db.t', num_files => 2)")
      .collect()
    out.map(_.getLong(0)).toSeq shouldBe Seq(3L)
    Snapshots.snapshotAt(spark, p).get.files.size shouldBe 2
    spark.table(s"$cat.db.t").as[(Long, Double)]
      .collect().toSet shouldBe before
  }

  test("CALL system.optimize with zorder clusters without changing " +
      "content (bounds derived from the table)") {
    val (cat, wh) = freshCat()
    val p = seed(cat, wh)
    val before = spark.table(s"$cat.db.t").as[(Long, Double)]
      .collect().toSet
    spark.sql(s"CALL $cat.system.optimize(`table` => 'db.t', " +
      "num_files => 2, zorder => 'id,v')").collect()
    spark.table(s"$cat.db.t").as[(Long, Double)]
      .collect().toSet shouldBe before
    Snapshots.snapshotAt(spark, p).get.op shouldBe "optimize"
  }

  test("CALL system.history lists the commit log; restore rolls back " +
      "as a NEW commit; vacuum sweeps retired files") {
    val (cat, wh) = freshCat()
    val p = seed(cat, wh)
    spark.sql(s"DELETE FROM $cat.db.t WHERE id <= 50")
    val hist = spark.sql(
      s"CALL $cat.system.history(`table` => 'db.t')").collect()
    hist.map(r => (r.getLong(0), r.getString(1))).toSeq shouldBe
      Seq((1L, "append"), (2L, "append"), (3L, "delete"))
    // restore to v2 (the seeded content): a NEW commit v4
    val rv = spark.sql(
      s"CALL $cat.system.restore(`table` => 'db.t', version => 2)")
      .collect().head.getLong(0)
    rv shouldBe 4L
    spark.table(s"$cat.db.t").count() shouldBe 100L
    // vacuum below v4 with zero grace: the delete-rewrite's files and
    // retired manifests sweep; the restored table still reads
    val removed = spark.sql(s"CALL $cat.system.vacuum(" +
      s"`table` => 'db.t', keep_from_version => 4, grace_ms => 0)")
      .collect().head.getLong(0)
    removed should be >= 1L
    spark.table(s"$cat.db.t").count() shouldBe 100L
  }

  test("CALL system.restore by timestamp_ms resolves the newest commit " +
      "at or before it; version XOR timestamp enforced") {
    val (cat, wh) = freshCat()
    val p = seed(cat, wh) // v1 create, v2 insert
    val ts2 = Snapshots.history(spark, p)
      .where(col("version") === 2L).select("commit_ts").as[Long].head()
    spark.sql(s"DELETE FROM $cat.db.t WHERE id <= 50") // v3
    spark.sql(s"CALL $cat.system.restore(`table` => 'db.t', " +
      s"timestamp_ms => $ts2)").as[Long].head() shouldBe 4L
    spark.table(s"$cat.db.t").count() shouldBe 100L
    intercept[Exception] {
      spark.sql(s"CALL $cat.system.restore(`table` => 'db.t', " +
        s"version => 2, timestamp_ms => $ts2)").collect()
    }.getMessage should include("exactly one")
    intercept[Exception] {
      spark.sql(s"CALL $cat.system.restore(`table` => 'db.t')")
        .collect()
    }.getMessage should include("exactly one")
  }

  test("CALL system.optimize_to_size derives the file count from " +
      "recorded sizes") {
    val (cat, wh) = freshCat()
    val p = seed(cat, wh)
    val total = Snapshots.snapshotAt(spark, p).get.stats.values
      .map(_.bytes).sum
    spark.sql(s"CALL $cat.system.optimize_to_size(`table` => 'db.t', " +
      s"target_file_bytes => ${math.max(1L, total / 2)})").collect()
    val n = Snapshots.snapshotAt(spark, p).get.files.size
    n should (be >= 2 and be <= 4)
  }

  test("CALL system.detail returns the operational summary row") {
    val (cat, wh) = freshCat()
    val p = seed(cat, wh)
    spark.sql(s"ALTER TABLE $cat.db.t ADD CONSTRAINT v_pos CHECK (v > 0)")
    val r = spark.sql(s"CALL $cat.system.detail(`table` => 'db.t')")
      .collect().head
    r.getLong(0) shouldBe 3L             // create, insert, constraint
    r.getLong(3) shouldBe 0L             // no DVs
    r.getLong(4) should be > 0L          // recorded bytes
    r.getLong(5) shouldBe 100L           // recorded rows
    r.getString(6) shouldBe ""           // unpartitioned
    r.getString(7) shouldBe "v_pos"
  }

  test("unknown procedure and namespace fail typed; bad segment " +
      "cannot escape the warehouse") {
    val (cat, _) = freshCat()
    // Spark wraps loadProcedure failures as FAILED_TO_LOAD_ROUTINE
    intercept[Exception] {
      spark.sql(s"CALL $cat.system.nope(`table` => 'db.t')").collect()
    }.getMessage should include("nope")
    intercept[Exception] {
      spark.sql(s"CALL $cat.sys2.optimize(`table` => 'db.t', " +
        "num_files => 1)").collect()
    }
    seed(cat, spark.conf.get(s"spark.sql.catalog.$cat.warehouse"))
    intercept[Exception] {
      spark.sql(s"CALL $cat.system.history(`table` => '../../etc')")
        .collect()
    }
  }

  test("optimizeWhere rewrites ONLY stats-matching files (content " +
      "preserved, others carry unmoved); CALL optimize(where => ...) " +
      "routes to it") {
    val (cat, wh) = freshCat()
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v DOUBLE)")
    val p = s"$wh/db/t"
    // 4 range-clustered files over id 1..400 (direct append — the
    // catalog INSERT path may emit extra empty-partition files)
    Snapshots.append(
      (1 to 400).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
        .repartitionByRange(4, col("id")), p)
    val m0 = Snapshots.snapshotAt(spark, p).get
    m0.files.size should be >= 4 // AQE may rebalance the range write
    // the files whose recorded id range sits ENTIRELY below the
    // predicate — the law: these exact files must carry over unmoved
    val below = m0.files.filter(f => m0.stats(f).cols.get("id")
      .exists(_.max.exists(_.toDouble < 150.0))).toSet
    below should not be empty
    val before = spark.table(s"$cat.db.t").as[(Long, Double)]
      .collect().toSet
    // scope the rewrite to the top of the key range via SQL CALL
    spark.sql(s"CALL $cat.system.optimize(`table` => 'db.t', " +
      "num_files => 1, `where` => 'id >= 150')").collect()
    val m1 = Snapshots.snapshotAt(spark, p).get
    m1.op shouldBe "compact"
    // every provably-below file carried unmoved; the in-bound files
    // rewrote (the manifest shrank)
    below.subsetOf(m1.files.toSet) shouldBe true
    m1.files.size should be < m0.files.size
    spark.table(s"$cat.db.t").as[(Long, Double)]
      .collect().toSet shouldBe before
    // incremental consumers skip the compact commit (a maintenance-
    // only range is typed-empty, like optimize)
    intercept[IllegalArgumentException] {
      Snapshots.changes(spark, p, m0.version, m1.version)
    }.getMessage should include("no data-changing")
    // fewer than two candidate files -> version unchanged
    Snapshots.optimizeWhere(spark, p, col("id") < 0L, 1) shouldBe
      m1.version
    // an unanalyzable predicate would silently select EVERY file — the
    // full rewrite the caller tried to scope; it must fail typed
    val e = intercept[IllegalArgumentException] {
      Snapshots.optimizeWhere(spark, p, col("id") % 2 === 0L, 1)
    }
    e.getMessage should include("stats-analyzable")
  }

  test("CALL system.vacuum_dry_run lists what vacuum WOULD remove and " +
      "deletes NOTHING; the real vacuum then removes exactly the " +
      "listed parquet files") {
    val (cat, wh) = freshCat()
    val p = seed(cat, wh)
    // v3: a CoW delete retires v2's files; v4: optimize retires v3's
    spark.sql(s"DELETE FROM $cat.db.t WHERE id <= 10")
    spark.sql(s"CALL $cat.system.optimize(`table` => 'db.t', " +
      "num_files => 1)").collect()
    val before = spark.table(s"$cat.db.t").as[(Long, Double)]
      .collect().toSet
    val listed = spark.sql(s"CALL $cat.system.vacuum_dry_run(" +
      "`table` => 'db.t', keep_from_version => 4, grace_ms => 0)")
      .as[String].collect().toSeq
    val listedParquet = listed.filter(_.endsWith(".parquet"))
    listedParquet should not be empty
    listed.exists(_.startsWith("_graft_log/")) shouldBe true // manifests
    // NOTHING was deleted: full history still resolves
    Snapshots.read(spark, p, Some(2L)).count() shouldBe 100L
    spark.table(s"$cat.db.t").as[(Long, Double)]
      .collect().toSet shouldBe before
    listedParquet.foreach { f =>
      new java.io.File(s"$p/$f").exists() shouldBe true }
    // the real vacuum removes exactly the dry run's parquet count
    val removed = spark.sql(s"CALL $cat.system.vacuum(" +
      "`table` => 'db.t', keep_from_version => 4, grace_ms => 0)")
      .as[Long].head()
    removed shouldBe listedParquet.size.toLong
    listedParquet.foreach { f =>
      new java.io.File(s"$p/$f").exists() shouldBe false }
    spark.table(s"$cat.db.t").as[(Long, Double)]
      .collect().toSet shouldBe before
  }

  test("CALL system.expire_changes retires sidecars below the bound: " +
      "feeds below fail typed, feeds above still serve, reads and " +
      "time travel untouched, re-expiry is a no-op") {
    val (cat, wh) = freshCat()
    val p = seed(cat, wh) // v1 create, v2 insert
    spark.sql(s"UPDATE $cat.db.t SET v = v + 1 WHERE id <= 5")  // v3
    spark.sql(s"UPDATE $cat.db.t SET v = v + 10 WHERE id > 95") // v4
    // pre-expiry: both update commits feed row-exactly
    Snapshots.changeFeed(spark, p, 2L, 4L)
      .where(col("_change_type") === "update_postimage")
      .count() shouldBe 10L
    val removed = spark.sql(s"CALL $cat.system.expire_changes(" +
      "`table` => 'db.t', keep_from_version => 4)").as[Long].head()
    removed should be >= 1L
    // below the horizon: the typed expiry error, batch AND V2 face
    val e1 = intercept[IllegalArgumentException] {
      Snapshots.changeFeed(spark, p, 2L, 4L)
    }
    e1.getMessage should include("expire")
    val e2 = intercept[Exception] {
      spark.read.format("graft-snapshot")
        .option("readChangeFeed", "true")
        .option("startingVersion", "3").load(p).collect()
    }
    e2.getMessage should include("expire")
    // at/above the horizon the feed still serves (v4's sidecar intact)
    Snapshots.changeFeed(spark, p, 3L, 4L)
      .where(col("_change_type") === "update_postimage")
      .count() shouldBe 5L
    // the no-options V2 feed clamps its default start to the horizon
    spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true").load(p)
      .select("_commit_version").distinct()
      .as[Long].collect().toSeq shouldBe Seq(4L)
    // reads and time travel are UNTOUCHED by change-data expiry
    spark.table(s"$cat.db.t").count() shouldBe 100L
    Snapshots.read(spark, p, Some(3L)).count() shouldBe 100L
    // monotonic + idempotent: an older bound is a no-op
    spark.sql(s"CALL $cat.system.expire_changes(" +
      "`table` => 'db.t', keep_from_version => 3)")
      .as[Long].head() shouldBe 0L
    // crash-orphan reclaim: simulate a run that died after publishing
    // its horizon but before finishing its deletes by resurrecting an
    // already-expired sidecar file — the next ADVANCE re-sweeps the
    // whole below-horizon range and reclaims it
    val m3 = Snapshots.manifestAt(spark, p, 3L).get
    m3.cdc should not be empty
    val orphan = new java.io.File(s"$p/${m3.cdc.head}")
    orphan.getParentFile.mkdirs()
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    // (the advance to 5 also legitimately expires v4's sidecar)
    spark.sql(s"CALL $cat.system.expire_changes(" +
      "`table` => 'db.t', keep_from_version => 5)")
      .as[Long].head() should be >= 2L
    orphan.exists() shouldBe false
    // horizon publish discipline (r13): the O(1) fast file plus the
    // value-suffixed crash anchor — exactly those two survive an
    // advance; when the fast file is missing (a writer died inside
    // its republish window) the marker fallback still serves the
    // advanced value, and a stale smaller marker never wins the max
    val logDir = new java.io.File(s"$p/_graft_log")
    val names = logDir.listFiles().map(_.getName)
    names.count(_.startsWith("_cdc_horizon")) shouldBe 2
    names should contain("_cdc_horizon.5")
    names should contain("_cdc_horizon")
    Snapshots.cdcHorizon(spark, p) shouldBe 5L
    new java.io.File(logDir, "_cdc_horizon").delete() shouldBe true
    Snapshots.cdcHorizon(spark, p) shouldBe 5L // anchor fallback
    java.nio.file.Files.write(
      new java.io.File(logDir, "_cdc_horizon.2").toPath, "2".getBytes)
    Snapshots.cdcHorizon(spark, p) shouldBe 5L
  }

  test("CALL system.compact_small_files bin-packs only the stragglers") {
    val (cat, wh) = freshCat()
    spark.sql(s"CREATE TABLE $cat.db.t (id BIGINT, v DOUBLE)")
    val p = s"$wh/db/t"
    // one big file + 8 straggler files (the post-streaming shape)
    Snapshots.append(
      (1 to 5000).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
        .repartition(1), p)
    Snapshots.append(
      (5001 to 5080).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
        .repartition(8), p)
    val m0 = Snapshots.snapshotAt(spark, p).get
    val big = m0.files.maxBy(f => m0.stats(f).bytes)
    val smallBytes = m0.stats(big).bytes // everything below the big file
    spark.sql(s"CALL $cat.system.compact_small_files(" +
      s"`table` => 'db.t', small_bytes => $smallBytes)").collect()
    val m1 = Snapshots.snapshotAt(spark, p).get
    m1.op shouldBe "compact"
    m1.files should contain(big)          // the big file never moved
    m1.files.size should be < m0.files.size
    spark.table(s"$cat.db.t").count() shouldBe 5080L
  }

  test("SHOW PROCEDURES lists the system namespace") {
    val (cat, _) = freshCat()
    val names = spark.sql(s"SHOW PROCEDURES IN $cat.system")
      .collect().map(_.toSeq.mkString(" ")).mkString("\n")
    names should include("optimize")
    names should include("vacuum")
    names should include("history")
  }
}
