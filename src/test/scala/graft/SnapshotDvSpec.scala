package graft

import graft.ops.Snapshots
import org.apache.spark.sql.functions._

/** Merge-on-read deletion vectors, RESTORE, and timestamp time travel
  * over the snapshot store. */
class SnapshotDvSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_dv_").toString
    new java.io.File(d).deleteOnExit(); d
  }

  private def tbl(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(i => (i.toLong, s"t${i % 5}", i * 2.0)).toDF("id", "typ", "v")

  private def dataParquetCount(p: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    val d = new java.io.File(s"$p/data")
    if (d.exists()) walk(d) else 0
  }

  test("deleteMor removes rows WITHOUT rewriting any data file; the " +
      "vector and its exact cardinality land in the log; time travel " +
      "to the pre-delete version is untouched") {
    val p = freshDir()
    Snapshots.append(tbl(0 until 100).repartitionByRange(4, col("id")), p)
    val before = dataParquetCount(p)
    val m1 = Snapshots.snapshotAt(spark, p).get
    Snapshots.deleteMor(spark, p, col("id") < 30L && col("typ") === "t1")
    val m2 = Snapshots.snapshotAt(spark, p).get
    // ids 1,6,11,16,21,26 → 6 deleted rows
    Snapshots.read(spark, p).count() shouldBe 94L
    Snapshots.read(spark, p, Some(1L)).count() shouldBe 100L
    dataParquetCount(p) shouldBe before // merge-on-read: zero rewrites
    m2.files.toSet shouldBe m1.files.toSet
    m2.dvs.values.map(_.n).sum shouldBe 6L
    Snapshots.read(spark, p).where(col("typ") === "t1")
      .select("id").as[Long].collect().sorted shouldBe
      (31L until 100L by 5L).toSeq
  }

  test("plan pin: the vector anti-join extracts its equi keys — a hash " +
      "join (broadcast here), never a nested loop from the path-suffix " +
      "residual") {
    val p = freshDir()
    Snapshots.append(tbl(0 until 200).repartitionByRange(4, col("id")), p)
    Snapshots.deleteMor(spark, p, col("id") < 40L)
    val plan = Snapshots.read(spark, p)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    (plan should include).regex("(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)")
  }

  test("law: deleteMor ≡ copy-on-write delete for the same predicate") {
    val pMor = freshDir(); val pCow = freshDir()
    val pred = col("id") % 7 === 0 || col("v") > 150.0
    Seq(pMor, pCow).foreach(p =>
      Snapshots.append(tbl(0 until 120)
        .repartitionByRange(4, col("id")), p))
    Snapshots.deleteMor(spark, pMor, pred)
    Snapshots.delete(spark, pCow, pred)
    val a = Snapshots.read(spark, pMor).orderBy("id").collect()
    val b = Snapshots.read(spark, pCow).orderBy("id").collect()
    a should contain theSameElementsInOrderAs b
  }

  test("vectors ACCUMULATE: a second deleteMor supersedes touched " +
      "files' vectors with the union, scanWhere applies them, and a " +
      "replayed predicate is a no-op commit") {
    val p = freshDir()
    Snapshots.append(tbl(0 until 200).repartitionByRange(4, col("id")), p)
    Snapshots.deleteMor(spark, p, col("id") < 40L && col("typ") === "t1")
    val v = Snapshots.deleteMor(spark, p, col("id") < 25L)
    // ids<25 (25 rows) ∪ t1-ids<40 (1,6,...,36 → 8 rows); overlap 5 → 28
    Snapshots.read(spark, p).count() shouldBe 172L
    Snapshots.scanWhere(spark, p, col("id") < 50L).count() shouldBe
      (25L until 50L).count(i => !(i < 40 && i % 5 == 1)) // 25 - 3 = 22
    // replay: every matching row is already deleted → no new commit
    Snapshots.deleteMor(spark, p, col("id") < 25L) shouldBe v
    Snapshots.read(spark, p).count() shouldBe 172L
  }

  test("copy-on-write on a vectored table: deleted rows never " +
      "resurrect, and a rewritten file RETIRES its vector") {
    val p = freshDir()
    Snapshots.append(tbl(0 until 100).repartitionByRange(4, col("id")), p)
    Snapshots.deleteMor(spark, p, col("id") < 10L)
    // CoW update overlapping the vectored band: rows 0..9 must stay gone
    Snapshots.update(spark, p, col("id") < 30L,
      Map("v" -> (col("v") + 1000.0)))
    val rows = Snapshots.read(spark, p)
    rows.count() shouldBe 90L
    rows.where(col("id") < 10L).count() shouldBe 0L
    rows.where(col("id") < 30L).select(min("v")).head().getDouble(0) should
      be >= 1000.0
    // the touched files rewrote → their vectors retired from the log
    val m = Snapshots.snapshotAt(spark, p).get
    m.dvs shouldBe empty
    // merge on a vectored table: deleted keys come back only as INSERTS
    val p2 = freshDir()
    Snapshots.append(tbl(0 until 50).repartitionByRange(2, col("id")), p2)
    Snapshots.deleteMor(spark, p2, col("id") === 7L)
    Snapshots.merge(spark, p2,
      Seq((7L, "t9", -1.0)).toDF("id", "typ", "v"), Seq("id"))
    val r7 = Snapshots.read(spark, p2).where(col("id") === 7L).collect()
    r7.length shouldBe 1
    r7.head.getString(1) shouldBe "t9"
  }

  test("OPTIMIZE materializes the vectors: same rows, dvs gone, " +
      "vacuum then reclaims the superseded vector dataset") {
    val p = freshDir()
    Snapshots.append(tbl(0 until 100).repartitionByRange(4, col("id")), p)
    Snapshots.deleteMor(spark, p, col("id") % 3 === 0L)
    val live = Snapshots.read(spark, p).orderBy("id").collect()
    Snapshots.optimize(spark, p, numFiles = 2)
    val m = Snapshots.snapshotAt(spark, p).get
    m.dvs shouldBe empty
    Snapshots.read(spark, p).orderBy("id").collect() should
      contain theSameElementsInOrderAs live
    def dvDirs(): Int = {
      val d = new java.io.File(s"$p/dv")
      if (d.exists()) d.listFiles().count(_.isDirectory) else 0
    }
    dvDirs() shouldBe 1
    Snapshots.vacuum(spark, p, keepFromVersion = 3L, graceMs = 0L)
    dvDirs() shouldBe 0 // unreferenced after the horizon passed v2
    Snapshots.read(spark, p).count() shouldBe live.length.toLong
  }

  test("vacuum KEEPS vector datasets any retained version references") {
    val p = freshDir()
    Snapshots.append(tbl(0 until 60), p)
    Snapshots.deleteMor(spark, p, col("id") < 20L)
    Snapshots.append(tbl(100 until 110), p)
    Snapshots.vacuum(spark, p, keepFromVersion = 2L, graceMs = 0L)
    // v2 and v3 both reference the vector — reads stay exact
    Snapshots.read(spark, p, Some(2L)).count() shouldBe 40L
    Snapshots.read(spark, p).count() shouldBe 50L
    new java.io.File(s"$p/dv").listFiles().count(_.isDirectory) shouldBe 1
  }

  test("deleteMor on a PARTITIONED table: partition-dir file paths " +
      "attribute exactly, partition pruning composes") {
    val p = freshDir()
    Snapshots.append(tbl(0 until 100), p, partitionBy = Seq("typ"))
    Snapshots.deleteMor(spark, p, col("typ") === "t2" && col("id") < 50L)
    Snapshots.read(spark, p).count() shouldBe 90L
    Snapshots.scanWhere(spark, p, col("typ") === "t2")
      .select("id").as[Long].collect().sorted shouldBe
      (52L until 100L by 5L).toSeq
  }

  test("deletion vectors on partition values that need path escaping " +
      "and URI encoding (space, '%', '='): delete, read, scan, and the " +
      "delete feed stay exact — no silent resurrection through a " +
      "failed path match") {
    val p = freshDir()
    val vals = Seq("a b", "x%7y", "k=v")
    val df = (0 until 60).map(i => (i.toLong, vals(i % 3), i * 2.0))
      .toDF("id", "typ", "v")
    Snapshots.append(df, p, partitionBy = Seq("typ"))
    Snapshots.deleteMor(spark, p, col("id") < 12L)
    val m = Snapshots.snapshotAt(spark, p).get
    m.dvs.values.map(_.n).sum shouldBe 12L // positions actually landed
    Snapshots.read(spark, p).count() shouldBe 48L
    Snapshots.read(spark, p).where(col("id") < 12L).count() shouldBe 0L
    Snapshots.scanWhere(spark, p, col("typ") === "a b")
      .select("id").as[Long].collect().sorted shouldBe
      (12L until 60L by 3L)
    Snapshots.deletedRows(spark, p, 2L)
      .select("id").as[Long].collect().sorted shouldBe (0L until 12L)
    // V2 face: same vectors through the per-partition position loader
    spark.read.format("graft-snapshot").load(p).count() shouldBe 48L
    spark.read.format("graft-snapshot").load(p)
      .where(col("id") < 12L).count() shouldBe 0L
  }

  test("pruning survives LOSSY literals: keys past 2^53 and " +
      "high-precision decimal predicates never prune a file that " +
      "contains matching rows (literal-side interval widening)") {
    val p = freshDir()
    val big = (1L << 53) + 1L // not double-representable
    Seq((big, "x", 1.0), (big + 2L, "y", 2.0))
      .toDF("id", "typ", "v").write.format("graft-snapshot")
      .mode("append").save(p)
    Snapshots.scanWhere(spark, p, col("id") === big).count() shouldBe 1L
    Snapshots.scanWhere(spark, p, col("id") > big - 1L).count() shouldBe 2L
    Snapshots.scanWhere(spark, p, col("id") < big + 1L).count() shouldBe 1L
    Snapshots.scanWhere(spark, p,
      col("id").isin(big, big + 2L)).count() shouldBe 2L
    // decimal columns + high-precision decimal literals: pruning must
    // agree with the unpruned filter (the conservative-superset law —
    // a literal rounding toward a stored bound must not flip a strict
    // comparison and lose a file)
    val pd = freshDir()
    Seq((1L, "1.00000000000000000001"), (2L, "2.5"))
      .toDF("id", "ds")
      .select(col("id"), col("ds").cast("decimal(38,20)").as("d"))
      .write.format("graft-snapshot").mode("append").save(pd)
    val cut = expr("CAST(1.00000000000000000001 AS DECIMAL(38,20))")
    Seq(col("d") > cut, col("d") >= cut, col("d") < cut, col("d") <= cut,
      col("d") === cut).foreach { pred =>
      Snapshots.scanWhere(spark, pd, pred).count() shouldBe
        Snapshots.read(spark, pd).where(pred).count()
    }
  }

  test("deleting EVERY row of a file merge-on-read keeps the listing " +
      "but reads exclude it all; metadata counts stay exact") {
    val p = freshDir()
    Snapshots.append(tbl(0 until 40).repartitionByRange(4, col("id")), p)
    Snapshots.deleteMor(spark, p, col("id") < 10L)
    val m = Snapshots.snapshotAt(spark, p).get
    m.files.size shouldBe 4
    val total = m.files.flatMap(m.stats.get).map(_.rows).sum -
      m.dvs.values.map(_.n).sum
    total shouldBe 30L
    Snapshots.read(spark, p).count() shouldBe 30L
  }

  test("RESTORE is metadata-only: content equals the target version, " +
      "no data files move, history stays readable, and txn high-water " +
      "marks carry forward so a replayed batch stays a no-op") {
    val p = freshDir()
    Snapshots.appendIdempotent(tbl(0 until 30), p, "job", 0L)
    Snapshots.append(tbl(100 until 120), p)
    Snapshots.deleteMor(spark, p, col("id") >= 110L)
    val filesBefore = dataParquetCount(p)
    val vr = Snapshots.restore(spark, p, 1L)
    vr shouldBe 4L
    dataParquetCount(p) shouldBe filesBefore
    Snapshots.read(spark, p).select("id").as[Long].collect().sorted shouldBe
      (0L until 30L)
    // rolled-away versions stay time-travel-readable (v3 had the vector)
    Snapshots.read(spark, p, Some(3L)).count() shouldBe 40L
    // the replayed exactly-once batch must NOT re-append after restore
    Snapshots.appendIdempotent(tbl(0 until 30), p, "job", 0L) shouldBe 4L
    Snapshots.read(spark, p).count() shouldBe 30L
  }

  test("RESTORE re-references deletion vectors and survives a " +
      "checkpoint-interval fold; restore to the current version no-ops") {
    val p = freshDir()
    Snapshots.append(tbl(0 until 50), p)
    Snapshots.deleteMor(spark, p, col("id") < 5L)
    Snapshots.overwrite(tbl(500 until 510), p)
    Snapshots.restore(spark, p, 2L) shouldBe 4L
    Snapshots.read(spark, p).count() shouldBe 45L
    Snapshots.restore(spark, p, 4L) shouldBe 4L // already there
    // later appends fold on top of the restored (self-checkpointing) base
    Snapshots.append(tbl(900 until 905), p)
    Snapshots.read(spark, p).count() shouldBe 50L
  }

  test("restore fails typed when the target was vacuumed") {
    val p = freshDir()
    Snapshots.append(tbl(0 until 20), p)
    Snapshots.overwrite(tbl(100 until 105), p)
    Snapshots.vacuum(spark, p, keepFromVersion = 2L, graceMs = 0L)
    val e = intercept[IllegalArgumentException] {
      Snapshots.restore(spark, p, 1L)
    }
    e.getMessage should include("vacuum")
  }

  test("deletedRows: the row-level delete feed emits exactly what each " +
      "delete-dv commit removed — and only the NEW deletions on an " +
      "accumulating vector") {
    val p = freshDir()
    Snapshots.append(tbl(0 until 100).repartitionByRange(4, col("id")), p)
    Snapshots.deleteMor(spark, p, col("id") < 20L) // v2
    Snapshots.deleteMor(spark, p, col("id") < 30L) // v3: 10 new
    Snapshots.deletedRows(spark, p, 2L)
      .select("id").as[Long].collect().sorted shouldBe (0L until 20L)
    Snapshots.deletedRows(spark, p, 3L)
      .select("id").as[Long].collect().sorted shouldBe (20L until 30L)
    // the feed composes with changes(): adds feed + delete feed = full
    // row-level CDC for an append+MOR-delete workload
    val e = intercept[IllegalArgumentException] {
      Snapshots.deletedRows(spark, p, 1L)
    }
    e.getMessage should include("delete-dv")
  }

  test("compactSmallFiles: only sub-threshold files bin-pack (batch-" +
      "proportional maintenance), big files carry over unmoved, " +
      "content identical, incremental consumers skip the commit, and " +
      "covered deletion vectors materialize") {
    val p = freshDir()
    // one big commit + five tiny straggler commits (the streaming shape)
    Snapshots.append(tbl(0 until 2000).repartition(1), p)
    (0 until 5).foreach(i =>
      Snapshots.append(tbl(3000 + i * 3 until 3000 + i * 3 + 3)
        .repartition(1), p))
    val m0 = Snapshots.snapshotAt(spark, p).get
    m0.files.size shouldBe 6
    val big = m0.files.maxBy(f => m0.stats(f).bytes)
    Snapshots.deleteMor(spark, p, col("id") === 3001L) // vector a straggler
    val before = Snapshots.read(spark, p).orderBy("id").collect()
    val smallCut = m0.stats(big).bytes // everything strictly below the big file
    val v = Snapshots.compactSmallFiles(spark, p, smallBytes = smallCut)
    val m1 = Snapshots.snapshotAt(spark, p).get
    m1.version shouldBe v
    m1.files should contain(big) // untouched, not rewritten
    m1.files.size should be < 6
    m1.dvs shouldBe empty // the vectored straggler materialized
    Snapshots.read(spark, p).orderBy("id").collect() should
      contain theSameElementsInOrderAs before
    // changes() skips maintenance: only the real commits' rows surface
    Snapshots.changes(spark, p, 1L, v).select("id")
      .as[Long].collect().sorted shouldBe (3000L until 3015L)
    // nothing left to compact → version unchanged, no empty commit
    Snapshots.compactSmallFiles(spark, p, smallBytes = 10L) shouldBe v
  }

  test("streaming source skips compact commits (same rows, new layout " +
      "must not re-emit)") {
    val p = freshDir()
    (0 until 4).foreach(i =>
      Snapshots.append(tbl(i * 5 until i * 5 + 5).repartition(1), p))
    val sink = "snap_compact_stream"
    val q = spark.readStream.format("graft-snapshot").load(p)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table(sink).count() shouldBe 20L
      Snapshots.compactSmallFiles(spark, p, smallBytes = 1L << 30)
      Snapshots.append(tbl(100 until 103).repartition(1), p)
      q.processAllAvailable()
      // the compact's rewritten 20 rows must NOT re-emit
      spark.table(sink).count() shouldBe 23L
    } finally q.stop()
  }

  test("a dangling deletion-vector reference fails LOUDLY everywhere: " +
      "restore refuses to commit it, and the V2 reader raises instead " +
      "of silently resurrecting deleted rows") {
    val p = freshDir()
    Snapshots.append(tbl(0 until 50).repartition(1), p)
    Snapshots.deleteMor(spark, p, col("id") < 10L) // v2, vector d-A
    Snapshots.deleteMor(spark, p, col("id") < 20L) // v3 supersedes d-A
    // simulate the vacuum race / partial copy: v2's now-unreferenced
    // vector dataset disappears while its manifest survives
    val m2 = Snapshots.snapshotAt(spark, p, Some(2L)).get
    val d = new java.io.File(s"$p/${m2.dvs.values.head.path}")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); () }
    rm(d)
    val e = intercept[IllegalArgumentException] {
      Snapshots.restore(spark, p, 2L)
    }
    e.getMessage should include("deletion-vector")
    // the live version (v3, its own vector intact) still reads fine
    Snapshots.read(spark, p).count() shouldBe 30L
    // V2 face pinned to the corrupted version: metadata COUNT(*) still
    // answers from the log (exact, zero file reads — by design), but a
    // real row read is a typed failure, never silent resurrection
    spark.read.format("graft-snapshot").option("versionAsOf", "2")
      .load(p).count() shouldBe 40L
    val thrown = intercept[Exception] {
      spark.read.format("graft-snapshot").option("versionAsOf", "2")
        .load(p).select("id").collect()
    }
    thrown.toString + Option(thrown.getCause).mkString should
      include regex "(?i)(deletion-vector|path does not exist|missing)"
  }

  test("history(): one row per commit, oldest first, with op, adds/" +
      "removes, IN-FORCE vector coverage, and the constraint names " +
      "in force") {
    val p = freshDir()
    Snapshots.append(tbl(0 until 40).repartition(2), p)
    Snapshots.deleteMor(spark, p, col("id") < 5L)
    Snapshots.addConstraint(spark, p, "pos_v", "v >= 0")
    Snapshots.optimize(spark, p, numFiles = 1)
    val h = Snapshots.history(spark, p)
      .orderBy("version")
      .select("version", "op", "n_added", "n_dv_files", "constraints")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    // n_dv_files is the vectors IN FORCE at each version (a metadata
    // commit between the delete and the optimize still shows 2), so a
    // vacuum/restore planner reads live state, not deltas
    h shouldBe Array(
      (1L, "append", 2L, 0L, ""),
      (2L, "delete-dv", 0L, 2L, ""),
      (3L, "metadata", 0L, 2L, "pos_v"),
      (4L, "optimize", 1L, 0L, "pos_v"))
    // timestamps ride along, monotonic
    val ts = Snapshots.history(spark, p).orderBy("version")
      .select("commit_ts").as[Long].collect()
    ts shouldBe ts.sorted
  }

  test("replaceWhere: exactly the predicate region replaces in ONE " +
      "commit — untouched files carry over, a batch leaking outside " +
      "the region is rejected typed, and prior vector deletes outside " +
      "the region survive") {
    val p = freshDir()
    Snapshots.append(tbl(0 until 100).repartitionByRange(4, col("id")), p)
    Snapshots.deleteMor(spark, p, col("id") === 30L) // outside the region
    val m1 = Snapshots.snapshotAt(spark, p).get
    val repl = tbl(0 until 25).where(col("id") % 2 === 0)
      .withColumn("v", col("v") + 1000.0)
    Snapshots.replaceWhere(spark, p, col("id") < 25L, repl)
    val rows = Snapshots.read(spark, p)
    // 100 - 25 (region out) - 1 (vector delete) + 13 (replacement)
    rows.count() shouldBe 87L
    rows.where(col("id") < 25L).count() shouldBe 13L
    rows.where(col("id") < 25L).select(min("v")).head()
      .getDouble(0) should be >= 1000.0
    rows.where(col("id") === 30L).count() shouldBe 0L
    // files whose range the region never touched carry over unmoved
    val m2 = Snapshots.snapshotAt(spark, p).get
    m1.files.toSet.intersect(m2.files.toSet) should not be empty
    // the contract: a replacement row OUTSIDE the region fails typed
    val vBefore = m2.version
    val e = intercept[IllegalArgumentException] {
      Snapshots.replaceWhere(spark, p, col("id") < 25L, tbl(50 until 52))
    }
    e.getMessage should include("replaced region")
    // a FRESH read (not the pre-rejection pin): nothing committed
    Snapshots.snapshotAt(spark, p).get.version shouldBe vBefore
    Snapshots.read(spark, p).count() shouldBe 87L
  }

  test("replaceWhere PARTITION-ALIGNED fast path: files whose recorded " +
      "partition values prove every row matches drop METADATA-ONLY, " +
      "and CHECK constraints gate the replacement batch") {
    val p = freshDir()
    Snapshots.append(tbl(0 until 100), p, partitionBy = Seq("typ"))
    Snapshots.addConstraint(spark, p, "pos_v", "v >= 0")
    val m1 = Snapshots.snapshotAt(spark, p).get
    val t2Files = m1.files.filter(f =>
      m1.stats(f).parts.get("typ").contains("t2"))
    t2Files should not be empty
    // whole-partition backfill: predicate is one exact pin, so the t2
    // files retire without being read — removed exactly, other
    // partitions' files carried by identity
    val repl = tbl(200 until 210).withColumn("typ", lit("t2"))
    Snapshots.replaceWhere(spark, p, col("typ") === "t2", repl)
    val m2 = Snapshots.snapshotAt(spark, p).get
    t2Files.foreach(f => m2.files should not contain f)
    (m1.files.toSet -- t2Files).subsetOf(m2.files.toSet) shouldBe true
    val rows = Snapshots.read(spark, p)
    rows.count() shouldBe (80L + 10L)
    rows.where(col("typ") === "t2").select("id")
      .as[Long].collect().sorted shouldBe (200L until 210L)
    // constraints validate the replacement batch like any data commit
    intercept[Snapshots.ConstraintViolation] {
      Snapshots.replaceWhere(spark, p, col("typ") === "t2",
        Seq((999L, "t2", -1.0)).toDF("id", "typ", "v"))
    }
    Snapshots.read(spark, p).count() shouldBe 90L
  }

  test("CHECK constraints: a violating batch is rejected atomically " +
      "before publish (table unchanged), valid batches pass, SQL null " +
      "semantics hold, and drop re-admits") {
    val p = freshDir()
    Snapshots.append(tbl(1 until 50), p)
    val vc = Snapshots.addConstraint(spark, p, "pos_v", "v > 0")
    vc shouldBe 2L
    // valid append passes and inherits the constraint
    Snapshots.append(tbl(50 until 60), p) shouldBe 3L
    // violating append: typed rejection, version AND content unchanged
    val e = intercept[Snapshots.ConstraintViolation] {
      Snapshots.append(Seq((999L, "t0", -5.0)).toDF("id", "typ", "v"), p)
    }
    e.getMessage should include("pos_v")
    Snapshots.snapshotAt(spark, p).get.version shouldBe 3L
    Snapshots.read(spark, p).count() shouldBe 59L
    // violating UPDATE rejected too (SET can break a constraint)
    intercept[Snapshots.ConstraintViolation] {
      Snapshots.update(spark, p, col("id") === 5L,
        Map("v" -> lit(-1.0)))
    }
    Snapshots.read(spark, p).where(col("id") === 5L)
      .head().getDouble(2) shouldBe 10.0
    // SQL CHECK null semantics: NULL result passes
    Snapshots.append(Seq((998L, "t0", null.asInstanceOf[java.lang.Double]))
      .toDF("id", "typ", "v").select(col("id"), col("typ"),
        col("v").cast("double")), p)
    // ...so null rejection is the explicit IS NOT NULL constraint
    intercept[Snapshots.ConstraintViolation] {
      Snapshots.addConstraint(spark, p, "v_not_null", "v IS NOT NULL")
    }
    // adding a constraint the CURRENT data breaks fails typed (above);
    // drop re-admits the negative batch
    Snapshots.dropConstraint(spark, p, "pos_v")
    Snapshots.append(Seq((999L, "t0", -5.0)).toDF("id", "typ", "v"), p)
    Snapshots.read(spark, p).where(col("v") < 0).count() shouldBe 1L
    // constraints restore with the version they were part of
    val vHad = vc + 1 // v3: pos_v active
    Snapshots.restore(spark, p, vHad)
    intercept[Snapshots.ConstraintViolation] {
      Snapshots.append(Seq((997L, "t0", -2.0)).toDF("id", "typ", "v"), p)
    }
  }

  test("a constrained column an evolution append OMITS reads as null " +
      "— SQL CHECK passes (no unresolved-column crash), and a " +
      "constraint no batch schema can resolve fails typed") {
    val p = freshDir()
    Snapshots.append(tbl(1 until 10), p)
    Snapshots.addConstraint(spark, p, "pos_v", "v > 0")
    // the batch omits 'v' entirely: the merged table schema supplies
    // it as null, which CHECK semantics pass
    Snapshots.append(Seq((100L, "t9")).toDF("id", "typ"), p)
    Snapshots.read(spark, p).count() shouldBe 10L
    // an overwrite DROPPING the constrained column cannot evaluate the
    // constraint at all — typed error naming it, not an analysis crash
    val e = intercept[IllegalArgumentException] {
      Snapshots.overwrite(Seq((1L, "t0")).toDF("id", "typ"), p)
    }
    e.getMessage should include("pos_v")
  }

  test("materializeDeletes: only files at/above the coverage fraction " +
      "rewrite, vectors retire, rows bit-identical, feeds skip it") {
    val p = freshDir()
    // file A: ids 0..9 (will lose 6/10 = 60%), file B: 10..29 (2/20 = 10%)
    Snapshots.append(tbl(0 until 10).repartition(1), p)
    Snapshots.append(tbl(10 until 30).repartition(1), p)
    Snapshots.deleteMor(spark, p, col("id") < 6L || col("id") === 10L ||
      col("id") === 11L)
    val before = Snapshots.read(spark, p).select("id")
      .as[Long].collect().sorted
    val m1 = Snapshots.snapshotAt(spark, p).get
    m1.dvs.size shouldBe 2
    // threshold 0.5: only file A (60% covered) materializes
    Snapshots.materializeDeletes(spark, p, 0.5)
    val m2 = Snapshots.snapshotAt(spark, p).get
    m2.op shouldBe "compact"
    m2.dvs.size shouldBe 1 // B's vector survives, A's retired
    Snapshots.read(spark, p).select("id")
      .as[Long].collect().sorted shouldBe before
    // incremental consumers skip the materialization commit
    intercept[IllegalArgumentException] {
      Snapshots.changes(spark, p, m1.version, m2.version).collect()
    }
    // below every file's coverage → no-op
    Snapshots.materializeDeletes(spark, p, 0.5) shouldBe m2.version
    // minFraction 0 sweeps the rest
    Snapshots.materializeDeletes(spark, p, 0.0)
    Snapshots.snapshotAt(spark, p).get.dvs shouldBe empty
    Snapshots.read(spark, p).select("id")
      .as[Long].collect().sorted shouldBe before
  }

  test("dvMaterializeFraction auto-trigger: deleteMor materializes hot " +
      "files in a follow-up compact commit; reads identical to " +
      "trigger-off; CDC still carries the deletes") {
    def build(p: String, conf: Option[String]): Unit = {
      conf.foreach(v =>
        spark.conf.set("spark.graft.snapshot.dvMaterializeFraction", v))
      try {
        Snapshots.append(tbl(0 until 10).repartition(1), p)
        Snapshots.append(tbl(10 until 30).repartition(1), p)
        Snapshots.deleteMor(spark, p, col("id") < 6L)
      } finally conf.foreach(_ => spark.conf
        .unset("spark.graft.snapshot.dvMaterializeFraction"))
    }
    val pOff = freshDir(); build(pOff, None)
    val pOn = freshDir(); build(pOn, Some("0.5"))
    // bit-identical reads across the trigger
    Snapshots.read(spark, pOn).select("id").as[Long].collect().sorted shouldBe
      Snapshots.read(spark, pOff).select("id").as[Long].collect().sorted
    // trigger-on: the 60%-covered file rewrote in a compact commit v4
    Snapshots.versions(spark, pOn).map(_._2) shouldBe
      Seq("append", "append", "delete-dv", "compact")
    Snapshots.snapshotAt(spark, pOn).get.dvs shouldBe empty
    Snapshots.versions(spark, pOff).map(_._2) shouldBe
      Seq("append", "append", "delete-dv")
    // the row-level change feed still carries the deletes (v3's vectors
    // are read BEFORE the materialization, which the feed skips)
    Snapshots.changeFeed(spark, pOn, 2L, 4L)
      .where(col("_change_type") === "delete")
      .select("id").as[Long].collect().sorted shouldBe (0L until 6L)
  }

  test("timestampAsOf: in-commit timestamps are strictly monotonic and " +
      "versionAtTimestamp picks the newest commit at-or-before the time") {
    val p = freshDir()
    Snapshots.append(tbl(0 until 10), p)
    Snapshots.append(tbl(10 until 25), p)
    Snapshots.overwrite(tbl(100 until 103), p)
    val ts = (1L to 3L).map(v =>
      Snapshots.manifestAt(spark, p, v).get.ts)
    ts shouldBe ts.sorted
    ts.distinct.size shouldBe 3
    Snapshots.versionAtTimestamp(spark, p, ts(0)) shouldBe Some(1L)
    Snapshots.versionAtTimestamp(spark, p, ts(1)) shouldBe Some(2L)
    Snapshots.versionAtTimestamp(spark, p, ts(2) + 1000L) shouldBe Some(3L)
    Snapshots.versionAtTimestamp(spark, p, ts(0) - 1L) shouldBe None
    Snapshots.readAsOfTimestamp(spark, p, ts(1)).count() shouldBe 25L
    intercept[IllegalArgumentException] {
      Snapshots.readAsOfTimestamp(spark, p, ts(0) - 1L)
    }
  }
}
