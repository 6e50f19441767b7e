package graft

import graft.ops.Snapshots
import org.apache.spark.sql.functions._

/** Row-level CHANGE FEED laws — batch [[Snapshots.changeFeed]] and the
  * V2 `readChangeFeed` face (batch + streaming) must agree, deletes
  * must be FRESH positions only, and maintenance must contribute
  * nothing. */
class SnapshotCdfSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_cdf_").toString
    new java.io.File(d).deleteOnExit(); d
  }

  private def tbl(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(i => (i.toLong, s"r$i", i * 2.0)).toDF("id", "name", "v")

  /** v1 append 1..10, v2 append 11..15, v3 deleteMor(id<=3),
    * v4 deleteMor(id<=5) — overlapping, so v4 must emit ONLY 4,5 —
    * v5 optimize (skipped). */
  private def buildStore(): String = {
    val p = freshDir()
    Snapshots.append(tbl(1 to 10), p)
    Snapshots.append(tbl(11 to 15), p)
    Snapshots.deleteMor(spark, p, col("id") <= 3L)
    Snapshots.deleteMor(spark, p, col("id") <= 5L)
    Snapshots.optimize(spark, p, 1)
    p
  }

  private def feedSet(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
    df.select(col("id"), col("_change_type"), col("_commit_version"))
      .as[(Long, String, Long)].collect().toSet

  private val expected: Set[(Long, String, Long)] =
    (1L to 10L).map((_, "insert", 1L)).toSet ++
      (11L to 15L).map((_, "insert", 2L)).toSet ++
      (1L to 3L).map((_, "delete", 3L)).toSet ++
      (4L to 5L).map((_, "delete", 4L)).toSet

  test("batch changeFeed: inserts per commit, FRESH deletes only, " +
      "optimize skipped") {
    val p = buildStore()
    feedSet(Snapshots.changeFeed(spark, p, 0L, 5L)) shouldBe expected
    // a sub-range carries exactly its versions
    feedSet(Snapshots.changeFeed(spark, p, 2L, 4L)) shouldBe
      ((1L to 3L).map((_, "delete", 3L)).toSet ++
        (4L to 5L).map((_, "delete", 4L)).toSet)
  }

  test("V2 batch readChangeFeed == changeFeed (same planning)") {
    val p = buildStore()
    val v2 = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true").load(p)
    feedSet(v2) shouldBe expected
    // data columns ride along with correct values
    v2.where(col("_change_type") === "delete" &&
        col("_commit_version") === 4L)
      .select("name").as[String].collect().sorted shouldBe Seq("r4", "r5")
    // startingVersion bounds the range
    feedSet(spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true").option("startingVersion", "3")
      .load(p)) shouldBe expected.filter(_._3 >= 3L)
    // endingVersion pins the high end
    feedSet(spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true").option("endingVersion", "2")
      .load(p)) shouldBe expected.filter(_._3 <= 2L)
  }

  test("streaming readChangeFeed == batch feed across real micro-batches") {
    val p = buildStore()
    val q = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "1")
      .load(p)
      .writeStream.format("memory").queryName("cdf_law")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    feedSet(spark.table("cdf_law")) shouldBe expected
  }

  test("column pruning: meta-only and partial projections stay correct") {
    val p = buildStore()
    val v2 = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true").load(p)
    v2.select("_change_type").groupBy("_change_type").count()
      .as[(String, Long)].collect().toMap shouldBe
      Map("insert" -> 15L, "delete" -> 5L)
    v2.select("id", "_commit_version")
      .where(col("_commit_version") === 1L)
      .select("id").as[Long].collect().sorted shouldBe (1L to 10L)
  }

  test("graph process snapshot_change_feed == API") {
    val p = buildStore()
    val graph = s"""{
      "f": {"process_id": "snapshot_change_feed", "arguments": {
        "path": "$p", "from_exclusive": 0, "to_inclusive": 5},
        "result": true}}"""
    val df = new graft.compile.GraphCompiler(spark, Map.empty)
      .compile(graph).asInstanceOf[org.apache.spark.sql.DataFrame]
    feedSet(df) shouldBe expected
  }

  test("applyChangeFeed law: state(v0) + feed(v0, v] == read(v), " +
      "including a re-insert after a delete") {
    val p = buildStore() // v1..v5 with overlapping deleteMors + optimize
    val base = Snapshots.read(spark, p, Some(1L))
    val out = Snapshots.applyChangeFeed(base,
      Snapshots.changeFeed(spark, p, 1L, 5L), Seq("id"))
    rowSet(out) shouldBe rowSet(Snapshots.read(spark, p))
    out.count() shouldBe 10L // 15 rows − 5 deleted
    // a key deleted at v4 and re-inserted later must come back (the
    // newest commit wins per key)
    Snapshots.append(tbl(3 to 3), p) // v6 re-inserts id 3
    val out2 = Snapshots.applyChangeFeed(base,
      Snapshots.changeFeed(spark, p, 1L, 6L), Seq("id"))
    rowSet(out2) shouldBe rowSet(Snapshots.read(spark, p))
    out2.where(col("id") === 3L).count() shouldBe 1L
  }

  test("applyChangeFeed carries schema-evolved columns: state law holds " +
      "when a commit in the range widened the schema") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 5), p)
    Snapshots.append(tbl(6 to 8).withColumn("lang", lit("en")), p)
    val out = Snapshots.applyChangeFeed(
      Snapshots.read(spark, p, Some(1L)),
      Snapshots.changeFeed(spark, p, 1L, 2L), Seq("id"))
    out.columns should contain("lang")
    rowSet(out) shouldBe rowSet(Snapshots.read(spark, p))
    out.where(col("lang").isNull).count() shouldBe 5L
    // reserved internal names are rejected loudly
    intercept[IllegalArgumentException] {
      Snapshots.applyChangeFeed(
        Snapshots.read(spark, p, Some(1L)).withColumn("__gcf_v", lit(1)),
        Snapshots.changeFeed(spark, p, 1L, 2L), Seq("id"))
    }
  }

  test("batch readChangeFeed without startingVersion still works after " +
      "vacuum retired early versions (defaults to the horizon)") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 5), p)
    Snapshots.overwrite(tbl(6 to 9), p)
    Snapshots.append(tbl(10 to 12), p)
    Snapshots.vacuum(spark, p, keepFromVersion = 2L, graceMs = 0L)
    val feed = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true").load(p)
    feedSet(feed) shouldBe
      ((6L to 9L).map((_, "insert", 2L)).toSet ++
        (10L to 12L).map((_, "insert", 3L)).toSet)
    // an EXPLICIT start below the horizon names vacuumed changes: loud
    intercept[Exception] {
      spark.read.format("graft-snapshot")
        .option("readChangeFeed", "true").option("startingVersion", "1")
        .load(p).collect()
    }
  }

  test("deleteMor with the auto-materialize trigger returns the DELETE " +
      "commit's version, so deletedRows(v) keeps working") {
    val p = freshDir()
    spark.conf.set("spark.graft.snapshot.dvMaterializeFraction", "0.3")
    try {
      Snapshots.append(tbl(1 to 10).repartition(1), p)
      val v = Snapshots.deleteMor(spark, p, col("id") <= 6L)
      Snapshots.manifestAt(spark, p, v).get.op shouldBe "delete-dv"
      Snapshots.deletedRows(spark, p, v).select("id")
        .as[Long].collect().sorted shouldBe (1L to 6L)
      // the follow-up compact landed after it
      Snapshots.latestVersion(spark, p) shouldBe (v + 1)
    } finally spark.conf
      .unset("spark.graft.snapshot.dvMaterializeFraction")
  }

  test("mergeChanges: newest change wins per key (delete-then-reinsert " +
      "survives), untouched files carry over, NULL keys reject, txn " +
      "marks make replays no-ops") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 10).repartition(1), p)   // file A
    Snapshots.append(tbl(11 to 20).repartition(1), p)  // file B
    val mBefore = Snapshots.snapshotAt(spark, p).get
    // batch touching only file A's keys: delete 1, update 2,
    // delete-then-reinsert 3 (newest wins → survives with new payload)
    val batch = Seq(
      (1L, "x", 0.0, "delete", 7L),
      (2L, "upd", 99.0, "insert", 7L),
      (3L, "gone", 0.0, "delete", 7L),
      (3L, "back", 42.0, "insert", 8L))
      .toDF("id", "name", "v", "_change_type", "_commit_version")
    Snapshots.mergeChanges(spark, p, batch, Seq("id"),
      txn = Some(("mc", 1L)))
    val m = Snapshots.snapshotAt(spark, p).get
    // file B untouched: still referenced unmoved
    m.files should contain (mBefore.files(1))
    val out = Snapshots.read(spark, p)
    out.count() shouldBe 19L // 20 − deleted id 1
    out.where(col("id") === 2L).select("v").as[Double].head() shouldBe 99.0
    out.where(col("id") === 3L).select("name")
      .as[String].head() shouldBe "back"
    // replay with the same txn mark: no new commit, same content
    val vNow = Snapshots.latestVersion(spark, p)
    Snapshots.mergeChanges(spark, p, batch, Seq("id"),
      txn = Some(("mc", 1L))) shouldBe vNow
    Snapshots.latestVersion(spark, p) shouldBe vNow
    // NULL keys reject typed
    intercept[Snapshots.MergeSourceConflict] {
      Snapshots.mergeChanges(spark, p,
        Seq((Option.empty[Long], "n", 0.0, "insert", 9L))
          .toDF("id", "name", "v", "_change_type", "_commit_version"),
        Seq("id"))
    }
  }

  test("mergeChanges evolves the schema from the batch: new feed " +
      "columns land NULLABLE (untouched files read null), and a " +
      "mistyped key batch cannot rewrite the recorded key type") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 10).repartitionByRange(2, col("id")), p)
    // batch carries a NEW column 'lang' and an INT-typed key (table
    // key is LONG); touches only the low-id file
    val batch = Seq((2, "upd", 9.0, "en", "insert", 3L),
        (99, "new", 6.0, "de", "insert", 3L))
      .toDF("id", "name", "v", "lang", "_change_type", "_commit_version")
    batch.schema("id").dataType shouldBe
      org.apache.spark.sql.types.IntegerType
    Snapshots.mergeChanges(spark, p, batch, Seq("id"))
    val out = Snapshots.read(spark, p)
    val sch = out.schema
    sch("id").dataType shouldBe org.apache.spark.sql.types.LongType
    sch("lang").nullable shouldBe true
    out.count() shouldBe 11L
    out.where(col("id") === 2L).select("lang")
      .as[String].head() shouldBe "en"
    // the HIGH-id file carried over untouched and lacks 'lang' on
    // disk: rows read it as null (the nullable recording is what makes
    // this safe instead of an NPE)
    out.where(col("id") === 9L).select("lang")
      .collect().head.isNullAt(0) shouldBe true
  }

  test("streamMirror: the mirror tracks the source across real " +
      "micro-batches, and a crash-replayed batch is a no-op") {
    val p = buildStore()
    val mirror = freshDir() + "/m"
    val ck = freshDir() + "/ck"
    val q = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "1")
      .load(p)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch(Snapshots.streamMirror(mirror, "mirror_law",
        Seq("id")))
      .start()
    try q.processAllAvailable() finally q.stop()
    rowSet(Snapshots.read(spark, mirror)) shouldBe
      rowSet(Snapshots.read(spark, p))
    // crash replay: re-invoking the sink with an ALREADY-COMMITTED
    // batchId must not move the mirror (exactly-once on the txn mark)
    val vBefore = Snapshots.latestVersion(spark, mirror)
    val replayBatch = Snapshots.changeFeed(spark, p, 0L, 1L)
    Snapshots.streamMirror(mirror, "mirror_law", Seq("id"))(
      replayBatch, 0L)
    Snapshots.latestVersion(spark, mirror) shouldBe vBefore
    rowSet(Snapshots.read(spark, mirror)) shouldBe
      rowSet(Snapshots.read(spark, p))
    // the source keeps committing: one more batch round keeps tracking
    Snapshots.append(tbl(100 to 105), p)
    val q2 = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .load(p)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch(Snapshots.streamMirror(mirror, "mirror_law",
        Seq("id")))
      .start()
    try q2.processAllAvailable() finally q2.stop()
    rowSet(Snapshots.read(spark, mirror)) shouldBe
      rowSet(Snapshots.read(spark, p))
  }

  test("CoW delete surfaces at file granularity (re-emitted survivors), " +
      "documented contract") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 10).repartition(1), p)
    Snapshots.delete(spark, p, col("id") <= 2L) // copy-on-write rewrite
    val feed = Snapshots.changeFeed(spark, p, 0L, 2L)
    // the CoW commit re-adds the surviving rows as inserts (v2);
    // no row-level delete is claimed (only dv commits are row-exact)
    feedSet(feed) shouldBe
      ((1L to 10L).map((_, "insert", 1L)).toSet ++
        (3L to 10L).map((_, "insert", 2L)).toSet)
  }

  test("a table column named _change_type rejects the CDF read (typed)") {
    val p = freshDir()
    Snapshots.append(Seq((1L, "x")).toDF("id", "_change_type"), p)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-snapshot")
        .option("readChangeFeed", "true").load(p).collect()
    }
    e.getMessage should include("_change_type")
  }
}
