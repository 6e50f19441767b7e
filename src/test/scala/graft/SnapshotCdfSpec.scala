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

  test("CoW delete is ROW-EXACT in the feed: only the deleted rows " +
      "emit as _change_type='delete', survivors never re-emit") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 10).repartition(1), p)
    Snapshots.delete(spark, p, col("id") <= 2L) // copy-on-write rewrite
    val feed = Snapshots.changeFeed(spark, p, 0L, 2L)
    // the commit's _change_data sidecar carries exactly the removed
    // rows — the r10 "file granularity" weakness is gone
    feedSet(feed) shouldBe
      ((1L to 10L).map((_, "insert", 1L)).toSet ++
        (1L to 2L).map((_, "delete", 2L)).toSet)
  }

  test("CoW delete WITHOUT a sidecar (cdc disabled at write time): " +
      "batch feed falls back to a read-time diff — still row-exact") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 10).repartition(1), p)
    spark.conf.set(Snapshots.CdcEnabledKey, "false")
    try Snapshots.delete(spark, p, col("id") <= 2L)
    finally spark.conf.unset(Snapshots.CdcEnabledKey)
    val feed = Snapshots.changeFeed(spark, p, 0L, 2L)
    feedSet(feed) shouldBe
      ((1L to 10L).map((_, "insert", 1L)).toSet ++
        (1L to 2L).map((_, "delete", 2L)).toSet)
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

  // ------------------------------------------------- r11 row-exact laws

  /** One store exercising EVERY data-changing op family: append, CoW
    * delete, update, merge, replaceWhere, mergeChanges, deleteMor,
    * overwrite — plus a maintenance compact that must contribute
    * nothing. */
  private def buildEveryOpStore(): String = {
    val p = freshDir()
    Snapshots.append(tbl(1 to 10).repartition(2), p)            // v1
    Snapshots.append(tbl(11 to 20).repartition(2), p)           // v2
    Snapshots.delete(spark, p, col("id") <= 2L)                 // v3 CoW
    Snapshots.update(spark, p, col("id") === 5L,                // v4 CoW
      Map("v" -> (col("v") * 100)))
    Snapshots.merge(spark, p,                                   // v5 CoW
      tbl(8 to 12).withColumn("name", concat(lit("m"), col("name"))),
      Seq("id"))
    Snapshots.replaceWhere(spark, p,                            // v6 CoW
      col("id") >= 18L, tbl(18 to 22))
    Snapshots.mergeChanges(spark, p, Seq(                       // v7 CoW
        (3L, "x", 0.0, "delete", 1L),
        (30L, "r30", 60.0, "insert", 1L))
      .toDF("id", "name", "v", "_change_type", "_commit_version"),
      Seq("id"))
    Snapshots.deleteMor(spark, p, col("id") === 11L)            // v8 MoR
    p
  }

  test("THE law, every op: state(v0) + feed(v0, v] == read(v) for a " +
      "range containing CoW delete/update/merge/replaceWhere/" +
      "mergeChanges/deleteMor") {
    val p = buildEveryOpStore()
    val vEnd = Snapshots.latestVersion(spark, p)
    // from every possible seed version, the law must hold
    for (v0 <- 1L until vEnd) {
      val out = Snapshots.applyChangeFeed(
        Snapshots.read(spark, p, Some(v0)),
        Snapshots.changeFeed(spark, p, v0, vEnd), Seq("id"))
      withClue(s"seed v$v0: ") {
        rowSet(out) shouldBe rowSet(Snapshots.read(spark, p))
      }
    }
  }

  test("THE law under overwrite: whole-file synthesis emits parent " +
      "rows as deletes, adds as inserts") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 10), p)              // v1
    Snapshots.overwrite(tbl(5 to 8), p)            // v2 full replacement
    Snapshots.append(tbl(30 to 32), p)             // v3
    val feed = Snapshots.changeFeed(spark, p, 1L, 3L)
    feedSet(feed) shouldBe
      ((1L to 10L).map((_, "delete", 2L)).toSet ++
        (5L to 8L).map((_, "insert", 2L)).toSet ++
        (30L to 32L).map((_, "insert", 3L)).toSet)
    val out = Snapshots.applyChangeFeed(
      Snapshots.read(spark, p, Some(1L)), feed, Seq("id"))
    rowSet(out) shouldBe rowSet(Snapshots.read(spark, p))
    // V2 face plans the same synthesis
    feedSet(spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true").option("startingVersion", "2")
      .load(p)) shouldBe feedSet(feed)
  }

  test("update commits carry PAIRED images: update_preimage holds the " +
      "old values, update_postimage the new, and consumers replay " +
      "postimages only") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 6), p)
    Snapshots.update(spark, p, col("id") <= 2L,
      Map("v" -> (col("v") + 1000), "name" -> lit("upd")))
    val feed = Snapshots.changeFeed(spark, p, 1L, 2L)
    feed.select("id", "name", "v", "_change_type")
      .as[(Long, String, Double, String)].collect().toSet shouldBe Set(
      (1L, "r1", 2.0, "update_preimage"),
      (2L, "r2", 4.0, "update_preimage"),
      (1L, "upd", 1002.0, "update_postimage"),
      (2L, "upd", 1004.0, "update_postimage"))
    // aggregate-maintenance shape: sum(post) − sum(pre) == Δ of the sum
    val delta = feed.groupBy()
      .agg(sum(when(col("_change_type") === "update_postimage", col("v"))
        .when(col("_change_type") === "update_preimage", -col("v"))
        .otherwise(0.0)).as("d")).as[Double].head()
    val before = Snapshots.read(spark, p, Some(1L))
      .agg(sum("v")).as[Double].head()
    val after = Snapshots.read(spark, p).agg(sum("v")).as[Double].head()
    delta shouldBe (after - before)
    // the consumer law still holds (preimages are dropped internally)
    rowSet(Snapshots.applyChangeFeed(Snapshots.read(spark, p, Some(1L)),
      feed, Seq("id"))) shouldBe rowSet(Snapshots.read(spark, p))
  }

  test("mergeChanges records images too, and consuming its OWN feed " +
      "(with pre/post images) through mergeChanges converges") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 10).repartition(1), p)
    Snapshots.mergeChanges(spark, p, Seq(
        (2L, "two", 22.0, "insert", 1L),
        (4L, "x", 0.0, "delete", 1L),
        (40L, "r40", 80.0, "insert", 1L))
      .toDF("id", "name", "v", "_change_type", "_commit_version"),
      Seq("id"))
    val feed = Snapshots.changeFeed(spark, p, 1L, 2L)
    feed.select("id", "_change_type").as[(Long, String)]
      .collect().toSet shouldBe Set(
      (2L, "update_preimage"), (2L, "update_postimage"),
      (4L, "delete"), (40L, "insert"))
    // a second table consuming the feed via mergeChanges ends equal
    val m2 = freshDir() + "/m2"
    Snapshots.overwrite(Snapshots.read(spark, p, Some(1L)), m2)
    Snapshots.mergeChanges(spark, m2, feed, Seq("id"))
    rowSet(Snapshots.read(spark, m2)) shouldBe
      rowSet(Snapshots.read(spark, p))
  }

  test("streamMirror CONVERGES when the source uses CoW deletes — the " +
      "r10 'silent divergence' weakness is closed") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 10).repartition(2), p)
    Snapshots.append(tbl(11 to 20).repartition(2), p)
    Snapshots.delete(spark, p, col("id") % 4 === 0L)   // CoW delete
    Snapshots.replaceWhere(spark, p,
      col("id") >= 17L, tbl(17 to 25))                 // CoW backfill
    val mirror = freshDir() + "/m"
    val ck = freshDir() + "/ck"
    val q = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "1")
      .load(p)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch(Snapshots.streamMirror(mirror, "mirror_cow",
        Seq("id")))
      .start()
    try q.processAllAvailable() finally q.stop()
    rowSet(Snapshots.read(spark, mirror)) shouldBe
      rowSet(Snapshots.read(spark, p))
    // keep going: another CoW delete lands, the mirror keeps tracking
    Snapshots.delete(spark, p, col("id") === 18L)
    val q2 = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .load(p)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch(Snapshots.streamMirror(mirror, "mirror_cow",
        Seq("id")))
      .start()
    try q2.processAllAvailable() finally q2.stop()
    rowSet(Snapshots.read(spark, mirror)) shouldBe
      rowSet(Snapshots.read(spark, p))
  }

  test("a CoW commit WITHOUT a sidecar fails TYPED on the streaming " +
      "face (never silent divergence), and a RESTORE fails typed on " +
      "both faces") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 10), p)
    spark.conf.set(Snapshots.CdcEnabledKey, "false")
    try Snapshots.delete(spark, p, col("id") <= 2L)
    finally spark.conf.unset(Snapshots.CdcEnabledKey)
    val e = intercept[Exception] {
      spark.read.format("graft-snapshot")
        .option("readChangeFeed", "true").load(p).collect()
    }
    e.getMessage should include("no persisted change data")
    // restore: typed on batch changeFeed AND the V2 face
    val r = freshDir()
    Snapshots.append(tbl(1 to 5), r)
    Snapshots.append(tbl(6 to 8), r)
    Snapshots.restore(spark, r, 1L)
    intercept[IllegalArgumentException] {
      Snapshots.changeFeed(spark, r, 1L, 3L)
    }.getMessage should include("RESTORE")
    intercept[Exception] {
      spark.read.format("graft-snapshot")
        .option("readChangeFeed", "true").option("startingVersion", "2")
        .load(r).collect()
    }.getMessage should include("RESTORE")
  }

  test("_commit_timestamp rides the feed (batch AND V2), equals the " +
      "manifest's monotonic in-commit time") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 3), p)
    Snapshots.append(tbl(4 to 6), p)
    val ts = (1L to 2L).map(v =>
      v -> Snapshots.manifestAt(spark, p, v).get.ts).toMap
    val batch = Snapshots.changeFeed(spark, p, 0L, 2L)
      .select(col("_commit_version"), col("_commit_timestamp"))
      .as[(Long, java.sql.Timestamp)].collect().toSet
    batch shouldBe ts.map { case (v, t) =>
      (v, new java.sql.Timestamp(t)) }.toSet
    val v2 = spark.read.format("graft-snapshot")
      .option("readChangeFeed", "true").load(p)
      .select(col("_commit_version"), col("_commit_timestamp"))
      .as[(Long, java.sql.Timestamp)].collect().toSet
    v2 shouldBe batch
  }

  test("vacuum sweeps a retired commit's _change_data sidecar and " +
      "keeps retained ones") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 10).repartition(1), p)  // v1
    Snapshots.delete(spark, p, col("id") <= 2L)       // v2: sidecar
    Snapshots.delete(spark, p, col("id") === 9L)      // v3: sidecar
    def sidecars(): Set[String] = {
      val d = new java.io.File(p, "_change_data")
      if (!d.exists()) Set.empty
      else d.listFiles().map(_.getName).toSet
    }
    sidecars().size shouldBe 2
    val keptCdc = Snapshots.manifestAt(spark, p, 3L).get.cdc
    Snapshots.vacuum(spark, p, keepFromVersion = 3L, graceMs = 0L)
    // v2's sidecar swept, v3's retained — and the retained feed range
    // still reads exactly
    sidecars().size shouldBe 1
    keptCdc.foreach(f => new java.io.File(p, f).exists() shouldBe true)
    feedSet(Snapshots.changeFeed(spark, p, 2L, 3L)) shouldBe
      Set((9L, "delete", 3L))
  }

  test("streaming CDF across a schema evolution: a sidecar commit " +
      "written BEFORE the evolution reads with the evolved schema " +
      "(late columns null) on both faces") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = freshDir()
    Snapshots.append(tbl(1 to 6).repartition(1), p)   // v1
    Snapshots.delete(spark, p, col("id") <= 2L)       // v2: CoW sidecar
    Snapshots.append((7 to 8).map(i =>
      (i.toLong, s"r$i", i * 2.0, s"x$i"))
      .toDF("id", "name", "v", "extra"), p)           // v3: evolution
    val expectedRows =
      (1L to 6L).map(i => (i, "insert", 1L, None: Option[String])).toSet ++
      (1L to 2L).map(i => (i, "delete", 2L, None: Option[String])).toSet ++
      (7L to 8L).map(i => (i, "insert", 3L, Some(s"x$i"))).toSet
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), col("_change_type"), col("_commit_version"),
        col("extra")).as[(Long, String, Long, Option[String])]
        .collect().toSet
    shape(Snapshots.changeFeed(spark, p, 0L, 3L)) shouldBe expectedRows
    val q = spark.readStream.format("graft-snapshot")
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "1")
      .load(p)
      .writeStream.format("memory").queryName("cdf_evo")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      shape(spark.table("cdf_evo")) shouldBe expectedRows
    } finally q.stop()
  }

  test("graft_table_changes TVF: SQL CDC == changeFeed, by path and " +
      "by catalog identifier; bad args fail typed") {
    val p = buildStore()
    feedSet(spark.sql(
      s"SELECT * FROM graft_table_changes('$p', 0, 5)")) shouldBe expected
    feedSet(spark.sql(
      s"SELECT id, _change_type, _commit_version " +
        s"FROM graft_table_changes('$p', 2, 4)")) shouldBe
      ((1L to 3L).map((_, "delete", 3L)).toSet ++
        (4L to 5L).map((_, "delete", 4L)).toSet)
    // identifier resolution through a configured catalog warehouse
    val wh = freshDir()
    spark.conf.set("spark.sql.catalog.gtvf",
      "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.gtvf.warehouse", wh)
    spark.sql("CREATE NAMESPACE gtvf.db")
    spark.sql("CREATE TABLE gtvf.db.t (id BIGINT, v DOUBLE)")
    import spark.implicits._
    Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v")
      .createOrReplaceTempView("gtvf_seed")
    spark.sql("INSERT INTO gtvf.db.t SELECT * FROM gtvf_seed")
    spark.sql(
      "SELECT * FROM graft_table_changes('gtvf.db.t', 1, 2)")
      .select("id", "_change_type").as[(Long, String)]
      .collect().toSet shouldBe Set((1L, "insert"), (2L, "insert"))
    intercept[Exception] {
      spark.sql("SELECT * FROM graft_table_changes('nope.db.t', 0, 1)")
    }.getMessage should include("cannot resolve")
    intercept[Exception] {
      spark.sql(s"SELECT * FROM graft_table_changes('$p', 0)")
    }
  }

  test("graft_table_files TVF: one row per live file with recorded " +
      "rows/bytes, partition values, DV flag; version pin honored") {
    import spark.implicits._
    val p = freshDir()
    Snapshots.append(tbl(1 to 10).withColumn("par",
        when(col("id") <= 5L, "a").otherwise("b")),
      p, Seq("par"))
    Snapshots.deleteMor(spark, p, col("id") === 2L)
    val files = spark.sql(
      s"SELECT * FROM graft_table_files('$p')")
      .as[(String, Option[Long], Option[Long], String, Boolean)]
      .collect()
    files.map(_._2.get).sum shouldBe 10L       // recorded rows
    files.forall(_._3.exists(_ > 0)) shouldBe true
    files.map(_._4).toSet shouldBe Set("par=a", "par=b")
    files.count(_._5) shouldBe 1               // one dv-covered file
    // version pin: v1 has no DVs
    spark.sql(s"SELECT * FROM graft_table_files('$p', 1)")
      .where(col("has_dv")).count() shouldBe 0L
  }

  test("graft_table_history TVF == Snapshots.history, by path") {
    val p = buildStore()
    val viaSql = spark.sql(
      s"SELECT version, op, n_added FROM graft_table_history('$p')")
      .as[(Long, String, Long)].collect().toSeq
    val viaApi = Snapshots.history(spark, p)
      .select("version", "op", "n_added")
      .as[(Long, String, Long)].collect().toSeq
    viaSql shouldBe viaApi
    viaSql.map(r => (r._1, r._2)) shouldBe Seq(
      (1L, "append"), (2L, "append"), (3L, "delete-dv"),
      (4L, "delete-dv"), (5L, "optimize"))
  }
}
