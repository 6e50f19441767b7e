package graft

import graft.ops.Snapshots
import org.apache.spark.sql.functions._

class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_snap_").toString
    new java.io.File(d).deleteOnExit(); d
  }

  private def tbl(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(i => (i.toLong, s"r$i", i * 2.0)).toDF("id", "name", "v")

  test("append + time travel: every version reproduces its snapshot") {
    val p = freshDir()
    val v1 = Snapshots.append(tbl(1 to 10), p)
    val v2 = Snapshots.append(tbl(11 to 15), p)
    v1 shouldBe 1L; v2 shouldBe 2L
    Snapshots.read(spark, p, Some(1L)).select("id")
      .as[Long].collect().sorted shouldBe (1L to 10L)
    Snapshots.read(spark, p).select("id")
      .as[Long].collect().sorted shouldBe (1L to 15L)
    Snapshots.versions(spark, p).map(t => (t._1, t._2)) shouldBe
      Seq((1L, "append"), (2L, "append"))
  }

  test("overwrite replaces latest, old versions stay readable") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 10), p)
    Snapshots.overwrite(tbl(100 to 102), p)
    Snapshots.read(spark, p).select("id")
      .as[Long].collect().sorted shouldBe (100L to 102L)
    Snapshots.read(spark, p, Some(1L)).count() shouldBe 10L
  }

  test("changes(from, to) reads exactly the added rows") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 10), p)
    Snapshots.append(tbl(11 to 15), p)
    Snapshots.append(tbl(16 to 18), p)
    Snapshots.changes(spark, p, 1L, 3L).select("id")
      .as[Long].collect().sorted shouldBe (11L to 18L)
    Snapshots.changes(spark, p, 2L, 3L).select("id")
      .as[Long].collect().sorted shouldBe (16L to 18L)
  }

  test("read plans exactly the manifest's files — no data-dir listing") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 10), p)
    Snapshots.append(tbl(11 to 15), p)
    val m1 = Snapshots.snapshotAt(spark, p).get
    // a file parked in data/ but never committed is invisible
    tbl(900 to 905).write.parquet(s"$p/data/c-orphan")
    Snapshots.read(spark, p).count() shouldBe 15L
    val scanned = Snapshots.read(spark, p).inputFiles.toSet
    scanned.map(f => new java.net.URI(f).getPath) shouldBe
      m1.files.map(f => s"$p/$f").toSet
  }

  test("aborted/in-flight claim: readers step down, next commit skips it") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 5), p)
    // a crashed writer's claim: exists but unparseable (zero bytes)
    val claim = new java.io.File(s"$p/_graft_log/v000000000002.json")
    claim.createNewFile() shouldBe true
    Snapshots.read(spark, p).count() shouldBe 5L // latest parseable = v1
    val v = Snapshots.append(tbl(6 to 8), p) // claim of 2 loses, takes 3
    v shouldBe 3L
    Snapshots.read(spark, p).count() shouldBe 8L
    // history chains v3.parent = 1 across the dead claim
    Snapshots.latestManifest(spark, p).get.parent shouldBe 1L
  }

  test("vacuum deletes only unreferenced files; horizon reads raise") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 10), p)
    Snapshots.overwrite(tbl(100 to 102), p)
    Snapshots.append(tbl(103 to 104), p)
    val deleted = Snapshots.vacuum(spark, p, keepFromVersion = 2L, graceMs = 0L)
    deleted should be >= 1L // v1's retired files
    // retained versions read fine, incl. time travel to v2
    Snapshots.read(spark, p, Some(2L)).count() shouldBe 3L
    Snapshots.read(spark, p).count() shouldBe 5L
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, p, Some(1L))
    }
    // vacuuming away every committed version is refused
    intercept[IllegalArgumentException] {
      Snapshots.vacuum(spark, p, keepFromVersion = 99L)
    }
  }

  test("vacuum grace window: a fresh unreferenced file (an in-flight " +
      "commit's data, manifest not yet published) survives the default " +
      "sweep; the publish then commits against intact files") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 10), p)
    Snapshots.overwrite(tbl(100 to 102), p)
    // simulate commit step 1 of a concurrent writer: data files written
    // into an uncommitted per-commit directory, manifest NOT published
    tbl(900 to 905).coalesce(1).write.parquet(s"$p/data/c-inflight")
    // default grace: everything here is seconds old → NOTHING deletable,
    // not v1's retired files and especially not the in-flight data
    Snapshots.vacuum(spark, p, keepFromVersion = 2L) shouldBe 0L
    new java.io.File(s"$p/data/c-inflight").exists() shouldBe true
    // grace=0 (single-writer maintenance window): the sweep reclaims both
    val deleted = Snapshots.vacuum(spark, p, keepFromVersion = 2L,
      graceMs = 0L)
    deleted should be >= 2L
  }

  test("partitioned commit: = and IN prune partitions EXACTLY (ranges " +
      "would keep the middle), stats skipping composes on top, null " +
      "partition never prunes wrong, reads unchanged") {
    val p = freshDir()
    val df = (1 to 300).map(i =>
        (i.toLong, Seq("test", "train", "val")(i % 3), i * 1.0))
      .toDF("id", "split", "v")
    Snapshots.append(df, p, partitionBy = Seq("split"))
    Snapshots.append(Seq((1000L, null.asInstanceOf[String], 9.0))
      .toDF("id", "split", "v"), p, partitionBy = Seq("split"))
    // partition columns stay IN the data files — reads are unchanged
    Snapshots.read(spark, p).count() shouldBe 301L
    // IN ('test','val'): sorted range [test..val] contains 'train', so
    // range stats alone could NOT drop it — exact pin pruning must
    val sw = Snapshots.scanWhere(spark, p,
      col("split").isin("test", "val"))
    sw.count() shouldBe 200L
    val swFiles = sw.inputFiles.toSet
    swFiles should not be empty
    all(swFiles) should not include "__gp_split=train"
    // the null-partition file survives pruning (conservative), and the
    // residual filter removes its row — count already proved that
    // equality plans ONLY that partition's files (+ the null file)
    val eq = Snapshots.scanWhere(spark, p, col("split") === "val")
    eq.count() shouldBe 100L
    all(eq.inputFiles.toSet
        .filterNot(_.contains("__HIVE_DEFAULT_PARTITION__")))
      .should(include("__gp_split=val"))
    // min/max stats still compose on top of the partition pin
    val both = Snapshots.scanWhere(spark, p,
      col("split") === "val" && col("id") <= 10L)
    both.count() shouldBe 3L // ids 2, 5, 8 (i % 3 == 2 → "val")
    both.inputFiles.length should be < eq.inputFiles.length
    // V2 source prunes by partition too: fewer planned file-partitions
    val v2all = spark.read.format("graft-snapshot").load(p)
    val v2tr = v2all.where(col("split") === "train")
    v2tr.count() shouldBe 100L
    v2tr.rdd.getNumPartitions should be < v2all.rdd.getNumPartitions
  }

  test("partitionBy is table metadata: plain appends inherit it, CoW " +
      "rewrites and optimize preserve the layout, exact pruning " +
      "survives maintenance, missing partition column fails typed") {
    val p = freshDir()
    val mk = (r: Range) => r.map(i =>
        (i.toLong, Seq("test", "train", "val")(i % 3), i * 1.0))
      .toDF("id", "split", "v")
    Snapshots.append(mk(1 to 120), p, partitionBy = Seq("split"))
    Snapshots.append(mk(121 to 240), p) // NO explicit list — inherits
    def dataFiles() = Snapshots.read(spark, p).inputFiles.toSet
    all(dataFiles()) should include("__gp_split=")
    // CoW update rewrites only touched files — still into the layout
    Snapshots.update(spark, p, col("id") <= 5L,
      Map("v" -> (col("v") + 1000)))
    all(dataFiles()) should include("__gp_split=")
    // optimize preserves the layout (plain and z-order)
    Snapshots.optimize(spark, p, numFiles = 2)
    all(dataFiles()) should include("__gp_split=")
    Snapshots.optimize(spark, p, numFiles = 2,
      zorderBy = Seq(("id", 0.0, 256.0), ("v", 0.0, 2000.0)), zBits = 8)
    all(dataFiles()) should include("__gp_split=")
    // pruning is still EXACT after inherit + rewrite + two optimizes
    val sw = Snapshots.scanWhere(spark, p,
      col("split").isin("test", "val"))
    sw.count() shouldBe 160L
    all(sw.inputFiles.toSet) should not include "__gp_split=train"
    // rows fully intact through every rewrite
    Snapshots.read(spark, p).count() shouldBe 240L
    Snapshots.read(spark, p).agg(sum(col("v"))).head().getDouble(0) shouldBe
      ((1 to 240).map(_.toDouble).sum + 5 * 1000.0)
    // a batch missing the partition column fails loudly
    val e = intercept[IllegalArgumentException] {
      Snapshots.append(Seq((999L, 9.0)).toDF("id", "v"), p)
    }
    e.getMessage should include("partitioned by split")
  }

  test("file sizes ride the manifest: recorded at commit, and " +
      "optimizeToSize derives its file count from them with no " +
      "filesystem stat") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 400).repartition(8), p)
    val m = Snapshots.snapshotAt(spark, p).get
    m.files should have size 8
    all(m.files.map(f => m.stats(f).bytes)) should be > 0L
    // recorded bytes == actual on-disk lengths
    m.files.foreach { f =>
      m.stats(f).bytes shouldBe new java.io.File(s"$p/$f").length()
    }
    val total = m.files.map(f => m.stats(f).bytes).sum
    // target half the table → 2 files
    Snapshots.optimizeToSize(spark, p, targetFileBytes = (total + 1) / 2)
    val m2 = Snapshots.snapshotAt(spark, p).get
    m2.files should have size 2
    Snapshots.read(spark, p).count() shouldBe 400L
  }

  test("vacuum reclaims PARTITIONED commits' files (one __gp_ level " +
      "deep) once unreferenced") {
    val p = freshDir()
    val mk = (r: Range) => r.map(i =>
        (i.toLong, Seq("a", "b")(i % 2), i * 1.0)).toDF("id", "split", "v")
    Snapshots.append(mk(1 to 100), p, partitionBy = Seq("split"))
    Snapshots.overwrite(mk(200 to 210), p, partitionBy = Seq("split"))
    val deleted = Snapshots.vacuum(spark, p, keepFromVersion = 2L,
      graceMs = 0L)
    deleted should be >= 2L // v1's files, nested under __gp_split dirs
    Snapshots.read(spark, p).count() shouldBe 11L
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, p, Some(1L))
    }
  }

  test("multi-column partitionBy + escapable values: stats attribute to " +
      "the right files, exact pins survive escaping, CoW finds the " +
      "escaped partition") {
    val p = freshDir()
    val df = (1 to 120).map(i => (i.toLong, Seq("us", "eu")(i % 2),
        Seq("d one", "d:2", "d3")(i % 3), i * 1.0))
      .toDF("id", "region", "day", "v")
    Snapshots.append(df, p, partitionBy = Seq("region", "day"))
    val m = Snapshots.snapshotAt(spark, p).get
    // every file carries stats and BOTH partition values
    m.files.toSet shouldBe m.stats.keySet
    m.files.foreach { f =>
      m.stats(f).parts.keySet shouldBe Set("region", "day")
      m.stats(f).rows should be > 0L
    }
    // id-range pruning uses correctly-attributed bounds
    Snapshots.scanWhere(spark, p, col("id") <= 10L).count() shouldBe 10L
    // exact pin on a space value (URI-encoded in input_file_name)
    Snapshots.scanWhere(spark, p, col("day") === "d one")
      .count() shouldBe 40L
    // exact pin on an escaped value (':' escapes on disk)
    val pin = Snapshots.scanWhere(spark, p, col("day") === "d:2")
    pin.count() shouldBe 40L
    all(pin.inputFiles.toSet) should not include "__gp_day=d3"
    // CoW delete inside the escaped partition actually removes rows
    Snapshots.delete(spark, p, col("day") === "d:2" && col("id") <= 50L)
    Snapshots.read(spark, p).count() shouldBe
      (120L - (1 to 50).count(_ % 3 == 1))
    // and merge against the space partition updates, not duplicates
    Snapshots.merge(spark, p,
      df.where(col("day") === "d one" && col("id") <= 9L)
        .withColumn("v", col("v") * 100), Seq("id"))
    Snapshots.read(spark, p).where(col("id") === 3L)
      .select("v").head().getDouble(0) shouldBe 300.0
    Snapshots.read(spark, p).where(col("id") === 3L).count() shouldBe 1L
  }

  test("touched-file cap: a CoW op whose predicate spans more files than " +
      "spark.graft.snapshot.maxTouchedFiles fails loudly, not OOM") {
    val p = freshDir()
    // 4 files of one row each → a match-all predicate touches 4 files
    (1 to 4).foreach(i => Snapshots.append(tbl(i to i), p))
    spark.conf.set("spark.graft.snapshot.maxTouchedFiles", "2")
    try {
      intercept[Snapshots.TouchedFilesOverflow] {
        Snapshots.delete(spark, p, col("id") >= 1L)
      }
      intercept[Snapshots.TouchedFilesOverflow] {
        Snapshots.update(spark, p, col("id") >= 1L,
          Map("v" -> (col("v") * 10)))
      }
      intercept[Snapshots.TouchedFilesOverflow] {
        Snapshots.merge(spark, p, tbl(1 to 4), Seq("id"))
      }
      // under the cap the same ops plan normally
      Snapshots.delete(spark, p, col("id") === 1L)
      Snapshots.read(spark, p).count() shouldBe 3L
    } finally spark.conf.unset("spark.graft.snapshot.maxTouchedFiles")
  }

  test("optimize: rows identical, fewer files, old versions intact, " +
      "changes() skips it; z-order variant bounds per-file spans") {
    val p = freshDir()
    // many tiny commits → fragmented current snapshot
    (0 until 6).foreach(i => Snapshots.append(tbl(i * 10 until i * 10 + 5), p))
    val before = Snapshots.read(spark, p)
    val beforeRows = before.orderBy("id").collect().toSeq
    val beforeFiles = before.inputFiles.length
    val v = Snapshots.optimize(spark, p, numFiles = 2)
    v shouldBe 7L
    val after = Snapshots.read(spark, p)
    after.orderBy("id").collect().toSeq shouldBe beforeRows
    after.inputFiles.length shouldBe 2
    after.inputFiles.length should be < beforeFiles
    // time travel to the pre-optimize snapshot still works
    Snapshots.read(spark, p, Some(6L)).count() shouldBe 30L
    // incremental consumers never re-ingest an optimize: a range that
    // holds ONLY the optimize commit has no data changes at all
    intercept[IllegalArgumentException] {
      Snapshots.changes(spark, p, 6L, 7L)
    }
    Snapshots.changes(spark, p, 5L, 7L).count() shouldBe 5L // v6 adds only
    // z-order optimize: same rows, and per-file id-span is bounded
    // (ids 0..59 over 2 range-partitioned files → each file < full span)
    Snapshots.optimize(spark, p, numFiles = 2,
      zorderBy = Seq(("id", 0.0, 60.0), ("v", 0.0, 120.0)))
    val z = Snapshots.read(spark, p)
    z.orderBy("id").collect().toSeq shouldBe beforeRows
    val spans = z.select(col("id"),
        org.apache.spark.sql.functions.input_file_name().as("f"))
      .groupBy("f").agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => r.getLong(1) -> r.getLong(2))
    spans.length shouldBe 2
    // ids 0..54: an unclustered split could span ~54 per file; the
    // z-clustered range split must roughly halve it
    all(spans.map(s => s._2 - s._1)) should be < 40L
    // and the optimize commit recorded stats for the NEW layout: a
    // selective filter on the second z dim data-skips to one file
    val zskip = Snapshots.scanWhere(spark, p, col("v") < 20.0)
    zskip.inputFiles.length shouldBe 1
    rowSet(zskip) shouldBe rowSet(z.where(col("v") < 20.0))
  }

  test("pruning safety: date-vs-timestamp casts block pruning, NaN " +
      "bounds and NaN literals never prune, inexact decimal stats widen") {
    import java.sql.Date
    val p = freshDir()
    Snapshots.append(Seq((1L, Date.valueOf("2024-01-10"), 1.0))
      .toDF("id", "d", "v").repartition(1), p)
    Snapshots.append(Seq((2L, Date.valueOf("2024-02-10"), Double.NaN))
      .toDF("id", "d", "v").repartition(1), p)
    // date column vs TIMESTAMP literal: the analyzer casts the column
    // (days → micros unit change) — pruning must NOT fire on that
    // conjunct, and the result must still be exact
    val tsLit = org.apache.spark.sql.functions.lit(
      java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))
    val scan = Snapshots.scanWhere(spark, p, col("d") > tsLit.cast("date"))
    scan.select("id").as[Long].collect() shouldBe Array(2L)
    // the raw timestamp comparison (cast lands on the column) also stays
    // correct — it reads a superset and filters exactly
    val scanTs = Snapshots.scanWhere(spark, p,
      col("d").cast("timestamp") > tsLit)
    scanTs.select("id").as[Long].collect() shouldBe Array(2L)
    // a file whose max is NaN must survive > bounds (Spark sorts NaN
    // greatest: the NaN row MATCHES v > 100)
    val nan = Snapshots.scanWhere(spark, p, col("v") > 100.0)
    nan.select("id").as[Long].collect() shouldBe Array(2L)
    // NaN equality literal: Spark's = matches NaN rows; never prune
    Snapshots.scanWhere(spark, p, col("v") === Double.NaN)
      .select("id").as[Long].collect() shouldBe Array(2L)
  }

  test("read and changes use the manifest schema: evolved columns " +
      "survive regardless of footer sampling order") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 5), p)
    Snapshots.append(
      (6 to 8).map(i => (i.toLong, s"r$i", i * 2.0, s"x$i"))
        .toDF("id", "name", "v", "tag"), p)
    val out = Snapshots.read(spark, p)
    out.schema.fieldNames.toSeq shouldBe Seq("id", "name", "v", "tag")
    out.where(col("id") === 2L).select("tag").collect()
      .head.isNullAt(0) shouldBe true
    out.where(col("id") === 7L).select("tag")
      .as[String].head() shouldBe "x7"
    val ch = Snapshots.changes(spark, p, 0L, 2L)
    ch.schema.fieldNames.toSeq shouldBe Seq("id", "name", "v", "tag")
    ch.count() shouldBe 8L
  }

  test("append schema enforcement: type changes fail typed, added " +
      "columns merge into the table-schema union") {
    import spark.implicits._
    val p = freshDir()
    Snapshots.append(tbl(1 to 5), p)
    // type change on a shared column is a writer bug
    val e = intercept[IllegalArgumentException] {
      Snapshots.append(
        Seq((6, "r6", 12.0)).toDF("id", "name", "v"), p) // id is INT here
    }
    e.getMessage should include("changes column id")
    Snapshots.read(spark, p).count() shouldBe 5L // nothing committed
    // adding a column evolves: union schema, parent column order first
    Snapshots.append(
      Seq((6L, "r6", 12.0, true)).toDF("id", "name", "v", "flag"), p)
    val out = Snapshots.read(spark, p)
    out.schema.fieldNames.toSeq shouldBe Seq("id", "name", "v", "flag")
    out.where(col("id") === 3L).select("flag").collect()
      .head.isNullAt(0) shouldBe true
    out.where(col("id") === 6L).select("flag")
      .as[Boolean].head() shouldBe true
    // a batch MISSING an existing column appends fine and the union
    // schema keeps the column (its rows read as null)
    Snapshots.append(Seq((7L, "r7")).toDF("id", "name"), p)
    val out2 = Snapshots.read(spark, p)
    out2.schema.fieldNames.toSeq shouldBe Seq("id", "name", "v", "flag")
    out2.where(col("id") === 7L).select("v").collect()
      .head.isNullAt(0) shouldBe true
  }

  test("delta log: manifests are O(change), checkpoints bound the fold, " +
      "losing a checkpoint only lengthens resolution") {
    val p = freshDir()
    (1 to 12).foreach(i => Snapshots.append(tbl(i * 10 until i * 10 + 3), p))
    // the latest manifest carries ONLY its own adds — no full file list
    val m12 = Snapshots.latestManifest(spark, p).get
    m12.files shouldBe None
    m12.adds.size should be <= 4
    m12.removes shouldBe Nil
    // a checkpoint landed at the interval boundary
    new java.io.File(s"$p/_graft_log/v000000000010.checkpoint.json")
      .isFile shouldBe true
    // resolution folds checkpoint(10) + deltas 11..12
    Snapshots.read(spark, p).count() shouldBe 36L
    Snapshots.read(spark, p, Some(5L)).count() shouldBe 15L
    // checkpoints are DERIVED: deleting one only lengthens the fold
    new java.io.File(s"$p/_graft_log/v000000000010.checkpoint.json")
      .delete() shouldBe true
    Snapshots.read(spark, p).count() shouldBe 36L
    Snapshots.read(spark, p, Some(10L)).count() shouldBe 30L
  }

  test("vacuum past a delta chain: a horizon checkpoint materializes so " +
      "retained versions stay resolvable after manifests retire") {
    val p = freshDir()
    (1 to 7).foreach(i => Snapshots.append(tbl(i * 10 until i * 10 + 3), p))
    // keepFrom=6: v6/v7 are deltas whose chains reach v1..v5 — vacuum
    // must write a checkpoint at the boundary before retiring those
    Snapshots.vacuum(spark, p, keepFromVersion = 6L, graceMs = 0L)
    Snapshots.read(spark, p, Some(6L)).count() shouldBe 18L
    Snapshots.read(spark, p).count() shouldBe 21L
    intercept[IllegalArgumentException] {
      Snapshots.read(spark, p, Some(5L))
    }
    // data files of retained versions all survive (appends only — every
    // old file is still referenced by v6/v7)
    Snapshots.read(spark, p).collect().length shouldBe 21
    // and a later commit keeps working on the vacuumed log
    Snapshots.append(tbl(900 to 901), p) shouldBe 8L
    Snapshots.read(spark, p).count() shouldBe 23L
  }

  test("sequential independent writers never lose a commit") {
    val p = freshDir()
    val vs = (0 until 4).map(i => Snapshots.append(tbl(i * 10 to i * 10 + 4), p))
    vs shouldBe Seq(1L, 2L, 3L, 4L)
    Snapshots.read(spark, p).count() shouldBe 20L
    // each parent chains to the prior version
    Snapshots.versions(spark, p).map(_._1) shouldBe Seq(1L, 2L, 3L, 4L)
  }

  test("scanWhere: stats prune files, result == full filter, superset " +
      "laws (strings, unknown stats, non-analyzable conjuncts)") {
    val p = freshDir()
    // three appends with disjoint id ranges → per-file id stats disjoint
    Snapshots.append(tbl(1 to 100).repartition(1), p)
    Snapshots.append(tbl(101 to 200).repartition(1), p)
    Snapshots.append(tbl(201 to 300).repartition(1), p)
    val full = Snapshots.read(spark, p)
    val allFiles = full.inputFiles.length
    allFiles shouldBe 3
    // numeric range: only the middle file survives
    val f = col("id") >= 150L && col("id") <= 160L
    val scan = Snapshots.scanWhere(spark, p, f)
    scan.inputFiles.length shouldBe 1
    rowSet(scan) shouldBe rowSet(full.where(f))
    // equality on a string column prunes by UTF8 min/max
    val sf = col("name") === "r250"
    val sscan = Snapshots.scanWhere(spark, p, sf)
    sscan.inputFiles.length should be < allFiles
    rowSet(sscan) shouldBe rowSet(full.where(sf))
    // a non-analyzable conjunct (modulo) prunes nothing on its own but
    // the analyzable one still does; result stays exact
    val mixed = (col("id") % 7 === 0) && col("id") < 100L
    val mscan = Snapshots.scanWhere(spark, p, mixed)
    mscan.inputFiles.length shouldBe 1
    rowSet(mscan) shouldBe rowSet(full.where(mixed))
    // a filter that no file can satisfy reads ZERO files, empty result
    val none = Snapshots.scanWhere(spark, p, col("id") > 9999L)
    none.inputFiles.length shouldBe 0
    none.count() shouldBe 0L
    none.schema.fieldNames.toSeq shouldBe Seq("id", "name", "v")
  }

  test("merge: upsert semantics, untouched files carry over unmoved, " +
      "pure-insert path, conflict detection") {
    import spark.implicits._
    val p = freshDir()
    Snapshots.append(tbl(1 to 100).repartition(1), p)
    Snapshots.append(tbl(101 to 200).repartition(1), p)
    val before = Snapshots.snapshotAt(spark, p).get
    // updates touch only the FIRST file's key range + insert new keys
    val updates = Seq((5L, "UPD", -5.0), (7L, "UPD", -7.0),
      (999L, "NEW", 0.0)).toDF("id", "name", "v")
    val v = Snapshots.merge(spark, p, updates, Seq("id"))
    v shouldBe 3L
    val after = Snapshots.snapshotAt(spark, p).get
    // the second file (ids 101-200, stats-disjoint from the update key
    // range) is retained verbatim — copy-on-write touched one file
    val retained = after.files.toSet.intersect(before.files.toSet)
    retained.size shouldBe 1
    val out = Snapshots.read(spark, p)
    out.count() shouldBe 201L
    out.where(col("id") === 5L).select("name")
      .as[String].head() shouldBe "UPD"
    out.where(col("id") === 999L).count() shouldBe 1L
    out.where(col("id") === 6L).select("name")
      .as[String].head() shouldBe "r6" // co-located non-matched row kept
    // pure insert: no key overlaps → zero files rewritten
    val v2 = Snapshots.merge(spark, p,
      Seq((5000L, "INS", 1.0)).toDF("id", "name", "v"), Seq("id"))
    Snapshots.snapshotAt(spark, p).get.files.toSet
      .intersect(after.files.toSet).size shouldBe after.files.size
    Snapshots.read(spark, p).count() shouldBe 202L
  }

  test("merge/delete conflict: a rewrite prepared against a stale " +
      "version fails instead of dropping the interleaved commit") {
    import spark.implicits._
    val p = freshDir()
    Snapshots.append(tbl(1 to 10), p)
    val prepared = Snapshots.latestManifest(spark, p).get.version
    Snapshots.append(tbl(11 to 12), p) // interleaved commit
    val t = intercept[java.util.ConcurrentModificationException] {
      Snapshots.merge(spark, p,
        Seq((1L, "X", 0.0)).toDF("id", "name", "v"), Seq("id"),
        expectVersion = Some(prepared))
    }
    t.getMessage should include("re-run")
    intercept[java.util.ConcurrentModificationException] {
      Snapshots.delete(spark, p, col("id") === 1L,
        expectVersion = Some(prepared))
    }
    // nothing was lost: both data commits are intact
    Snapshots.read(spark, p).count() shouldBe 12L
  }

  test("delete: predicate rows gone, stats prune candidates, whole-file " +
      "delete drops the file, no-match delete is a no-op version") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 100).repartition(1), p)
    Snapshots.append(tbl(101 to 200).repartition(1), p)
    Snapshots.append(tbl(201 to 300).repartition(1), p)
    // delete a slice inside file 2 only
    val v = Snapshots.delete(spark, p,
      col("id") >= 150L && col("id") < 160L)
    v shouldBe 4L
    val m = Snapshots.latestManifest(spark, p).get
    m.op shouldBe "delete"
    val out = Snapshots.read(spark, p)
    out.count() shouldBe 290L
    out.where(col("id") === 155L).count() shouldBe 0L
    out.where(col("id") === 160L).count() shouldBe 1L
    // files 1 and 3 carried over unmoved (their stats excluded them)
    Snapshots.versions(spark, p).last._3 shouldBe 3
    // whole-file delete: every row of file 1 matches → file drops, the
    // rewrite adds nothing but an empty part (or nothing)
    Snapshots.delete(spark, p, col("id") <= 100L)
    Snapshots.read(spark, p).count() shouldBe 190L
    // no-match delete returns the current version without a commit
    val cur = Snapshots.latestManifest(spark, p).get.version
    Snapshots.delete(spark, p, col("id") > 100000L) shouldBe cur
    Snapshots.latestManifest(spark, p).get.version shouldBe cur
  }

  test("update: SET expressions hit only predicate rows, untouched " +
      "files carry over, no-match update is a no-op") {
    import spark.implicits._
    val p = freshDir()
    Snapshots.append(tbl(1 to 100).repartition(1), p)
    Snapshots.append(tbl(101 to 200).repartition(1), p)
    val before = Snapshots.snapshotAt(spark, p).get
    val v = Snapshots.update(spark, p, col("id") >= 10L && col("id") < 20L,
      Map("v" -> (col("v") * 10.0), "name" -> upper(col("name"))))
    v shouldBe 3L
    val out = Snapshots.read(spark, p)
    out.count() shouldBe 200L
    out.where(col("id") === 15L).select("v", "name")
      .as[(Double, String)].head() shouldBe ((300.0, "R15"))
    out.where(col("id") === 25L).select("v", "name")
      .as[(Double, String)].head() shouldBe ((50.0, "r25"))
    // file 2 (ids 101-200) carried over unmoved — stats excluded it
    Snapshots.snapshotAt(spark, p).get.files.toSet
      .intersect(before.files.toSet).size shouldBe 1
    // no-match: same version back, no commit
    Snapshots.update(spark, p, col("id") > 99999L,
      Map("v" -> lit(0.0))) shouldBe 3L
    Snapshots.latestManifest(spark, p).get.version shouldBe 3L
  }

  test("appendIdempotent: a replayed (app, txnId) is a no-op; higher " +
      "ids commit; apps are independent") {
    val p = freshDir()
    Snapshots.appendIdempotent(tbl(1 to 10), p, "jobA", 0L) shouldBe 1L
    // exact replay (crash-retry of batch 0) → no-op, version unchanged
    Snapshots.appendIdempotent(tbl(1 to 10), p, "jobA", 0L) shouldBe 1L
    Snapshots.read(spark, p).count() shouldBe 10L
    // stale replay below the high-water mark is also a no-op
    Snapshots.appendIdempotent(tbl(11 to 15), p, "jobA", 1L) shouldBe 2L
    Snapshots.appendIdempotent(tbl(99 to 99), p, "jobA", 0L) shouldBe 2L
    Snapshots.read(spark, p).count() shouldBe 15L
    // a different app has its own txn line
    Snapshots.appendIdempotent(tbl(21 to 22), p, "jobB", 0L) shouldBe 3L
    Snapshots.read(spark, p).count() shouldBe 17L
    // plain commits interleave without disturbing txn high-water marks
    Snapshots.append(tbl(31 to 32), p)
    Snapshots.appendIdempotent(tbl(98 to 98), p, "jobA", 1L) shouldBe 4L
    Snapshots.read(spark, p).count() shouldBe 19L
  }

  test("streamAppend: exactly-once foreachBatch sink feeding a " +
      "graft-snapshot streaming read — log-to-log pipeline") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = freshDir()
    val ms = MemoryStream[(Long, String, Double)]
    val q = ms.toDF().toDF("id", "name", "v")
      .writeStream
      .foreachBatch(Snapshots.streamAppend(p, "sink-spec"))
      .start()
    try {
      ms.addData((1L, "a", 1.0), (2L, "b", 2.0))
      q.processAllAvailable()
      ms.addData((3L, "c", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    Snapshots.read(spark, p).count() shouldBe 3L
    // simulate the crash-replay of the FIRST batch: same app, batchId 0
    import spark.implicits._
    Snapshots.appendIdempotent(
      Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "name", "v"),
      p, "sink-spec", 0L)
    Snapshots.read(spark, p).count() shouldBe 3L // still exactly once
    // versions are real snapshot commits: time travel works on the sink
    Snapshots.read(spark, p, Some(1L)).count() shouldBe 2L
  }

  test("delete to empty table: read yields empty DF with schema") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 5), p)
    Snapshots.delete(spark, p, col("id") >= 0L)
    val out = Snapshots.read(spark, p)
    out.schema.fieldNames.toSeq shouldBe Seq("id", "name", "v")
    out.count() shouldBe 0L
  }

  test("concurrent racing writers: all commits land, none lost") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 2), p)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futs = (0 until 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long =
            Snapshots.append(tbl(1000 + i * 10 to 1000 + i * 10 + 1), p)
        })
      }
      val got = futs.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      got.toSet.size shouldBe 4 // four distinct versions
      Snapshots.read(spark, p).count() shouldBe (2 + 4 * 2).toLong
    } finally pool.shutdownNow()
  }

  test("bloom file-skipping: equality on an UNSORTED high-cardinality " +
      "column prunes files min/max cannot — no false negatives, range " +
      "predicates untouched, conf-off commits record nothing") {
    spark.conf.set(Snapshots.BloomColumnsKey, "uid,name")
    try {
      val p = freshDir()
      // 8 files range-clustered by SEQUENTIAL id; uid/name are
      // scrambled high-cardinality values — every file's uid min/max
      // spans ~the whole domain, so stats alone prune nothing
      val rows = (0 until 4000).map { i =>
        (i.toLong, (i * 2654435761L) % 100000L,
          s"n${(i * 48271) % 100000}")
      }
      Snapshots.append(rows.toDF("id", "uid", "name")
        .repartitionByRange(8, col("id")), p)
      val m = Snapshots.snapshotAt(spark, p).get
      m.files.size shouldBe 8
      m.files.foreach(f =>
        m.stats(f).blooms.keySet shouldBe Set("uid", "name"))
      // PRESENT value: exact rows back (no false negative possible —
      // the filter records every present value's positions) and the
      // scan plans fewer than all files
      val target = (1234L * 2654435761L) % 100000L
      val expect = rows.filter(_._2 == target).map(_._1).sorted
      val hit = Snapshots.scanWhere(spark, p, col("uid") === target)
      hit.select("id").as[Long].collect().sorted.toSeq shouldBe expect
      hit.inputFiles.length should be < 8
      // ABSENT value (outside the domain): every file bloom-prunes
      val miss = Snapshots.scanWhere(spark, p, col("uid") === 99999999L)
      miss.inputFiles.length shouldBe 0
      miss.count() shouldBe 0L
      // string bloom, both directions
      val starget = s"n${(777 * 48271) % 100000}"
      Snapshots.scanWhere(spark, p, col("name") === starget)
        .count() shouldBe rows.count(_._3 == starget).toLong
      Snapshots.scanWhere(spark, p, col("name") === "definitely_absent")
        .inputFiles.length shouldBe 0
      // non-equality predicates never consult the bloom
      Snapshots.scanWhere(spark, p, col("uid") >= 0L)
        .count() shouldBe 4000L
      // the V2 face shares pruneFiles: pushed EqualTo bloom-prunes too
      spark.read.format("graft-snapshot").load(p)
        .where(col("uid") === 99999999L).count() shouldBe 0L
      spark.read.format("graft-snapshot").load(p)
        .where(col("uid") === target)
        .select("id").as[Long].collect().sorted.toSeq shouldBe expect
      // a CoW rewrite re-records blooms for its rewritten files
      Snapshots.delete(spark, p, col("id") === 0L)
      val m2 = Snapshots.snapshotAt(spark, p).get
      m2.files.foreach(f =>
        m2.stats(f).blooms.keySet shouldBe Set("uid", "name"))
      // conf OFF: new commits record no blooms; reads stay correct
      spark.conf.unset(Snapshots.BloomColumnsKey)
      val p2 = freshDir()
      Snapshots.append(rows.take(100).toDF("id", "uid", "name"), p2)
      val m3 = Snapshots.snapshotAt(spark, p2).get
      m3.files.foreach(f => m3.stats(f).blooms shouldBe Map.empty)
      Snapshots.scanWhere(spark, p2, col("uid") === 99999999L)
        .count() shouldBe 0L
    } finally spark.conf.unset(Snapshots.BloomColumnsKey)
  }

  test("bloom bits knob (r13): the writer's modulus rides in the tag, " +
      "so mixed-width commits read exactly; legacy un-widthed tags " +
      "read as 2^16") {
    spark.conf.set(Snapshots.BloomColumnsKey, "uid")
    try {
      val p = freshDir()
      val rows = (0 until 2000).map(i =>
        (i.toLong, (i * 2654435761L) % 100000L))
      // commit 1 at 2^12 (clamped small), commit 2 at 2^20: one table,
      // two widths — each file tests against its own writer's modulus
      spark.conf.set(Snapshots.BloomBitsKey, "12")
      Snapshots.append(rows.take(1000).toDF("id", "uid")
        .repartitionByRange(4, col("id")), p)
      spark.conf.set(Snapshots.BloomBitsKey, "20")
      Snapshots.append(rows.drop(1000).toDF("id", "uid")
        .repartitionByRange(4, col("id")), p)
      val m = Snapshots.snapshotAt(spark, p).get
      val widths = m.files.map(f => m.stats(f).blooms("uid").split(':')(1))
        .toSet
      widths shouldBe Set("12", "20")
      // exactness across both widths
      val target = (77L * 2654435761L) % 100000L
      Snapshots.scanWhere(spark, p, col("uid") === target)
        .select("id").as[Long].collect().sorted.toSeq shouldBe
        rows.filter(_._2 == target).map(_._1).sorted
      Snapshots.scanWhere(spark, p, col("uid") === 99999999L)
        .count() shouldBe 0L
      // legacy tag (no width segment) still reads — as 2^16
      val legacy = rows.take(1000).toDF("id", "uid")
      val p2 = freshDir()
      spark.conf.unset(Snapshots.BloomBitsKey)
      Snapshots.append(legacy.repartitionByRange(4, col("id")), p2)
      // simulate a pre-r13 manifest by stripping the width segment
      val logDir = new java.io.File(s"$p2/_graft_log")
      val mf = logDir.listFiles().filter(_.getName.endsWith(".json"))
        .minBy(_.getName)
      val txt = new String(java.nio.file.Files.readAllBytes(mf.toPath),
        java.nio.charset.StandardCharsets.UTF_8)
      val stripped = txt.replaceAll("\"l:16:", "\"l:")
      stripped should not be txt
      java.nio.file.Files.write(mf.toPath, stripped.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      Snapshots.scanWhere(spark, p2, col("uid") === target)
        .select("id").as[Long].collect().sorted.toSeq shouldBe
        rows.take(1000).filter(_._2 == target).map(_._1).sorted
      Snapshots.scanWhere(spark, p2, col("uid") === 99999999L)
        .count() shouldBe 0L
    } finally {
      spark.conf.unset(Snapshots.BloomColumnsKey)
      spark.conf.unset(Snapshots.BloomBitsKey)
    }
  }

  test("checkpointInterval knob (r13): checkpoints land only at the " +
      "configured cadence, resolution stays exact at latest and " +
      "mid-log, and an interval change mid-log is safe") {
    val p = freshDir()
    val one = Seq((1L, 2.0)).toDF("id", "v")
    def ckpts(): Seq[Long] =
      new java.io.File(s"$p/_graft_log").listFiles()
        .map(_.getName).toSeq
        .collect { case s if s.endsWith(".checkpoint.json") =>
          s.stripPrefix("v").stripSuffix(".checkpoint.json").toLong }
        .sorted
    spark.conf.set(Snapshots.CheckpointIntervalKey, "25")
    try {
      (1 to 60).foreach(_ => Snapshots.append(one, p))
      ckpts() shouldBe Seq(25L, 50L)
      Snapshots.read(spark, p).count() shouldBe 60L
      Snapshots.read(spark, p, Some(37L)).count() shouldBe 37L
      Snapshots.history(spark, p).count() shouldBe 60L
      // interval change mid-log: resolution correctness is unaffected
      // (checkpoints are derived data; cadence only bounds fold length)
      spark.conf.set(Snapshots.CheckpointIntervalKey, "10")
      (1 to 10).foreach(_ => Snapshots.append(one, p))
      ckpts() shouldBe Seq(25L, 50L, 70L)
      Snapshots.read(spark, p).count() shouldBe 70L
      Snapshots.read(spark, p, Some(55L)).count() shouldBe 55L
      // invalid values fall back to the default rather than failing
      spark.conf.set(Snapshots.CheckpointIntervalKey, "0")
      (1 to 10).foreach(_ => Snapshots.append(one, p))
      ckpts() shouldBe Seq(25L, 50L, 70L, 80L)
    } finally spark.conf.unset(Snapshots.CheckpointIntervalKey)
  }
}
