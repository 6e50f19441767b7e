package graft

import graft.ops.Snapshots
import org.apache.spark.sql.functions._

class SnapshotSourceSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_snapsrc_").toString
    new java.io.File(d).deleteOnExit(); d
  }

  private def tbl(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(i => (i.toLong, s"r$i", i * 2.0)).toDF("id", "name", "v")

  test("batch read == Snapshots.read, versionAsOf time travel, column " +
      "pruning emits only requested fields") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 50), p)
    Snapshots.overwrite(tbl(100 to 120), p)
    val latest = spark.read.format("graft-snapshot").load(p)
    rowSet(latest) shouldBe rowSet(Snapshots.read(spark, p))
    val v1 = spark.read.format("graft-snapshot")
      .option("versionAsOf", "1").load(p)
    rowSet(v1) shouldBe rowSet(Snapshots.read(spark, p, Some(1L)))
    // column pruning: a single-column projection round-trips
    v1.select("id").as[Long].collect().sorted shouldBe (1L to 50L)
    latest.count() shouldBe 21L
  }

  test("planning prunes files by manifest stats; filters stay residual " +
      "so results are exact") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 100).repartition(1), p)
    Snapshots.append(tbl(101 to 200).repartition(1), p)
    Snapshots.append(tbl(201 to 300).repartition(1), p)
    val df = spark.read.format("graft-snapshot").load(p)
    df.rdd.getNumPartitions shouldBe 3
    val filtered = df.where(col("id") >= 150L && col("id") <= 160L)
    // physical pin: the key-range scan plans ONE file partition
    filtered.rdd.getNumPartitions shouldBe 1
    filtered.select("id").as[Long].collect().sorted shouldBe (150L to 160L)
    // residual correctness: a predicate the stats cannot refine still
    // evaluates exactly on the survivors
    val mixed = df.where((col("id") % 7 === 0) && col("id") < 100L)
    mixed.rdd.getNumPartitions shouldBe 1
    mixed.select("id").as[Long].collect().sorted shouldBe
      (1L to 99L).filter(_ % 7 == 0)
  }

  test("schema evolution: files written before a column existed read " +
      "it as null") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 5), p)
    Snapshots.append(
      (6 to 8).map(i => (i.toLong, s"r$i", i * 2.0, s"extra$i"))
        .toDF("id", "name", "v", "tag"), p)
    val df = spark.read.format("graft-snapshot").load(p)
    df.schema.fieldNames.toSeq shouldBe Seq("id", "name", "v", "tag")
    df.where(col("id") <= 5L).select("tag").collect()
      .foreach(_.isNullAt(0) shouldBe true)
    df.where(col("id") === 7L).select("tag")
      .as[String].head() shouldBe "extra7"
  }

  test("timestamp and date columns round-trip through the Group reader") {
    val p = freshDir()
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-03-01 10:20:30.123456"),
        java.sql.Date.valueOf("2024-03-01")),
      (2L, java.sql.Timestamp.valueOf("1969-12-31 23:59:59.5"),
        java.sql.Date.valueOf("1969-12-31")))
      .toDF("id", "ts", "d")
    Snapshots.append(df, p)
    val back = spark.read.format("graft-snapshot").load(p)
    rowSet(back) shouldBe rowSet(Snapshots.read(spark, p))
  }

  test("streaming: version offsets tail the log exactly-once, optimize " +
      "commits are skipped, startingVersion honored") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = freshDir()
    Snapshots.append(tbl(1 to 10), p)
    Snapshots.append(tbl(11 to 20), p)
    val q = spark.readStream.format("graft-snapshot").load(p)
      .writeStream.format("memory").queryName("snap_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table("snap_stream").count() shouldBe 20L
      // maintenance must not re-emit
      Snapshots.optimize(spark, p, numFiles = 1)
      q.processAllAvailable()
      spark.table("snap_stream").count() shouldBe 20L
      // a new append lands as its own delta
      Snapshots.append(tbl(21 to 25), p)
      q.processAllAvailable()
      spark.table("snap_stream").select("id").as[Long].collect().sorted shouldBe
        (1L to 25L)
    } finally q.stop()
    // startingVersion: consume only from v2 onward
    val q2 = spark.readStream.format("graft-snapshot")
      .option("startingVersion", "2").load(p)
      .writeStream.format("memory").queryName("snap_stream2")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      spark.table("snap_stream2").select("id").as[Long].collect().sorted shouldBe
        (11L to 25L)
    } finally q2.stop()
  }

  test("batch reads pin 'latest' at load: one DataFrame never straddles " +
      "two versions across actions") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 10), p)
    val df = spark.read.format("graft-snapshot").load(p)
    df.count() shouldBe 10L
    Snapshots.append(tbl(11 to 20), p) // concurrent commit
    df.count() shouldBe 10L // still the pinned version
    spark.read.format("graft-snapshot").load(p).count() shouldBe 20L
  }

  test("log-to-log pipeline: exactly-once sink feeding the streaming " +
      "source end to end") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = freshDir()
    val ms = MemoryStream[(Long, String, Double)]
    val writer = ms.toDF().toDF("id", "name", "v")
      .writeStream.foreachBatch(Snapshots.streamAppend(p, "l2l"))
      .start()
    try {
      ms.addData((1L, "a", 1.0), (2L, "b", 2.0))
      writer.processAllAvailable()
      // downstream tails the same table
      val reader = spark.readStream.format("graft-snapshot").load(p)
        .writeStream.format("memory").queryName("l2l_out")
        .outputMode("append").start()
      try {
        reader.processAllAvailable()
        spark.table("l2l_out").count() shouldBe 2L
        ms.addData((3L, "c", 3.0))
        writer.processAllAvailable()
        reader.processAllAvailable()
        spark.table("l2l_out").select("id").as[Long].collect().sorted shouldBe
          Array(1L, 2L, 3L)
      } finally reader.stop()
    } finally writer.stop()
  }

  test("streaming from a pre-vacuum offset fails loudly instead of " +
      "silently skipping vacuumed commits") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = freshDir()
    Snapshots.append(tbl(1 to 5), p)
    Snapshots.append(tbl(6 to 9), p)
    Snapshots.vacuum(spark, p, keepFromVersion = 2L, graceMs = 0L) // v1 retired
    // default startingVersion=1 points below the horizon → typed failure
    val q = spark.readStream.format("graft-snapshot").load(p)
      .writeStream.format("memory").queryName("snap_vac")
      .outputMode("append").start()
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try q.processAllAvailable() finally q.stop()
    }
    err.getMessage should include("vacuumed")
    // startingVersion at the horizon consumes cleanly
    val q2 = spark.readStream.format("graft-snapshot")
      .option("startingVersion", "2").load(p)
      .writeStream.format("memory").queryName("snap_vac2")
      .outputMode("append").start()
    try {
      q2.processAllAvailable()
      spark.table("snap_vac2").count() shouldBe 4L
    } finally q2.stop()
  }

  test("vectorized read: the plan crosses a ColumnarToRow boundary and " +
      "every supported type round-trips, incl. evolved-null columns and " +
      "the footer-only count(*) fast path") {
    val p = freshDir()
    val full = (1 to 9000).map(i => (i.toLong, s"r$i", i * 2.0, i % 3 == 0,
        java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 06:30:00"),
        java.sql.Date.valueOf(f"2024-02-${i % 28 + 1}%02d"), i.toFloat))
      .toDF("id", "name", "v", "flag", "ts", "d", "f")
    Snapshots.append(full.where(col("id") <= 6000), p)
    // schema-evolving second commit: old files must read `tag` as null
    Snapshots.append(
      (6001 to 9000).map(i => (i.toLong, s"r$i", i * 2.0, i % 3 == 0,
          java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 06:30:00"),
          java.sql.Date.valueOf(f"2024-02-${i % 28 + 1}%02d"), i.toFloat,
          s"t$i"))
        .toDF("id", "name", "v", "flag", "ts", "d", "f", "tag"), p)
    val df = spark.read.format("graft-snapshot").load(p)
    // plan pin: the scan emits ColumnarBatch → ColumnarToRow in the plan
    df.queryExecution.executedPlan.toString should include("ColumnarToRow")
    rowSet(df.where(col("id") <= 6000)) shouldBe
      rowSet(full.where(col("id") <= 6000).withColumn("tag",
        lit(null).cast("string")))
    df.where(col("tag").isNull).count() shouldBe 6000L
    // footer-only path: count(*) prunes every column
    df.count() shouldBe 9000L
    // 4096-row batch boundaries don't duplicate or drop rows
    df.select(sum(col("id"))).head().getLong(0) shouldBe
      (1L to 9000L).sum
  }

  test("COUNT(*) pushes down to log metadata: zero file reads, exact " +
      "at any pinned version; filtered counts fall back to the scan") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 500).repartition(4), p)
    Snapshots.append(tbl(501 to 800).repartition(2), p)
    val df = spark.read.format("graft-snapshot").load(p)
    val counted = df.groupBy().count()
    counted.queryExecution.executedPlan.toString should
      include("COUNT(*) from log metadata")
    counted.head().getLong(0) shouldBe 800L
    df.count() shouldBe 800L
    spark.read.format("graft-snapshot").option("versionAsOf", "1")
      .load(p).count() shouldBe 500L
    // a filtered count cannot use the metadata row (filters stay
    // residual) — falls back to the real scan, stays exact
    val filtered = df.where(col("id") <= 100L).groupBy().count()
    filtered.queryExecution.executedPlan.toString should
      not include "COUNT(*) from log metadata"
    filtered.head().getLong(0) shouldBe 100L
  }

  test("runtime filtering: a join-key filter handed over at execution " +
      "replans the scan to fewer file partitions, results exact") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 300).repartitionByRange(6, col("id")), p)
    // unit-level contract pin (what Spark's DPP calls at runtime)
    val sb = new graft.sources.SnapshotScanBuilder(p,
      spark.read.format("graft-snapshot").load(p).schema, None, None)
    val scan = sb.build()
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsRuntimeFiltering]
    scan.filterAttributes().map(_.describe()) should contain("id")
    val before = scan.asInstanceOf[graft.sources.SnapshotScan]
      .planInputPartitions().length
    before shouldBe 6
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("id", Array(5L, 7L))))
    val after = scan.asInstanceOf[graft.sources.SnapshotScan]
      .planInputPartitions().length
    after should be < before
    // end-to-end: broadcast-dim join stays exact with the filter live
    import spark.implicits._
    val dim = Seq((5L, "a"), (7L, "b"), (250L, "c")).toDF("id", "tag")
    val joined = spark.read.format("graft-snapshot").load(p)
      .join(broadcast(dim), "id")
    joined.select("id", "tag").collect().map(r =>
      (r.getLong(0), r.getString(1))).sorted shouldBe
      Seq((5L, "a"), (7L, "b"), (250L, "c"))
  }

  test("reported statistics: a small snapshot table auto-broadcasts in " +
      "a join (no hint) because numRows/sizeInBytes come from the log") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 50), p)
    import spark.implicits._
    val big = spark.range(100000).select(col("id"),
      (col("id") % 50 + 1).as("k"))
    val joined = big.join(spark.read.format("graft-snapshot").load(p)
      .select(col("id").as("k"), col("name")), "k")
    joined.queryExecution.executedPlan.toString should
      include("BroadcastHashJoin")
    joined.count() shouldBe 100000L
  }

  test("LIMIT pushdown cuts the planned file list by exact row counts; " +
      "filtered limits keep every file") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 300).repartitionByRange(6, col("id")), p)
    val schema = spark.read.format("graft-snapshot").load(p).schema
    def planned(limit: Option[Int], filters: Array[
        org.apache.spark.sql.sources.Filter] = Array.empty): Int = {
      val sb = new graft.sources.SnapshotScanBuilder(p, schema, None, None)
      sb.pushFilters(filters)
      limit.foreach(sb.pushLimit)
      sb.build().asInstanceOf[graft.sources.SnapshotScan]
        .planInputPartitions().length
    }
    planned(None) shouldBe 6
    planned(Some(60)) shouldBe 2 // 50-row files: 2 cover 60
    planned(Some(1)) shouldBe 1
    planned(Some(10000)) shouldBe 6 // limit past the table keeps all
    // defensive: with a filter present the cut must NOT engage
    planned(Some(1), Array(
      org.apache.spark.sql.sources.GreaterThan("id", 250L))) should be >= 1
    // end-to-end limit correctness
    spark.read.format("graft-snapshot").load(p).limit(60)
      .count() shouldBe 60L
  }

  test("maxVersionsPerTrigger: a backlogged consumer catches up in " +
      "bounded per-trigger batches, consuming everything exactly once") {
    val p = freshDir()
    (1 to 6).foreach(i => Snapshots.append(tbl(i * 10 until i * 10 + 5), p))
    val sink = "snap_admission"
    val q = spark.readStream.format("graft-snapshot")
      .option("maxVersionsPerTrigger", "2").load(p)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table(sink).count() shouldBe 30L // 6 commits × 5 rows
      // 6 versions at 2 per trigger → 3 non-empty batches
      q.recentProgress.count(_.numInputRows > 0) shouldBe 3
    } finally q.stop()
  }

  test("maxBytesPerTrigger: the bytes budget admits whole versions, " +
      "at least one per trigger, consuming the backlog exactly once") {
    val p = freshDir()
    (1 to 5).foreach(i => Snapshots.append(tbl(i * 10 until i * 10 + 4), p))
    val sink = "snap_bytes_admission"
    // a 1-byte budget forces exactly one version per trigger (the
    // ≥1-version floor), so the 5-commit backlog drains in 5 batches
    val q = spark.readStream.format("graft-snapshot")
      .option("maxBytesPerTrigger", "1").load(p)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.table(sink).count() shouldBe 20L
      q.recentProgress.count(_.numInputRows > 0) shouldBe 5
    } finally q.stop()
  }

  test("deletion vectors through the V2 face: batch reads apply them " +
      "row-based (no ColumnarToRow until OPTIMIZE materializes), " +
      "metadata COUNT(*) stays exact and zero-file-read, versionAsOf " +
      "pre-delete is untouched") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 400).repartitionByRange(4, col("id")), p)
    Snapshots.deleteMor(spark, p, col("id") % 4 === 0L)
    val df = spark.read.format("graft-snapshot").load(p)
    rowSet(df) shouldBe rowSet(Snapshots.read(spark, p))
    df.count() shouldBe 300L
    // a vectored snapshot reads row-based (uniform mode per scan)
    df.queryExecution.executedPlan.toString should
      not include "ColumnarToRow"
    // the count still answers from the log: per-file dv cardinalities
    // subtract exactly, zero data-file reads
    val counted = df.groupBy().count()
    counted.queryExecution.executedPlan.toString should
      include("COUNT(*) from log metadata")
    counted.head().getLong(0) shouldBe 300L
    // pre-delete version: full content, vectorized again
    val v1 = spark.read.format("graft-snapshot")
      .option("versionAsOf", "1").load(p)
    v1.count() shouldBe 400L
    v1.queryExecution.executedPlan.toString should include("ColumnarToRow")
    // stats-pruned + vector-filtered scan stays exact
    df.where(col("id") >= 100L && col("id") < 200L)
      .select("id").as[Long].collect().sorted shouldBe
      (100L until 200L).filter(_ % 4 != 0)
    // OPTIMIZE materializes: vectorized path restored, rows unchanged
    Snapshots.optimize(spark, p, numFiles = 2)
    val opt = spark.read.format("graft-snapshot").load(p)
    opt.count() shouldBe 300L
    opt.queryExecution.executedPlan.toString should include("ColumnarToRow")
  }

  test("V2 WRITE face: df.write.format(graft-snapshot) creates, " +
      "appends, and overwrites through the full commit protocol — " +
      "schema enforcement and CHECK constraints included") {
    val p = freshDir() + "/t"
    // first write CREATES the table (version 1). V2 writes take
    // explicit append/overwrite modes (Spark routes the default
    // ErrorIfExists to the V1 path, which this source does not serve)
    tbl(1 to 30).write.format("graft-snapshot").mode("append").save(p)
    Snapshots.read(spark, p).count() shouldBe 30L
    // append mode = a second atomic commit
    tbl(31 to 40).write.format("graft-snapshot").mode("append").save(p)
    rowSet(spark.read.format("graft-snapshot").load(p)) shouldBe
      rowSet(tbl(1 to 40))
    // overwrite mode = whole-snapshot replacement, history retained
    tbl(100 to 105).write.format("graft-snapshot").mode("overwrite").save(p)
    Snapshots.read(spark, p).count() shouldBe 6L
    Snapshots.read(spark, p, Some(2L)).count() shouldBe 40L
    // schema enforcement reaches the V2 writer: the table schema is
    // manifest-authoritative, so Spark's own output resolution rejects
    // a type change at ANALYSIS time (cannot safely cast), before any
    // data write
    intercept[Exception] {
      Seq(("x", "y", 1.0)).toDF("id", "name", "v")
        .write.format("graft-snapshot").mode("append").save(p)
    }.getMessage.toLowerCase should include("cast")
    // CHECK constraints gate V2 writes too. Since the table surfaces
    // its constraints via Table.constraints() (r11), Spark 4.1's OWN
    // plan-level enforcement fires first (SparkRuntimeException,
    // CHECK_CONSTRAINT_VIOLATION) — earlier and per-row-precise; the
    // engine's commit-time ConstraintViolation remains the backstop
    // for path-API writes (SnapshotsSpec pins that face)
    Snapshots.addConstraint(spark, p, "pos_id", "id > 0")
    val ce = intercept[Exception] {
      tbl(-5 to -1).write.format("graft-snapshot").mode("append").save(p)
    }
    // exactly the two expected rejection shapes — anything else (a
    // resolution error that happens to name the constraint, an NPE)
    // must FAIL this law, or it stops covering rejection semantics
    assert(ce.isInstanceOf[Snapshots.ConstraintViolation] ||
      ce.getMessage.toUpperCase.contains("CHECK_CONSTRAINT_VIOLATION"),
      s"expected a constraint rejection, got: ${ce.getMessage}")
    Snapshots.read(spark, p).count() shouldBe 6L
    // the default mode (ErrorIfExists) gets Spark's own typed
    // unsupported-save-mode error pointing at append/overwrite — never
    // a silent wrong write
    intercept[Exception] {
      tbl(1 to 3).write.format("graft-snapshot").save(p)
    }.getMessage.toLowerCase should include("append")
    Snapshots.read(spark, p).count() shouldBe 6L
    // READS stay manifest-authoritative: a user-specified schema with
    // a typo'd column is ignored, never silently read as all-null
    val withUserSchema = spark.read.format("graft-snapshot")
      .schema("id LONG, nmae STRING").load(p)
    withUserSchema.columns.toSeq shouldBe Seq("id", "name", "v")
  }

  test("unsupported column types get a typed error at load, not a " +
      "mid-task crash") {
    val p = freshDir()
    Snapshots.append(
      Seq((1L, Array(1.0, 2.0))).toDF("id", "vec"), p)
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-snapshot").load(p)
    }
    e.getMessage should include("unsupported")
    e.getMessage should include("Snapshots.read")
  }

  test("BINARY columns round-trip through the V2 reader (columnar and " +
      "row paths) — the persisted sketch-cube read path") {
    import spark.implicits._
    val p = freshDir()
    val rows = Seq(
      (1L, Array[Byte](1, 2, 3)),
      (2L, Array.emptyByteArray),
      (3L, null.asInstanceOf[Array[Byte]]),
      (4L, Array.tabulate(5000)(i => (i % 251).toByte))) // multi-page-ish
    Snapshots.append(rows.toDF("id", "b"), p)
    val got = spark.read.format("graft-snapshot").load(p)
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    got.map(_._1).toSeq shouldBe Seq(1L, 2L, 3L, 4L)
    got(0)._2.toSeq shouldBe Seq[Byte](1, 2, 3)
    got(1)._2.length shouldBe 0
    got(2)._2 shouldBe null
    got(3)._2.toSeq shouldBe Array.tabulate(5000)(i => (i % 251).toByte).toSeq
    // a real sketch survives the round-trip and still counts exactly
    import graft.functions.BitmapExprs._
    val p2 = freshDir()
    Snapshots.append(
      (1 to 500).map(i => (i % 3, i.toLong % 101)).toDF("g", "u")
        .groupBy("g").agg(bitmapAgg(col("u")).as("s")), p2)
    spark.read.format("graft-snapshot").load(p2)
      .select(col("g"), bitmapCount(col("s")).as("n"))
      .as[(Int, Long)].collect().toMap shouldBe
      (1 to 500).map(i => (i % 3, i % 101)).groupBy(_._1)
        .map { case (g, xs) => g -> xs.map(_._2).distinct.size.toLong }
  }
}
