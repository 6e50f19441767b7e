package graft

import graft.ops.Snapshots
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-10 hardening: the four carried round-8 ADVICE findings (merge
  * source contract, pre-epoch NANOS floor division, changes() dead-claim
  * skip, getTable schema/pin single resolution) and the round-9 lows
  * (vacuum dv per-file counting, unknown-bytes admission, V2 overwrite
  * partition inheritance, user read-schema conflict). */
class SnapshotFixesSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_snapfix_").toString
    new java.io.File(d).deleteOnExit(); d
  }

  private def tbl(ids: Range): org.apache.spark.sql.DataFrame =
    ids.map(i => (i.toLong, s"r$i", i * 2.0)).toDF("id", "name", "v")

  // ------------------------------------------------- merge source contract

  test("merge rejects duplicate keys in the updates batch (typed)") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 10), p)
    val dup = Seq((5L, "a", 1.0), (5L, "b", 2.0), (6L, "c", 3.0))
      .toDF("id", "name", "v")
    val e = intercept[Snapshots.MergeSourceConflict] {
      Snapshots.merge(spark, p, dup, Seq("id"))
    }
    e.getMessage should include("appears 2 times")
    // the table is untouched — the guard fired before any commit
    Snapshots.read(spark, p).count() shouldBe 10L
    Snapshots.versions(spark, p).map(_._1) shouldBe Seq(1L)
  }

  test("merge rejects NULL key columns in the updates batch (typed)") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 10), p)
    val withNull = Seq((Some(5L), "a", 1.0), (None, "b", 2.0))
      .toDF("id", "name", "v")
    val e = intercept[Snapshots.MergeSourceConflict] {
      Snapshots.merge(spark, p, withNull, Seq("id"))
    }
    e.getMessage should include("NULL")
    Snapshots.read(spark, p).count() shouldBe 10L
  }

  test("merge with a clean batch is unchanged: upsert semantics hold") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 10), p)
    val updates = Seq((5L, "upd", 50.0), (11L, "new", 22.0))
      .toDF("id", "name", "v")
    Snapshots.merge(spark, p, updates, Seq("id"))
    val out = Snapshots.read(spark, p)
    out.count() shouldBe 11L
    out.where(col("id") === 5L).select("name")
      .as[String].head() shouldBe "upd"
    out.where(col("id") === 11L).count() shouldBe 1L
  }

  // ------------------------------------------- pre-epoch NANOS floor division

  /** Write an INT64 TIMESTAMP(NANOS) parquet file with parquet-java —
    * Spark itself never writes NANOS, but external writers (Arrow, Flink,
    * pandas) do, and the V2 readers advertise support for it. */
  private def writeNanosParquet(file: String, nanos: Seq[Long]): Unit = {
    import org.apache.parquet.schema.MessageTypeParser
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    val schema = MessageTypeParser.parseMessageType(
      "message spark_schema { required int64 ts (TIMESTAMP(NANOS,true)); }")
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val writer = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(file))
      .withConf(conf).withType(schema).build()
    val gf = new SimpleGroupFactory(schema)
    nanos.foreach { v =>
      val g = gf.newGroup(); g.append("ts", v); writer.write(g)
    }
    writer.close()
  }

  test("NANOS timestamps floor toward -inf for pre-epoch values in both " +
      "V2 readers (columnar and row)") {
    val p = freshDir()
    // establish a 4-row timestamp table, then swap its single data file
    // for an externally-written NANOS file with the same row count
    val base = Seq(1L, 2L, 3L, 4L)
      .toDF("us").select(timestamp_micros(col("us")).as("ts"))
      .repartition(1)
    Snapshots.append(base, p)
    val m = Snapshots.snapshotAt(spark, p).get
    m.files should have size 1
    val dataFile = s"$p/${m.files.head}"
    // -1001 ns: floor -2 µs (truncation would give -1); -1 ns: floor
    // -1 µs (truncation would give 0); 0 and 1500 ns: sign-independent
    val nanos = Seq(-1001L, -1L, 0L, 1500L)
    val expectedMicros = nanos.map(Math.floorDiv(_, 1000L))
    new java.io.File(dataFile).delete()
    writeNanosParquet(dataFile, nanos)

    // columnar path (no dvs → vectorized)
    val v2 = spark.read.format("graft-snapshot").load(p)
      .select(unix_micros(col("ts")).as("us"))
    v2.as[Long].collect().sorted shouldBe expectedMicros.sorted

    // row path: instantiate the group reader directly on the file (the
    // row mode a dv-covered snapshot uses)
    val reader = new graft.sources.SnapshotGroupReader(
      dataFile, StructType(Seq(StructField("ts", TimestampType))))
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    while (reader.next()) got += reader.get().getLong(0)
    reader.close()
    got.sorted.toSeq shouldBe expectedMicros.sorted
  }

  // --------------------------------------------- changes() dead-claim skip

  test("changes() skips a dead (unparseable) claim like the streaming " +
      "source, but still fails loudly on a vacuumed version") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 5), p) // v1
    // a crashed writer's claim: the file exists but parses to nothing
    val dead = new java.io.File(s"$p/_graft_log/v000000000002.json")
    val w = new java.io.FileWriter(dead); w.write("{corrupt"); w.close()
    Snapshots.append(tbl(6 to 9), p) shouldBe 3L // next claim lands at v3
    // the dead claim no longer wedges the range
    Snapshots.changes(spark, p, 0L, 3L).select("id")
      .as[Long].collect().sorted shouldBe (1L to 9L)
    Snapshots.changes(spark, p, 1L, 3L).select("id")
      .as[Long].collect().sorted shouldBe (6L to 9L)
    // an ABSENT manifest (vacuumed) is a different story: fail loudly
    dead.delete()
    val e = intercept[IllegalArgumentException] {
      Snapshots.changes(spark, p, 1L, 3L).collect()
    }
    e.getMessage should include("vacuumed")
  }

  // ---------------------------------- getTable: one resolution, schema rules

  test("V2 read after schema evolution surfaces the evolved column " +
      "(schema and pin come from one manifest resolution)") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 5), p)
    Snapshots.append(
      tbl(6 to 8).withColumn("lang", lit("en")), p)
    val df = spark.read.format("graft-snapshot").load(p)
    df.columns should contain("lang")
    df.where(col("lang").isNull).count() shouldBe 5L
    df.where(col("lang") === "en").count() shouldBe 3L
    // versionAsOf 1 pins BOTH the version and the pre-evolution schema
    val old = spark.read.format("graft-snapshot")
      .option("versionAsOf", "1").load(p)
    old.columns should not contain "lang"
    old.count() shouldBe 5L
  }

  test("schema evolution widens nullability: a non-nullable new column " +
      "reads as null from pre-evolution files without NPE") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 5), p)
    // lit("en") is NON-nullable — before the widening rule the manifest
    // recorded it so, codegen elided the null check, and selecting the
    // column alone NPE'd on old files' nulls
    Snapshots.append(tbl(6 to 8).withColumn("lang", lit("en")), p)
    val m = Snapshots.snapshotAt(spark, p).get
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(m.schemaJson.get).asInstanceOf[StructType]
    schema("lang").nullable shouldBe true
    val langs = spark.read.format("graft-snapshot").load(p)
      .select("lang").collect()
      .map(r => if (r.isNullAt(0)) "NULL" else r.getString(0))
    langs.count(_ == "NULL") shouldBe 5
    langs.count(_ == "en") shouldBe 3
    // a batch OMITTING a parent column forces that column nullable too
    val p2 = freshDir()
    Snapshots.append(Seq((1L, "a")).toDF("id", "name")
      .select(col("id"), coalesce(col("name"), lit("x")).as("name")), p2)
    Snapshots.append(Seq(Tuple1(2L)).toDF("id"), p2)
    val s2 = org.apache.spark.sql.types.DataType
      .fromJson(Snapshots.snapshotAt(spark, p2).get.schemaJson.get)
      .asInstanceOf[StructType]
    s2("name").nullable shouldBe true
    spark.read.format("graft-snapshot").load(p2)
      .where(col("name").isNull).count() shouldBe 1L
  }

  test("a user .schema(...) disagreeing with the manifest fails typed at " +
      "scan build; an agreeing one reads fine") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 5), p)
    val wrong = StructType(Seq(StructField("id", LongType),
      StructField("typo", StringType), StructField("v", DoubleType)))
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft-snapshot").schema(wrong).load(p).collect()
    }
    e.getMessage should include("does not match the table schema")
    val right = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType), StructField("v", DoubleType)))
    spark.read.format("graft-snapshot").schema(right).load(p)
      .count() shouldBe 5L
  }

  // ------------------------------------------- V2 overwrite keeps the layout

  test("V2 mode(overwrite) inherits the table's partition layout instead " +
      "of silently stripping it") {
    val p = freshDir()
    Snapshots.append(
      tbl(1 to 10).withColumn("part", (col("id") % 2).cast("string")),
      p, Seq("part"))
    Snapshots.tablePartitionBy(spark, p) shouldBe Seq("part")
    tbl(11 to 16).withColumn("part", (col("id") % 2).cast("string"))
      .write.format("graft-snapshot").mode("overwrite").save(p)
    // layout survived the catalog-writer overwrite
    Snapshots.tablePartitionBy(spark, p) shouldBe Seq("part")
    val m = Snapshots.snapshotAt(spark, p).get
    // exact partition values recorded for every new file → pruning lives
    m.files.foreach { f =>
      m.stats(f).parts.keySet shouldBe Set("part")
    }
    Snapshots.read(spark, p).count() shouldBe 6L
  }

  // ------------------------------------------- unknown-bytes admission

  test("maxBytesPerTrigger treats unknown (zero) recorded sizes as " +
      "over-budget: one such version per trigger") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 5), p)
    Snapshots.append(tbl(6 to 9), p)
    Snapshots.append(tbl(10 to 12), p)
    // simulate a pre-bytes manifest: zero out the recorded sizes of v1/v2
    Seq(1L, 2L).foreach { v =>
      val f = new java.io.File(
        s"$p/_graft_log/v${"%012d".format(v)}.json")
      val txt = scala.io.Source.fromFile(f).mkString
      val out = new java.io.FileWriter(f)
      out.write(txt.replaceAll(""""bytes":\d+""", "\"bytes\":0"))
      out.close()
    }
    val stream = new graft.sources.SnapshotMicroBatchStream(
      p, StructType(Seq(StructField("id", LongType))), 1L,
      maxBytesPerTrigger = Some(1L << 30))
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val o0 = stream.initialOffset()
    // v1 has unknown sizes: admitted alone despite the 1 GiB budget
    val o1 = stream.latestOffset(o0, ReadLimit.allAvailable())
    o1.json.trim.toLong shouldBe 1L
    // v2 likewise
    val o2 = stream.latestOffset(o1, ReadLimit.allAvailable())
    o2.json.trim.toLong shouldBe 2L
    // v3 has real sizes under budget: admitted normally
    val o3 = stream.latestOffset(o2, ReadLimit.allAvailable())
    o3.json.trim.toLong shouldBe 3L
  }

  test("reads stay correct when live vectors span MULTIPLE delete-dv " +
      "datasets (regression: multi-root dv read)") {
    val p = freshDir()
    // two files, then two deleteMor commits each touching a DIFFERENT
    // file: the live snapshot references two independent vector
    // datasets — one multi-root spark.read over them used to trip
    // CONFLICTING_DIRECTORY_STRUCTURES and brick every read
    Snapshots.append(tbl(1 to 50).repartitionByRange(2, col("id")), p)
    Snapshots.deleteMor(spark, p, col("id") === 3L)
    Snapshots.deleteMor(spark, p, col("id") === 40L)
    val m = Snapshots.snapshotAt(spark, p).get
    m.dvs.values.map(_.path).toSet.size shouldBe 2
    val expect = (1L to 50L).filterNot(Set(3L, 40L))
    Snapshots.read(spark, p).select("id")
      .as[Long].collect().sorted shouldBe expect
    spark.read.format("graft-snapshot").load(p).select("id")
      .as[Long].collect().sorted shouldBe expect
    // CoW on the mixed-dataset table composes too
    Snapshots.delete(spark, p, col("id") === 10L)
    Snapshots.read(spark, p).count() shouldBe 47L
  }

  // ------------------------------------------- vacuum dv per-file counting

  test("vacuum counts the parquet files inside a reclaimed dv dataset, " +
      "not the directory") {
    val p = freshDir()
    Snapshots.append(tbl(1 to 100).repartition(2), p)
    Snapshots.deleteMor(spark, p, col("id") <= 10L)
    val mDv = Snapshots.snapshotAt(spark, p).get
    mDv.dvs should not be empty
    val dvFiles = mDv.dvs.values.map(_.path).toSet.toSeq.map { d: String =>
      def count(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(count).sum
        else if (f.getName.endsWith(".parquet")) 1L else 0L
      count(new java.io.File(s"$p/$d"))
    }.sum
    dvFiles should be >= 1L
    // materialize the vectors (CoW) then vacuum everything older
    Snapshots.optimize(spark, p, 1)
    val latest = Snapshots.latestVersion(spark, p)
    val reclaimed = Snapshots.vacuum(spark, p, latest, graceMs = 0L)
    // v1 wrote 2 data files; the dv dataset contributes its parquet
    // files (not "1 per directory") — the metric is per-file everywhere
    reclaimed shouldBe (2L + dvFiles)
    Snapshots.read(spark, p).count() shouldBe 90L
  }
}
