package graft

import graft.ops.Snapshots
import org.apache.spark.sql.functions._

/** NATIVE streaming sink laws — `writeStream.format("graft-snapshot")`
  * without foreachBatch (the Delta DeltaSink architecture): idempotent
  * per-batch commits keyed (query id, batchId), Append and Complete
  * modes, partitionBy layout creation, Update rejection. */
class SnapshotSinkSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_sink_$tag").toString
    new java.io.File(d).deleteOnExit(); d
  }

  private def ck(tag: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_sinkck_${tag}_" +
      System.nanoTime()

  test("writeStream append: each micro-batch is one idempotent commit; " +
      "restart from the checkpoint does not duplicate") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = freshDir("app")
    val ckDir = ck("app")
    val ms = MemoryStream[(Long, Double)]
    def start() = ms.toDF().toDF("id", "v")
      .writeStream.format("graft-snapshot")
      .option("checkpointLocation", ckDir)
      .outputMode("append")
      .start(p)
    val q = start()
    try {
      ms.addData((1L, 1.0), (2L, 2.0))
      q.processAllAvailable()
      ms.addData((3L, 3.0))
      q.processAllAvailable()
    } finally q.stop()
    Snapshots.read(spark, p).count() shouldBe 3L
    // two batches → two append commits, each txn-marked
    val m = Snapshots.latestManifest(spark, p).get
    m.version shouldBe 2L
    m.op shouldBe "append"
    // restart on the SAME checkpoint: no new data → no duplicate rows
    val q2 = start()
    try { ms.addData((4L, 4.0)); q2.processAllAvailable() }
    finally q2.stop()
    Snapshots.read(spark, p).select("id").as[Long].collect().sorted shouldBe
      Array(1L, 2L, 3L, 4L)
  }

  test("writeStream append replays are no-ops: re-landing an already " +
      "committed batchId keeps the version") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = freshDir("rep")
    val ms = MemoryStream[(Long, Double)]
    val q = ms.toDF().toDF("id", "v")
      .writeStream.format("graft-snapshot")
      .option("checkpointLocation", ck("rep"))
      .start(p)
    try { ms.addData((1L, 1.0)); q.processAllAvailable() }
    finally q.stop()
    val v1 = Snapshots.latestManifest(spark, p).get.version
    // simulate the crash-replay directly against the engine: same
    // (appId, txnId) → no-op (the sink derives appId from the query id)
    val appId = Snapshots.latestManifest(spark, p).get.txns.keys
      .find(_.startsWith("stream-sink:")).get
    Snapshots.appendIdempotent(
      Seq((1L, 1.0)).toDF("id", "v"), p, appId, 0L) shouldBe v1
    Snapshots.read(spark, p).count() shouldBe 1L
  }

  test("writeStream complete: per-batch overwrite mirrors the " +
      "aggregation state") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = freshDir("cmp")
    val ms = MemoryStream[(String, Double)]
    val q = ms.toDF().toDF("k", "v")
      .groupBy("k").agg(sum("v").as("total"))
      .writeStream.format("graft-snapshot")
      .option("checkpointLocation", ck("cmp"))
      .outputMode("complete")
      .start(p)
    try {
      ms.addData(("a", 1.0), ("b", 2.0))
      q.processAllAvailable()
      ms.addData(("a", 10.0))
      q.processAllAvailable()
    } finally q.stop()
    Snapshots.read(spark, p).as[(String, Double)].collect().toMap shouldBe
      Map("a" -> 11.0, "b" -> 2.0)
    Snapshots.latestManifest(spark, p).get.op shouldBe "overwrite"
  }

  test("writeStream partitionBy creates the table layout; appends " +
      "inherit it; a conflicting layout on an existing table rejects") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = freshDir("par")
    val ms = MemoryStream[(Long, String, Double)]
    val q = ms.toDF().toDF("id", "lang", "v")
      .writeStream.format("graft-snapshot")
      .option("checkpointLocation", ck("par"))
      .partitionBy("lang")
      .start(p)
    try {
      ms.addData((1L, "en", 1.0), (2L, "de", 2.0))
      q.processAllAvailable()
    } finally q.stop()
    Snapshots.latestManifest(spark, p).get.partitionBy shouldBe Seq("lang")
    Snapshots.read(spark, p).count() shouldBe 2L
    // partition pruning works on the layout the sink created
    Snapshots.scanWhere(spark, p, col("lang") === "en").count() shouldBe 1L
    val ms2 = MemoryStream[(Long, String, Double)]
    val q2 = ms2.toDF().toDF("id", "lang", "v")
      .writeStream.format("graft-snapshot")
      .option("checkpointLocation", ck("par2"))
      .partitionBy("id")
      .start(p)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      try { ms2.addData((3L, "fr", 3.0)); q2.processAllAvailable() }
      finally q2.stop()
    }
    err.getMessage should include("layout")
  }

  test("writeStream complete WITHOUT partitionBy inherits an existing " +
      "table's layout instead of silently stripping it") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = freshDir("cmpin")
    Snapshots.append(
      Seq(("en", 1.0), ("de", 2.0)).toDF("lang", "total"), p,
      Seq("lang"))
    val ms = MemoryStream[(String, Double)]
    val q = ms.toDF().toDF("lang", "v")
      .groupBy("lang").agg(sum("v").as("total"))
      .writeStream.format("graft-snapshot")
      .option("checkpointLocation", ck("cmpin"))
      .outputMode("complete")
      .start(p)
    try {
      ms.addData(("en", 5.0), ("fr", 7.0))
      q.processAllAvailable()
    } finally q.stop()
    Snapshots.latestManifest(spark, p).get.partitionBy shouldBe
      Seq("lang")
    Snapshots.scanWhere(spark, p, col("lang") === "fr")
      .select("total").as[Double].head() shouldBe 7.0
  }

  test("writeStream update mode rejects typed") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = freshDir("upd")
    val ms = MemoryStream[(String, Double)]
    val e = intercept[Exception] {
      ms.toDF().toDF("k", "v")
        .groupBy("k").agg(sum("v").as("total"))
        .writeStream.format("graft-snapshot")
        .option("checkpointLocation", ck("upd"))
        .outputMode("update")
        .start(p)
    }
    e.getMessage should include("Append and Complete")
  }

  test("sink feeding the streaming SOURCE: native log-to-log pipeline") {
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val p = freshDir("l2l")
    val ms = MemoryStream[(Long, Double)]
    val w = ms.toDF().toDF("id", "v")
      .writeStream.format("graft-snapshot")
      .option("checkpointLocation", ck("l2l"))
      .start(p)
    try {
      ms.addData((1L, 1.0), (2L, 2.0))
      w.processAllAvailable()
      val r = spark.readStream.format("graft-snapshot").load(p)
        .writeStream.format("memory").queryName("sink_l2l")
        .outputMode("append").start()
      try {
        r.processAllAvailable()
        ms.addData((3L, 3.0))
        w.processAllAvailable()
        r.processAllAvailable()
        spark.table("sink_l2l").select("id").as[Long]
          .collect().sorted shouldBe Array(1L, 2L, 3L)
      } finally r.stop()
    } finally w.stop()
  }
}
