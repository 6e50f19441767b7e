package graft

import org.apache.spark.sql.functions._
import graft.ops.Compaction
import graft.text.Sketches

class CompactionSketchSpec extends SparkSpec {
  import spark.implicits._

  test("compactionPlan never splits a file; bins are dense and bounded by " +
      "target + max member") {
    val rnd = new scala.util.Random(5)
    val files = (1 to 300).map(i => (s"f$i%03d", 100L + rnd.nextInt(3000)))
      .toDF("path", "bytes")
    val target = 8192L
    val plan = Compaction.compactionPlan(files, "path", "bytes", target)
    plan.count() shouldBe 300 // one row per file — no splits
    val perBin = plan.groupBy("bin")
      .agg(sum("bytes").as("total"), max("bytes").as("mx"))
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // dense ids 0..N
    perBin.map(_._1).toSeq shouldBe perBin.indices.map(_.toLong)
    // payload bound: a bin holds < target + its largest member
    val maxFile = 100L + 3000L
    all(perBin.map(_._2)) should be < (target + maxFile)
    // all bins except the last reach at least target − one global-max
    // member (the previous bin's last file may overflow into this bin's
    // byte window by up to its own length)
    perBin.dropRight(1).foreach { case (_, total, _) =>
      total should be >= (target - maxFile)
    }
  }

  test("compactionPlan is partitioning-deterministic") {
    val files = (1 to 100).map(i => (s"p$i", (i * 37 % 900 + 10).toLong))
      .toDF("path", "bytes")
    val a = Compaction.compactionPlan(files.repartition(7), "path", "bytes", 2048)
      .as[(String, Long, Long)].collect().toSet
    val b = Compaction.compactionPlan(files.coalesce(1), "path", "bytes", 2048)
      .as[(String, Long, Long)].collect().toSet
    a shouldBe b
  }

  test("compactDirectory: one output file per planned bin, rows survive " +
      "exactly, an already-compact directory is a no-op") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("compact-exec").toString
    val data = (0L until 5000L).map(i => (i, s"payload $i"))
      .toDF("id", "payload")
    data.repartition(24).write.parquet(s"$dir/t")
    def parts() = new java.io.File(s"$dir/t").listFiles
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).sortBy(_.getName)
    parts().length shouldBe 24
    val before = rowSet(spark.read.parquet(s"$dir/t"))
    val sizes = parts().map(_.length)
    // target sized to force a handful of bins out of 24 files
    val target = sizes.sum / 4
    val expectedBins = graft.ops.Compaction.compactionPlan(
      parts().map(f => (f.getName, f.length)).toSeq.toDF("path", "bytes"),
      "path", "bytes", target)
      .agg(max(col("bin"))).head().getLong(0) + 1
    val n = graft.ops.Compaction.compactDirectory(spark, s"$dir/t", target)
    n shouldBe expectedBins
    parts().length shouldBe n // exactly one file per bin
    parts().foreach(_.getName should startWith("compact-"))
    rowSet(spark.read.parquet(s"$dir/t")) shouldBe before // rows identical
    // no hidden temp residue; a second pass with a huge target collapses
    // to one bin, and a third is a no-op
    new java.io.File(s"$dir/t/_graft_compact_tmp").exists() shouldBe false
    graft.ops.Compaction.compactDirectory(spark, s"$dir/t",
      Long.MaxValue) shouldBe 1L
    graft.ops.Compaction.compactDirectory(spark, s"$dir/t",
      Long.MaxValue) shouldBe 0L
    rowSet(spark.read.parquet(s"$dir/t")) shouldBe before
  }

  test("hllKeyOverlap: disjoint keys → ~zero common; identical keys → " +
      "common ≈ either side; union == merged registers") {
    val a = (0L until 500L).map(i => Tuple1(i)).toDF("k")
    val b = (500L until 1000L).map(i => Tuple1(i)).toDF("k")
    val disjoint = Sketches.hllKeyOverlap(a, col("k"), b, col("k"))
      .as[(Double, Double, Double, Double)].head()
    // each side ~500 (±3σ at 2.3% error), intersection near zero
    disjoint._1 shouldBe 500.0 +- 40.0
    disjoint._2 shouldBe 500.0 +- 40.0
    disjoint._3 shouldBe 1000.0 +- 75.0
    disjoint._4 should be < 60.0
    val same = Sketches.hllKeyOverlap(a, col("k"), a, col("k"))
      .as[(Double, Double, Double, Double)].head()
    same._1 shouldBe same._3 // union of identical sets == either sketch
    same._4 shouldBe same._1 // intersection estimate == the set itself
  }

  test("hllKeyOverlap union estimate equals hllDistinct over the " +
      "concatenated key stream (merge == re-sketch, bit-exact)") {
    val a = (0L until 300L).map(i => Tuple1(i)).toDF("k")
    val b = (150L until 450L).map(i => Tuple1(i)).toDF("k")
    val overlap = Sketches.hllKeyOverlap(a, col("k"), b, col("k"))
      .select("est_union_keys").as[Double].head()
    val resketch = Sketches.hllDistinct(
      a.union(b).select(col("k").cast("string").as("k")), col("k"), Nil)
      .select("est_distinct").as[Double].head()
    overlap shouldBe resketch
  }

  test("TableProfile: exact nulls/min/max per column; HLL estimate near " +
      "the true distinct count; two jobs not 2·|cols|") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"), (3L, null),
      (null, "a"), (2L, "c")).toDF("x", "s")
    val out = graft.ops.TableProfile.profile(df, Seq("x", "s"))
      .as[(String, Long, Long, Long, Option[String], Option[String], Double)]
      .collect().map(r => r._1 -> r).toMap
    val (_, nr, nv, nn, mn, mx, est) = out("x")
    (nr, nv, nn, mn, mx) shouldBe ((5L, 4L, 1L, Some("1"), Some("3")))
    est shouldBe 3.0 +- 0.5
    val s = out("s")
    (s._2, s._3, s._4, s._5, s._6) shouldBe
      ((5L, 4L, 1L, Some("a"), Some("c")))
    s._7 shouldBe 3.0 +- 0.5
  }

  test("sampleWeightedK: exact k, deterministic under repartitioning, " +
      "kept sets nested in k, weight bias holds") {
    import graft.text.Sampling
    val df = (1L to 2000L).map(i =>
      (i, if (i % 10 == 0) 8.0 else 0.25)).toDF("id", "w")
    val k200 = Sampling.sampleWeightedK(df, "id", col("w"), 200)
      .as[(Long, Double)].collect().map(_._1).toSet
    k200.size shouldBe 200
    val again = Sampling.sampleWeightedK(df.repartition(13), "id",
      col("w"), 200).as[(Long, Double)].collect().map(_._1).toSet
    again shouldBe k200
    val k100 = Sampling.sampleWeightedK(df, "id", col("w"), 100)
      .as[(Long, Double)].collect().map(_._1).toSet
    k100.subsetOf(k200) shouldBe true
    // 10% of rows carry 32× the weight — they should dominate the draw
    val heavy = k200.count(_ % 10 == 0)
    heavy should be > 120
  }

  test("incrementalAgg: any shard permutation and granularity equals the " +
      "one-shot aggregate") {
    import graft.ops.Incremental
    val rnd = new scala.util.Random(31)
    val rows = (1 to 600).map(i =>
      (s"k${rnd.nextInt(7)}", (rnd.nextInt(10000) / 100.0)))
    val full = rows.toDF("k", "v")
    val oneShot = Incremental.incrementalAgg(Seq(full), Seq("k"), "v")
      .as[(String, Long, Double, Double)].collect().toSet
    val shards3 = rows.grouped(200).map(_.toDF("k", "v")).toSeq
    val shards6 = rows.grouped(100).map(_.toDF("k", "v")).toSeq
    Incremental.incrementalAgg(shards3, Seq("k"), "v")
      .as[(String, Long, Double, Double)].collect().toSet shouldBe oneShot
    Incremental.incrementalAgg(shards3.reverse, Seq("k"), "v")
      .as[(String, Long, Double, Double)].collect().toSet shouldBe oneShot
    Incremental.incrementalAgg(shards6, Seq("k"), "v")
      .as[(String, Long, Double, Double)].collect().toSet shouldBe oneShot
  }

  test("joinStreamsWithin == the batch band join under any micro-batch split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(m: Int) = new java.sql.Timestamp(1700000000000L + m * 60000L)
    val views = (1 to 40).map(i => (i.toLong, (i % 4).toLong, t(i * 7 % 120)))
    val clicks = (1 to 40).map(i => ((i % 4).toLong, t(i * 11 % 120), i.toDouble))
    val batch = {
      val v = views.toDF("event_id", "user_id", "ts")
      val c = clicks.toDF("user_id", "cts", "click_value")
      v.join(c, Seq("user_id"))
        .where(col("cts") >= col("ts") - expr("INTERVAL 15 MINUTES") &&
          col("cts") <= col("ts") + expr("INTERVAL 15 MINUTES"))
        .select("event_id", "user_id", "ts", "cts", "click_value")
        .as[(Long, Long, java.sql.Timestamp, java.sql.Timestamp, Double)]
        .collect().toSet
    }
    for (nSplits <- Seq(1, 3)) {
      val msV = MemoryStream[(Long, Long, java.sql.Timestamp)]
      val msC = MemoryStream[(Long, java.sql.Timestamp, Double)]
      val out = graft.streaming.StreamingOps.joinStreamsWithin(
        msV.toDF.toDF("event_id", "user_id", "ts"),
        msC.toDF.toDF("user_id", "cts", "click_value"),
        Seq("user_id"), "ts", "cts",
        bandMs = 15L * 60 * 1000, watermarkMs = 365L * 24 * 3600 * 1000)
      val sink = s"ssj_$nSplits"
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        val vb = views.grouped(views.length / nSplits + 1).toSeq
        val cb = clicks.grouped(clicks.length / nSplits + 1).toSeq
        (0 until math.max(vb.length, cb.length)).foreach { i =>
          if (i < vb.length) msV.addData(vb(i))
          if (i < cb.length) msC.addData(cb(i))
          q.processAllAvailable()
        }
        spark.table(sink)
          .select("event_id", "user_id", "ts", "cts", "click_value")
          .as[(Long, Long, java.sql.Timestamp, java.sql.Timestamp, Double)]
          .collect().toSet shouldBe batch
      } finally q.stop()
    }
  }
}
