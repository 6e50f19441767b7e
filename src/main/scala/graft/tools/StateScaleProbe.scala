package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** State-store provider A/B at MB state scale (round-13 verdict task 5).
  *
  * The round-12 RocksDB decision ("default HDFS-backed provider wins")
  * was recorded from gate rows whose state is a few KB. The 100 TB
  * serving claim needs the crossover pinned: this probe drives the
  * changelog-latest stateful aggregation (the CDC-mirror serving shape)
  * with 10⁵ and 10⁶ distinct keys — ~5 MB and ~50 MB of live state —
  * through BOTH providers, asserts result identity, and records wall
  * times per batch. Run:
  * {{{ sbt "runMain graft.tools.StateScaleProbe [nKeys ...]" }}}
  */
object StateScaleProbe {
  def main(args: Array[String]): Unit = {
    val keyCounts: Seq[Int] =
      if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(100000, 1000000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.streaming.minBatchesToRetain", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val RocksDb = "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider"
    val Hdfs = "org.apache.spark.sql.execution.streaming.state." +
      "HDFSBackedStateStoreProvider"

    /** One run: three micro-batches of per-key changes (full key sweep,
      * half-sweep of updates, 10% deletes) through changelogLatestStream
      * in complete mode — live state is one row per key. Returns
      * (result checksum, per-batch seconds). */
    def once(nKeys: Int, provider: String,
        label: String): (Long, Seq[Double]) = {
      val prev = spark.conf.getOption(
        "spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        provider)
      try {
        val ms = MemoryStream[(Long, Long, String, Double)]
        val out = graft.streaming.StreamingOps.changelogLatestStream(
          ms.toDF.toDF("k", "ts", "op", "v"), Seq("k"), "ts", "op")
        val sink = s"state_scale_$label"
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("complete").start()
        val times = scala.collection.mutable.ArrayBuffer.empty[Double]
        def feed(rows: Seq[(Long, Long, String, Double)]): Unit = {
          val t0 = System.nanoTime()
          ms.addData(rows); q.processAllAvailable()
          times += (System.nanoTime() - t0) / 1e9
        }
        try {
          feed((0 until nKeys).map(i =>
            (i.toLong, 1L, "I", i * 1.0)))
          feed((0 until nKeys by 2).map(i =>
            (i.toLong, 2L, "U", i * 2.0)))
          feed((0 until nKeys by 10).map(i =>
            (i.toLong, 3L, "D", 0.0)))
          val checksum = spark.table(sink)
            .select(sum(hash(col("k"), col("op"), col("v"))
              .cast("long")).as("c")).head().getLong(0)
          (checksum, times.toSeq)
        } finally {
          q.stop()
          spark.sql(s"DROP VIEW IF EXISTS $sink")
        }
      } finally prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }

    // JIT / codegen warm-up, uncounted
    once(1000, Hdfs, "warm_h"); once(1000, RocksDb, "warm_r")
    keyCounts.foreach { n =>
      val (ch, th) = once(n, Hdfs, s"hdfs_$n")
      val (cr, tr) = once(n, RocksDb, s"rocks_$n")
      val same = if (ch == cr) "IDENTICAL" else "***DIVERGED***"
      println(f"[statescale] keys=$n result=$same " +
        f"hdfs=${th.map(t => f"$t%.2f").mkString("/")} " +
        f"rocksdb=${tr.map(t => f"$t%.2f").mkString("/")} " +
        f"total hdfs=${th.sum}%.2f rocksdb=${tr.sum}%.2f")
    }
    spark.stop()
  }
}
