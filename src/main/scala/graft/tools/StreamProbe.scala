package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level profiler for the stream-stream join rows (the bench's
  * costliest streaming tier): splits q_stream_join's wall time into
  * driver prep (collect+sort feed), stream start, each feeding round's
  * micro-batch cycle, and stop — and A/Bs the watermark (the state-
  * eviction knob): 30 d (keep everything) vs 2×band (evict aggressively;
  * safe for the sorted two-batch feed because any cross-batch match is
  * within band of the boundary, so its state is younger than 2×band
  * when probed). Run:
  * {{{ SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.StreamProbe" }}}
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    def once(watermarkMs: Long, label: String): Long = {
      val t = new scala.collection.mutable.ArrayBuffer[(String, Double)]
      def phase[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        t += name -> (System.nanoTime() - t0) / 1e9; r
      }
      val ev = graft.SparkEntry.readEvents(spark, sfDir)
      val (views, clicks) = phase("prep") {
        (ev.where(col("event_type") === "view")
           .select(col("event_id"), col("user_id"), col("ts"))
           .as[(Long, Long, java.sql.Timestamp)].collect().sortBy(_._3.getTime),
         ev.where(col("event_type") === "click")
           .select(col("user_id"), col("ts"), col("value"))
           .as[(Long, java.sql.Timestamp, Double)].collect().sortBy(_._2.getTime))
      }
      val msV = MemoryStream[(Long, Long, java.sql.Timestamp)]
      val msC = MemoryStream[(Long, java.sql.Timestamp, Double)]
      val joined = graft.streaming.StreamingOps.joinStreamsWithin(
        msV.toDF.toDF("event_id", "user_id", "ts"),
        msC.toDF.toDF("user_id", "cts", "click_value"),
        Seq("user_id"), "ts", "cts",
        bandMs = 30L * 60 * 1000, watermarkMs = watermarkMs)
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val sink = s"probe_$label"
      val q = phase("start") {
        joined.writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
      }
      try {
        val vb = views.grouped(math.max(1, views.length / 2 + 1)).toSeq
        val cb = clicks.grouped(math.max(1, clicks.length / 2 + 1)).toSeq
        (0 until math.max(vb.length, cb.length)).foreach { i =>
          phase(s"round$i") {
            if (i < vb.length) msV.addData(vb(i))
            if (i < cb.length) msC.addData(cb(i))
            q.processAllAvailable()
          }
        }
      } finally {
        phase("stop") { q.stop() }
        spark.conf.set("spark.sql.shuffle.partitions", prev)
      }
      val n = spark.table(sink).count()
      println(f"[$label] rows=$n  " +
        t.map { case (k, v) => f"$k=$v%.2fs" }.mkString("  ") +
        f"  total=${t.map(_._2).sum}%.2fs")
      n
    }

    // JIT/plan warm-up pass (uncounted), then measure each variant twice
    once(30L * 24 * 3600 * 1000, "warmup")
    val a1 = once(30L * 24 * 3600 * 1000, "wm30d_a")
    val b1 = once(2L * 30 * 60 * 1000, "wm1h_a")
    // no-data micro-batches (watermark-only cycles) are output-neutral
    // for an INNER stream-stream join — they exist to advance state
    // cleanup and outer-join null emission; count their cost
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val c1 = once(30L * 24 * 3600 * 1000, "noDataOff_a")
    val c2 = once(30L * 24 * 3600 * 1000, "noDataOff_b")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    val a2 = once(30L * 24 * 3600 * 1000, "wm30d_b")
    val b2 = once(2L * 30 * 60 * 1000, "wm1h_b")
    println(s"row-count equal across variants: ${
      Set(a1, b1, c1, c2, a2, b2).size == 1}")
    spark.stop()
  }
}
