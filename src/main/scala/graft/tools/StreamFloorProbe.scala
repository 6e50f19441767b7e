package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming-tier FIXED-COST breakdown (round-14 verdict task 5): the
  * 23 stream rows cost ~2.4 s/row on a quiet machine — this pins what
  * fraction of the representative outer-join row
  * (`q_stream_join_outer`) is irreducible machinery (query start/stop,
  * per-batch planning/WAL/state-commit overhead) vs per-row join work.
  *
  * Instrumentation: wall-clock phases (prep / start / feeding rounds /
  * sentinels / stop) around the row's exact body, plus a
  * StreamingQueryListener capturing every micro-batch's durationMs map
  * (triggerExecution, queryPlanning, walCommit, stateCommit via
  * addBatch, ...) and numInputRows — the per-batch decomposition the
  * wall phases can't see. Bench-only code: the gate row itself stays
  * uninstrumented. Run:
  * {{{ SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.StreamFloorProbe" }}}
  */
object StreamFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.minBatchesToRetain", "2")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "600s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val batches =
      new scala.collection.mutable.ArrayBuffer[(Long, Long, Map[String, Long])]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        batches.synchronized {
          import scala.jdk.CollectionConverters._
          batches += ((e.progress.batchId, e.progress.numInputRows,
            e.progress.durationMs.asScala
              .map { case (k, v) => k -> v.longValue() }.toMap))
        }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    def once(label: String, report: Boolean): Unit = {
      batches.synchronized(batches.clear())
      val t = new scala.collection.mutable.ArrayBuffer[(String, Double)]
      def phase[A](name: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        t += name -> (System.nanoTime() - t0) / 1e9; r
      }
      val wall0 = System.nanoTime()
      // ---- the exact q_stream_join_outer body, phase-timed ----
      val ev = graft.SparkEntry.readEvents(spark, sfDir)
      val (views, clicks) = phase("prep") {
        (ev.where(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts"))
          .as[(Long, Long, java.sql.Timestamp)].collect()
          .sortBy(_._3.getTime),
          ev.where(col("event_type") === "click")
            .select(col("user_id"), col("ts"), col("value"))
            .as[(Long, java.sql.Timestamp, Double)].collect()
            .sortBy(_._2.getTime))
      }
      val maxTs = math.max(views.last._3.getTime, clicks.last._2.getTime)
      val sentinelTs =
        new java.sql.Timestamp(maxTs + 365L * 24 * 3600 * 1000)
      val msV = MemoryStream[(Long, Long, java.sql.Timestamp)]
      val msC = MemoryStream[(Long, java.sql.Timestamp, Double)]
      val joined = graft.streaming.StreamingOps.joinStreamsWithin(
        msV.toDF.toDF("event_id", "user_id", "ts"),
        msC.toDF.toDF("user_id", "cts", "click_value"),
        Seq("user_id"), "ts", "cts",
        bandMs = 30L * 60 * 1000, watermarkMs = 2L * 3600 * 1000,
        joinType = "left_outer")
      val sink = s"floor_$label"
      val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val prevNoData =
        spark.conf.get("spark.sql.streaming.noDataMicroBatches.enabled",
          "true")
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
        "false")
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
        val sentinel2 = new java.sql.Timestamp(
          sentinelTs.getTime + 365L * 24 * 3600 * 1000)
        phase("sentinel1") {
          msV.addData(Seq((-1L, -1L, sentinelTs)))
          msC.addData(Seq((-1L, sentinelTs, 0.0)))
          q.processAllAvailable()
        }
        phase("sentinel2") {
          msV.addData(Seq((-1L, -1L, sentinel2)))
          msC.addData(Seq((-1L, sentinel2, 0.0)))
          q.processAllAvailable()
        }
      } finally {
        phase("stop") { q.stop() }
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
          prevNoData)
      }
      val rows = spark.table(sink).where(col("event_id") =!= -1L).count()
      val wall = (System.nanoTime() - wall0) / 1e9
      if (report) {
        println(f"[floor:$label] rows=$rows wall=$wall%.2fs  " +
          t.map { case (k, v) => f"$k=$v%.2fs" }.mkString("  "))
        val bs = batches.synchronized(batches.toSeq.sortBy(_._1))
        val trig = bs.map(_._3.getOrElse("triggerExecution", 0L)).sum
        println(f"[floor:$label] batches=${bs.size} " +
          f"sum(triggerExecution)=${trig / 1000.0}%.2fs " +
          f"outside-batch wall=${wall - trig / 1000.0}%.2fs")
        bs.foreach { case (id, nin, d) =>
          val keys = Seq("triggerExecution", "queryPlanning", "getBatch",
            "latestOffset", "walCommit", "commitOffsets", "addBatch")
          println(s"[floor:$label]   batch=$id rows=$nin " +
            keys.flatMap(k => d.get(k).map(v => s"$k=${v}ms"))
              .mkString(" "))
        }
      }
      spark.sql(s"DROP VIEW IF EXISTS $sink")
    }

    once("warmup", report = false)
    once("a", report = true)
    once("b", report = true)
    spark.streams.removeListener(listener)
    spark.stop()
  }
}
