package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** r14 optimization probe: run every q_stream_* gate row under a
  * StreamingQueryListener and report, per row, how many micro-batches
  * actually executed and where their milliseconds went (triggerExecution
  * / addBatch / queryPlanning / walCommit / data vs no-data batches).
  * The streaming tier's cost is batch-count × per-batch state machinery
  * (BENCH_NOTES r13 floor breakdown), so the lever this probe exposes is
  * WHICH rows run avoidable no-data batches. Read-only: uses the gate
  * row functions themselves; results are discarded via noop write. */
object StreamTierProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.minBatchesToRetain", "2")
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "600s")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class B(rows: Long, ms: Map[String, Long])
    val batches = new scala.collection.mutable.ArrayBuffer[B]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        batches.synchronized {
          import scala.jdk.CollectionConverters._
          batches += B(e.progress.numInputRows,
            e.progress.durationMs.asScala
              .map { case (k, v) => k -> v.longValue() }.toMap)
        }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)

    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val rows = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith("q_stream"))
      .filter { case (n, _) => only.forall(_.contains(n)) }
    rows.foreach { case (name, fn) =>
      batches.synchronized(batches.clear())
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(e) =>
        println(s"$name FAILED: ${e.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      // listener events are async; drain before reading
      Thread.sleep(300)
      val bs = batches.synchronized(batches.toVector)
      val nData = bs.count(_.rows > 0)
      val nEmpty = bs.count(_.rows == 0)
      def sumK(k: String) = bs.flatMap(_.ms.get(k)).sum
      val emptyMs = bs.filter(_.rows == 0)
        .flatMap(_.ms.get("triggerExecution")).sum
      println(f"$name%-28s wall=$wall%6.2f batches=${bs.size}%2d " +
        f"(data=$nData empty=$nEmpty) trig=${sumK("triggerExecution")}%5dms " +
        f"addBatch=${sumK("addBatch")}%5dms plan=${sumK("queryPlanning")}%4dms " +
        f"wal=${sumK("walCommit") + sumK("commitOffsets")}%4dms " +
        f"emptyTrig=${emptyMs}%5dms")
    }
    spark.stop()
  }
}
