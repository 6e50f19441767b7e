package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r14 optimization probe: where does a snapshot COMMIT's wall time go?
  * Times Snapshots.append / delete / overwrite on the sf events table
  * and, separately, the two Spark jobs inside a commit (the data write
  * and the stats read-back) by running the same shapes standalone.
  * Read-only scratch work under java.io.tmpdir. */
object CommitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.SparkEntry.readEvents(spark, sfDir)
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-34s ${(System.nanoTime() - t0) / 1e9}%6.3f s"); r
    }
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_commitprobe"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    // warm the plan shapes once
    ev.write.mode("overwrite").parquet(s"$root/warm")
    spark.read.parquet(s"$root/warm").groupBy(input_file_name())
      .agg(count(lit(1)), min("event_id"), max("event_id"),
        min("value"), max("value"), min("event_type"), max("event_type"),
        min(unix_micros(col("ts"))), max(unix_micros(col("ts"))),
        min("user_id"), max("user_id")).collect()
    (1 to 3).foreach { i =>
      t(s"append #$i (full commit)") {
        graft.ops.Snapshots.append(ev, s"$root/st")
      }
    }
    // standalone: the bare data write job
    (1 to 2).foreach { i =>
      t(s"bare parquet write #$i") {
        ev.write.mode("overwrite").parquet(s"$root/bare$i")
      }
    }
    // standalone: the stats read-back job shape (what computeStats runs)
    (1 to 2).foreach { i =>
      t(s"stats pass #$i (groupBy input_file)") {
        spark.read.parquet(s"$root/bare1").groupBy(input_file_name())
          .agg(count(lit(1)), min("event_id"), max("event_id"),
            min("value"), max("value"), min("event_type"), max("event_type"),
            min(unix_micros(col("ts"))), max(unix_micros(col("ts"))),
            min("user_id"), max("user_id")).collect()
      }
    }
    t("delete (CoW, rewrite)") {
      graft.ops.Snapshots.delete(spark, s"$root/st",
        col("event_type") === "view" && col("event_id") < 2000L)
    }
    t("overwrite") {
      graft.ops.Snapshots.overwrite(ev.limit(1000), s"$root/st")
    }
    spark.stop()
  }
}
