package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Output-file compaction planning — the small-files problem at 100 TB.
  *
  * A long-running ingest (hourly streaming flushes, per-partition
  * writers) leaves millions of kilobyte-scale files whose per-file open/
  * footer cost dominates scans. Compaction rewrites them into
  * ~`targetBytes` objects; the PLAN (which files group into which output
  * bin) is what this operator computes, over the file LISTING — metadata
  * rows (path, bytes), orders of magnitude smaller than the data, so the
  * global sort below is one tiny range exchange, not a data shuffle.
  *
  * Bin assignment is the deterministic cumulative-offset rule: order
  * files by (bytes DESC, path) — the first-fit-DECREASING flavor, so
  * large files seed bins and small files fill tails — take the running
  * byte sum, and a file joins bin `floor(start_offset / targetBytes)`
  * where `start_offset` is the cumulative sum BEFORE the file. Properties
  * (law-tested):
  *   - never splits a file;
  *   - every bin except possibly the last holds >= targetBytes only if a
  *     single member overflows it: payload < targetBytes + max member;
  *   - bin ids are dense 0..N and the assignment is total-order
  *     deterministic (same listing → same plan, any partitioning).
  */
object Compaction {

  def compactionPlan(files: DataFrame, pathCol: String, bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val w = Window.orderBy(col(bytesCol).desc, col(pathCol))
    files
      .withColumn("_cum", sum(col(bytesCol)).over(w))
      // pure integer division — no IEEE step an external engine could
      // round differently
      .withColumn("bin",
        expr(s"CAST((_cum - $bytesCol) DIV $targetBytes AS LONG)"))
      .drop("_cum")
  }
}
