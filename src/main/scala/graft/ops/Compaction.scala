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

  /** EXECUTE a compaction: rewrite one flat parquet directory's small
    * files into [[compactionPlan]]'s bins — the maintenance op the plan
    * exists for.
    *
    * Mechanics (ONE distributed job, not a per-bin loop): the listed
    * files are read as an explicit snapshot, each row maps to its bin
    * via a literal filename→bin map over `input_file_name()` (the
    * listing is per-directory metadata, bounded), one shuffle clusters
    * rows by bin, and `partitionBy("_bin")` writes exactly one file per
    * bin into a hidden `_`-prefixed temp dir (a bin's rows live in one
    * task; hash collisions between bins cost parallelism, never file
    * count). The compacted files then move in as `compact-<bin>-…` and
    * the listed originals are deleted.
    *
    * Crash contract (documented, not transactional): tmp is written
    * fully before anything moves — a crash before move-in leaves the
    * store untouched (the `_` dir is invisible to readers); a crash
    * between move-in and original-deletion leaves BOTH generations
    * (duplicate rows, distinguishable by the `compact-` prefix) — data
    * is never lost. Run under a maintenance window / external lock,
    * like any non-transactional table service. Partitioned stores:
    * compact each leaf directory (this op is per-directory by design;
    * the partition columns live in directory names, not files).
    *
    * Returns the number of compacted output files (0 = nothing to gain:
    * ≤1 file, or the plan has no fewer bins than files). */
  def compactDirectory(spark: org.apache.spark.sql.SparkSession,
      dir: String, targetBytes: Long): Long = {
    import org.apache.hadoop.fs.Path
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val listed = Option(fs.listStatus(root)).getOrElse(Array.empty)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith(".") &&
        s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.getName, s.getLen))
    if (listed.length <= 1) return 0L
    import spark.implicits._
    val plan = compactionPlan(listed.toSeq.toDF("path", "bytes"),
        "path", "bytes", targetBytes)
      .select("path", "bin").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val nBins = plan.map(_._2).max + 1
    if (nBins >= listed.length) return 0L
    val binOf = map(plan.flatMap { case (n, b) =>
      Seq(lit(n), lit(b)) }.toIndexedSeq: _*)
    val tmp = new Path(root, "_graft_compact_tmp")
    fs.delete(tmp, true)
    val withBin = spark.read
      .parquet(listed.map(f => s"$dir/${f._1}").toIndexedSeq: _*)
      .withColumn("_bin", element_at(binOf,
        element_at(split(input_file_name(), "/"), -1)))
    // abort BEFORE any mutation if a row failed to map to its bin (a
    // filename the literal map does not know — e.g. URI-encoding
    // surprises): a null bin would otherwise write into the Hive
    // default-partition dir, which the move loop skips → data loss
    val unmapped = withBin.where(col("_bin").isNull).count()
    require(unmapped == 0L,
      s"compactDirectory: $unmapped rows failed filename→bin mapping; " +
        "aborting before any file is touched")
    withBin
      .repartition(col("_bin"))
      .write.partitionBy("_bin").parquet(tmp.toString)
    // move-in BEFORE deleting originals (crash ⇒ duplicates, never loss)
    // — iterate the bin directories partitionBy ACTUALLY wrote (the
    // plan's bin numbering is not dense: a bytes-desc prefix can skip
    // bin ids, and an all-empty-part bin writes no directory at all;
    // listStatus on a missing path THROWS, it never returns null)
    var moved = 0L
    Option(fs.listStatus(tmp)).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getPath.getName.startsWith("_bin="))
      .foreach { d =>
        val b = d.getPath.getName.stripPrefix("_bin=")
        Option(fs.listStatus(d.getPath)).getOrElse(Array.empty)
          .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
          .foreach { s =>
            val dest = new Path(root, s"compact-$b-${s.getPath.getName}")
            // rename reports failure by RETURNING false on most Hadoop
            // filesystems — a silently-failed move followed by the
            // original deletes below would LOSE that bin's rows
            require(fs.rename(s.getPath, dest),
              s"compactDirectory: rename ${s.getPath} -> $dest failed; " +
                "aborting with originals intact (duplicates, never loss)")
            moved += 1
          }
      }
    listed.foreach { case (name, _) =>
      fs.delete(new Path(root, name), false) }
    fs.delete(tmp, true)
    moved
  }
}
