package graft.tools

import graft.ops.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-smoke for the snapshot-store tier: times ingest, a fixed-width
  * stats-pruned key-band scan, merge/delete/update of a fixed-size
  * batch, and optimize at 1× (sf0.1 events) and a synthetic 10×, to pin
  * which costs scale with TABLE size and which with BATCH size. The
  * design claim under test: scanWhere and the copy-on-write rewrites
  * are BATCH-proportional (file pruning bounds them), only optimize is
  * table-proportional. Run:
  * {{{ sbt "runMain graft.tools.SnapshotProbe [sfDir]" }}}
  */
object SnapshotProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def rmrf(p: String): Unit = graft.SparkEntry.deleteRecursively(p)

    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
    val n1 = ev.count()

    /** 10×: nine shifted copies + the original — same distribution,
      * disjoint key ranges, so file stats stay as selective as 1×. */
    def scale10(df: DataFrame): DataFrame =
      (0 until 10).map(i => df.select(
        (col("event_id") + lit(i * 10L * n1)).as("event_id"),
        col("user_id"), col("event_type"), col("value")))
        .reduce(_ unionByName _)

    def probe(tag: String, data: DataFrame, n: Long): Unit = {
      val p = s"/tmp/graft_snapprobe_$tag"
      rmrf(p)
      // ingest: 8 range-clustered appends (the nightly-commit shape)
      val ingest = time {
        (0 until 8).foreach { i =>
          Snapshots.append(data.where(col("event_id") % 8 === i)
            .repartitionByRange(8, col("event_id")), p)
        }
      }
      // fixed-width key band INSIDE the dense copy-0 key range: scale10
      // shifts copies by i*10*n1, leaving 9*n1-wide GAPS — a band at n/2
      // would fall in a gap at 10x and every row-level op below would
      // measure a no-op on an empty region
      val lo = math.min(n, n1) / 2
      val band = time {
        Snapshots.scanWhere(spark, p,
          col("event_id") >= lo && col("event_id") < lo + 1000L)
          .write.format("noop").mode("overwrite").save()
      }
      val bandFiles = Snapshots.scanWhere(spark, p,
        col("event_id") >= lo && col("event_id") < lo + 1000L)
        .inputFiles.length
      val totFiles = Snapshots.read(spark, p).inputFiles.length
      // fixed-size update batch (1000 keys in one band)
      val updates = data.where(col("event_id") >= lo &&
          col("event_id") < lo + 1000L)
        .withColumn("value", col("value") * 2)
      val mergeT = time(Snapshots.merge(spark, p, updates, Seq("event_id")))
      val updT = time(Snapshots.update(spark, p,
        col("event_id") >= lo && col("event_id") < lo + 500L,
        Map("value" -> (col("value") + 1))))
      val delT = time(Snapshots.delete(spark, p,
        col("event_id") >= lo && col("event_id") < lo + 250L))
      // optimize IS table-proportional — the one full rewrite
      val optT = time(Snapshots.optimize(spark, p, numFiles = 16))
      println(f"[snapprobe] $tag n=$n files=$totFiles band_files=$bandFiles " +
        f"ingest=$ingest%.2f band_scan=$band%.2f merge=$mergeT%.2f " +
        f"update=$updT%.2f delete=$delT%.2f optimize=$optT%.2f")
      rmrf(p)
    }

    /** Partitioned-commit twin (round 9): the dynamic partitionBy write
      * + partition-pinned IN scan at 1× and 10×. The claims: ingest is
      * linear in batch rows (one distributed write, one stats pass),
      * and the two-of-five-types scan stays proportional to the
      * SELECTED partitions' bytes, not table size. */
    def probePart(tag: String, data: DataFrame, n: Long): Unit = {
      val p = s"/tmp/graft_snapprobe_pt_$tag"
      rmrf(p)
      val ingest = time {
        Snapshots.append(data, p, partitionBy = Seq("event_type"))
      }
      val scanT = time {
        Snapshots.scanWhere(spark, p,
          col("event_type").isin("click", "view"))
          .write.format("noop").mode("overwrite").save()
      }
      val selFiles = Snapshots.scanWhere(spark, p,
        col("event_type").isin("click", "view")).inputFiles.length
      val totFiles = Snapshots.read(spark, p).inputFiles.length
      println(f"[snapprobe] part_$tag n=$n files=$totFiles " +
        f"sel_files=$selFiles ingest=$ingest%.2f part_scan=$scanT%.2f")
      rmrf(p)
    }

    /** Merge-on-read twin (round 9): deleteMor of a fixed 1000-key band
      * + the vectored full read at 1× and 10×. The claims: the vector
      * write is BATCH-proportional (stats pre-prune + positions of the
      * matched rows only — never a file rewrite), and the reader's
      * anti-join overhead tracks the VECTOR size, not table size. */
    def probeDv(tag: String, data: DataFrame, n: Long): Unit = {
      val p = s"/tmp/graft_snapprobe_dv_$tag"
      rmrf(p)
      (0 until 8).foreach { i =>
        Snapshots.append(data.where(col("event_id") % 8 === i)
          .repartitionByRange(8, col("event_id")), p)
      }
      // band inside the dense copy-0 range (see probe's lo comment)
      val lo = math.min(n, n1) / 2
      val morT = time(Snapshots.deleteMor(spark, p,
        col("event_id") >= lo && col("event_id") < lo + 1000L))
      val readT = time {
        Snapshots.read(spark, p)
          .write.format("noop").mode("overwrite").save()
      }
      val cowRef = time(Snapshots.delete(spark, p,
        col("event_id") >= lo + 2000L && col("event_id") < lo + 3000L))
      // replaceWhere of the same-width band: the backfill idiom must be
      // region-proportional (delete-shaped planning + the batch write)
      val replT = time(Snapshots.replaceWhere(spark, p,
        col("event_id") >= lo + 4000L && col("event_id") < lo + 5000L,
        data.where(col("event_id") >= lo + 4000L &&
            col("event_id") < lo + 5000L)
          .withColumn("value", col("value") * 2)))
      // constraint-validated append of a fixed 1000-row batch: the
      // validation pass reads ONLY the new files — overhead must be
      // batch-proportional, independent of table size
      Snapshots.addConstraint(spark, p, "val_bound", "value IS NOT NULL")
      val consT = time(Snapshots.append(
        data.where(col("event_id") < 1000L), p))
      println(f"[snapprobe] dv_$tag n=$n delete_mor=$morT%.2f " +
        f"vectored_read=$readT%.2f cow_delete_ref=$cowRef%.2f " +
        f"replace_where=$replT%.2f constrained_append=$consT%.2f")
      rmrf(p)
    }

    /** Accumulated-vector scenario (round 10): 50 deleteMor commits
      * until vectors cover ~30% of the table's rows across its files —
      * measure the vectored full-read tax as coverage accumulates, then
      * materializeDeletes and measure again. The claims: the read tax
      * tracks VECTOR size (bounded, and reclaimed in full by the
      * materialization), and the materialization itself is
      * hot-file-proportional. */
    def probeDvAccum(tag: String, data: DataFrame, n: Long): Unit = {
      val p = s"/tmp/graft_snapprobe_dva_$tag"
      rmrf(p)
      (0 until 8).foreach { i =>
        Snapshots.append(data.where(col("event_id") % 8 === i)
          .repartitionByRange(8, col("event_id")), p)
      }
      val base = time {
        Snapshots.read(spark, p)
          .write.format("noop").mode("overwrite").save()
      }
      // 50 commits, each vectoring a disjoint ~0.6% id band → ~30%
      val step = math.max(1L, n * 6L / 1000L)
      val morTot = time {
        (0 until 50).foreach { i =>
          Snapshots.deleteMor(spark, p,
            col("event_id") >= i * 2 * step &&
              col("event_id") < i * 2 * step + step)
        }
      }
      val m = Snapshots.snapshotAt(spark, p).get
      val covered = m.dvs.values.map(_.n).sum
      val taxed = time {
        Snapshots.read(spark, p)
          .write.format("noop").mode("overwrite").save()
      }
      val matT = time(Snapshots.materializeDeletes(spark, p, 0.0))
      val after = time {
        Snapshots.read(spark, p)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"[snapprobe] dva_$tag n=$n covered=$covered " +
        f"base_read=$base%.2f mor_50x=$morTot%.2f " +
        f"taxed_read=$taxed%.2f materialize=$matT%.2f " +
        f"post_read=$after%.2f")
      rmrf(p)
    }

    /** Change-feed scenario (round 10): 8 appends + one deleteMor, then
      * the row-level feed read and the mirror fold at 1× and 10×. The
      * claims: the feed reads exactly the changed files (here the whole
      * history — worst case ≈ one table read), and the applyChangeFeed
      * fold is ONE key-shuffle over state+changes — both ~linear in
      * rows, never super-linear. */
    def probeCdf(tag: String, data: DataFrame, n: Long): Unit = {
      val p = s"/tmp/graft_snapprobe_cdf_$tag"
      rmrf(p)
      (0 until 8).foreach { i =>
        Snapshots.append(data.where(col("event_id") % 8 === i)
          .repartitionByRange(4, col("event_id")), p)
      }
      val lo = math.min(n, n1) / 2
      Snapshots.deleteMor(spark, p,
        col("event_id") >= lo && col("event_id") < lo + 1000L)
      val latest = Snapshots.latestVersion(spark, p)
      val feedT = time {
        Snapshots.changeFeed(spark, p, 0L, latest)
          .write.format("noop").mode("overwrite").save()
      }
      val foldT = time {
        Snapshots.applyChangeFeed(
          Snapshots.read(spark, p, Some(1L)),
          Snapshots.changeFeed(spark, p, 1L, latest), Seq("event_id"))
          .write.format("noop").mode("overwrite").save()
      }
      println(f"[snapprobe] cdf_$tag n=$n feed_read=$feedT%.2f " +
        f"mirror_fold=$foldT%.2f")
      rmrf(p)
    }

    /** Steady-state mirror apply (round 11): the `mergeChanges` commit
      * itself at 1× and 10× table size with a FIXED-SIZE change batch
      * (1000 upserts + 250 deletes in the dense band). The claim: the
      * apply is O(touched files + batch) — stats pre-pruning bounds
      * the rewrite to the band's files, so the time stays ~flat as the
      * table grows 10× (and the CDC sidecar, ON by default, adds only
      * O(batch) bytes). */
    def probeMergeChanges(tag: String, data: DataFrame, n: Long): Unit = {
      val p = s"/tmp/graft_snapprobe_mc_$tag"
      rmrf(p)
      (0 until 8).foreach { i =>
        Snapshots.append(data.where(col("event_id") % 8 === i)
          .repartitionByRange(8, col("event_id")), p)
      }
      val lo = math.min(n, n1) / 2
      val batch = data
        .where(col("event_id") >= lo && col("event_id") < lo + 1000L)
        .withColumn("value", col("value") * 2)
        .withColumn("_change_type", lit("insert"))
        .unionByName(data
          .where(col("event_id") >= lo + 1000L &&
            col("event_id") < lo + 1250L)
          .withColumn("_change_type", lit("delete")))
        .withColumn("_commit_version", lit(1L))
      val mcT = time(Snapshots.mergeChanges(spark, p, batch,
        Seq("event_id")))
      val m = Snapshots.manifestAt(spark, p,
        Snapshots.latestVersion(spark, p)).get
      val totFiles = Snapshots.read(spark, p).inputFiles.length
      println(f"[snapprobe] mc_$tag n=$n files=$totFiles " +
        f"touched=${m.removes.size} cdc_files=${m.cdc.size} " +
        f"apply=$mcT%.2f")
      rmrf(p)
    }

    /** General MERGE INTO at scale: a fixed-size source against a
      * growing table. Claim: WITHOUT NOT-MATCHED-BY-SOURCE the rewrite
      * is batch-proportional (key-touched files only); the insert-only
      * shape is append-proportional (zero rewrites). */
    def probeMergeInto(tag: String, data: DataFrame, n: Long): Unit = {
      import Snapshots.{mergeSource => ms}
      val p = s"/tmp/graft_snapprobe_gmi_$tag"
      rmrf(p)
      (0 until 8).foreach { i =>
        Snapshots.append(data.where(col("event_id") % 8 === i)
          .repartitionByRange(8, col("event_id")), p)
      }
      val lo = math.min(n, n1) / 2
      val srcDf = data
        .where(col("event_id") >= lo && col("event_id") < lo + 1250L)
        .select(col("event_id"), (col("value") * 2).as("nv"))
      val gmiT = time(Snapshots.mergeInto(spark, p, srcDf,
        Seq("event_id"),
        matched = Seq(
          Snapshots.WhenMatched(Some(ms("nv") > 1.0),
            Snapshots.MergeUpdate(Map("value" -> ms("nv")))),
          Snapshots.WhenMatched(None, Snapshots.MergeDelete))))
      val m = Snapshots.manifestAt(spark, p,
        Snapshots.latestVersion(spark, p)).get
      // insert-only shape: disjoint keys, no rewrite expected
      val insSrc = data
        .where(col("event_id") >= lo && col("event_id") < lo + 1250L)
        .select((col("event_id") + lit(100L * n1 * 10L)).as("event_id"),
          col("user_id"), col("event_type"), col("value"))
      val insT = time(Snapshots.mergeInto(spark, p, insSrc,
        Seq("event_id"),
        notMatched = Seq(Snapshots.WhenNotMatched(None,
          Map("event_id" -> ms("event_id"), "user_id" -> ms("user_id"),
            "event_type" -> ms("event_type"),
            "value" -> ms("value"))))))
      val mi = Snapshots.manifestAt(spark, p,
        Snapshots.latestVersion(spark, p)).get
      // NMBS with a STATS-BOUNDED condition (round 12): the dimension-
      // sync shape — matched band updates, a bounded id-band of
      // target-only rows ages out. Claim: candidate files = matched
      // band + NMBS band (stats-pruned), NOT the whole table; time
      // stays ~flat at 10×.
      val nmbsT = time(Snapshots.mergeInto(spark, p, srcDf,
        Seq("event_id"),
        matched = Seq(Snapshots.WhenMatched(None,
          Snapshots.MergeUpdate(Map("value" -> ms("nv"))))),
        notMatchedBySource = Seq(Snapshots.WhenNotMatchedBySource(
          Some(col("event_id") >= lo + 2000L &&
            col("event_id") < lo + 3000L),
          Snapshots.MergeUpdate(Map("value" -> lit(0.0)))))))
      val mb = Snapshots.manifestAt(spark, p,
        Snapshots.latestVersion(spark, p)).get
      val totF = Snapshots.read(spark, p).inputFiles.length
      println(f"[snapprobe] gmi_$tag n=$n touched=${m.removes.size} " +
        f"merge_into=$gmiT%.2f insert_only=$insT%.2f " +
        f"ins_rewrites=${mi.removes.size} nmbs_bounded=$nmbsT%.2f " +
        f"nmbs_touched=${mb.removes.size} files=$totF")
      rmrf(p)
    }

    /** Bitmap sketch cube at scale: build the per-(type, day-ish) cube
      * and roll it up. Claim: build is one shuffle of SKETCHES (not
      * rows); rollup touches only cube rows. */
    def probeBitmap(tag: String, data: DataFrame, n: Long): Unit = {
      import graft.functions.BitmapExprs._
      val cubeT = time {
        data.groupBy(col("event_type"), (col("event_id") % 64).as("b"))
          .agg(bitmapAgg(col("user_id")).as("s"))
          .write.mode("overwrite")
          .parquet(s"/tmp/graft_bmprobe_$tag")
      }
      val rollT = time {
        spark.read.parquet(s"/tmp/graft_bmprobe_$tag")
          .groupBy("event_type")
          .agg(bitmapCount(bitmapUnionAgg(col("s"))).as("nu"))
          .collect()
      }
      println(f"[snapprobe] bitmap_$tag n=$n cube_build=$cubeT%.2f " +
        f"rollup=$rollT%.2f")
      rmrf(s"/tmp/graft_bmprobe_$tag")
    }

    /** Bloom-skipping probe (round-13 verdict task 4): the store
      * clusters by event_id with blooms on user_id, so user_id min/max
      * spans every file and ONLY the blooms can skip. Claims: a point
      * lookup's files-read tracks the VALUE's occurrence spread (plus
      * the documented ~(2n/65536)² false-positive tax), not table
      * size; an absent value plans ZERO files at any scale; and the
      * Scala scanWhere face and the V2 source face plan the SAME file
      * count (shared pruneFiles → bloomSurvives). */
    def probeBloom(tag: String, data: DataFrame, n: Long,
        bits: Option[Int] = None): Unit = {
      val p = s"/tmp/graft_snapprobe_bl_$tag"
      rmrf(p)
      spark.conf.set(Snapshots.BloomColumnsKey, "user_id")
      bits.foreach(b =>
        spark.conf.set(Snapshots.BloomBitsKey, b.toString))
      try {
        (0 until 8).foreach { i =>
          Snapshots.append(data.where(col("event_id") % 8 === i)
            .repartitionByRange(8, col("event_id")), p)
        }
      } finally {
        spark.conf.unset(Snapshots.BloomColumnsKey)
        bits.foreach(_ => spark.conf.unset(Snapshots.BloomBitsKey))
      }
      val tot = Snapshots.read(spark, p).inputFiles.length
      val u = 77L
      def v2Planned(filters: Array[org.apache.spark.sql.sources.Filter])
          : Int = {
        val schema = spark.read.format("graft-snapshot").load(p).schema
        val sb = new graft.sources.SnapshotScanBuilder(p, schema,
          None, None)
        sb.pushFilters(filters)
        sb.build().asInstanceOf[graft.sources.SnapshotScan]
          .planInputPartitions().length
      }
      val hitScan = Snapshots.scanWhere(spark, p, col("user_id") === u)
      val hitFiles = hitScan.inputFiles.length
      val hitV2 = v2Planned(Array(
        org.apache.spark.sql.sources.EqualTo("user_id", u)))
      val missFiles = Snapshots.scanWhere(spark, p,
        col("user_id") === -1L).inputFiles.length
      val missV2 = v2Planned(Array(
        org.apache.spark.sql.sources.EqualTo("user_id", -1L)))
      // no-false-negative check: the skip-scan finds every row
      val got = hitScan.count()
      val want = data.where(col("user_id") === u).count()
      val scanT = time {
        Snapshots.scanWhere(spark, p, col("user_id") === u)
          .write.format("noop").mode("overwrite").save()
      }
      println(f"[snapprobe] bloom_$tag n=$n files=$tot " +
        f"hit_files=$hitFiles hit_v2=$hitV2 miss_files=$missFiles " +
        f"miss_v2=$missV2 rows=$got/$want point_scan=$scanT%.2f")
      rmrf(p)
    }

    /** Manifest-fold probe at Delta-scale commit counts (round-13
      * verdict task 6): a 5000-commit log (tiny 1-row appends), then
      * time latest-version planning, mid-log time travel, and
      * history(). Claims: planning is checkpoint-interval-bounded
      * (fold ≤ interval manifests + one log listStatus), so it stays
      * FLAT as commits grow; only history() is O(commits) — by
      * definition. Also A/Bs the r13 checkpointInterval knob (100 vs
      * the default 10) for commit-throughput vs fold-length. */
    def probeLog(nCommits: Int, interval: Option[Long]): Unit = {
      val tag = s"${nCommits}_i${interval.getOrElse(10L)}"
      val p = s"/tmp/graft_snapprobe_log_$tag"
      rmrf(p)
      interval.foreach(i =>
        spark.conf.set(Snapshots.CheckpointIntervalKey, i.toString))
      try {
        val one = spark.range(1).selectExpr("id as event_id",
          "id as user_id", "'probe' as event_type", "1.0 as value")
          .coalesce(1).cache()
        one.count()
        val halfT = time {
          (0 until nCommits / 2).foreach(_ => Snapshots.append(one, p))
        }
        val ingest = halfT + time {
          (nCommits / 2 until nCommits).foreach(_ =>
            Snapshots.append(one, p))
        }
        // METADATA-ONLY resolution (what "planning" means): fold from
        // the nearest checkpoint — O(live files + interval), never
        // O(commits). The data scan over the table's (by construction)
        // nCommits one-row files is reported separately: that cost is
        // the table's file count, not the log's length.
        val planLatest = time { Snapshots.snapshotAt(spark, p).get }
        val planMid = time {
          Snapshots.snapshotAt(spark, p, Some(nCommits / 2L)).get }
        val scanT = time {
          Snapshots.read(spark, p).write.format("noop")
            .mode("overwrite").save()
        }
        val histT = time { Snapshots.history(spark, p).count() }
        one.unpersist()
        println(f"[snapprobe] log_$tag commits=$nCommits " +
          f"ingest=$ingest%.1f (${ingest * 1000 / nCommits}%.0f ms/commit, " +
          f"first-half ${halfT * 2000 / nCommits}%.0f) " +
          f"resolve_latest=$planLatest%.3f resolve_mid=$planMid%.3f " +
          f"scan=$scanT%.2f history=$histT%.2f")
      } finally {
        interval.foreach(_ =>
          spark.conf.unset(Snapshots.CheckpointIntervalKey))
        rmrf(p)
      }
    }

    // probe selection: no extra arg = the standard 1x/10x suite;
    // "bloom" = bloom probes only; "log" = the (slow) log-scale probes
    val mode = if (args.length > 1) args(1) else "all"
    if (mode == "all") {
      // JIT/codegen warm-up at tiny scale, uncounted
      probe("warm",
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .select(col("event_id"), col("user_id"), col("event_type"),
            col("value")), 1000L)
      probe("x1", ev, n1)
      probe("x10", scale10(ev), n1 * 10)
      probePart("x1", ev, n1)
      probePart("x10", scale10(ev), n1 * 10)
      probeDv("x1", ev, n1)
      probeDv("x10", scale10(ev), n1 * 10)
      probeDvAccum("x1", ev, n1)
      probeDvAccum("x10", scale10(ev), n1 * 10)
      probeCdf("x1", ev, n1)
      probeCdf("x10", scale10(ev), n1 * 10)
      probeMergeChanges("x1", ev, n1)
      probeMergeChanges("x10", scale10(ev), n1 * 10)
      probeMergeInto("x1", ev, n1)
      probeMergeInto("x10", scale10(ev), n1 * 10)
      probeBitmap("x1", ev, n1)
      probeBitmap("x10", scale10(ev), n1 * 10)
    }
    if (mode == "all" || mode == "bloom") {
      probeBloom("x1", ev, n1)
      // bloom x10 shifts USER ids too: a real 10x corpus has 10x more
      // users, each with the same occurrence count — shifting only
      // event_id would give every user 10x the events and no file could
      // ever be skipped (that is corpus growth per key, not table growth)
      val evU10 = (0 until 10).map(i => ev.select(
        (col("event_id") + lit(i * 10L * n1)).as("event_id"),
        (col("user_id") + lit(i * 100000000L)).as("user_id"),
        col("event_type"), col("value"))).reduce(_ unionByName _)
      // default 2^16 saturates at 10x (~14k distinct users/file ->
      // ~12% FP); the r13 bits knob at 2^20 restores the skip ratio
      probeBloom("x10_b16", evU10, n1 * 10)
      probeBloom("x10_b20", evU10, n1 * 10, bits = Some(20))
    }
    // log-scale probes run only when asked (the 5000-commit build is
    // minutes of wall time): `sbt "runMain graft.tools.SnapshotProbe
    // <sfDir> log"`
    if (mode == "log") {
      probeLog(500, None) // reference point
      probeLog(5000, None)
      probeLog(5000, Some(100L))
    }
    spark.stop()
  }
}
