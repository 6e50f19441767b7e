package graft.tools

import graft.ops.Snapshots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-smoke helper for the round-8 retrieval/fusion additions and
  * the snapshot streaming source (round-8 advice #7). Self-synthesizes
  * its 10× inputs (no external fixture), times each op at 1× and 10×,
  * and measures the checkpoint-fold benefit of the log directly.
  *
  * Laws to check:
  *  - rrfFuse: per-query windows are partitioned by the query key and
  *    depth-cut, the fusion join carries ≤ 2·depth rows/query → linear
  *    in query count.
  *  - marginMine: the two top-k runs are O(src × tgt) brute-force dots
  *    (the documented small-corpus tier) → linear in tgt for fixed src;
  *    everything after the lists is Zipf-small.
  *  - rankingMetrics: one ranking of ONE run (no global window over
  *    corpus-sized data) → linear in run length.
  *  - snapshot streaming/log at ~120 commits: read planning folds the
  *    newest checkpoint + ≤ interval deltas, so resolution cost is
  *    FLAT in commit count; with the checkpoints removed the fold must
  *    walk every delta — the measured gap IS the checkpoint benefit. A
  *    streaming consumer tailing all 120 commits stays batch-
  *    proportional.
  *
  * Run: {{{ sbt "runMain graft.tools.RetrievalScale [sfDir]" }}}
  */
object RetrievalScale {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def t(name: String)(b: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = b
      println(f"RETRSCALE $name ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }

    // ---- rrfFuse: synthetic runs, 1k and 10k queries × 200 candidates
    def run(nq: Long, tag: Int): DataFrame = spark.range(nq * 200)
      .select((col("id") / 200).cast("long").as("query_id"),
        ((col("id") * (31 + tag)) % 100000).cast("long").as("doc_id"),
        (((col("id") * (7 + tag)) % 1000) / 1000.0).as("score"))
    for (nq <- Seq(1000L, 10000L)) {
      val (a, b) = (run(nq, 0), run(nq, 1))
      t(s"rrf_fuse_q$nq") {
        graft.text.Search.rrfFuse(a, b, "doc_id", "score",
          Seq("query_id"), k0 = 60, depth = 60).count()
      }
    }

    // ---- rankingMetrics: one scored run, 100k and 1M rows
    for (n <- Seq(100000L, 1000000L)) {
      val scored = spark.range(n).select(col("id").as("doc_id"),
        (col("id") % 4 + 1).cast("long").as("n_terms"),
        ((col("id") * 13) % 9973 / 9973.0).as("score"))
      t(s"ranking_metrics_n$n") {
        graft.text.Search.rankingMetrics(scored, "doc_id", k = 10,
          relMinTerms = 2).count()
      }
    }

    // ---- marginMine: fixed 50-query src vs 1× and 10× target corpus
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val src = e.where(col("vec_id") < 50)
    val e10 = (0 until 10).map(i => e.select(
        (col("vec_id") + lit(i * 1000000L)).as("vec_id"),
        col("embedding")))
      .reduce(_ unionByName _)
    t("margin_mine_tgt1x") {
      graft.text.Similarity.marginMine(src, e, "vec_id", "embedding",
        k = 4).count()
    }
    t("margin_mine_tgt10x") {
      graft.text.Similarity.marginMine(src, e10, "vec_id", "embedding",
        k = 4).count()
    }

    // ---- snapshot log at ~120 commits: flat planning via checkpoints
    val p = "/tmp/retrscale_snap"
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete()
    }
    deleteRec(new java.io.File(p))
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select("event_id", "user_id", "value")
    (0 until 120).foreach { i =>
      Snapshots.append(
        ev.where(col("event_id") % 120 === i).coalesce(1), p)
    }
    t("snapshot_read_at_v120_with_checkpoints") {
      Snapshots.read(spark, p).count()
    }
    // resolution-only cost (no scan): constructing the read folds the
    // log — repeat 100× so the driver-side fold dominates the timing
    t("snapshot_resolve_x100_with_checkpoints") {
      (0 until 100).foreach(_ => Snapshots.read(spark, p)); 100L
    }
    // remove the derived checkpoints: resolution must now fold every
    // delta manifest — the measured gap is the checkpoint benefit
    val log = new java.io.File(s"$p/_graft_log")
    val cps = Option(log.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.contains("checkpoint"))
    println(s"RETRSCALE removing ${cps.length} checkpoints")
    cps.foreach(_.delete())
    t("snapshot_read_at_v120_no_checkpoints") {
      Snapshots.read(spark, p).count()
    }
    t("snapshot_resolve_x100_no_checkpoints") {
      (0 until 100).foreach(_ => Snapshots.read(spark, p)); 100L
    }
    // streaming consumer tailing all 120 commits in one run
    t("snapshot_stream_tail_120_commits") {
      val q = spark.readStream.format("graft-snapshot").load(p)
        .writeStream.format("memory").queryName("retrscale_tail")
        .outputMode("append").start()
      try { q.processAllAvailable() } finally q.stop()
      spark.table("retrscale_tail").count()
    }
    spark.stop()
  }
}
