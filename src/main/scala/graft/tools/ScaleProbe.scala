package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-smoke helper: times `Similarity.knnJoinIvf` across scale
  * factors and centroid counts to pin the kNN join's scaling LAW —
  * with nCentroids FIXED, per-cell density grows linearly in n and
  * pairwise work quadratically (the gate row's shape at 16 cells);
  * with nCentroids scaled ∝ n, per-cell density is constant and total
  * work linear — the 100 TB parameterization. Run:
  * {{{ sbt "runMain graft.tools.ScaleProbe <dirA> <dirB>" }}}
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirA = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dirB = if (args.length > 1) args(1) else "/tmp/sf1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(dir: String, c: Int): Double = {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val t0 = System.nanoTime()
      graft.text.Similarity.knnJoinIvf(e, "vec_id", "embedding", k = 3,
        nCentroids = c, nProbe = 4, saltFactor = 2)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run("/root/testdata/sf0.001", 16) // JIT warm-up, uncounted
    println(f"[scaleprobe] A_c16=${run(dirA, 16)}%.2f")
    println(f"[scaleprobe] B_c16=${run(dirB, 16)}%.2f")
    println(f"[scaleprobe] B_c160=${run(dirB, 160)}%.2f")
    println(f"[scaleprobe] A_c16_again=${run(dirA, 16)}%.2f")
    // near-dup pair generation: blocked pairwise (fixed lang×source
    // blocks → O(Σ block²), the curation pipeline's oracle tier) vs
    // prefix-filtered (candidates bounded by shingle co-occurrence, the
    // scale path)
    def pairs(dir: String, blocked: Boolean): Double = {
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val t0 = System.nanoTime()
      (if (blocked)
        graft.text.Dedup.ngramJaccardPairs(d, "text", "doc_id",
          Seq("lang", "source"), shingleN = 3, threshold = 0.5)
      else
        graft.text.Dedup.ngramJaccardPairsPrefix(d, "text", "doc_id",
          shingleN = 3, threshold = 0.5))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    pairs("/root/testdata/sf0.001", blocked = true) // warm-up
    pairs("/root/testdata/sf0.001", blocked = false)
    println(f"[scaleprobe] pairs_A_blocked=${pairs(dirA, true)}%.2f")
    println(f"[scaleprobe] pairs_B_blocked=${pairs(dirB, true)}%.2f")
    println(f"[scaleprobe] pairs_A_prefix=${pairs(dirA, false)}%.2f")
    println(f"[scaleprobe] pairs_B_prefix=${pairs(dirB, false)}%.2f")
    spark.stop()
  }
}
