package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-smoke helper for the round-8 store/drift additions: times the
  * persisted-IVF lifecycle (build, append, serve) and the corpus drift
  * monitor at two scale factors to pin linear scaling. Run:
  * {{{ sbt "runMain graft.tools.StoreProbe <dirA> <dirB>" }}}
  */
object StoreProbe {
  def main(args: Array[String]): Unit = {
    val dirA = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dirB = if (args.length > 1) args(1) else "/tmp/sf1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.text.Similarity

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def lifecycle(dir: String, tag: String): Unit = {
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val idx = s"/tmp/graft_probe_idx_$tag"
      val n = e.count()
      // centroid count ∝ √n is the production parameterization; keep the
      // gate's fixed 16 as well to expose the density cliff if any
      val build = time(Similarity.writeIvfStore(e, "vec_id", "embedding",
        idx, nCentroids = 16))
      val append = time(Similarity.appendIvfStore(spark, idx,
        e.select((col("vec_id") + lit(10000000L)).as("vec_id"),
          col("embedding")), "vec_id", "embedding"))
      val serve = time(Similarity.topKIvfStore(spark, idx,
        e.where(col("vec_id") < 10), "vec_id", "embedding", k = 5,
        nProbe = 4)
        .write.format("noop").mode("overwrite").save())
      println(f"[storeprobe] $tag n=$n build=$build%.2f " +
        f"append=$append%.2f serve=$serve%.2f")
    }
    def drift(dir: String, tag: String): Unit = {
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val t = time(graft.text.TextAnalysis.distributionDrift(
        d.where(col("doc_id") % 2 === 0), d.where(col("doc_id") % 2 === 1),
        "text")
        .write.format("noop").mode("overwrite").save())
      println(f"[storeprobe] drift_$tag=$t%.2f")
    }
    lifecycle("/root/testdata/sf0.001", "warm") // JIT warm-up, uncounted
    drift("/root/testdata/sf0.001", "warm")
    lifecycle(dirA, "A")
    lifecycle(dirB, "B")
    drift(dirA, "A")
    drift(dirB, "B")
    spark.stop()
  }
}
