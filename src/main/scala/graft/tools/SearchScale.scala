package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-smoke helper for the persisted inverted index: times
  * `Search.writeSearchIndex` (the one corpus pass) and `bm25Indexed`
  * (the bucket-pruned probe) across scale factors. The law to check:
  * build scales ~linearly in corpus bytes (one tokenize + two
  * partial-aggregated shuffles), while serve cost follows the PROBED
  * BUCKETS' bytes — near-flat in corpus size for a fixed query until
  * the probed postings themselves grow. Run:
  * {{{ sbt "runMain graft.tools.SearchScale <dirA> <dirB>" }}}
  */
object SearchScale {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val idx = s"/tmp/searchscale_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      val t0 = System.nanoTime()
      graft.text.Search.writeSearchIndex(d, "text", "doc_id", idx)
      val t1 = System.nanoTime()
      val rows = graft.text.Search.bm25Indexed(spark, idx,
        Seq("spark", "merge", "window")).count()
      val t2 = System.nanoTime()
      println(f"SEARCHSCALE dir=$dir docs=${d.count()} " +
        f"build=${(t1 - t0) / 1e9}%.2f serve=${(t2 - t1) / 1e9}%.3f " +
        f"rows=$rows")
    }
    spark.stop()
  }
}
