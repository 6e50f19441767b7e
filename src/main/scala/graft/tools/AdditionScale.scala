package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-smoke helper for the round-8 table additions (CDC merge,
  * drift monitor, char entropy, compaction planning): times each op at
  * two scale factors to catch super-linear blowups the gate cannot
  * see. Expected laws: applyChangelog is one union + one partial-
  * aggregated shuffle (linear); drift collapses both snapshots to
  * Zipf-sized count tables before the join (linear in corpus, flat in
  * vocabulary); charEntropy is a stateless projection + one agg
  * (linear). Run:
  * {{{ sbt "runMain graft.tools.AdditionScale <dirA> <dirB>" }}}
  */
object AdditionScale {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String, dir: String)(b: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = b
      println(f"ADDSCALE $name dir=$dir ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    for (dir <- dirs) {
      val o = spark.read.parquet(s"$dir/orders.parquet")
      val base = o.select("o_orderkey", "o_orderstatus", "o_totalprice")
      val changes = o.where(col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"), col("o_orderdate").as("change_ts"),
          when(col("o_orderkey") % 15 === 0, "D").otherwise("U").as("op"),
          col("o_orderstatus"),
          (col("o_totalprice") + 1000.0).as("o_totalprice"))
      t("apply_changelog", dir) {
        graft.ops.TableJoins.applyChangelog(base, changes,
          Seq("o_orderkey"), "change_ts", "op").count()
      }
      val d = spark.read.parquet(s"$dir/documents.parquet")
      t("distribution_drift", dir) {
        graft.text.TextAnalysis.distributionDrift(
          d.where(col("doc_id") % 2 === 0),
          d.where(col("doc_id") % 2 === 1), "text").count()
      }
      t("char_entropy", dir) {
        graft.text.TextAnalysis.charEntropy(d, "text", "doc_id").count()
      }
    }
    spark.stop()
  }
}
