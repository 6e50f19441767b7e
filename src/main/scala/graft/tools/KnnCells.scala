package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: cell-occupancy histogram + total candidate-pair
  * count for [[graft.text.Similarity.knnJoinIvf]]'s blocking at a given
  * (dir, nCentroids) — run to see whether a scale smoke's cost is
  * density (even cells, too few) or skew (one hot cell). */
object KnnCells {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/sf1"
    val c = if (args.length > 1) args(1).toInt else 16
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = graft.text.Similarity
      .sampleCentroids(e, "vec_id", "embedding", c)
    val sizes = graft.text.Similarity
      .ivfAssign(e, cents, "vec_id", "embedding")
      .groupBy("centroid_id").count().orderBy(desc("count"))
    val rows = sizes.collect()
    val n = rows.map(_.getLong(1)).sum
    println(s"[knncells] dir=$dir C=$c n=$n cells=${rows.length} " +
      s"top5=${rows.take(5).map(_.getLong(1)).mkString(",")} " +
      s"candPairsApprox=${rows.map(r => r.getLong(1) * r.getLong(1) * 4).sum}")
    spark.stop()
  }
}
