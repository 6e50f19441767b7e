package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for the q_dedup_simhash phase costs (round-14 task 2). */
object ProfSim {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val d0 = spark.read.parquet(s"$dir/documents.parquet")
    graft.text.Dedup.simhashPairs(d0, "text", "doc_id", 6)
      .write.format("noop").mode("overwrite").save()
    for (i <- 1 to 3) {
      t(s"full q_dedup_simhash #$i") {
        graft.text.Dedup.simhashPairs(d0, "text", "doc_id", 6)
          .write.format("noop").mode("overwrite").save()
      }
    }
    t("scan+simhash only") {
      d0.select(col("doc_id"), graft.text.Dedup.simhash(col("text")).as("h"))
        .write.format("noop").mode("overwrite").save()
    }
    t("banded explode only") {
      val h = graft.text.Dedup.simhash(col("text"))
      d0.select(col("doc_id").as("id"), h.as("_h"),
          explode(graft.text.Dedup.simhashPairKeys(h)).as("b"))
        .write.format("noop").mode("overwrite").save()
    }
    t("hot agg only") {
      val h = graft.text.Dedup.simhash(col("text"))
      d0.select(col("doc_id").as("id"), h.as("_h"),
          explode(graft.text.Dedup.simhashPairKeys(h)).as("b"))
        .select(col("id"), col("_h"), col("b.band"), col("b.bh"))
        .groupBy(col("band"), col("bh")).agg(count(lit(1)).as("_bn"))
        .where(col("_bn") > 1)
        .write.format("noop").mode("overwrite").save()
    }
    val withH = d0.select(col("doc_id").as("id"),
      graft.text.Dedup.simhash(col("text")).as("h"))
    val banded = withH.select(col("id"), col("h").as("_h"),
        explode(graft.text.Dedup.simhashPairKeys(col("h"))).as("b"))
      .select(col("id"), col("_h"), col("b.band"), col("b.bh"))
    t("banded (pre-projected)") {
      banded.write.format("noop").mode("overwrite").save()
    }
    val buckets = banded.groupBy(col("band"), col("bh"))
      .agg(collect_list(struct(col("id"), col("_h"))).as("xs"))
      .where(size(col("xs")) > 1)
    t("+ bucket agg") {
      buckets.write.format("noop").mode("overwrite").save()
    }
    val pairs = buckets.select(explode(expr(
      """flatten(transform(xs, (x, i) ->
        |  transform(slice(xs, i + 2, size(xs) - i - 1), y ->
        |    struct(x.id AS ida, y.id AS idb, x._h AS ha, y._h AS hb))))"""
        .stripMargin)).as("p"))
    t("+ pair explode") {
      pairs.write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
