package graft

import org.apache.spark.sql.functions._

/** Micro-bench for the bounded top-k aggregate buffer:
  * `sbt "Test/runMain graft.TopKBench"`. 2M scored rows, 8 query groups,
  * k = 5 and 100, two reps each (first rep carries codegen). */
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(2000000).select(
      (col("id") % 65536).as("q"), col("id"),
      ((col("id") * 2654435761L % 1000003L).cast("double") / 1000003.0)
        .as("cos"))
    df.write.format("noop").mode("overwrite").save()
    for (k <- Seq(5, 100); rep <- 1 to 4) {
      val t0 = System.nanoTime()
      df.groupBy("q")
        .agg(graft.functions.TopKAgg.topK(k)(col("id"), col("cos")).as("nn"))
        .write.format("noop").mode("overwrite").save()
      println(f"PROF topk_k${k}_r$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
