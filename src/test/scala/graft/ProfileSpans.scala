package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for duplicatedSpans (dev tool, like
  * ProfileCuration). Run: Test/runMain graft.ProfileSpans [sfDir] */
object ProfileSpans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    def docs2 = {
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val seed = d.where(col("doc_id") < 50)
        .select(col("doc_id").as("sid"),
          substring(col("text"), 1, 100).as("shared"))
      d.join(broadcast(seed), col("doc_id") % 50 === col("sid"))
        .select(col("doc_id"),
          concat_ws(" ", col("text"), col("shared")).as("text2"))
    }
    (1 to 2).foreach { rep =>
      // stage A: tokenize + log-doubling windows + explode, count only
      val tcol = split(lower(trim(col("text2"))), "\\s+")
      def dbl(arr: org.apache.spark.sql.Column, width: Int) =
        zip_with(arr,
          slice(arr, lit(width + 1), greatest(size(arr) - width, lit(0))),
          (a, b) => concat(a, lit(" "), b))
      var win = tcol; var w = 1
      while (w < 8) { win = dbl(win, w); w *= 2 }
      val nWins = t(s"r$rep explode+count")(docs2.select(col("doc_id"),
        explode(filter(win, x => x.isNotNull)).as("_w")).count())
      println(s"  windows: $nWins")
      // stage B: + window count over _w (the string shuffle + sort)
      val cw = org.apache.spark.sql.expressions.Window.partitionBy("_w")
      t(s"r$rep +windowCount")(docs2.select(col("doc_id"),
          explode(filter(win, x => x.isNotNull)).as("_w"))
        .withColumn("_c", count(lit(1)).over(cw))
        .groupBy("doc_id").agg(count(lit(1)), sum(when(col("_c") > 1, 1L)))
        .write.format("noop").mode("overwrite").save())
      // full operator
      t(s"r$rep full duplicatedSpans")(
        graft.text.Dedup.duplicatedSpans(docs2, "text2", "doc_id", 8)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
