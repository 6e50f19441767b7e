package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r14: sub-step timing of one writeSearchIndex phase (tokenize+postings
  * write vs df write vs stats vs params) to find the build's cost center. */
object SearchPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-30s ${(System.nanoTime() - t0) / 1e9}%6.3f s"); r
    }
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    d.count()
    val toks = split(lower(trim(col("text"))), "\\s+")
    (1 to 2).foreach { i =>
      val p = s"${System.getProperty("java.io.tmpdir")}/graft_spp_$i"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
      val postings = d
        .select(col("doc_id"), size(toks).cast("double").as("dl"),
          explode(graft.functions.TextHashExprs.termCounts(toks))
            .as(Seq("term", "tf")))
        .withColumn("p_bucket", pmod(hash(col("term")), lit(16)))
        .persist()
      t(s"run$i materialize postings(count)") { postings.count() }
      t(s"run$i postings partitioned write") {
        postings.repartition(col("p_bucket"))
          .write.mode("overwrite").partitionBy("p_bucket")
          .parquet(s"$p/postings")
      }
      t(s"run$i postings FLAT write") {
        postings.repartition(col("p_bucket"))
          .write.mode("overwrite").parquet(s"$p/postings_flat")
      }
      t(s"run$i df write") {
        postings.groupBy(col("term"), col("p_bucket"))
          .agg(count(lit(1)).as("df"))
          .repartition(col("p_bucket"))
          .write.mode("overwrite").partitionBy("p_bucket")
          .parquet(s"$p/df")
      }
      t(s"run$i stats (count+agg+write)") {
        val nDocs = d.count()
        postings.agg(lit(nDocs).as("n_docs"), sum(col("tf")).as("sum_dl"))
          .coalesce(1).write.mode("overwrite").parquet(s"$p/stats")
      }
      t(s"run$i params write") {
        Seq((16, "doc_id")).toDF("n_buckets", "id_col")
          .coalesce(1).write.mode("overwrite").parquet(s"$p/params")
      }
      postings.unpersist(false)
    }
    spark.stop()
  }
}
