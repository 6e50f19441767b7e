package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r14 optimization probe: phase-times the shared inverted-index build
  * (writeSearchIndex base + appendSearchIndex shard) that q_search_append
  * pays in the bench. */
object SearchBuildProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-30s ${(System.nanoTime() - t0) / 1e9}%6.3f s"); r
    }
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    d.count() // warm scan
    (1 to 2).foreach { i =>
      val p = s"${System.getProperty("java.io.tmpdir")}/graft_sbp_$i"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
      t(s"run$i TOTAL build (base+append)") {
        graft.SparkEntry.withSearchBuildConf(spark) {
          t(s"run$i writeSearchIndex base") {
            graft.text.Search.writeSearchIndex(
              d.where(col("doc_id") < 400), "text", "doc_id", p)
          }
          t(s"run$i appendSearchIndex shard") {
            graft.text.Search.appendSearchIndex(spark, p,
              d.where(col("doc_id") >= 400), "text")
          }
        }
      }
      t(s"run$i serve bm25Indexed") {
        graft.text.Search.bm25Indexed(spark, p,
          Seq("spark", "merge", "window"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
