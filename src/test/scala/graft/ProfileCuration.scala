package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the curation pipeline (dev tool, like
  * TopKBench). Run: Test/runMain graft.ProfileCuration [sfDir] */
object ProfileCuration {
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
    import graft.text.{Dedup, TextAnalysis}
    def runOnce(tag: String): Unit = {
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val st = graft.functions.TextHashExprs
        .repetitionStats(lower(trim(col("text"))))
      val filtered = d
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .withColumn("rep", round(when(st.getField("n2") > 0,
          st.getField("top2").cast("double") /
            st.getField("n2").cast("double")).otherwise(0.0), 6))
        .where(col("quality") >= 0.75 && col("rep") <= 0.2)
      val keepIds = filtered.groupBy(sha2(col("text"), 256).as("h"))
        .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      val deduped = t(s"$tag checkpoint deduped")(
        filtered.join(keepIds, Seq("doc_id"), "left_semi")
          .localCheckpoint(true))
      val pairs = Dedup.ngramJaccardPairs(deduped, "text", "doc_id",
        Seq("lang", "source"), 3, 0.5)
      val canonical = t(s"$tag dedupCorpus(CC)")(
        Dedup.dedupCorpus(deduped, pairs, "doc_id"))
      val split8 = graft.text.Sampling.assignSplit(
        canonical.withColumn("grp", concat_ws("|", col("source"), col("lang"))),
        "grp", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      val out = split8.groupBy(col("split"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(TextAnalysis.tokenCountWs(col("text")).cast("long")).as("n_tokens"))
      t(s"$tag final write")(
        out.write.format("noop").mode("overwrite").save())
    }
    t("TOTAL first")(runOnce("first"))
    t("TOTAL second")(runOnce("second"))
    // drift guard: the stage breakdown above re-implements
    // q_curation_pipeline; timing the REAL benched query too makes a
    // divergence visible (totals should track the 'second' run)
    t("REAL q_curation_pipeline")(
      SparkEntry.queries("q_curation_pipeline")(spark, dir)
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
