package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation DAG's stages as named, reusable
  * operators — one definition shared by the Scala API
  * (SparkEntry.q_curation_pipeline) and the openEO process-graph surface
  * (compile/GraphCompiler's text processes), so a JSON graph compiles to
  * the IDENTICAL Spark plan as the library call chain.
  *
  * Stage contract: frames carry the documents-table shape — at least
  * (doc_id, lang, source, text). Replaces nothing in the reference (it is
  * EO-only); this is the LLM-pipeline tier driven through the reference's
  * one query language, the openEO JSON process graph
  * (openeo_odc_driver.py:122-1840 dispatches EO processes the same way).
  *
  * Scale notes live on the underlying operators ([[TextAnalysis]],
  * [[Dedup]], [[Sampling]]); the two `localCheckpoint(true)` points are
  * deliberate fan-out materializations — the filter-pushdown double-eval
  * lesson (BENCH_NOTES r4): a `withColumn(heavy).where(on it)` pair
  * evaluates the heavy expression in both Filter and Project, and the
  * gate's survivor slice feeds multiple consumers downstream.
  */
object Curation {

  /** Quality + repetition gate (map-side): one-pass quality score and
    * top-bigram fraction drive the filter; survivors materialize ONCE
    * (narrow checkpoint) because the gate columns would otherwise
    * evaluate twice under pushdown and once more per consumer. */
  def qualityGate(d: DataFrame, minQuality: Double,
      maxRepetition: Double): DataFrame = {
    val st = graft.functions.TextHashExprs
      .repetitionStats(lower(trim(col("text"))))
    d.withColumn("quality", TextAnalysis.qualityScore(col("text")))
      .withColumn("rep", round(when(st.getField("n2") > 0,
        st.getField("top2").cast("double") /
          st.getField("n2").cast("double")).otherwise(0.0), 6))
      .where(col("quality") >= minQuality && col("rep") <= maxRepetition)
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .localCheckpoint(true)
  }

  /** Exact dedup, keep-lowest-id: one digest shuffle to the keeper set,
    * then a semi-join. The result checkpoints eagerly — it feeds BOTH
    * sides of the near-dup self-join, the corpus join, and the split
    * (the fan-out rule; blocks are freed by the ContextCleaner). */
  def dedupExactKeepMin(filtered: DataFrame): DataFrame = {
    val keepIds = filtered
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("doc_id")).select("doc_id")
    filtered.join(keepIds, Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
  }

  /** NEAR-dup cluster-canonical dedup: blocked exact n-gram Jaccard
    * pairs → connected components → keep each cluster's minimum id (the
    * CC step eagerly materializes the tiny pair graph — the DAG's one
    * bounded materialization point).
    *
    * COST-ADAPTIVE pair generation: the blocked self-join is O(Σ block²)
    * with lang×source a FIXED block count, so it turns quadratic the
    * moment blocks outgrow a few hundred docs (r8 sf1 smoke: 54× cost at
    * 10× data); the prefix-filtered generator is bounded by shingle
    * co-occurrence (4× at 10× data) but pays two extra shuffles that
    * lose at small blocks. One cheap count aggregate over the already-
    * checkpointed input picks the generator; both produce the IDENTICAL
    * pair set (prefix filtering has perfect recall; the verify is the
    * same sorted-merge Jaccard), so results — and the oracle hash — do
    * not depend on the choice. `spark.graft.neardup.blockSwitch`
    * overrides the crossover (docs per largest block). */
  def nearDupCanonical(deduped: DataFrame, blocking: Seq[String],
      shingleN: Int, threshold: Double): DataFrame = {
    val switchAt = deduped.sparkSession.conf
      .get("spark.graft.neardup.blockSwitch", "1000").toInt
    val maxBlock =
      if (blocking.isEmpty) Long.MaxValue
      else {
        // max over an EMPTY grouped count is one NULL row — an upstream
        // gate that filtered every document must yield an empty corpus,
        // not an NPE here
        val r = deduped.groupBy(blocking.map(col): _*)
          .count().agg(max("count")).collect()(0)
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }
    val pairs =
      if (maxBlock <= switchAt)
        Dedup.ngramJaccardPairs(deduped, "text", "doc_id",
          blocking, shingleN = shingleN, threshold = threshold)
      else
        Dedup.ngramJaccardPairsPrefix(deduped, "text", "doc_id",
          shingleN = shingleN, threshold = threshold, blockCols = blocking)
    Dedup.dedupCorpus(deduped, pairs, "doc_id")
  }

  /** Leakage-safe grouped split (map-side md5 over the (source, lang)
    * block key): near-dup pairs live within blocks, so splitting whole
    * blocks keeps them on one side ([[Sampling.assignSplit]]). */
  def groupedSplit(canonical: DataFrame,
      fractions: Seq[(String, Double)]): DataFrame =
    Sampling.assignSplit(
      canonical.withColumn("grp",
        concat_ws("|", col("source"), col("lang"))),
      "grp", fractions)

  /** Per-group document/token stats (partial+final agg) — the dataset
    * card's headline numbers. */
  def tokenStats(split: DataFrame, by: Seq[String]): DataFrame =
    split.groupBy(by.map(col): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCountWs(col("text")).cast("long"))
          .as("n_tokens"))
}
