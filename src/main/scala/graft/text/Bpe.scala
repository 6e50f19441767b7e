package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary training and application (Sennrich et
  * al. 2016), distributed the way the algorithm actually scales: the
  * corpus collapses ONCE to the Zipf-bounded (word, count) table — one
  * shuffle over the data, after which every merge iteration runs on the
  * word table only, never re-reading the corpus. 100 TB of text becomes
  * a few-million-row weighted vocabulary before the first merge.
  *
  * Representation: a word's segmentation is a SPACE-DELIMITED string
  * (` h e l l o `, padded), because applying merge (a, b) is then
  * exactly `replace(seg, ' a b ', ' ab ')` — the left-to-right
  * non-overlapping literal replace that Spark, the JVM, and DuckDB all
  * implement identically, which is what makes the whole T-step training
  * trajectory hash-replayable by the oracle as unrolled SQL. Merges are
  * word-internal (word-boundary splitting already happened); the
  * classic end-of-word marker is omitted — it matters for
  * detokenization, not for the merge dynamics.
  *
  * Determinism: pair counts are exact integer sums; the winning pair is
  * argmax by (count DESC, pair ASC) — a total order, so the learned
  * merge sequence is unique and engine-independent.
  */
object Bpe {

  /** The weighted vocabulary: one row per distinct whitespace token with
    * its corpus occurrence count (the repo-wide tokenizer contract). */
  def wordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(graft.functions.TextHashExprs.wsTokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("wc"))

  private def initSeg: Column =
    concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 "))

  private def mergeOnce(seg: Column, pair: String): Column =
    replace(seg, lit(" " + pair + " "),
      lit(" " + pair.replace(" ", "") + " "))

  /** Learn `nMerges` merges. Returns them in order as
    * (merge_rank, pair, pair_count) — the merge TABLE is the model.
    *
    * Each iteration is one aggregation job over the word table (pair
    * windows x word weight, partial+final sum) plus a driver-side
    * argmax of ONE row; the lazily-layered replace chain re-derives
    * segmentations from the checkpointed vocabulary, so per-iteration
    * cost is O(vocab * chain-depth). Every `checkpointEvery` merges the
    * segmentation COLUMN is materialized (a vocab-sized localCheckpoint)
    * and the replace chain restarts from it, bounding both the chain
    * depth and the expression-tree size for a production 30k-merge run
    * — the trajectory is bit-identical (each replace is a pure function
    * of the segmentation string, so layering over a materialized prefix
    * equals layering over the original chain; law-tested in TextSpec).
    * The default never triggers for short oracle-scale trainings. */
  def trainMerges(df: DataFrame, textCol: String,
      nMerges: Int, checkpointEvery: Int = 256): Seq[(Int, String, Long)] = {
    require(nMerges > 0, s"nMerges must be positive: $nMerges")
    require(checkpointEvery > 0,
      s"checkpointEvery must be positive: $checkpointEvery")
    var words = wordTable(df, textCol).localCheckpoint(true)
    var seg = initSeg
    val out = Seq.newBuilder[(Int, String, Long)]
    var t = 1
    var exhausted = false
    while (t <= nMerges && !exhausted) {
      val top = words
        .select(explode(graft.functions.TextHashExprs
          .tokenWindows(trim(seg), 2)).as("pr"), col("wc"))
        .groupBy("pr").agg(sum(col("wc")).as("cnt"))
        .orderBy(col("cnt").desc, col("pr"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val pair = top.head.getString(0)
        out += ((t, pair, top.head.getLong(1)))
        seg = mergeOnce(seg, pair)
        if (t % checkpointEvery == 0) {
          words = words.select(seg.as("_seg"), col("wc"))
            .localCheckpoint(true)
          seg = col("_seg")
        }
        t += 1
      }
    }
    out.result()
  }

  /** [[trainMerges]] as a DataFrame (merge_rank, pair, pair_count). */
  def trainMergesDf(df: DataFrame, textCol: String,
      nMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    trainMerges(df, textCol, nMerges)
      .toDF("merge_rank", "pair", "pair_count")
  }

  /** Tokenizer FERTILITY by group (conventionally language): the
    * occurrence-weighted subwords-per-word ratio under a learned merge
    * sequence — the standard tokenizer-quality audit (a vocabulary
    * trained on English-heavy data shows high fertility on the
    * languages it underserves; multilingual pipelines track this per
    * language before committing to a vocab).
    *
    * 100 TB shape: two corpus collapses — the (group, word) count table
    * and the distinct-word vocabulary — then the segmentation fold runs
    * on the VOCAB only and joins back by word (vocab-sized side), and
    * the final aggregation is |groups| rows. Integer counts; the one
    * division is rounded at 6 like the datasheet means. */
  def fertilityByGroup(df: DataFrame, textCol: String, groupCol: String,
      merges: Seq[String]): DataFrame = {
    val perGroup = df.select(col(groupCol),
        explode(graft.functions.TextHashExprs.wsTokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
      .groupBy(col(groupCol), col("w")).agg(count(lit(1)).as("lwc"))
    val segFinal = merges.foldLeft(initSeg)(mergeOnce)
    val subCounts = wordTable(df, textCol)
      .select(col("w"),
        size(split(trim(segFinal), " ")).cast("long").as("n_sub"))
    perGroup.join(subCounts, "w")
      .groupBy(col(groupCol))
      .agg(sum(col("lwc")).as("n_words"),
        sum(col("lwc") * col("n_sub")).as("n_subwords"))
      .select(col(groupCol), col("n_words"), col("n_subwords"),
        round(col("n_subwords").cast("double") /
          col("n_words").cast("double"), 6).as("fertility"))
  }

  /** Tokenize the corpus under a learned merge sequence and count the
    * resulting subword tokens: the fold of literal replaces runs
    * map-side over the word table, so applying a tokenizer to 100 TB is
    * again one corpus collapse + vocab-sized work. Returns
    * (token, n_occurrences). */
  def applyMerges(df: DataFrame, textCol: String,
      merges: Seq[String]): DataFrame = {
    val words = wordTable(df, textCol)
    val segFinal = merges.foldLeft(initSeg)(mergeOnce)
    words.select(explode(split(trim(segFinal), " ")).as("token"),
        col("wc"))
      .groupBy("token").agg(sum(col("wc")).as("n_occurrences"))
  }
}
