package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic pack planning for LLM training pipelines: assign each
  * document to a fixed-weight-budget pack (the "which sequences go into
  * which training shard/context window" step).
  *
  * Semantics: within a stratum, documents take a DETERMINISTIC order (the
  * portable [[Sampling.portableHash]], ties by id — a reproducible
  * shuffle), and pack `p` holds the documents whose preceding cumulative
  * weight lands in [p·budget, (p+1)·budget). This is contiguous greedy
  * fill: a pack may overflow its budget by at most one document (exact
  * bin packing is NP-hard and inherently sequential; this is the
  * streaming-friendly form every large-scale packer uses). All
  * arithmetic is integer, so an external engine reproduces the exact
  * assignment.
  *
  * Scale shape: one shuffle into stratum partitions + a within-partition
  * sort for the running sum. Strata are expected to be numerous
  * (language × source × shard-group); a single global stratum serializes
  * the cumulative sum into one partition — add a salt column to the
  * strata in that case.
  */
object Packing {

  /** Append `pack_id`: the fixed-budget pack ordinal of each row within
    * its stratum. `weightCol` must be a non-negative integer column
    * (token or char counts) — a null or negative weight fails the job
    * loudly rather than silently corrupting the running sum. Ordinals
    * are DENSE from 0 per stratum even when a single oversized document
    * jumps the cumulative sum past several budget multiples (a shard
    * consumer enumerating 0..max must never hit an empty pack). */
  def packByBudget(df: DataFrame, strataCols: Seq[String], idCol: String,
      weightCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val wv = col(weightCol).cast("long")
    val guarded = when(wv.isNull || wv < 0,
      raise_error(concat(
        lit(s"packByBudget: $weightCol must be non-negative, got "),
        col(weightCol).cast("string"))).cast("long"))
      .otherwise(wv)
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(Sampling.portableHash(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sum(guarded).over(w)
    // integer division (SQL `div` → IntegralDivide): double division +
    // floor would lose exactness once cumulative weights pass 2^53.
    // dense_rank over the raw boundary ordinal closes the gaps an
    // oversized document would leave.
    val raw = call_function("div", cum - guarded, lit(budget))
    val dw = Window.partitionBy(strataCols.map(col): _*).orderBy(raw)
    df.withColumn("pack_id", (dense_rank().over(dw) - 1).cast("long"))
  }

  /** Context-length chunking: split each document into consecutive
    * `maxTokens`-token chunks (whitespace tokens — `tokenCountWs`
    * semantics), one output row per chunk with a dense 0-based
    * `chunk_idx`, the chunk text, and its token count. The final chunk
    * carries the remainder. A pure map-side explode — amplification is
    * exactly the output size (Σ ceil(nᵢ/maxTokens) rows), no shuffle;
    * compose with [[packByBudget]] for the chunk→pack step. */
  def chunkByTokens(df: DataFrame, textCol: String, idCol: String,
      maxTokens: Int): DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive: $maxTokens")
    val toks = graft.functions.TextHashExprs.wsSplit(trim(col(textCol)))
    val n = size(toks)
    val nChunks = ceil(n.cast("double") / maxTokens).cast("int")
    df.select(col(idCol), toks.as("_t"), n.as("_n"), nChunks.as("_nc"))
      .select(col(idCol), col("_t"), col("_n"),
        posexplode(sequence(lit(0), col("_nc") - 1)).as(Seq("_p", "chunk_idx")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        array_join(slice(col("_t"),
          col("chunk_idx") * maxTokens + 1, lit(maxTokens)), " ")
          .as("chunk_text"),
        least(lit(maxTokens),
          col("_n") - col("chunk_idx") * maxTokens).cast("long").as("n_tokens"))
  }
}
