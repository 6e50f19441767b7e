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
    * (token or char counts). */
  def packByBudget(df: DataFrame, strataCols: Seq[String], idCol: String,
      weightCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(Sampling.portableHash(col(idCol)), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sum(col(weightCol).cast("long")).over(w)
    // integer division (SQL `div` → IntegralDivide): double division +
    // floor would lose exactness once cumulative weights pass 2^53
    df.withColumn("pack_id",
      call_function("div", cum - col(weightCol), lit(budget)))
  }
}
