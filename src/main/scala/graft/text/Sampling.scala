package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Both samplers key off a PORTABLE integer hash (a linear-congruential
  * mix in plain modular arithmetic) instead of `rand()` or engine hash
  * functions: the sample is reproducible across runs, partitionings, and
  * engines (the DuckDB oracle computes the identical arithmetic), which is
  * what a dataset card needs — "we kept ids with lcg(id) < f·M" is a
  * statement anyone can re-verify at 100 TB.
  */
object Sampling {

  // Knuth/glibc LCG constants; M = 2^31 keeps every intermediate below
  // 2^62 (no ANSI overflow for any bigint id)
  private val A = 1103515245L
  private val C = 12345L
  private val M = 2147483648L

  /** The portable per-id hash in [0, M): ((id mod M) * A + C) mod M. */
  def portableHash(id: Column): Column =
    pmod(pmod(id.cast("long"), lit(M)) * lit(A) + lit(C), lit(M))

  /** Deterministic Bernoulli sample: keep rows with hash < fraction·M.
    * A pure filter — no shuffle, fully pushdown-friendly, stable under
    * repartitioning (rand()-based sampling is none of these). */
  def sampleFraction(df: DataFrame, idCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction not in [0,1]")
    df.where(portableHash(col(idCol)) < lit((fraction * M).toLong))
  }

  /** Exact-n-per-stratum sample: the n ids with the smallest portable
    * hash in each stratum (ties break by ascending id).
    *
    * Scale shape: the bounded [[graft.functions.TopKAgg]] runs under
    * groupBy(strata) with map-side combine — each task reduces to ≤ n ids
    * per stratum before the only shuffle, so the full rows never move;
    * the selected (stratum, id) set (n × |strata| rows) broadcast
    * semi-joins the originals. A window row_number would instead shuffle
    * every row into per-stratum partitions. */
  def sampleStratified(df: DataFrame, strataCols: Seq[String], idCol: String,
      nPerStratum: Int): DataFrame = {
    require(nPerStratum > 0, s"nPerStratum must be positive: $nPerStratum")
    // TopKAgg keeps the LARGEST score (desc, ties id asc); negating the
    // hash selects the smallest hashes with the same id tie-break
    val score = -portableHash(col(idCol)).cast("double")
    val picked = df
      .groupBy(strataCols.map(col): _*)
      .agg(graft.functions.TopKAgg.topK(nPerStratum)(
        col(idCol), score).as("_nn"))
      .select(strataCols.map(col) :+
        explode(col("_nn.id")).as(idCol): _*)
    df.join(broadcast(picked), strataCols :+ idCol, "left_semi")
  }
}
