package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the nightly-rollup pattern: a
  * stored per-key aggregate STATE (count + exact decimal sum) absorbs
  * each new data shard by union + re-aggregation, without ever touching
  * earlier shards again. Because (count, decimal-sum) is a commutative
  * monoid, folding shards in ANY order equals the one-shot aggregate
  * over everything (law-tested), and the state stays one row per key —
  * at 100 TB the daily merge costs |state| + |shard|, not |history|.
  * The same algebra backs the HLL register store
  * ([[graft.text.Sketches.hllMergeRegisters]]) for distinct counts.
  */
object Incremental {

  /** Collapse a raw shard to per-key state rows. `valueCol` must be a
    * 2-decimal double (the repo-wide exactness contract). */
  def aggState(shard: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    shard.groupBy(keys.map(col): _*)
      .agg(count(col(valueCol)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("s"))

  /** Merge state tables (associative + commutative; duplicate keys
    * re-combine). */
  def mergeState(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"))

  /** Fold shards through the state monoid; returns (keys…, n, sum,
    * mean) with the sums surfaced as doubles (one deterministic cast). */
  def incrementalAgg(shards: Seq[DataFrame], keys: Seq[String],
      valueCol: String): DataFrame = {
    require(shards.nonEmpty, "incrementalAgg needs at least one shard")
    val folded = shards.map(aggState(_, keys, valueCol))
      .reduce(mergeState(_, _, keys))
    folded.select(keys.map(col) :+
      col("n") :+
      col("s").cast("double").as("sum_value") :+
      (col("s").cast("double") / col("n").cast("double")).as("mean_value"): _*)
      .drop("s")
  }
}
