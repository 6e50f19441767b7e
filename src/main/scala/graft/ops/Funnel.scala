package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel conversion analysis: for each entity, the earliest
  * completion time of each stage GIVEN the previous stage completed
  * first — the greedy first-match semantics of product funnels
  * (signup → click → purchase): stage i's timestamp is the minimum event
  * time of stage i's type STRICTLY AFTER stage i−1's resolved timestamp,
  * null (and propagating null) once any stage is unreached.
  *
  * Shape: one `groupBy(key)` per stage plus a per-stage equi-join of the
  * (already key-partitioned) accumulator against that stage's events —
  * every exchange is on the SAME key, so Catalyst reuses the
  * partitioning across stages rather than reshuffling (plan-pinned: k
  * stages ⇒ k+1 hash exchanges on a k=3 funnel would mean no reuse; the
  * pin asserts fewer). No window over the whole event stream, no
  * per-entity collect: state per stage is one timestamp column. */
object Funnel {

  def funnel(df: DataFrame, keyCol: String, tsCol: String,
      stageCol: String, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "a funnel needs at least two stages")
    val tsCols = stages.map(s => s"${s}_ts")
    var acc = df.where(col(stageCol) === stages.head)
      .groupBy(col(keyCol))
      .agg(min(col(tsCol)).as(tsCols.head))
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      val nxt = df.where(col(stageCol) === st)
        .select(col(keyCol), col(tsCol).as("_t"))
      val carried = (keyCol +: tsCols.take(i)).map(col)
      acc = acc.join(nxt, Seq(keyCol), "left")
        .groupBy(carried: _*)
        // `_t > null` is null → when() null → min() null: an unreached
        // previous stage propagates automatically
        .agg(min(when(col("_t") > col(tsCols(i - 1)), col("_t")))
          .as(tsCols(i)))
    }
    acc.withColumn("converted", col(tsCols.last).isNotNull)
  }
}
