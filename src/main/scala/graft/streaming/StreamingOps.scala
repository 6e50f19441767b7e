package graft.streaming

import graft.cube.{Cube, CubeMeta, Dim}
import graft.ops.Reducers
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming forms of the cube aggregations.
  *
  * The reference is strictly batch (SURVEY.md §2.10) — this is the
  * forward-looking streaming surface for the same semantics: an unbounded
  * cube stream (e.g. the `events` table as a feed) aggregated per calendar
  * period with late-data handling. Batch and streaming share the reducer
  * vocabulary (graft.ops.Reducers.reducer), so a process graph's
  * aggregate_temporal_period compiles to either mode.
  *
  * Scale notes: watermark + append output keeps state bounded (a group
  * closes once the watermark passes its window end); the shuffle key is
  * (window, band, y, x) — the same key the batch groupBy uses, so a
  * 1000-executor cluster partitions identically in both modes.
  */
object StreamingOps {

  /** `aggregate_temporal_period` over a streaming cube DataFrame:
    * tumbling window of `period` with `delay` watermark.
    *
    * Uses window() (not date_trunc) so the state store tracks closed
    * windows; the emitted `time` label is the window start — identical
    * labels to the batch periodBucket for hour/day/week. */
  def aggregateTemporalPeriodStream(df: DataFrame, period: String,
      reducerName: String, delay: String = "1 hour"): DataFrame = {
    val dur = period match {
      case "hour" => "1 hour"
      case "day"  => "1 day"
      case "week" => "1 week"
      case other => throw new IllegalArgumentException(
        s"streaming period '$other' not supported (calendar months/seasons" +
          " need batch recompute)")
    }
    val dims = Seq(Dim.Band, Dim.Y, Dim.X).filter(df.columns.contains)
    df.withWatermark(Dim.Time, delay)
      .groupBy(window(col(Dim.Time), dur) +: dims.map(col): _*)
      .agg(Reducers.reducer(reducerName)(col(Cube.ValueCol)).as(Cube.ValueCol))
      .withColumn(Dim.Time, col("window.start"))
      .drop("window")
      .select(col(Dim.Time) +: (dims.map(col) :+ col(Cube.ValueCol)): _*)
  }

  /** Streaming exact-dedup pass: keep the first occurrence of each content
    * hash within the watermark horizon (dropDuplicates with event-time
    * column bounds the state — the streaming analogue of Dedup.exact). */
  def dedupExactStream(df: DataFrame, textCol: String, timeCol: String,
      delay: String = "1 hour"): DataFrame =
    df.withColumn("content_hash", sha2(col(textCol), 256))
      .withWatermark(timeCol, delay)
      .dropDuplicates("content_hash")

  /** Streaming quality-gate filter: pure per-row expressions pass through
    * unchanged in streaming mode (no state) — language ID + quality score
    * as one select. */
  def qualityGateStream(df: DataFrame, textCol: String,
      minQuality: Double): DataFrame = {
    import graft.text.TextAnalysis
    df.withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
      .where(col("quality") >= minQuality)
  }
}
