package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column dataset profiling — the "what is in this 100 TB table"
  * operator. TWO passes over the data regardless of column count:
  *
  *  1. one aggregation computing every column's non-null count and
  *     min/max (plus the row total) in a single partial+final hash agg —
  *     the result is ONE row, collected (bounded: 3·|cols|+1 values);
  *  2. one stacked pass for distinct-count ESTIMATES: columns explode to
  *     (column, value-string) rows and feed the shared HLL register
  *     machinery ([[graft.text.Sketches.hllDistinct]]) grouped by column
  *     name — ≤ |cols|·2^p register rows of shuffle, never a per-column
  *     `COUNT(DISTINCT)` expansion.
  *
  * Values profile through their canonical STRING form so one schema
  * serves every column type and the hashes are engine-portable.
  * Output: (column, n_rows, n_values, n_nulls, min, max, est_distinct).
  */
object TableProfile {

  def profile(df: DataFrame, cols: Seq[String], p: Int = 11): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = cols.flatMap { c => Seq(
      count(col(c)).as(s"${c}__n"),
      min(col(c)).cast("string").as(s"${c}__min"),
      max(col(c)).cast("string").as(s"${c}__max"))
    }
    val row: Row = df.agg(count(lit(1)).as("__rows"), aggs: _*).head()
    val nRows = row.getLong(0)
    val exact = cols.zipWithIndex.map { case (c, i) =>
      val n = row.getLong(1 + i * 3)
      (c, nRows, n, nRows - n,
        Option(row.getString(2 + i * 3)), Option(row.getString(3 + i * 3)))
    }.toDF("column", "n_rows", "n_values", "n_nulls", "min", "max")

    val stacked = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("column"), col(c).cast("string").as("v"))): _*))
      .as("s")).select(col("s.column"), col("s.v"))
    val est = graft.text.Sketches
      .hllDistinct(stacked, col("v"), Seq("column"), p)
      .select(col("column"), col("est_distinct"))
    // |cols| rows on each side: the join is a broadcast of a handful of
    // profile rows, not a data-sized shuffle
    exact.join(broadcast(est), Seq("column"), "left")
      .withColumn("est_distinct", coalesce(col("est_distinct"), lit(0.0)))
  }
}
