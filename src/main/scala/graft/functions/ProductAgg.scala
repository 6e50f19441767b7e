package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact `product` aggregate — the one reducer with no Spark built-in
  * (SURVEY.md §2.4 A2; reference: running `*=` fold,
  * openeo_odc_driver.py:550-571). The exp(sum(log)) rewrite is wrong for
  * values <= 0, so this is a real `Aggregator`. Nulls are ignored (SQL agg
  * convention, matches DuckDB's product()); an all-null group yields null.
  *
  * Scale note: merges are O(1) and the buffer is 9 bytes — partial
  * aggregation (map-side combine) applies as with any built-in agg, so no
  * extra shuffle pressure at 100 TB.
  */
object ProductAgg extends Aggregator[java.lang.Double, (Double, Boolean), java.lang.Double] {
  def zero: (Double, Boolean) = (1.0, false)
  def reduce(b: (Double, Boolean), v: java.lang.Double): (Double, Boolean) =
    if (v == null) b else (b._1 * v.doubleValue(), true)
  def merge(a: (Double, Boolean), b: (Double, Boolean)): (Double, Boolean) =
    (a._1 * b._1, a._2 || b._2)
  def finish(b: (Double, Boolean)): java.lang.Double =
    if (b._2) java.lang.Double.valueOf(b._1) else null
  def bufferEncoder: Encoder[(Double, Boolean)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaBoolean)
  def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE

  private lazy val fn = udaf(ProductAgg)
  /** `product(col)` as a Column aggregate expression. */
  def product(c: Column): Column = fn(c.cast("double"))
}
