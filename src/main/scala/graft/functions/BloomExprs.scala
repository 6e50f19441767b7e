package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Column access to Spark's own Bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind runtime row-level join filtering, registered here under graft
  * names because Spark does not expose them as public SQL functions).
  *
  * The intended shape (see [[graft.text.Dedup.decontaminateBloom]]):
  * aggregate a BOUNDED key set into a filter once, collect the sketch
  * bytes to the driver, and embed them as a binary LITERAL in a probe
  * expression — `might_contain` requires a constant filter, and a
  * literal keeps the probe a pure codegen projection (streaming-safe,
  * no join, no shuffle). */
object BloomExprs {

  private def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val agg = FunctionIdentifier("graft_bloom_agg")
    if (!registry.functionExists(agg)) {
      registry.registerFunction(agg,
        new ExpressionInfo(classOf[BloomFilterAggregate].getName,
          "graft_bloom_agg"),
        (cs: Seq[Expression]) =>
          new BloomFilterAggregate(cs(0), cs(1), cs(2))
            .toAggregateExpression())
    }
    val mc = FunctionIdentifier("graft_might_contain")
    if (!registry.functionExists(mc)) {
      registry.registerFunction(mc,
        new ExpressionInfo(classOf[BloomFilterMightContain].getName,
          "graft_might_contain"),
        (cs: Seq[Expression]) => BloomFilterMightContain(cs(0), cs(1)))
    }
  }

  /** Aggregate LONG keys into a Bloom filter (binary sketch). */
  def bloomAgg(value: Column, estimatedItems: Long, numBits: Long): Column = {
    SparkSession.getActiveSession.foreach(register)
    call_function("graft_bloom_agg", value,
      lit(estimatedItems), lit(numBits))
  }

  /** Membership probe; `bloom` must be a constant (binary literal). A
    * non-constant sketch is rejected HERE with a typed graft error —
    * Spark's own check only fires at analysis time, far from the call
    * site and with an opaque message. */
  def mightContain(bloom: Column, value: Column): Column = {
    SparkSession.getActiveSession.foreach(register)
    // node-class check (internal.Literal is private[sql] to Scala but the
    // node accessor itself is public API)
    val constant =
      bloom.node.getClass.getName == "org.apache.spark.sql.internal.Literal"
    if (!constant)
      throw graft.OpenEoError("BloomNotConstant",
        "mightContain needs a constant bloom sketch: collect the " +
          "aggregated sketch bytes and pass lit(bytes) (see " +
          "Dedup.decontaminateBloom)")
    call_function("graft_might_contain", bloom, value)
  }
}
