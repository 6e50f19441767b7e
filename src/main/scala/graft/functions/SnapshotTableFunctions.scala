package graft.functions

import graft.ops.Snapshots
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.unsafe.types.UTF8String

/** SQL TABLE-VALUED FUNCTIONS over the snapshot lakehouse — the Delta
  * `table_changes(...)` face (`/root/reference` has no SQL surface at
  * all; Delta ships this exact TVF for CDF consumers):
  *
  * {{{
  * SELECT * FROM graft_table_changes('/data/tbl', 2, 5)
  * SELECT * FROM graft_table_changes('cat.db.t', 0, 3)   -- by identifier
  * }}}
  *
  * returns the row-exact change feed over versions (from, to] — the
  * same planning as [[Snapshots.changeFeed]] (insert/delete rows plus
  * update pre/post image pairs, stamped `_change_type` /
  * `_commit_version` / `_commit_timestamp`). Registered by
  * [[graft.GraftExtensions]] through `injectTableFunction`, so a
  * pure-SQL client can consume CDC without the option-based reader.
  * Identifier targets resolve through the named catalog's configured
  * warehouse (`spark.sql.catalog.<cat>.warehouse`). */
object SnapshotTableFunctions {

  private def strArg(args: Seq[Expression], i: Int, fn: String): String =
    args(i) match {
      case Literal(s: UTF8String, _) => s.toString
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a string literal; got $other")
    }

  private def longArg(args: Seq[Expression], i: Int, fn: String): Long =
    args(i) match {
      case Literal(v: Int, _) => v.toLong
      case Literal(v: Long, _) => v
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be an integer literal; got $other")
    }

  /** 'cat.db.t' (through the catalog's warehouse conf) or a direct
    * filesystem path. Identifier segments get the same validation as
    * the catalog surface — a quoted '..' must not escape. */
  private[graft] def resolveTarget(spark: SparkSession,
      target: String): String = {
    if (target.contains('/')) return target
    val segs = target.split('.').toSeq
    val wh = spark.conf.getOption(s"spark.sql.catalog.${segs.head}.warehouse")
    if (segs.length < 2 || wh.isEmpty)
      throw new IllegalArgumentException(
        s"cannot resolve snapshot table '$target' — pass a filesystem " +
          "path, or a <catalog>.<ns...>.<table> identifier whose " +
          "catalog has spark.sql.catalog.<cat>.warehouse configured")
    segs.tail.foreach { s =>
      require(s.nonEmpty && s != "." && s != ".." &&
          !s.exists(c => c == '/' || c == '\\' || c == ':'),
        s"invalid identifier segment '$s' in '$target'")
    }
    (wh.get +: segs.tail).mkString("/")
  }

  val injectables: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => LogicalPlan)] = Seq(
    (FunctionIdentifier("graft_table_changes"),
      new ExpressionInfo("graft.functions.SnapshotTableFunctions",
        "graft_table_changes"),
      (args: Seq[Expression]) => {
        val fn = "graft_table_changes"
        require(args.length == 3,
          s"$fn(target, from_version, to_version) takes 3 arguments; " +
            s"got ${args.length}")
        val spark = SparkSession.active
        val path = resolveTarget(spark, strArg(args, 0, fn))
        val df = Snapshots.changeFeed(spark, path,
          longArg(args, 1, fn), longArg(args, 2, fn))
        org.apache.spark.sql.graft.Bridge.planOf(df)
      }),
    (FunctionIdentifier("graft_table_files"),
      new ExpressionInfo("graft.functions.SnapshotTableFunctions",
        "graft_table_files"),
      (args: Seq[Expression]) => {
        val fn = "graft_table_files"
        require(args.length == 1 || args.length == 2,
          s"$fn(target[, version]) takes 1-2 arguments; " +
            s"got ${args.length}")
        val spark = SparkSession.active
        val df = Snapshots.tableFiles(spark,
          resolveTarget(spark, strArg(args, 0, fn)),
          if (args.length == 2) Some(longArg(args, 1, fn)) else None)
        org.apache.spark.sql.graft.Bridge.planOf(df)
      }),
    (FunctionIdentifier("graft_table_history"),
      new ExpressionInfo("graft.functions.SnapshotTableFunctions",
        "graft_table_history"),
      (args: Seq[Expression]) => {
        val fn = "graft_table_history"
        require(args.length == 1,
          s"$fn(target) takes 1 argument; got ${args.length}")
        val spark = SparkSession.active
        val df = Snapshots.history(spark,
          resolveTarget(spark, strArg(args, 0, fn)))
        org.apache.spark.sql.graft.Bridge.planOf(df)
      }))
}
