package graft.plans

import graft.ops.Snapshots
import graft.sources.SnapshotTable
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.Bridge

/** SQL row-level DML for the `graft-snapshot` lakehouse — the Delta
  * "V1 command fallback" architecture: a post-hoc RESOLUTION rule
  * rewrites analyzed `UPDATE`/`MERGE INTO` plans over a snapshot table
  * into runnable commands that route through the engine's own
  * copy-on-write primitives ([[Snapshots.update]]/[[Snapshots.merge]]),
  * inheriting the full commit protocol — stats-pruned touched-file
  * planning, CHECK constraints, optimistic concurrency, and the
  * row-exact `_change_data` CDC sidecar. Registered by
  * [[graft.GraftExtensions]] (`spark.sql.extensions=graft
  * .GraftExtensions`), the same front door the native SQL functions
  * use. `DELETE FROM`/`TRUNCATE` need no rule: they ride the standard
  * V2 `SupportsDelete` capability on [[SnapshotTable]].
  *
  * The rewrite fires only on RESOLVED plans, and the commands execute
  * at RUN time (never during analysis — `EXPLAIN UPDATE ...` stays
  * side-effect-free). */
case class SnapshotDmlRule(session: SparkSession)
    extends Rule[LogicalPlan] {

  private def snapshotPath(plan: LogicalPlan): Option[String] =
    plan match {
      case DataSourceV2Relation(t: SnapshotTable, _, _, _, _, _) =>
        Some(t.tablePath)
      case SubqueryAlias(_, child) => snapshotPath(child)
      case _ => None
    }

  /** Clause payloads travel as SQL TEXT and re-parse with `expr()` at
    * run time; a subquery (EXISTS/IN/scalar, correlated or not) does
    * not survive that round-trip — it would surface as a runtime
    * parse/resolution failure AFTER analysis succeeded. Reject it
    * typed at analysis time like every other unsupported shape. */
  private def checkRoundTrips(e: Expression, where: String): Expression = {
    e.foreach {
      case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
        throw new UnsupportedOperationException(
          s"graft-snapshot $where does not support subqueries (got " +
            s"${s.prettyName}) — pre-compute the subquery into the " +
            "MERGE source (a join), or into a literal for UPDATE")
      case _ => ()
    }
    e
  }

  /** Analyzed target-side expressions carry AttributeReferences bound
    * to the DML plan's relation; the engine re-issues them against its
    * OWN scan of the same table, so they must resolve by NAME again
    * (snapshot schemas are flat — names are unambiguous). */
  private def unresolve(e: Expression): Expression =
    checkRoundTrips(e, "UPDATE").transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    }

  /** An assignment list that maps every target column to the
    * SAME-NAMED source attribute — what `UPDATE SET *` / `INSERT *`
    * expand to during resolution. */
  private def isIdentityAssignments(assigns: Seq[Assignment],
      sourceOut: org.apache.spark.sql.catalyst.expressions.AttributeSet)
      : Boolean =
    assigns.forall { a =>
      (a.key, a.value) match {
        case (k: AttributeReference, v: AttributeReference) =>
          k.name.equalsIgnoreCase(v.name) && sourceOut.contains(v)
        case _ => false
      }
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case u @ UpdateTable(table, assignments, condition)
          if u.resolved && snapshotPath(table).isDefined =>
        val path = snapshotPath(table).get
        // the command carries SQL TEXT, not expressions: CheckAnalysis
        // walks every Expression field of a command, and both
        // unresolved names and another plan's resolved attributes fail
        // it — the engine re-parses against its own scan at run time
        val assigns = assignments.map { a =>
          val name = a.key match {
            case attr: Attribute => attr.name
            case other => throw new UnsupportedOperationException(
              "graft-snapshot UPDATE supports top-level column " +
                s"assignments only; got $other")
          }
          name -> unresolve(a.value).sql
        }
        SnapshotUpdateCommand(path,
          condition.map(c => unresolve(c).sql), assigns)

      case m @ MergeIntoTable(target, source, cond,
            matched, notMatched, notMatchedBySource, withSchemaEvolution)
          if m.resolved && snapshotPath(target).isDefined =>
        val path = snapshotPath(target).get
        // `WITH SCHEMA EVOLUTION` needs no handling here: Spark's
        // ResolveMergeIntoSchemaEvolution already computed the schema
        // changes, routed them through this catalog's alterTable (the
        // append-evolution ADD COLUMN commit) and re-resolved the
        // target relation against the WIDENED table — by the time this
        // rule fires, the new columns are ordinary target columns.
        // Evolution is therefore two commits (metadata + the merge),
        // each atomic; a source column whose TYPE conflicts fails in
        // alterTable's typed guards.
        val targetOut = target.outputSet
        val sourceOut = source.outputSet
        val keys = splitConjuncts(cond).map {
          case EqualTo(a: AttributeReference, b: AttributeReference)
              if a.name.equalsIgnoreCase(b.name) &&
                ((targetOut.contains(a) && sourceOut.contains(b)) ||
                 (targetOut.contains(b) && sourceOut.contains(a))) =>
            a.name
          case other => throw new UnsupportedOperationException(
            "graft-snapshot MERGE needs an equi-condition on same-named " +
              s"key columns (t.k = s.k [AND ...]); got $other")
        }
        // the canonical unconditional UPSERT routes to the leaner
        // Snapshots.merge (no outer join — anti-join + union); every
        // other clause combination compiles to Snapshots.mergeInto
        val upsertShape = (matched match {
          case Seq(UpdateStarAction(None)) => true
          case Seq(UpdateAction(None, assigns, _)) =>
            isIdentityAssignments(assigns, source.outputSet)
          case _ => false
        }) && (notMatched match {
          case Seq(InsertStarAction(None)) => true
          case Seq(InsertAction(None, assigns)) =>
            isIdentityAssignments(assigns, source.outputSet)
          case _ => false
        }) && notMatchedBySource.isEmpty
        if (upsertShape) SnapshotMergeCommand(path, source, keys)
        else {
          // clause payloads travel as SQL TEXT (see the UPDATE rule
          // above): source-side attributes re-spell under the engine's
          // merge-source prefix, target-side by bare name — exactly the
          // joined-row namespace Snapshots.mergeInto evaluates in
          def rw(e: Expression): String =
            checkRoundTrips(e, "MERGE clause").transform {
              case a: AttributeReference if sourceOut.contains(a) =>
                UnresolvedAttribute.quoted(Snapshots.MergeSrcPrefix + a.name)
              case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
            }.sql
          def assignPairs(assigns: Seq[Assignment]): Seq[(String, String)] =
            assigns.map { a =>
              val name = a.key match {
                case attr: Attribute => attr.name
                case other => throw new UnsupportedOperationException(
                  "graft-snapshot MERGE supports top-level column " +
                    s"assignments only; got $other")
              }
              name -> rw(a.value)
            }
          def starPairs: Seq[(String, String)] =
            target.output.map(a => a.name ->
              UnresolvedAttribute
                .quoted(Snapshots.MergeSrcPrefix + a.name).sql)
          val matchedSpec = matched.map {
            case UpdateStarAction(c) => (c.map(rw), Some(starPairs))
            case UpdateAction(c, assigns, _) =>
              (c.map(rw), Some(assignPairs(assigns)))
            case DeleteAction(c) => (c.map(rw), None)
            case other => throw new UnsupportedOperationException(
              s"graft-snapshot MERGE: unsupported matched action $other")
          }
          val notMatchedSpec = notMatched.map {
            case InsertStarAction(c) => (c.map(rw), starPairs)
            case InsertAction(c, assigns) =>
              (c.map(rw), assignPairs(assigns))
            case other => throw new UnsupportedOperationException(
              s"graft-snapshot MERGE: unsupported not-matched action " +
                s"$other")
          }
          val bySourceSpec = notMatchedBySource.map {
            case UpdateAction(c, assigns, _) =>
              (c.map(rw), Some(assignPairs(assigns)))
            case DeleteAction(c) => (c.map(rw), None)
            case other => throw new UnsupportedOperationException(
              "graft-snapshot MERGE: unsupported not-matched-by-source " +
                s"action $other")
          }
          SnapshotMergeIntoCommand(path, source, keys, matchedSpec,
            notMatchedSpec, bySourceSpec)
        }
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}

/** `UPDATE <snapshot table> SET ... [WHERE ...]` → one copy-on-write
  * [[Snapshots.update]] commit. Condition and SET values travel as SQL
  * text (see [[SnapshotDmlRule]]) and re-parse in the session at run
  * time. */
case class SnapshotUpdateCommand(path: String,
    conditionSql: Option[String],
    assignments: Seq[(String, String)])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(session: SparkSession): Seq[Row] = {
    val cond = conditionSql
      .map(org.apache.spark.sql.functions.expr)
      .getOrElse(org.apache.spark.sql.functions.lit(true))
    Snapshots.update(session, path, cond,
      assignments.map { case (n, s) =>
        n -> org.apache.spark.sql.functions.expr(s) }.toMap)
    Nil
  }
}

/** `MERGE INTO <snapshot table> t USING src ON t.k = src.k WHEN
  * MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *` → one
  * copy-on-write [[Snapshots.merge]] upsert commit. The source plan is
  * executed at run time. */
case class SnapshotMergeCommand(path: String, source: LogicalPlan,
    keys: Seq[String]) extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(session: SparkSession): Seq[Row] = {
    Snapshots.merge(session, path, Bridge.ofRows(session, source), keys)
    Nil
  }
}

/** General `MERGE INTO` over a snapshot table → one copy-on-write
  * [[Snapshots.mergeInto]] commit. Clause conditions and assignments
  * travel as SQL text in the joined-row namespace (target columns
  * bare, source columns under the merge-source prefix — see
  * [[SnapshotDmlRule]]) and re-parse at run time; an assignment list
  * of `None` encodes DELETE. */
case class SnapshotMergeIntoCommand(path: String, source: LogicalPlan,
    keys: Seq[String],
    matched: Seq[(Option[String], Option[Seq[(String, String)]])],
    notMatched: Seq[(Option[String], Seq[(String, String)])],
    notMatchedBySource: Seq[(Option[String], Option[Seq[(String, String)]])])
    extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.expr
    def action(assigns: Option[Seq[(String, String)]]): Snapshots.MergeAction =
      assigns match {
        case Some(as) => Snapshots.MergeUpdate(
          as.map { case (n, s) => n -> expr(s) }.toMap)
        case None => Snapshots.MergeDelete
      }
    Snapshots.mergeInto(session, path, Bridge.ofRows(session, source),
      keys,
      matched = matched.map { case (c, as) =>
        Snapshots.WhenMatched(c.map(expr), action(as)) },
      notMatched = notMatched.map { case (c, as) =>
        Snapshots.WhenNotMatched(c.map(expr),
          as.map { case (n, s) => n -> expr(s) }.toMap) },
      notMatchedBySource = notMatchedBySource.map { case (c, as) =>
        Snapshots.WhenNotMatchedBySource(c.map(expr), action(as)) })
    Nil
  }
}
