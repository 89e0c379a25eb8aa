package org.apache.spark.sql.graftbridge

import graft.sources.{GraftGovernance, GraftTable}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, Filter, InsertIntoStatement, LogicalPlan, MergeIntoTable, Project, UpdateTable, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Analyzer rule: enforce table-declared masking / row-filter policies
  * ([[GraftGovernance]]) by wrapping every READ of a policied graft table
  * in `Project(masked columns, Filter(row filter, relation))`.
  *
  * Placement is the security argument:
  *  - the projection sits between the user plan and the relation, so user
  *    predicates on masked columns compare MASKED values — no raw-value
  *    probing through filters, joins or aggregates;
  *  - the row filter sits UNDER the projection, so the policy itself
  *    filters on raw values and Catalyst pushes it into the scan (stats
  *    pruning still applies);
  *  - masked aliases take FRESH expression ids (reusing the relation's
  *    ids would make the projection `sameOutput` as its child — a noop
  *    to the optimizer, which would strip the mask); parent references
  *    re-bind through `resolveOperatorsUpWithNewOutput`'s attribute
  *    mapping, the Catalyst API for output-changing rewrites.
  *
  * Batch, streaming (`readStream.table`) and time-travel relations are
  * all wrapped (a pinned [[GraftTable]] inherits the policies). Write
  * positions stay untouched: commands only ever sit at the plan ROOT, so
  * the rule peels INSERT / UPDATE / DELETE / MERGE there and governs
  * only their read-side children — appends never read their target, and
  * row-level rewrites are refused at `newRowLevelOperationBuilder`
  * outside the admin bypass (wrapping their target would corrupt the
  * copy-on-write read-back).
  *
  * Idempotency across fixpoint iterations: wrapped relation instances
  * are tagged; tags survive `makeCopy`, so the rule fires once per
  * relation.
  */
class GraftGovernanceRule(spark: SparkSession) extends Rule[LogicalPlan] {

  import GraftGovernanceRule.GovernedTag

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (GraftGovernance.bypass(spark)) plan
    else plan match {
      // commands are always root-level: skip their write-target child,
      // govern the read side (an INSERT ... SELECT over a masked table
      // still reads masked)
      case i: InsertIntoStatement =>
        i.mapChildren(c => if (c eq i.table) c else governed(c))
      case u: UpdateTable =>
        u.mapChildren(c => if (c eq u.table) c else governed(c))
      case d: DeleteFromTable =>
        d.mapChildren(c => if (c eq d.table) c else governed(c))
      case m: MergeIntoTable =>
        m.mapChildren(c => if (c eq m.targetTable) c else governed(c))
      case w: V2WriteCommand => w.mapChildren(governed) // table not a child
      case other => governed(other)
    }

  private def governed(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUpWithNewOutput {
      case rel: DataSourceV2Relation if wrappable(rel.table) &&
          rel.getTagValue(GovernedTag).isEmpty =>
        rel.setTagValue(GovernedTag, true)
        wrap(rel, rel.table.asInstanceOf[GraftTable], rel.output)
      case s: StreamingRelationV2 if wrappable(s.table) &&
          s.getTagValue(GovernedTag).isEmpty =>
        s.setTagValue(GovernedTag, true)
        wrap(s, s.table.asInstanceOf[GraftTable], s.output)
    }

  private def wrappable(t: org.apache.spark.sql.connector.catalog.Table): Boolean =
    t match {
      case g: GraftTable => GraftGovernance.policied(g)
      case _ => false
    }

  private def wrap(rel: LogicalPlan, t: GraftTable, output: Seq[Attribute])
      : (LogicalPlan, Seq[(Attribute, Attribute)]) = {
    val parser = spark.sessionState.sqlParser
    val filtered = t.rowFilter match {
      case Some(text) => Filter(parser.parseExpression(text), rel)
      case None => rel
    }
    val mapping = Seq.newBuilder[(Attribute, Attribute)]
    val projected: Seq[NamedExpression] = output.map { a =>
      t.maskCols.get(a.name) match {
        case Some(policy) =>
          // built RESOLVED (fresh alias ids need concrete attributes now)
          val masked = Alias(GraftGovernance.maskExpr(policy, a), a.name)()
          mapping += a -> masked.toAttribute
          masked
        case None => a
      }
    }
    (Project(projected, filtered), mapping.result())
  }
}

object GraftGovernanceRule {
  private[graftbridge] val GovernedTag =
    TreeNodeTag[Boolean]("graft.governance.applied")
}
