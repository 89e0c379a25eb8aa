package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier

/** Analyzer rule: substitute `catalog.ns....v` relations that name a
  * STORED VIEW of a graft catalog with the view's parsed body, so
  * `SELECT * FROM graft.db.v` (and joins, subqueries, CTEs over it)
  * resolves natively.
  *
  * Spark 4.1 ships the DSv2 `ViewCatalog` interface but wires NOTHING to
  * it — no analyzer resolution, no CREATE VIEW execution (the session-
  * catalog path throws MISSING_CATALOG_ABILITY for any v2 catalog). This
  * rule is that missing wiring for graft catalogs, injected through
  * `spark.sql.extensions=graft.GraftExtensions`; sessions without the
  * extension still reach stored views through the `graft_view` TVF.
  *
  * The body resolves through [[GraftViewResolution]] — one nested
  * analyzer run pinned to the view's RECORDED catalog/namespace, so an
  * unqualified `FROM t` in the body keeps meaning the creator's t, never
  * the reader's; views over views chain through the re-entrant nested
  * run, and self-reference fails loudly on the resolution-stack guard.
  */
class GraftViewSubstitution(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u @ UnresolvedRelation(parts, _, _) if parts.length >= 3 =>
        substitute(parts).getOrElse(u)
    }

  private def substitute(parts: Seq[String]): Option[LogicalPlan] = {
    // catalog lookup errors mean "someone else's relation" — leave those
    // for the normal resolution rules; errors RESOLVING a view we do own
    // (bad body, schema drift, recursion) must surface, not be swallowed
    // into a misleading TABLE_OR_VIEW_NOT_FOUND
    val view = try {
      spark.sessionState.catalogManager.catalog(parts.head) match {
        case g: graft.sources.GraftCatalog =>
          val ident = Identifier.of(parts.tail.init.toArray, parts.last)
          if (g.viewExists(ident)) Some(g.loadView(ident)) else None
        case _ => None
      }
    } catch { case _: Exception => None }
    view.map(v => SubqueryAlias(parts.last,
      GraftViewResolution.resolvedBody(spark, v)))
  }
}
