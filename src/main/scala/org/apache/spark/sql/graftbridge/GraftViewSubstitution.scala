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
  * The substituted body re-enters resolution, so views over views chain;
  * a self-referential view fails loudly at the analyzer's iteration
  * limit rather than looping. View bodies are stored with the catalog
  * prefix the creator used — fully-qualified references resolve
  * identically from any session.
  */
class GraftViewSubstitution(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u @ UnresolvedRelation(parts, _, _) if parts.length >= 3 =>
        substitute(parts).getOrElse(u)
    }

  private def substitute(parts: Seq[String]): Option[LogicalPlan] =
    try {
      spark.sessionState.catalogManager.catalog(parts.head) match {
        case g: graft.sources.GraftCatalog =>
          val ident = Identifier.of(parts.tail.init.toArray, parts.last)
          if (!g.viewExists(ident)) None
          else {
            val v = g.loadView(ident)
            Some(SubqueryAlias(parts.last,
              spark.sessionState.sqlParser.parsePlan(v.query())))
          }
        case _ => None
      }
    } catch {
      // not a registered catalog / no such namespace: someone else's
      // relation — leave it for the normal resolution rules
      case _: Exception => None
    }
}
