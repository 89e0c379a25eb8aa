package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedIdentifier, UnresolvedNamespace, UnresolvedView}
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{CreateView, DropView, LogicalPlan, SetViewProperties, ShowViews, UnsetViewProperties}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Identifier, ViewChange, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** Native view DDL for graft catalogs: `CREATE [OR REPLACE] VIEW
  * [IF NOT EXISTS] cat.db.v AS ...`, `DROP VIEW [IF EXISTS] cat.db.v`
  * and `SHOW VIEWS IN cat.db`, routed to the catalog's dormant DSv2
  * `ViewCatalog` surface (createView/replaceView/dropView/listViews).
  *
  * Spark 4.1 parses these statements but wires no execution for v2
  * catalogs — `ResolveSessionCatalog` throws MISSING_CATALOG_ABILITY
  * inside the Resolution batch, BEFORE any injected resolution rule
  * runs. So this rule is injected as a HINT-resolution rule: the Hints
  * batch executes ahead of Resolution, while the statement still carries
  * its `UnresolvedIdentifier`, and statements on non-graft catalogs pass
  * through untouched for Spark's own rules.
  *
  * The view body is validated and pinned exactly like the TVF create
  * path ([[GraftViewResolution.analyzeInContext]]): resolution runs in
  * the view's own catalog.namespace — the context every read pins.
  */
class GraftViewDDL(spark: SparkSession) extends Rule[LogicalPlan] {

  private def graftCatalog(name: String): Option[graft.sources.GraftCatalog] =
    try {
      spark.sessionState.catalogManager.catalog(name) match {
        case g: graft.sources.GraftCatalog => Some(g)
        case _ => None
      }
    } catch { case _: Exception => None }

  /** (catalogName, identifier) when `parts` names a view location in a
    * graft catalog — explicitly (`cat.db.v`) or via the session's current
    * catalog/namespace. Temp-view names always belong to Spark.
    */
  private def target(parts: Seq[String]): Option[(String, Identifier)] = {
    if (parts.length <= 2 &&
        spark.sessionState.catalog.isTempView(parts)) return None
    if (parts.length >= 3 && graftCatalog(parts.head).isDefined)
      Some((parts.head, Identifier.of(parts.tail.init.toArray, parts.last)))
    else {
      val cm = spark.sessionState.catalogManager
      val cur = cm.currentCatalog.name()
      if (parts.length >= 3 || graftCatalog(cur).isEmpty) None
      else {
        val ns = if (parts.length == 2) Array(parts.head) else cm.currentNamespace
        Some((cur, Identifier.of(ns, parts.last)))
      }
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case cv @ CreateView(UnresolvedIdentifier(parts, _), cols, comment,
        collation, props, originalText, _, allowExisting, replace, _) =>
      target(parts).map { case (cat, ident) =>
        require(cols.isEmpty,
          "graft CREATE VIEW: column lists are not supported — alias the " +
            "columns in the body (SELECT x AS a, ...)")
        require(collation.isEmpty,
          "graft CREATE VIEW: DEFAULT COLLATION is not supported")
        val body = originalText.getOrElse(throw new IllegalArgumentException(
          "graft CREATE VIEW: the view body's SQL text is required"))
        GraftCreateViewCommand(cat, ident, body,
          props ++ comment.map("comment" -> _), allowExisting, replace)
          : LogicalPlan
      }.getOrElse(cv)
    case dv @ DropView(UnresolvedIdentifier(parts, _), ifExists) =>
      target(parts).map(t =>
        GraftDropViewCommand(t._1, t._2, ifExists): LogicalPlan)
        .getOrElse(dv)
    case sp @ SetViewProperties(UnresolvedView(parts, _, _, _), props) =>
      target(parts).map(t =>
        GraftAlterViewCommand(t._1, t._2,
          props.toSeq.map { case (k, v) => ViewChange.setProperty(k, v) })
          : LogicalPlan)
        .getOrElse(sp)
    case up @ UnsetViewProperties(UnresolvedView(parts, _, _, _), keys, _) =>
      target(parts).map(t =>
        GraftAlterViewCommand(t._1, t._2,
          keys.map(ViewChange.removeProperty)): LogicalPlan)
        .getOrElse(up)
    case sv @ ShowViews(UnresolvedNamespace(parts, _), pattern, output)
        if parts.nonEmpty && graftCatalog(parts.head).isDefined =>
      GraftShowViewsCommand(parts.head, parts.tail, pattern, output)
  }
}

case class GraftCreateViewCommand(cat: String, ident: Identifier,
    body: String, props: Map[String, String], allowExisting: Boolean,
    replace: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val g = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[graft.sources.GraftCatalog]
    if (allowExisting && g.viewExists(ident)) return Nil
    // resolve NOW in the context reads will pin: validates the body and
    // captures the schema SHOW/describe surfaces report
    val resolved = GraftViewResolution.analyzeInContext(
      spark, cat, ident.namespace(), body)
    val jprops = new java.util.HashMap[String, String]()
    props.foreach { case (k, v) => jprops.put(k, v) }
    val info = new ViewInfo(ident, body, cat, ident.namespace(),
      resolved.schema, resolved.schema.fieldNames,
      Array.empty[String], Array.empty[String], jprops)
    if (replace) g.replaceView(info, orCreate = true)
    else g.createView(info)
    Nil
  }
}

case class GraftDropViewCommand(cat: String, ident: Identifier,
    ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val g = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[graft.sources.GraftCatalog]
    if (!g.dropView(ident) && !ifExists)
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchViewException(ident)
    Nil
  }
}

case class GraftAlterViewCommand(cat: String, ident: Identifier,
    changes: Seq[ViewChange]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val g = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[graft.sources.GraftCatalog]
    g.alterView(ident, changes: _*)
    Nil
  }
}

case class GraftShowViewsCommand(cat: String, ns: Seq[String],
    pattern: Option[String], override val output: Seq[Attribute])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val g = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[graft.sources.GraftCatalog]
    val nsParts =
      if (ns.nonEmpty) ns.toArray
      else spark.sessionState.catalogManager.currentNamespace
    g.listViews(nsParts: _*).toSeq
      .filter(id => pattern.forall(p =>
        org.apache.spark.sql.catalyst.util.StringUtils
          .filterPattern(Seq(id.name()), p).nonEmpty))
      .map(id => Row(nsParts.mkString("."), id.name(), false))
  }
}
