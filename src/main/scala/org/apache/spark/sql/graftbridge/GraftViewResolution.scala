package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.QueryPlanningTracker
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.connector.catalog.View

/** Resolves a stored view body against the view's RECORDED context —
  * the catalog + namespace captured at CREATE time — instead of whatever
  * catalog/namespace the READING session happens to have current. This is
  * Spark's view-resolution contract (a body written `FROM t` keeps
  * meaning the t it meant), done by pinning the session's
  * currentCatalog/currentNamespace around one nested analyzer run.
  *
  * Both read paths share this: the `GraftViewSubstitution` analyzer rule
  * (native `FROM cat.ns.v`) and the `graft_view` TVF. The nested
  * `executeAndCheck` is re-entrant (the analyzer saves/restores its
  * thread-local AnalysisContext), so views over views chain; direct or
  * mutual self-reference is cut off loudly by a thread-local resolution
  * stack rather than a stack overflow.
  */
object GraftViewResolution {

  private val inFlight = new ThreadLocal[Set[String]] {
    override def initialValue(): Set[String] = Set.empty
  }

  /** Fully-resolved plan of `v`'s body, resolution pinned to the view's
    * stored context. Throws loudly on recursive definitions, resolution
    * failure, or drift between the pinned schema and what the body
    * resolves to today (names/arity — a base-table evolution that changes
    * the view's shape needs an explicit re-create, not silent drift).
    */
  def resolvedBody(spark: SparkSession, v: View): LogicalPlan = {
    val key = s"${v.currentCatalog()}.${v.currentNamespace().mkString(".")}.${v.name()}"
    if (inFlight.get().contains(key))
      throw new IllegalStateException(
        s"view ${v.name()} is recursive (resolution cycle through $key)")
    inFlight.set(inFlight.get() + key)
    try {
      val analyzed = analyzeInContext(spark, v.currentCatalog(),
        v.currentNamespace(), v.query())
      val pinned = v.schema().fieldNames
      val now = analyzed.schema.fieldNames
      val resolver = spark.sessionState.conf.resolver
      require(pinned.length == now.length &&
          pinned.zip(now).forall { case (a, b) => resolver(a, b) },
        s"view ${v.name()}: the body now resolves to " +
          s"(${now.mkString(", ")}) but the view was created with " +
          s"(${pinned.mkString(", ")}) — the base tables evolved under " +
          "it; CREATE OR REPLACE the view to adopt the new shape")
      analyzed
    } finally inFlight.set(inFlight.get() - key)
  }

  /** Parse + fully analyze `body` with the session's current catalog and
    * namespace pinned to the given context (restored afterwards). The
    * CREATE path validates through this too, so a body is provably
    * resolvable in exactly the context reads will use.
    */
  def analyzeInContext(spark: SparkSession, cat: String, ns: Array[String],
                       body: String): LogicalPlan = {
    val cm = spark.sessionState.catalogManager
    val prevCat = cm.currentCatalog.name()
    val prevNs = cm.currentNamespace
    cm.setCurrentCatalog(cat)
    cm.setCurrentNamespace(ns)
    try {
      val parsed = spark.sessionState.sqlParser.parsePlan(body)
      spark.sessionState.analyzer.executeAndCheck(
        parsed, new QueryPlanningTracker)
    } finally {
      cm.setCurrentCatalog(prevCat)
      cm.setCurrentNamespace(prevNs)
    }
  }
}
