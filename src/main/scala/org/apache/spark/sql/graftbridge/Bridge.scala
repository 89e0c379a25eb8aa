package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression and DataFrame ⇄ LogicalPlan bridges. These Spark
  * internals are private[sql] in Spark 4, so the graft custom expressions
  * and plans go through this sub-package shim — the conventional way for
  * libraries to lift Catalyst constructs into the public API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER ColumnNode → Expression conversion. `expression` wraps the
    * column tree in a lazy ColumnNodeExpression, which is fine as a child
    * of a custom expression inside a Dataset plan (the analyzer converts
    * it) but UNEVALUABLE when returned from an injected SQL function
    * builder — builders must hand the analyzer a real expression tree.
    */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  def logicalPlan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed

  /** Fully-optimized plan of a DataFrame — used by the MV rewrite rule to
    * splice an already-planned replacement subtree into a plan that is
    * itself past the main optimizer batches (so the replacement must not
    * re-enter them).
    */
  def optimizedPlan(df: DataFrame): LogicalPlan = df.queryExecution.optimizedPlan

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Registered catalog plugin by name (CatalogManager is private[sql]). */
  def catalogPlugin(spark: SparkSession,
                    name: String): org.apache.spark.sql.connector.catalog.CatalogPlugin =
    spark.sessionState.catalogManager.catalog(name)

  /** DataFrame over an RDD[InternalRow] (`df.queryExecution.toRdd` shape):
    * the per-partition imperative operators (GlobalRank) stay in Tungsten
    * binary rows end-to-end instead of round-tripping through the external
    * Row encoder — the deserialize/reserialize pass dominates their cost.
    */
  def ofInternalRows(spark: SparkSession,
                     schema: org.apache.spark.sql.types.StructType,
                     rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow]): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
