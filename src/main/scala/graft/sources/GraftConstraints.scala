package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BooleanType, StructType}

/** Write-time CHECK / NOT NULL enforcement for graft-catalog tables — the
  * quality gate a lakehouse puts at the DOOR instead of in every consumer:
  *
  *   CREATE TABLE t (...) TBLPROPERTIES('graft.check.qty_range' =
  *     'qty BETWEEN 0 AND 100')
  *
  * Every row written through any path — INSERT append, copy-on-write
  * MERGE/UPDATE rewrites, merge-on-read delta inserts — is evaluated
  * against each constraint in the parquet writer itself (codegen'd
  * predicate, no extra pass over the data); the FIRST violation fails the
  * task loudly with the constraint name and the offending row. Because
  * every commit on this catalog is atomic (staged files + manifest /
  * rename commit point), a failed write leaves NO partial state: the
  * table reads exactly as before the attempt.
  *
  * Semantics are standard SQL CHECK: a row passes when the condition is
  * TRUE or UNKNOWN (NULL); it fails only when the condition is FALSE —
  * so `qty > 0` admits NULL qty unless the column is also declared NOT
  * NULL (non-nullable schema fields get an implicit IS NOT NULL check).
  *
  * Constraints are validated at CREATE TABLE (parse + resolve against the
  * schema, boolean type, deterministic, no aggregates), so a typo fails
  * the DDL, not the first insert three days later.
  */
object GraftConstraints {

  /** Table-property prefix: `graft.check.<name>` → SQL boolean text. */
  val Prefix = "graft.check."

  /** Parse and analyze one CHECK expression against a row shape; returns
    * the resolved condition over `attrs`. Throws on unknown columns,
    * non-boolean type, nondeterminism, or aggregate functions.
    */
  def resolve(spark: SparkSession, attrs: Seq[Attribute], name: String,
              text: String): Expression = {
    val cond = resolveExpr(spark, attrs, s"CHECK constraint $name", text)
    require(cond.dataType == BooleanType,
      s"CHECK constraint $name ('$text') must be BOOLEAN, is ${cond.dataType.simpleString}")
    require(cond.deterministic,
      s"CHECK constraint $name ('$text') must be deterministic")
    require(!cond.exists(_.isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression]),
      s"CHECK constraint $name ('$text') cannot aggregate — it is a row predicate")
    cond
  }

  /** Parse + analyze one scalar expression against a row shape — shared
    * by CHECK constraints and generated columns. RuntimeReplaceable nodes
    * (BETWEEN, ilike, ...) carry a replacement the optimizer normally
    * swaps in — eval on the raw node asserts, so swap here; the
    * replacement may use Spark 4's With/CommonExpressionRef sharing — the
    * defs are inlined (these expressions are tiny).
    */
  def resolveExpr(spark: SparkSession, attrs: Seq[Attribute], what: String,
                  text: String): Expression = {
    val parsed = spark.sessionState.sqlParser.parseExpression(text)
    val analyzed = Bridge.ofRows(spark,
      Filter(org.apache.spark.sql.catalyst.expressions.EqualTo(
        parsed, parsed), LocalRelation(attrs))).queryExecution.analyzed
    val resolved = analyzed.collectFirst {
      case Filter(org.apache.spark.sql.catalyst.expressions.EqualTo(l, _), _) => l
    }.getOrElse(throw new IllegalArgumentException(
      s"$what ('$text') did not analyze to a row expression"))
    resolved.transformUp {
      case r: RuntimeReplaceable => r.replacement
    }.transformUp {
      case w: With =>
        val defs = w.defs.map(d => d.id -> d.child).toMap
        w.child.transformUp {
          case ref: CommonExpressionRef => defs(ref.id)
        }
    }
  }

  /** Validate every check against a (possibly evolved) schema — used at
    * CREATE TABLE and at ALTER TABLE DROP COLUMN (dropping a column a
    * check references must fail the DDL, not poison future writes).
    */
  def validate(spark: SparkSession, schema: StructType,
               checks: Seq[(String, String)]): Unit = {
    val attrs = toAttrs(schema)
    checks.foreach { case (n, t) => resolve(spark, attrs, n, t) }
  }

  private def toAttrs(schema: StructType): Seq[Attribute] =
    schema.fields.toSeq.map(f => AttributeReference(f.name, f.dataType, f.nullable)())

  /** Bound VIOLATION predicates for a write of `rowSchema`-shaped rows
    * (the incoming row may carry extra metadata columns on rewrite paths).
    * A row VIOLATES when the predicate evaluates TRUE:
    *   - named checks: `condition <=> FALSE` (NULL passes, SQL CHECK)
    *   - implicit NOT NULL for each non-nullable table field present in
    *     the row shape: `IS NULL`
    * Driver-side resolution + binding; the executor only compiles.
    */
  def violationPredicates(spark: SparkSession, table: GraftTable,
                          rowSchema: StructType): Seq[(String, Expression)] = {
    val notNullFields = table.schema().fields.filterNot(_.nullable).toSeq
    if (table.checks.isEmpty && notNullFields.isEmpty) return Nil
    val attrs = toAttrs(rowSchema)
    val named = table.checks.map { case (name, text) =>
      val cond = resolve(spark, attrs, name, text)
      name -> BindReferences.bindReference(
        EqualNullSafe(cond, Literal(false)), attrs)
    }
    val notNull = notNullFields.flatMap { f =>
      attrs.find(_.name == f.name).map(a =>
        s"NOT NULL ${f.name}" ->
          BindReferences.bindReference(IsNull(a): Expression, attrs))
    }
    named ++ notNull
  }
}
