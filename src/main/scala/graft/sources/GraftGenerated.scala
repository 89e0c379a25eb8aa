package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, BindReferences, Cast, Expression}
import org.apache.spark.sql.types.{DataType, StructType}

/** GENERATED COLUMNS (`day DATE GENERATED ALWAYS AS (CAST(ts AS DATE))`) —
  * engine-computed derived columns, the second verb Spark only PARSES:
  * the DSv2 capability gates the DDL, the expression SQL rides
  * `Column.generationExpression()`, and computation is the connector's.
  *
  * Semantics: the value is computed on EVERY write path — appends, COW
  * rewrites (an UPDATE of a source column recomputes its derivations —
  * the invariant can never go stale), merge-on-read delta inserts. An
  * incoming explicit value must EQUAL the computed one (Delta's rule);
  * NULL/omitted always computes. Because computation precedes routing,
  * a generated column can be a PARTITION column — the classic
  * `PARTITIONED BY (day)` with `day GENERATED ALWAYS AS (CAST(ts AS
  * DATE))`, giving hidden-partition ergonomics through the identity
  * layout. CHECK constraints evaluate AFTER generation (they see the
  * computed values).
  *
  * Guards: generation expressions may reference only NON-generated,
  * non-identity columns (validated at CREATE — deterministic, no
  * aggregates, resolvable); renaming/dropping a referenced column — or
  * the generated column itself — refuses (the expression text resolves
  * by name).
  */
object GraftGenerated {

  /** Table-property prefix: `graft.generated.<col>` → expression SQL. */
  val Prefix = "graft.generated."

  def specsOf(props: Map[String, String]): Seq[(String, String)] =
    props.toSeq.filter(_._1.startsWith(Prefix))
      .map { case (k, v) => k.stripPrefix(Prefix) -> v }.sortBy(_._1)

  private def toAttrs(schema: StructType): Seq[Attribute] =
    schema.fields.toSeq.map(f =>
      AttributeReference(f.name, f.dataType, f.nullable)())

  /** Resolve one generation expression against the non-generated columns,
    * cast to the declared type. Throws on unknown/forbidden references,
    * nondeterminism, or aggregates.
    */
  def resolve(spark: SparkSession, schema: StructType, col: String,
              text: String, generatedCols: Set[String],
              identityCol: Option[String]): Expression = {
    val sources = StructType(schema.fields.filterNot(f =>
      generatedCols.contains(f.name) || identityCol.contains(f.name)))
    val attrs = toAttrs(sources)
    val e = GraftConstraints.resolveExpr(spark, attrs,
      s"generated column $col", text)
    require(e.deterministic,
      s"generated column $col ('$text') must be deterministic")
    require(!e.exists(_.isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression]),
      s"generated column $col ('$text') cannot aggregate — it is per-row")
    val dt = schema(col).dataType
    require(Cast.canCast(e.dataType, dt),
      s"generated column $col: expression type ${e.dataType.simpleString} " +
        s"does not cast to declared ${dt.simpleString}")
    if (e.dataType == dt) e else Cast(e, dt)
  }

  /** Column names a generation expression references (for ALTER guards). */
  def referencedCols(spark: SparkSession, text: String): Set[String] =
    spark.sessionState.sqlParser.parseExpression(text).collect {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        a.nameParts.head
    }.toSet

  /** Per-write bound generators: (column, index in rowSchema or -1 when
    * the write omits it, bound expression over rowSchema, declared type).
    * Bound against the FULL incoming row shape so source columns resolve
    * positionally; driver-side resolution, executors only compile.
    */
  def boundGenerators(spark: SparkSession, table: GraftTable,
                      rowSchema: StructType): Seq[(String, Int, Expression, DataType)] = {
    val specs = table.generated
    if (specs.isEmpty) return Nil
    val attrs = toAttrs(rowSchema)
    specs.map { case (col, text) =>
      // reference legality was validated at CREATE (resolve against the
      // non-generated source subset); binding here needs row positions
      val parsed = GraftConstraints.resolveExpr(spark, attrs,
        s"generated column $col", text)
      val dt = table.schema()(col).dataType
      val cast = if (parsed.dataType == dt) parsed else Cast(parsed, dt)
      val idx = rowSchema.fieldNames.indexOf(col)
      (col, idx, BindReferences.bindReference(cast, attrs), dt)
    }
  }
}
