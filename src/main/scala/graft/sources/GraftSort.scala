package graft.sources

import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection, SortOrder}
import org.apache.spark.sql.types._

/** Declared sort order on write — the `write.sort.cols` table property.
  *
  * The READ twin of index-on-write: declared columns make every write
  * land range-clustered files, so min/max whole-file skipping (the stats
  * log the writer already maintains) prunes range and point predicates
  * from the table's very first commit — no OPTIMIZE pass, no rebuild
  * lag. Mechanically it rides Spark's own v2 write contract
  * ([[org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering]],
  * the API Iceberg's write sort orders use):
  *
  *  - tables with NO other layout request `Distributions.ordered` — a
  *    RANGE shuffle, so files carry *disjoint* sort-key ranges (a range
  *    predicate plans O(matching) files, not O(files));
  *  - partitioned / bucketed / hidden-time tables keep their clustered
  *    distribution and APPEND the declared columns to the required
  *    ordering — each task owns whole layout units, so its files come
  *    out sorted within the unit;
  *  - copy-on-write row-level rewrites (UPDATE/DELETE/MERGE replacement
  *    writes) share the same trait, so maintenance never un-sorts what
  *    the declaration promised — exactly how declared indexes re-index
  *    behind compaction;
  *  - [[GraftMaintenance.compactTable]] defaults its clustering to the
  *    declared columns when the caller passes none.
  *
  * At 100 TB this is the difference between "we ran OPTIMIZE last week"
  * and a layout contract the commit protocol itself enforces.
  *
  * Scope guards (validated LOUDLY at CREATE and ALTER SET, never at
  * write time): physical columns only (layout columns cluster by path /
  * file name already), comparable scalar types (min/max bounds exist),
  * and never an identity or generated column — those values are produced
  * INSIDE the writer tasks, after any pre-write sort would have run.
  */
object GraftSort {

  val SortColsProp = "write.sort.cols"

  /** Parse the declared sort columns (CSV, order-significant). */
  def sortColsOf(props: Map[String, String]): Seq[String] =
    props.get(SortColsProp).toSeq.flatMap(_.split(","))
      .map(_.trim).filter(_.nonEmpty)

  private def comparable(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case DateType | TimestampType | TimestampNTZType => true
    case StringType | BooleanType => true
    case _ => false
  }

  /** Validate a declaration against the PHYSICAL schema (table schema
    * minus identity-partition columns) — driver-side, at DDL time.
    */
  def validate(cols: Seq[String], physicalSchema: StructType,
               identityCol: Option[String],
               generatedCols: Set[String]): Unit = {
    require(cols.distinct.size == cols.size,
      s"$SortColsProp: duplicate column in '${cols.mkString(",")}'")
    cols.foreach { c =>
      val f = physicalSchema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"$SortColsProp: column '$c' is not a physical column " +
            "(partition columns cluster by path already)"))
      require(comparable(f.dataType),
        s"$SortColsProp: column '$c' has type ${f.dataType.simpleString}; " +
          "sort clustering needs a comparable scalar (min/max bounds)")
      require(!identityCol.contains(c),
        s"$SortColsProp: column '$c' is an identity column — its values " +
          "are allocated inside the writer, after the sort would run")
      require(!generatedCols.contains(c),
        s"$SortColsProp: column '$c' is a generated column — its values " +
          "are computed inside the writer, after the sort would run")
    }
  }

  /** The declaration as connector sort orders (ascending, the layout
    * contract — descending adds nothing to min/max skipping).
    */
  def orders(cols: Seq[String]): Array[SortOrder] =
    cols.map(c => Expressions.sort(Expressions.column(c),
      SortDirection.ASCENDING)).toArray
}
