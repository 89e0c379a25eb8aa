package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the latest right row with
  * rightTime <= leftTime, per key — the standard event/time-series
  * enrichment Spark has no built-in operator for.
  *
  * Composed from existing operators (the brief's preference (a)): tag both
  * sides, union, and run one per-key window pass where `last(_, ignoreNulls)`
  * carries the most recent right values forward; right rows sort before
  * left rows at equal timestamps so an update at time t is visible to an
  * event at time t. Cost: one shuffle + sort on (key, time) — linear, vs.
  * the quadratic range-condition join a naive formulation produces.
  *
  * `right` must be unique per (key, time) — pre-aggregate otherwise — or
  * the tie among simultaneous right rows is nondeterministic.
  */
object AsOfJoin {

  def asofLast(left: DataFrame, right: DataFrame, keyCol: String,
               leftTimeCol: String, rightTimeCol: String): DataFrame = {
    val rightVals = right.columns.filterNot(c => c == keyCol || c == rightTimeCol).toSeq
    val leftCols = left.columns.filterNot(_ == keyCol).toSeq
    require(rightVals.intersect(leftCols).isEmpty,
      s"overlapping value columns: ${rightVals.intersect(leftCols).mkString(",")}")
    // Carry the right values as ONE struct so the window fill is atomic:
    // per-column last(_, ignoreNulls) would mix columns from different right
    // rows whenever a right value is NULL, and could never surface the
    // latest row's legitimate NULL.
    val rStructType = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c).copy(name = c)))
    val lSel = Seq(col(keyCol).as("__k"), col(leftTimeCol).as("__t"), lit(1).as("__side")) ++
      leftCols.map(left(_)) :+
      lit(null).cast(rStructType).as("__rv")
    val rSel = Seq(col(keyCol).as("__k"), col(rightTimeCol).as("__t"), lit(0).as("__side")) ++
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
      struct(rightVals.map(right(_)): _*).as("__rv")
    val unioned = left.select(lSel: _*).unionByName(right.select(rSel: _*))
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
    filled.where(col("__side") === 1)
      .select(col("__k").as(keyCol) +: (leftCols.map(col) ++ rightVals.map(c => col(s"__rv.$c").as(c))): _*)
  }
}
