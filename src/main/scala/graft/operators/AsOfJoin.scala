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
    val lSel = Seq(col(keyCol).as("__k"), col(leftTimeCol).as("__t"), lit(1).as("__side")) ++
      leftCols.map(left(_)) ++
      rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(c))
    val rSel = Seq(col(keyCol).as("__k"), col(rightTimeCol).as("__t"), lit(0).as("__side")) ++
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
      rightVals.map(right(_))
    val unioned = left.select(lSel: _*).unionByName(right.select(rSel: _*))
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.where(col("__side") === 1)
      .select(col("__k").as(keyCol) +: (leftCols ++ rightVals).map(col): _*)
  }
}
