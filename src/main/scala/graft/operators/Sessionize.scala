package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization (batch). The streaming twin lives in
  * graft.streaming.StreamOps. Works on integer epoch seconds so results are
  * engine-portable regardless of source timestamp precision.
  */
object Sessionize {

  /** events(userCol, secCol epoch-seconds, idCol tiebreak) → one row per
    * (user, session): n_events, start_sec, end_sec.
    */
  def sessions(events: DataFrame, userCol: String, secCol: String,
               idCol: String, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(userCol).orderBy(col(secCol), col(idCol))
    val withNew = events.withColumn("prev_sec", lag(col(secCol), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_sec").isNull || col(secCol) - col("prev_sec") > gapSeconds, 1)
          .otherwise(0))
    val withSession = withNew.withColumn("session_idx",
      sum(col("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withSession.groupBy(col(userCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(secCol)).as("start_sec"),
        max(col(secCol)).as("end_sec"))
  }
}
