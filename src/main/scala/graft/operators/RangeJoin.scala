package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: pair each point with every interval containing
  * it. Spark plans a raw `t BETWEEN s AND e` join as a broadcast
  * nested-loop — quadratic and driver-bound. This operator buckets time
  * into fixed chunks: an interval is exploded to the chunks it covers, a
  * point maps to one chunk, and the join becomes an equi-join on chunk
  * with an exact containment filter behind it. Shuffle is linear; row
  * amplification is avg(interval span / chunkSize) + 1, so pick chunkSize
  * near the typical interval length.
  */
object RangeJoin {

  def intervalJoin(points: DataFrame, intervals: DataFrame,
                   pointTimeCol: String, startCol: String, endCol: String,
                   chunkSize: Long): DataFrame = {
    require(chunkSize > 0)
    val p = points.withColumn("__chunk", floor(col(pointTimeCol) / chunkSize))
    val iv = intervals.withColumn("__chunk",
      explode(sequence(floor(col(startCol) / chunkSize), floor(col(endCol) / chunkSize))))
    p.join(iv, Seq("__chunk"))
      .where(col(pointTimeCol) >= col(startCol) && col(pointTimeCol) <= col(endCol))
      .drop("__chunk")
  }
}
