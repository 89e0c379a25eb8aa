package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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

  /** Broadcast interval join for a SMALL intervals side (maintenance
    * windows, campaign periods, outage lists): the sorted interval table
    * ships to every task and each point binary-searches the candidate
    * range — the fact side never shuffles (the asofBroadcast trade applied
    * to stabbing queries). Candidates are intervals with start <= t,
    * pruned by the running max-end: scanning backward from the insertion
    * point stops as soon as maxEnd(0..i) < t, so per-point work is
    * O(log n + matches) for non-pathological overlap. Inner-join
    * semantics: points in no interval emit nothing, like intervalJoin.
    */
  def intervalJoinBroadcast(points: DataFrame, intervals: DataFrame,
                            pointTimeCol: String, startCol: String,
                            endCol: String,
                            maxBroadcastRows: Long = 10_000_000L): DataFrame = {
    val ivVals = intervals.columns.filterNot(c => c == startCol || c == endCol).toSeq
    require(ivVals.intersect(points.columns.toSeq).isEmpty,
      s"overlapping columns: ${ivVals.intersect(points.columns.toSeq).mkString(",")}")
    val outSchema = StructType(points.schema.fields ++
      (Seq(startCol, endCol) ++ ivVals).map(c => intervals.schema(c).copy(name = c)))
    val tIdx = points.schema.fieldIndex(pointTimeCol)
    // dim-sized is ENFORCED: a mis-called fact side fails loudly here
    // instead of OOMing the driver mid-collect (one cheap count job)
    val ivRows = intervals.count()
    if (ivRows > maxBroadcastRows) throw new IllegalArgumentException(
      s"intervalJoinBroadcast intervals side has $ivRows rows " +
        s"(> $maxBroadcastRows): this side would be collected to the driver; " +
        "use intervalJoin for a fact-sized intervals side or raise " +
        "maxBroadcastRows deliberately")
    val sorted: Array[(Long, Long, Seq[Any])] = intervals
      .select((startCol +: endCol +: ivVals).map(col): _*)
      .collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1)) // null bounds: unmatchable
      .map(r => (r.getLong(0), r.getLong(1), (2 until r.length).map(r.get): Seq[Any]))
      .sortBy(iv => (iv._1, iv._2))
    // prefix running max of interval ends — the backward-scan stop bound
    val maxEnd = sorted.scanLeft(Long.MinValue) { case (m, iv) => math.max(m, iv._2) }.drop(1)
    val bc = points.sparkSession.sparkContext.broadcast((sorted, maxEnd))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    points.mapPartitions { it =>
      val (ivs, ends) = bc.value
      it.flatMap { row =>
        if (row.isNullAt(tIdx)) Iterator.empty else {
        val t = row.getLong(tIdx)
        // binary search: first index with start > t
        var lo = 0; var hi = ivs.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (ivs(mid)._1 <= t) lo = mid + 1 else hi = mid
        }
        val out = scala.collection.mutable.ListBuffer[Row]()
        var i = lo - 1
        while (i >= 0 && ends(i) >= t) {
          val (s, e, vs) = ivs(i)
          if (e >= t) out += Row.fromSeq(row.toSeq ++ (s +: e +: vs))
          i -= 1
        }
        out.reverse
        }
      }
    }(enc)
  }
}
