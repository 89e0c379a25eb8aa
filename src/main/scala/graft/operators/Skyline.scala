package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** 2-D skyline (Pareto frontier, both dimensions MAXIMIZED) without a
  * single-task window.
  *
  * A row is dominated when some other row is >= on both dimensions and
  * strictly > on at least one. The textbook distributed formulation is a
  * self-join (quadratic); the textbook single-node one is a sort + running
  * max — which as a `Window.orderBy` with no partition key funnels the
  * whole table through ONE task. This operator keeps the sort formulation
  * but makes the running max partition-parallel, the same two-pass shape
  * as [[GlobalRank.withGroupedPrefixSum]]:
  *
  *   1. aggregate `max(y)` per distinct `x` — one linear hash shuffle;
  *   2. range-partition the per-x table on `x DESC` (partitions are
  *      globally ordered, each bounded);
  *   3. scalar pre-pass: one `max(maxy)` per partition to the driver,
  *      folded in partition order into each partition's PRIOR max (the
  *      largest `maxy` seen at any strictly-larger x in earlier
  *      partitions) and broadcast back;
  *   4. each partition scans locally: keep `x` iff `maxy > runningMax`
  *      (a tie means some strictly-larger-x row has the same y and
  *      dominates), updating the running max as it goes;
  *   5. join survivors back to the input on `(x, y = maxy)` — equal-x
  *      rows below their group max are dominated within the group, and
  *      exact duplicates of a skyline point all survive (identical
  *      points do not dominate each other).
  *
  * Work is one shuffle + one range exchange over the DISTINCT-x table +
  * a skyline join AQE can broadcast when the frontier is small (it almost
  * always is). Both columns must be LongType — callers bring exact
  * integer dimensions (cents, counts), which also keeps dominance free
  * of float-comparison surprises.
  */
object Skyline {

  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    require(df.schema(xCol).dataType == LongType &&
      df.schema(yCol).dataType == LongType,
      s"skyline2D needs LongType dimensions, got " +
        s"$xCol: ${df.schema(xCol).dataType}, $yCol: ${df.schema(yCol).dataType}")
    val spark = df.sparkSession
    val maxyCol = "__sky_maxy"
    val perX = df.groupBy(col(xCol)).agg(max(col(yCol)).as(maxyCol))
    val sorted = perX.repartitionByRange(col(xCol).desc)
      .sortWithinPartitions(col(xCol).desc)
    val rdd = sorted.rdd

    // scalar pre-pass: one Option[max] per partition, never rows
    val partMax = rdd.mapPartitionsWithIndex { (pid, it) =>
      var m = Long.MinValue
      var any = false
      it.foreach { r => any = true; val v = r.getLong(1); if (v > m) m = v }
      Iterator.single(pid -> (if (any) Some(m) else None))
    }.collect().sortBy(_._1)

    var running = Long.MinValue
    val prior: Map[Int, Long] = partMax.map { case (pid, m) =>
      val p = running
      m.foreach(v => if (v > running) running = v)
      pid -> p
    }.toMap
    val bc = spark.sparkContext.broadcast(prior)

    val skyRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bc.value.getOrElse(pid, Long.MinValue)
      it.filter { r =>
        val y = r.getLong(1)
        val keep = y > run
        if (keep) run = y
        keep
      }
    }
    val sky = spark.createDataFrame(skyRdd, sorted.schema)
    df.join(sky,
      df(xCol) === sky(xCol) && df(yCol) === sky(maxyCol))
      .select(df.columns.map(df(_)).toIndexedSeq: _*)
  }
}
