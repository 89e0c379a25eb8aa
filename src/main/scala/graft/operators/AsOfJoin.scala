package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

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

  /** Nearest-in-time join: attach the CLOSEST right row in either
    * direction (|rightTime − leftTime| minimized; ties to the earlier
    * right row) — the sensor-alignment variant of [[asofLast]], for when
    * "latest before" is wrong because the nearest reading may be just
    * ahead (clock skew between feeds, alignment of two samplers).
    *
    * Same single (key, time) shuffle+sort as [[asofLast]]: one window
    * pass computes BOTH the backward carry (last right at-or-before) and
    * the forward carry (first right after) as struct-atomic fills, then
    * per-row arithmetic picks the closer. No range join, no per-row
    * probing. Output: left columns + right value columns +
    * `matched_<rightTimeCol>` (NULL when the key has no right rows).
    * `right` must be unique per (key, time) — pre-aggregate otherwise.
    */
  def asofNearest(left: DataFrame, right: DataFrame, keyCol: String,
                  leftTimeCol: String, rightTimeCol: String): DataFrame = {
    val rightVals = right.columns.filterNot(c => c == keyCol || c == rightTimeCol).toSeq
    val leftCols = left.columns.filterNot(_ == keyCol).toSeq
    require(rightVals.intersect(leftCols).isEmpty,
      s"overlapping value columns: ${rightVals.intersect(leftCols).mkString(",")}")
    val tType = right.schema(rightTimeCol).dataType
    val rStructType = StructType(
      StructType(Seq(right.schema(rightTimeCol).copy(name = "__rt"))) ++
        rightVals.map(c => right.schema(c).copy(name = c)))
    val lSel = Seq(col(keyCol).as("__k"), col(leftTimeCol).as("__t"),
      lit(1).as("__side")) ++ leftCols.map(left(_)) :+
      lit(null).cast(rStructType).as("__rv")
    val rSel = Seq(col(keyCol).as("__k"), col(rightTimeCol).as("__t"),
      lit(0).as("__side")) ++
      leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
      struct(col(rightTimeCol).as("__rt") +: rightVals.map(right(_)): _*).as("__rv")
    val unioned = left.select(lSel: _*).unionByName(right.select(rSel: _*))
    // rights sort before lefts at equal times, so an equal-time right is
    // in the BACKWARD frame (distance 0, unbeatable) and never double-
    // counted by the forward frame
    val ord = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
    val wBack = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = unioned
      .withColumn("__back", last(col("__rv"), ignoreNulls = true).over(wBack))
      .withColumn("__fwd", first(col("__rv"), ignoreNulls = true).over(wFwd))
    // distances at native precision: cast("long") on a timestamp truncates
    // to whole seconds and mis-picks the nearest side at sub-second skew
    val lType = left.schema(leftTimeCol).dataType
    val backD = ticks(col("__t"), lType) - ticks(col("__back.__rt"), tType)
    val fwdD = ticks(col("__fwd.__rt"), tType) - ticks(col("__t"), lType)
    val pick = when(col("__back").isNull, col("__fwd"))
      .when(col("__fwd").isNull, col("__back"))
      .when(backD <= fwdD, col("__back")) // tie → earlier (backward) row
      .otherwise(col("__fwd"))
    filled.where(col("__side") === 1)
      .withColumn("__pick", pick)
      .select(col("__k").as(keyCol) +: (leftCols.map(col) ++
        (col("__pick.__rt").cast(tType).as(s"matched_$rightTimeCol") +:
          rightVals.map(c => col(s"__pick.$c").as(c)))): _*)
  }

  /** Broadcast as-of join: for a SMALL right side (a dim history — rates,
    * configs, slowly-changing attributes), ship the whole right table to
    * every task and binary-search it per left row. The fact side is never
    * shuffled, never sorted, never leaves its scan stage — the correct
    * 100 TB plan when the right side fits in memory, exactly as Spark's
    * own BroadcastHashJoin trades a driver-side materialization of the
    * small side for a shuffle-free big side (asserted: zero Exchange in
    * the physical plan). Output schema and semantics match [[asofLast]]:
    * left columns + right value columns, NULL-filled when no right row
    * precedes. The key and time columns must be simple types; `right`
    * must be unique per (key, time) like asofLast.
    */
  def asofBroadcast(left: DataFrame, right: DataFrame, keyCol: String,
                    leftTimeCol: String, rightTimeCol: String,
                    maxBroadcastRows: Long = 10_000_000L): DataFrame = {
    val rightVals = right.columns.filterNot(c => c == keyCol || c == rightTimeCol).toSeq
    val leftCols = left.columns.toSeq
    require(rightVals.intersect(leftCols).isEmpty,
      s"overlapping value columns: ${rightVals.intersect(leftCols).mkString(",")}")
    val outSchema = StructType(left.schema.fields ++
      rightVals.map(c => right.schema(c).copy(name = c, nullable = true)))
    val keyIdx = left.schema.fieldIndex(keyCol)
    val timeIdx = left.schema.fieldIndex(leftTimeCol)
    // the broadcast materialization — same driver-side trade as Spark's
    // BroadcastExchange. "Dim-sized" is ENFORCED, not assumed: a mis-called
    // fact side must fail loudly here, not OOM the driver mid-collect. The
    // count is one cheap job (parquet answers it from footers).
    val rightRows = right.count()
    if (rightRows > maxBroadcastRows) throw new IllegalArgumentException(
      s"asofBroadcast right side has $rightRows rows (> $maxBroadcastRows): " +
        "this side would be collected to the driver; use asofLast for a " +
        "fact-sized right side or raise maxBroadcastRows deliberately")
    val table: Map[Any, Array[(Long, Seq[Any])]] = right
      .select((keyCol +: rightTimeCol +: rightVals).map(col): _*)
      .collect()
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1)) // null key/time: unmatchable
      .groupBy(_.get(0))
      .map { case (k, rows) =>
        k -> rows.map(r => (asLong(r.get(1)),
            rightVals.indices.map(i => r.get(i + 2)): Seq[Any]))
          .sortBy(_._1)
      }
    val bc = left.sparkSession.sparkContext.broadcast(table)
    val nulls = Seq.fill(rightVals.size)(null)
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    left.mapPartitions { it =>
      val t = bc.value
      it.map { row =>
        // NULL key or time can never match (SQL join semantics) — emit
        // the left row NULL-filled instead of crashing the task
        val rv = if (row.isNullAt(keyIdx) || row.isNullAt(timeIdx)) nulls
        else {
          val hist = t.getOrElse(row.get(keyIdx), Array.empty[(Long, Seq[Any])])
          val lt = asLong(row.get(timeIdx))
          // binary search: last entry with time <= lt
          var lo = 0; var hi = hist.length - 1; var ans = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (hist(mid)._1 <= lt) { ans = mid; lo = mid + 1 } else hi = mid - 1
          }
          if (ans < 0) nulls else hist(ans)._2
        }
        Row.fromSeq(row.toSeq ++ rv)
      }
    }(enc)
  }

  /** Time column → comparable long ticks at NATIVE precision (micros for
    * timestamps, days for dates, value for integrals) — `cast("long")`
    * would truncate timestamps to whole seconds.
    */
  private def ticks(c: org.apache.spark.sql.Column,
                    dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.Column =
    dt match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(c)
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.DateType => unix_date(c).cast("long")
      case _ => c.cast("long")
    }

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case ts: java.sql.Timestamp => // micros, not getTime's millis
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + (ts.getNanos / 1000L) % 1000000L
    case d: java.sql.Date => d.getTime
    case other => throw new IllegalArgumentException(
      s"unsupported as-of time type: ${other.getClass}")
  }
}
