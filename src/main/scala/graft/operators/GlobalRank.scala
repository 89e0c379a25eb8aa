package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.Column
import org.apache.spark.sql.types.{LongType, StructField}

/** Global (total-order) row ranking WITHOUT a single-partition window.
  *
  * `Window.orderBy(...)` with no partition key funnels every row through
  * ONE task — the classic scale cliff for global ntile/percent_rank. This
  * operator produces the identical 1-based rank with a range-partitioned
  * sort (the same shuffle a global ORDER BY uses, parallel across the
  * cluster) and per-partition index offsets:
  *
  *   1. repartitionByRange + sortWithinPartitions on the sort key —
  *      partitions are globally ordered AND internally sorted;
  *   2. zipWithIndex attaches the global position (one lightweight count
  *      job for the per-partition offsets — scalars to the driver, never
  *      rows);
  *   3. rank-derived statistics (quartiles, percent ranks) are then pure
  *      per-row arithmetic over (rank, total).
  *
  * The RDD hop is deliberate: this is genuine per-partition imperative
  * logic (offset + running index), the documented narrow use for RDDs.
  * Ranks are deterministic iff `sortCols` is a total order — pass a
  * tiebreaker column, as with any ranking.
  */
object GlobalRank {

  /** Append a 1-based global rank column ordered by `sortCols`. */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column],
                     rankCol: String = "rank"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ StructField(rankCol, LongType, nullable = false))
    val ranked = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1))
    }
    spark.createDataFrame(ranked, schema)
  }

  /** Per-group 1-based rank + EXCLUSIVE running sum of `weight`, ordered by
    * `sortCols` within `groupCols` — the scale-safe replacement for
    * `Window.partitionBy(group).orderBy(ord)` when the group key has LOW
    * cardinality (languages, return flags): a hash-partitioned window
    * funnels each group through ONE task no matter the cluster size.
    *
    * Here the sort range-partitions on (group, sort) — one group SPANS many
    * partitions, every partition stays bounded — then:
    *
    *   1. one scalar pre-pass collects per-partition per-group
    *      (rowCount, weightSum); partitions hold contiguous key ranges, so
    *      each touches only the few groups crossing its boundary — the
    *      collect is O(partitions × boundary groups) scalars, never rows;
    *   2. cumulative offsets per (partition, group) are broadcast back and
    *      each partition emits rank/prefix with pure local arithmetic.
    *
    * Parallelism is therefore partition-bound, not group-bound. The shuffle
    * files of step 0's exchange are reused by both jobs (Spark reuses
    * shuffle output across jobs on the same lineage), so the pre-pass costs
    * one extra within-partition sort, not a second shuffle.
    *
    * Determinism: as with any ranking, (groupCols ++ sortCols) must be a
    * total order per group; `weight` must be integral (summed as Long,
    * NULL counts as 0).
    */
  /** Guard for the scalar pre-pass collect: with range-partitioned input a
    * partition only sees the groups crossing its key range, so real
    * (dim-sized) group keys stay far below this. A HIGH-cardinality group
    * key would make the collect O(rows) and fail by driver OOM — this
    * bound turns that misuse into a loud error instead, mirroring
    * `AsOfJoin.asofBroadcast`'s maxBroadcastRows.
    */
  val defaultMaxGroupsPerPartition: Int = 65536

  def withGroupedPrefixSum(df: DataFrame, groupCols: Seq[String],
                           sortCols: Seq[Column], weight: Column,
                           rankCol: String = "grp_rank",
                           prefixCol: String = "grp_prefix",
                           maxGroupsPerPartition: Int = defaultMaxGroupsPerPartition): DataFrame = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{JoinedRow, UnsafeProjection}
    import org.apache.spark.unsafe.types.UTF8String

    val spark = df.sparkSession
    val wName = "__gps_weight"
    val keyed = df.withColumn(wName, weight.cast(LongType))
    val orderCols = groupCols.map(org.apache.spark.sql.functions.col) ++ sortCols
    val sorted = keyed.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = sorted.schema
    val gIdx = groupCols.map(schema.fieldIndex).toArray
    val gTypes = gIdx.map(schema.fields(_).dataType)
    val wIdx = schema.fieldIndex(wName)
    // stay in Tungsten binary rows: the external-Row encoder round trip
    // (deserialize every column to Scala objects, re-serialize) costs more
    // than the rank arithmetic itself
    val rdd = sorted.queryExecution.toRdd

    // group key detached from the scan's reused row buffer
    def groupKey(r: InternalRow): Seq[Any] = {
      val out = new Array[Any](gIdx.length)
      var i = 0
      while (i < gIdx.length) {
        out(i) = r.get(gIdx(i), gTypes(i)) match {
          case u: UTF8String => u.copy()
          case v => v
        }
        i += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }

    // pre-pass: per-partition per-group (count, weightSum) scalars
    val partStats = rdd.mapPartitionsWithIndex { (pid, it) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], (Long, Long)]
      it.foreach { r =>
        val g = groupKey(r)
        val w = if (r.isNullAt(wIdx)) 0L else r.getLong(wIdx)
        val (c, s) = m.getOrElse(g, (0L, 0L))
        if (c == 0L && m.size >= maxGroupsPerPartition)
          throw new IllegalArgumentException(
            s"withGroupedPrefixSum: partition $pid holds >$maxGroupsPerPartition " +
              s"distinct groups of ${groupCols.mkString("(", ", ", ")")} — the " +
              "group key is too high-cardinality for the scalar offset collect. " +
              "Use withGlobalRank on (group, sort) or a plain hash-partitioned " +
              "window, which parallelizes fine when groups are many.")
        m.update(g, (c + 1L, s + w))
      }
      Iterator.single(pid -> m.toSeq)
    }.collect()

    // fold partition-local stats (in partition order) into per-(pid, group)
    // starting offsets
    val running = scala.collection.mutable.HashMap.empty[Seq[Any], (Long, Long)]
    val offsets: Map[Int, Map[Seq[Any], (Long, Long)]] =
      partStats.sortBy(_._1).map { case (pid, groups) =>
        pid -> groups.map { case (g, (c, s)) =>
          val (oc, os) = running.getOrElse(g, (0L, 0L))
          running.update(g, (oc + c, os + s))
          g -> (oc, os)
        }.toMap
      }.toMap
    val bc = spark.sparkContext.broadcast(offsets)

    val outSchema = org.apache.spark.sql.types.StructType(
      schema.fields :+ StructField(rankCol, LongType, nullable = false)
        :+ StructField(prefixCol, LongType, nullable = false))
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val offs = bc.value.getOrElse(pid, Map.empty[Seq[Any], (Long, Long)])
      val extra = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outSchema)
      var curG: Seq[Any] = null
      var cnt = 0L
      var acc = 0L
      it.map { r =>
        val g = groupKey(r)
        if (g != curG) { // groups are contiguous within a sorted partition
          curG = g
          val (oc, os) = offs.getOrElse(g, (0L, 0L))
          cnt = oc; acc = os
        }
        cnt += 1L
        extra.setLong(0, cnt)
        extra.setLong(1, acc)
        acc += (if (r.isNullAt(wIdx)) 0L else r.getLong(wIdx))
        proj(joined(r, extra)): InternalRow
      }
    }
    org.apache.spark.sql.graftbridge.Bridge.ofInternalRows(spark, outSchema, out)
      .drop(wName)
  }
}
