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
}
