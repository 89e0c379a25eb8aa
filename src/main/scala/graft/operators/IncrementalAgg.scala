package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance (materialized-view upkeep): fold a new
  * batch's aggregate into a stored aggregate state without re-reading
  * history. The reference recomputes its whole pipeline per run; at 100 TB
  * the history is never re-scanned — only the day's delta is aggregated and
  * merged.
  *
  * Measures must be mergeable monoids: count is a sum of counts, sum/min/max
  * merge directly. Non-mergeable statistics derive at read time (avg =
  * sum/count; stddev/corr from power sums — see q38_corr_stats).
  *
  * Scale shape: the merge is a full-outer equi-join on the grouping keys.
  * The state side is large but STATIC between merges — store it bucketed on
  * the keys (Sources.writeBucketed) and the join shuffles only the delta,
  * which is orders of magnitude smaller. Union + re-aggregate would shuffle
  * the whole state every batch.
  */
object IncrementalAgg {

  sealed trait MergeOp
  case object MergeSum extends MergeOp
  case object MergeMin extends MergeOp
  case object MergeMax extends MergeOp
  /** HLL sketch union (DataSketches binary column from `hll_sketch_agg`):
    * makes COUNT DISTINCT a mergeable measure — the one statistic a naive
    * rollup can't maintain incrementally. Register-wise max-merge is
    * associative/commutative/idempotent, so re-delivered batches can't
    * inflate the estimate (unlike a count re-sum). Read the estimate out
    * with `hll_sketch_estimate`.
    */
  case object MergeHllUnion extends MergeOp
  /** KLL quantile-sketch merge (`graft.expressions.KllSketchAgg` binary
    * column): makes grouped PERCENTILES a mergeable measure. Associative
    * and commutative over any merge tree (KLL rank-error guarantee), but
    * NOT idempotent — unlike the HLL register max, a re-delivered delta
    * double-counts, so feed deltas exactly once (the catalogUpsertBatch
    * marker discipline). Read estimates out with `KllQuantile`.
    */
  case object MergeKll extends MergeOp

  /** Merge `delta` (the new batch, already aggregated to the same schema)
    * into `state`. Both sides: `keys` ++ measure columns; output the same.
    * Keys present in only one side pass through; keys in both merge
    * measure-wise.
    */
  def merge(state: DataFrame, delta: DataFrame, keys: Seq[String],
            measures: Seq[(String, MergeOp)]): DataFrame = {
    val s = state.as("s")
    val d = delta.as("d")
    val merged: Seq[Column] = measures.map { case (c, op) =>
      val sc = col(s"s.$c")
      val dc = col(s"d.$c")
      (op match {
        // coalesce(sc+dc, sc, dc): exact when both sides exist, pass-through
        // otherwise — no 0-literal that could widen or re-type the measure
        case MergeSum => coalesce(sc + dc, sc, dc)
        case MergeMin => least(sc, dc)   // least/greatest skip NULLs
        case MergeMax => greatest(sc, dc)
        case MergeHllUnion =>
          when(sc.isNull, dc).when(dc.isNull, sc)
            .otherwise(hll_union(sc, dc))
        case MergeKll => graft.expressions.KllSketchAgg.kllMerge(sc, dc)
      }).as(c)
    }
    s.join(d, keys, "full_outer")
      .select(keys.map(col) ++ merged: _*)
  }
}
