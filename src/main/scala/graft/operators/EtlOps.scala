package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Schema conformance: the reference's `to_dataframe` step (main.py:307-327)
  * — rename to target names, add missing columns with defaults, project in
  * target order.
  */
object EtlOps {

  /** target: (sourceCol | null, targetName, default). When sourceCol is
    * absent in `df` (or null per-row), `default` fills in.
    */
  def conformSchema(df: DataFrame, target: Seq[(String, String, Column)]): DataFrame = {
    val cols = target.map { case (src, name, default) =>
      if (src != null && df.columns.contains(src)) coalesce(col(src), default).as(name)
      else default.as(name)
    }
    df.select(cols: _*)
  }

  /** Forward fill (last observation carried forward): for each column in
    * `fillCols`, adds `<col>_filled` carrying the latest non-NULL value at
    * or before the current row in (`orderCols`) order within each
    * (`partitionCols`) group — the sparse-sensor / gap-repair shape.
    *
    * Scale shape: one window over the (partition, order) sort — the same
    * shuffle any per-key ordered pass needs; the fill itself is a running
    * `last(ignoreNulls)` carried through the frame, O(1) state per row.
    * `orderCols` must be a total order within each partition or the fill
    * is nondeterministic under shuffle (same contract as any LOCF).
    */
  def forwardFill(df: DataFrame, partitionCols: Seq[String],
                  orderCols: Seq[String], fillCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols.foldLeft(df) { (d, c) =>
      d.withColumn(s"${c}_filled", last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Snapshot diff (table-compare): full-outer join `oldDf` and `newDf` on
    * `keyCols` and classify every key as added / deleted / changed /
    * unchanged, with old/new values side by side. The audit step of an
    * incremental pipeline — "what did today's load actually change".
    *
    * Comparison is NULL-safe (`<=>`), so a NULL→value transition counts as
    * changed, not unchanged. Scale shape: ONE shuffle on the key for both
    * sides (AQE handles skew); no window, no collect. Keys must be unique
    * per snapshot (it's a diff of keyed states, not multisets).
    */
  /** Per-key union length of possibly-overlapping `[start, end)` integer
    * intervals — the time-on-site / sensor-uptime sweep. Sort per key by
    * start, carry the running max end over PRIOR rows (the frontier), and
    * clamp each interval's contribution to what extends past it. The sum
    * is the true union length under ANY tie order (a tied interval either
    * extends the frontier or contributes 0), so the result is
    * shuffle-deterministic; one window pass over the key partition — the
    * key must be the scaling dimension (users, devices), as with
    * sessionization. Output: (key, n_intervals, covered).
    */
  def intervalCoverage(df: DataFrame, keyCol: String,
                       startCol: String, endCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(startCol), col(endCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__prev_end", max(col(endCol)).over(w))
      .withColumn("__contrib", greatest(lit(0L),
        col(endCol) -
          greatest(col(startCol), coalesce(col("__prev_end"), col(startCol)))))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_intervals"), sum(col("__contrib")).as("covered"))
  }

  /** Incremental view maintenance for an APPEND-ONLY inner equi-join view
    * V = A ⋈ B: given deltas dA, dB, the new view rows are the standard
    * delta-join identity
    *
    *   dV = (dA ⋈ B) ∪ (A ⋈ dB) ∪ (dA ⋈ dB)
    *      = (dA ⋈ (B ∪ dB)) ∪ (A ⋈ dB)
    *
    * so the view APPENDS dV — the stored join output is never re-scanned
    * or re-shuffled (the aggregate twin is IncrementalAgg.merge; this is
    * the join half of view maintenance). Exact for append-only bases;
    * updates/deletes need retraction rows, which an append-only view by
    * definition does not carry.
    *
    * Scale shape: two equi-joins whose LEFT sides are delta-sized. With A
    * and B stored bucketed on the key (Sources.writeBucketed), neither
    * base re-shuffles — each join shuffles only its delta and streams the
    * bucketed base; AQE broadcasts a small-enough delta outright. Pass
    * the PRE-delta bases: rows in both `a` and `da` would otherwise pair
    * with dB twice.
    */
  def incrementalJoinDelta(a: DataFrame, b: DataFrame,
                           da: DataFrame, db: DataFrame,
                           keyCols: Seq[String]): DataFrame = {
    val newB = b.unionByName(db)
    da.join(newB, keyCols).unionByName(a.join(db, keyCols))
  }

  def diffSnapshots(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
                    compareCols: Seq[String]): DataFrame = {
    val o = oldDf.select(
      keyCols.map(col) ++ compareCols.map(c => col(c).as(s"old_$c")): _*)
      .withColumn("__in_old", lit(true))
    val n = newDf.select(
      keyCols.map(col) ++ compareCols.map(c => col(c).as(s"new_$c")): _*)
      .withColumn("__in_new", lit(true))
    val changed = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    o.join(n, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "deleted")
          .when(changed, "changed")
          .otherwise("unchanged"))
      .drop("__in_old", "__in_new")
  }
}
