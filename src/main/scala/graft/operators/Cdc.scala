package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog application (CDC merge / upsert): fold a stream of keyed
  * upsert/delete changes into a snapshot — the MERGE INTO shape without a
  * table format:
  *
  *   1. reduce the changelog to its latest change per key (window by
  *      sequence — one shuffle on the key),
  *   2. upserts replace matching snapshot rows and append new keys,
  *   3. deletes drop matching snapshot rows.
  *
  * Scale shape: one shuffle of the changelog (latest-per-key), one
  * shuffle-or-broadcast join of snapshot vs reduced changes (AQE decides —
  * a day's changelog is usually orders of magnitude smaller than the
  * snapshot). No driver-side state; works identically as the batch twin
  * of a streaming foreachBatch merge.
  */
object Cdc {

  val OpUpsert = "U"
  val OpDelete = "D"

  /** Latest change per key: max `seqCol` wins; ties broken by preferring
    * delete (a delete and upsert with the same sequence number is a
    * malformed feed — the deterministic choice keeps replays stable).
    */
  def latestChanges(changes: DataFrame, keyCol: String, seqCol: String,
                    opCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc, (col(opCol) === OpDelete).desc)
    changes.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Apply a keyed changelog to a snapshot. `changes` must carry the same
    * data columns as `snapshot` plus (seqCol, opCol). Output has the
    * snapshot schema.
    */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame, keyCol: String,
                     seqCol: String, opCol: String): DataFrame = {
    val dataCols = snapshot.columns.toSeq
    val latest = latestChanges(changes, keyCol, seqCol, opCol)
    val changedKeys = latest.select(col(keyCol).as("__ck"))
    val kept = snapshot // rows with no change at all
      .join(changedKeys, col(keyCol) === col("__ck"), "left_anti")
    val upserted = latest.where(col(opCol) === OpUpsert)
      .select(dataCols.map(col): _*)
    kept.unionByName(upserted)
  }

  /** Type-2 slowly-changing-dimension history from a keyed changelog:
    * every upsert opens a version valid from its sequence number until the
    * NEXT change of that key (upsert or delete); `valid_to` is null — and
    * `is_current` true — only for a key's last change when that change is
    * an upsert, so a trailing delete correctly closes the final version
    * and leaves no current row.
    *
    * One shuffle on the key (the lead window); rows = changelog upserts.
    */
  def scd2History(changes: DataFrame, keyCol: String, seqCol: String,
                  opCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol))
    changes
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .where(col(opCol) === OpUpsert)
      .withColumn("is_current", col("valid_to").isNull)
      .drop(seqCol, opCol)
  }
}
