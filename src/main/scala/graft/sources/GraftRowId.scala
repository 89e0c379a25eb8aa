package graft.sources

import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** ROW LINEAGE — stable per-row identifiers (`_row_id`), the Iceberg-v3
  * row-lineage shape re-expressed on this catalog's machinery.
  *
  * Contract: every row of a lineage table carries a table-unique BIGINT
  * `_row_id`, assigned ONCE when the row first lands and preserved through
  * every rewrite of its bytes — copy-on-write UPDATE/MERGE, merge-on-read
  * update-reinserts, compaction, Z-order, DV materialization, clones,
  * branches, restore. A row's identity survives its physical location;
  * only a genuine INSERT mints a new id. That is what makes row-accurate
  * downstream diffing possible at 100 TB: "which rows changed" becomes an
  * id join instead of a full-column compare.
  *
  * Mechanism — MATERIALIZED, not positional: where Iceberg v3 derives ids
  * as `first_row_id + pos` and materializes lazily on rewrite, here the id
  * is a hidden PHYSICAL int64 column written into every data file from the
  * table's birth (8 bytes/row before encoding; ids are allocated in runs,
  * so delta/RLE encoding collapses them). Readers serve it as the
  * `_row_id` METADATA column (never part of the logical schema); writers
  * allocate like identity columns — strided per task with zero in-job
  * coordination, the high watermark riding the SAME atomic manifest create
  * as the files (`idwm:_row_id` commit metadata, which means the existing
  * identity carry-forward, vacuum durability, branch, restore and clone
  * machinery all apply verbatim). Allocation races between concurrent
  * writers fail loudly, exactly like identity.
  *
  * Declared at CREATE (`TBLPROPERTIES('rowid'='true')`) on HISTORY tables
  * only; enabling on an existing table is refused (pre-feature files would
  * serve NULL ids — silent lineage gaps). Paths that land files without
  * running the catalog writer carry or re-route: equality-delete upserts
  * carry the masked row's id through their reinsert (and mint only for
  * genuinely new keys — [[GraftEqDelete.upsert]]); WAP publish always
  * routes staged rows through the writer.
  */
object GraftRowId {

  /** Table property (CREATE-time only). */
  val Prop = "rowid"

  /** Metadata-column AND physical parquet column name. */
  val Col = "_row_id"

  /** Watermark key in commit metadata. Deliberately inside the `idwm:`
    * namespace: manifest carry-forward, vacuum durability, branch bases,
    * restore and clone all propagate that prefix already — row-id
    * watermarks inherit every one of those guarantees with zero new code.
    * (No clash with a real identity column: `_row_id` is refused as a
    * schema column name on lineage tables.)
    */
  val WmKey = "idwm:_row_id"

  def enabled(props: Map[String, String]): Boolean =
    props.get(Prop).exists(_.equalsIgnoreCase("true"))

  /** Highest id any commit allocated; absent → 0 (ids start at 1). */
  def watermark(meta: Map[String, String]): Long =
    meta.get(WmKey).map(_.toLong).getOrElse(0L)

  val field: StructField = StructField(Col, LongType, nullable = false)

  /** Physical write schema of a lineage table: declared columns + the
    * trailing hidden id. Appending LAST keeps every declared-column index
    * (stats, checks, generated, identity) untouched.
    */
  def ioSchema(physical: StructType): StructType =
    StructType(physical.fields :+ field)

  /** Allocation plan for one write job (same strided protocol as
    * identity: task p of n starts at wm+1+p, strides n). `srcIdx` points
    * at an incoming `_row_id` attribute when the plan carries one (COW
    * rewrites project it as a metadata column) — non-null values are
    * CARRIED verbatim, nulls (merge-inserted rows) allocate fresh.
    */
  def writeGen(wm0: Long, srcIdx: Int, physIdx: Int,
               numParts: Int): GraftIdentity.WriteGen =
    GraftIdentity.WriteGen(Col, physIdx, srcIdx, wm0, 1L, numParts,
      allowExplicit = true)
}
