package graft.sources

import java.io.{DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.roaringbitmap.longlong.Roaring64Bitmap

/** Positional deletion-vector sidecars for merge-on-read tables: one
  * Roaring64 bitmap of deleted row positions per data file, stored as
  * `_graft_dv_<dataFile>.bin` next to the data (the underscore keeps it
  * invisible to `GraftTable.dataFiles` and any plain parquet listing).
  * This is the Delta Lake / Iceberg v2 position-delete shape: deleting k
  * rows from a 1 GB file costs a few-KB sidecar write instead of a 1 GB
  * rewrite, and the read path pays one bitmap probe per row until
  * [[GraftMaintenance.materializeDeletes]] folds the vector in.
  */
object GraftDv {
  private val Prefix = "_graft_dv_"
  private val Suffix = ".bin"

  def dvName(dataFileName: String): String = s"$Prefix$dataFileName$Suffix"
  def isDv(name: String): Boolean = name.startsWith(Prefix) && name.endsWith(Suffix)
  def dataFileName(dvName: String): String =
    dvName.stripPrefix(Prefix).stripSuffix(Suffix)

  /** VERSIONED sidecar name for merge-on-read HISTORY tables: each delta
    * commit writes a fresh merged bitmap under a unique name and re-points
    * the manifest entry — past snapshots keep referencing their own
    * sidecar, which is what makes DV state time-travelable. (The uuid
    * suffix also keeps these from ever matching a directory-listing
    * lookup keyed by `dvName`, which only plain MOR tables use.)
    */
  def versionedDvName(dataFileName: String): String =
    s"$Prefix$dataFileName.${java.util.UUID.randomUUID().toString.take(8)}$Suffix"

  def read(fs: FileSystem, path: Path): Roaring64Bitmap = {
    val in = new DataInputStream(fs.open(path))
    try { val bm = new Roaring64Bitmap; bm.deserialize(in); bm } finally in.close()
  }

  def write(fs: FileSystem, path: Path, bm: Roaring64Bitmap): Unit = {
    bm.runOptimize()
    val out = new DataOutputStream(fs.create(path, true))
    try bm.serialize(out) finally out.close()
  }

  def toBytes(bm: Roaring64Bitmap): Array[Byte] = {
    bm.runOptimize()
    val bos = new java.io.ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    bm.serialize(out); out.flush()
    bos.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): Roaring64Bitmap = {
    val bm = new Roaring64Bitmap
    bm.deserialize(new DataInputStream(new java.io.ByteArrayInputStream(bytes)))
    bm
  }
}

/** Delta-based (merge-on-read) row-level operation — Spark's
  * `SupportsDelta` path: `RewriteDeleteFromTable` / `RewriteUpdateTable` /
  * `RewriteMergeIntoTable` plan a `WriteDelta` that feeds this operation
  * only the CHANGED rows, keyed by row id (`_file`, `_pos`), instead of
  * rewriting whole affected files. Deletes land as deletion-vector
  * sidecars; inserts append new files; updates are split into
  * delete+insert (`representUpdateAsDeleteAndInsert`). The scan side may
  * push filters for whole-file skipping (a file with no matching rows
  * contributes no row ids — pruning it is exact), but never record
  * filters (row positions must count every physical row).
  */
class GraftDeltaOperation(table: GraftTable, cmd: RowLevelOperation.Command)
  extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd
  override def description(): String = s"GraftDeltaOperation[$cmd, merge-on-read]"

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(table, Some(this))

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new GraftDeltaWriteBuilder(table, info)

  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(GraftTable.FileCol), Expressions.column(GraftTable.PosCol))

  override def representUpdateAsDeleteAndInsert(): Boolean = true

  /** On row-lineage tables the rewrite plan carries `_row_id` as a
    * metadata attribute: an UPDATE's reinserted row keeps its id (read
    * from the metadata row), a MERGE's genuine inserts arrive without one
    * and mint. Non-lineage tables need no metadata beyond the row id.
    */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    if (table.rowLineage) Array(Expressions.column(GraftRowId.Col))
    else Array.empty
}

class GraftDeltaWriteBuilder(table: GraftTable, info: LogicalWriteInfo)
  extends DeltaWriteBuilder {
  override def build(): DeltaWrite = new DeltaWrite {
    override def toBatch: DeltaBatchWrite = {
      val rowIdSchema = info.rowIdSchema().orElseThrow(() =>
        new IllegalStateException("delta write without a row-id schema"))
      val metaSchema: StructType =
        info.metadataSchema().orElse(new StructType())
      new GraftDeltaBatchWrite(table, info.schema(), rowIdSchema, metaSchema)
    }
  }
}

/** Per-task delta results: appended data files plus per-data-file
  * serialized deletion bitmaps. Bitmaps ride the commit message (positions
  * per task are bounded by the task's matched rows); at 100 TB scale the
  * same protocol holds — a task's delete set is proportional to its slice
  * of the change set, not to table size — though a format would stage DV
  * files and commit references instead of bytes-in-message.
  */
case class GraftDeltaCommit(inserted: Seq[String],
                            deletes: Map[String, Array[Byte]],
                            stats: Map[String, GraftStats.FileStats] = Map.empty,
                            idLast: Option[Long] = None,
                            rowLast: Option[Long] = None)
  extends WriterCommitMessage

class GraftDeltaBatchWrite(table: GraftTable, rowSchema: StructType,
                           rowIdSchema: StructType,
                           metaSchema: StructType = new StructType())
  extends DeltaBatchWrite {

  private val stagingDir =
    new Path(table.dir, s".staging-${java.util.UUID.randomUUID()}")
  private def hadoopConf = SparkSession.active.sessionState.newHadoopConf()

  /** (spec, watermark the job allocated against) — commit re-checks it
    * (the batch-append identity protocol, on the delta path).
    */
  @volatile private var idWrite: Option[(GraftIdentity.Spec, Long)] = None

  /** Row-lineage watermark the job's genuine inserts minted against. */
  @volatile private var rowWrite: Option[Long] = None

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory = {
    val fs = stagingDir.getFileSystem(hadoopConf)
    fs.mkdirs(stagingDir)
    // a pure DELETE plans no data columns (empty row schema) — the insert
    // projection is never consulted then
    val proj =
      if (rowSchema.isEmpty) Array.empty[Int]
      else table.physicalSchema.fields.map(f => rowSchema.fieldIndex(f.name))
    val partIdx =
      if (rowSchema.isEmpty) Array.empty[Int]
      else table.partitionFields.map(f => rowSchema.fieldIndex(f.name)).toArray
    // CHECK / NOT NULL constraints apply to delta INSERTS too (a MOR
    // MERGE/UPDATE writing a violating value must fail like the COW path);
    // a pure DELETE plans no data columns, so nothing to check
    val violations =
      if (rowSchema.isEmpty) Nil
      else GraftConstraints.violationPredicates(SparkSession.active, table, rowSchema)
    // delta INSERTS route through the table's layout exactly like the
    // batch writer: bucket prefix in the file name, days() subdirs —
    // a MOR MERGE's appended rows must not break pruning or SPJ placement
    val bucket =
      if (rowSchema.isEmpty) None
      else table.bucketSpec.map { case (c, n) =>
        val i = rowSchema.fieldIndex(c)
        (i, rowSchema.fields(i).dataType, n)
      }
    val day =
      if (rowSchema.isEmpty) None
      else table.dayCol.map { c =>
        val i = rowSchema.fieldIndex(c)
        (i, rowSchema.fields(i).dataType, c, table.timeUnit)
      }
    val genProjs =
      if (rowSchema.isEmpty) Nil
      else GraftGenerated.boundGenerators(SparkSession.active, table, rowSchema)
    // identity on the DELTA path: genuine inserts (MERGE ... INSERT)
    // allocate against the head watermark exactly like a batch append;
    // update-REINSERTED rows carry their existing key (idCarry). A pure
    // DELETE plans no data columns and allocates nothing.
    val idGen: Option[GraftIdentity.WriteGen] =
      if (rowSchema.isEmpty) None
      else table.identity.map { sp =>
        val dir = new Path(table.dir)
        val wm0 = GraftIdentity.watermark(
          GraftIdentity.headMeta(fs, dir, table.branch), sp)
        idWrite = Some((sp, wm0))
        GraftIdentity.WriteGen(sp.col,
          table.physicalSchema.fieldIndex(sp.col),
          if (rowSchema.fieldNames.contains(sp.col))
            rowSchema.fieldIndex(sp.col) else -1,
          wm0, sp.step, info.numPartitions, sp.allowExplicit)
      }
    // row lineage: insert files carry the trailing hidden id; genuine
    // inserts mint against the head watermark (srcIdx = -1 — the DATA row
    // never carries `_row_id`), update-reinserts carry the original id
    // from the METADATA row (rowCarry side-channel). Pure DELETEs write
    // no files and allocate nothing.
    val ioSchema =
      if (table.rowLineage && rowSchema.nonEmpty)
        GraftRowId.ioSchema(table.physicalSchema)
      else table.physicalSchema
    val rowGen: Option[GraftIdentity.WriteGen] =
      if (!table.rowLineage || rowSchema.isEmpty) None
      else {
        val wm0 = GraftRowId.watermark(
          GraftIdentity.headMeta(fs, new Path(table.dir), table.branch))
        rowWrite = Some(wm0)
        Some(GraftRowId.writeGen(wm0, -1, ioSchema.length - 1,
          info.numPartitions))
      }
    val metaRowIdIdx =
      if (table.rowLineage && metaSchema.fieldNames.contains(GraftRowId.Col))
        metaSchema.fieldIndex(GraftRowId.Col) else -1
    new GraftDeltaWriterFactory(stagingDir.toString, ioSchema,
      rowSchema, if (rowGen.isEmpty) proj else proj ++ Array(-1),
      if (rowSchema.isEmpty) Nil else table.partitionFields, partIdx,
      rowIdSchema.fieldIndex(GraftTable.FileCol),
      rowIdSchema.fieldIndex(GraftTable.PosCol),
      new SerializableHadoopConf(hadoopConf), violations, bucket, day, genProjs,
      idGen, rowGen, metaRowIdIdx)
  }

  /** Commit: OR each file's new delete positions into its existing
    * sidecar (idempotent merge), then land appended files. Single-writer,
    * like every commit on this catalog. On a HISTORY table the merged
    * bitmaps land under fresh VERSIONED sidecar names and the next
    * manifest re-points the affected entries — past snapshots keep their
    * own delete state, so `VERSION AS OF` a pre-delete version resurrects
    * the rows and vacuum expires superseded sidecars like data files.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val fs = stagingDir.getFileSystem(hadoopConf)
    val dir = new Path(table.dir)
    val merged = mutable.Map.empty[String, Roaring64Bitmap]
    val staged = mutable.Buffer.empty[String]
    val stagedStats = mutable.Map.empty[String, GraftStats.FileStats]
    val idLasts = mutable.Buffer.empty[Long]
    val rowLasts = mutable.Buffer.empty[Long]
    messages.foreach { case GraftDeltaCommit(ins, dels, sts, idl, rl) =>
      staged ++= ins
      stagedStats ++= sts
      idLasts ++= idl
      rowLasts ++= rl
      dels.foreach { case (file, bytes) =>
        val bm = GraftDv.fromBytes(bytes)
        merged.get(file) match {
          case Some(acc) => acc.or(bm)
          case None => merged(file) = bm
        }
      }
    }
    def landStaged(): Seq[String] = {
      val landed = staged.toSeq.map { f =>
        val p = new Path(f)
        val tgt = new Path(dir, GraftTable.relativize(stagingDir, p))
        if (tgt.getParent != dir) fs.mkdirs(tgt.getParent)
        fs.rename(p, tgt)
        tgt.toString
      }
      // delta INSERTS carry tracked stats like batch appends (keyed by
      // landed name — rename preserves it)
      GraftStats.writeCommitStats(fs, dir,
        stagedStats.toSeq.map { case (p, st) => new Path(p).getName -> st })
      landed
    }
    if (table.history) {
      // branch deltas read the branch head and commit into the branch
      // namespace — MERGE INTO db.t.branch_<b> on a MOR table stages DV
      // sidecars exactly like main, invisible to main until fast-forward
      val br = table.branch
      val (v, headEntries) = GraftTable.headState(fs, dir, br)
      require(v > 0L, s"history table ${table.name()} has no manifest")
      val mergedByName = merged.map { case (f, bm) =>
        new Path(f).getName -> bm
      }
      val updated = headEntries.map { e =>
        mergedByName.get(new Path(e.file).getName) match {
          case Some(bm) =>
            e.dv.foreach(d => bm.or(GraftDv.read(fs, new Path(d))))
            val dvPath = new Path(dir,
              GraftDv.versionedDvName(new Path(e.file).getName))
            GraftDv.write(fs, dvPath, bm)
            e.copy(dv = Some(dvPath.toString)) // equality masks survive
          case None => e
        }
      }
      val landed = landStaged()
      // identity watermark rides the SAME manifest as the delta commit;
      // a delta that allocated against a watermark a concurrent identity
      // write moved fails loudly (re-run re-reads the fresh head)
      val idMeta: Map[String, String] = (idWrite match {
        case Some((sp, wm0)) if idLasts.nonEmpty =>
          val cur = GraftIdentity.watermark(
            GraftIdentity.headMeta(fs, dir, table.branch), sp)
          if (cur != wm0) throw new IllegalStateException(
            s"identity allocation on ${table.name()} raced a concurrent " +
              s"identity write (watermark $wm0 -> $cur since this delta " +
              "planned) — re-run the statement")
          Map(GraftIdentity.wmKey(sp.col) ->
            (if (sp.step > 0) idLasts.max else idLasts.min).toString)
        case _ => Map.empty[String, String]
      }) ++ (rowWrite match {
        // a delta whose genuine inserts minted row ids advances the
        // lineage watermark under the same loud race rule; a pure
        // delete/reinsert delta (no mints) writes no key — carry-forward
        // keeps the old line
        case Some(wm0) if rowLasts.nonEmpty =>
          val cur = GraftRowId.watermark(
            GraftIdentity.headMeta(fs, dir, table.branch))
          if (cur != wm0) throw new IllegalStateException(
            s"row-id allocation on ${table.name()} raced a concurrent " +
              s"lineage write (watermark $wm0 -> $cur since this delta " +
              "planned) — re-run the statement")
          Map(GraftRowId.WmKey -> rowLasts.max.toString)
        case _ => Map.empty[String, String]
      })
      GraftTable.commitWithKind(fs, dir, v + 1,
        updated ++ landed.map(GraftTable.GraftEntry(_, None)),
        GraftTable.KindDelta, idMeta, br)
    } else {
      merged.foreach { case (file, bm) =>
        val dvPath = new Path(dir, GraftDv.dvName(new Path(file).getName))
        if (fs.exists(dvPath)) bm.or(GraftDv.read(fs, dvPath))
        GraftDv.write(fs, dvPath, bm)
      }
      landStaged()
    }
    fs.delete(stagingDir, true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = stagingDir.getFileSystem(hadoopConf)
    fs.delete(stagingDir, true)
  }
}

class GraftDeltaWriterFactory(stagingDir: String, physicalSchema: StructType,
                              rowSchema: StructType, proj: Array[Int],
                              partFields: Seq[org.apache.spark.sql.types.StructField],
                              partIdx: Array[Int],
                              fileIdx: Int, posIdx: Int,
                              conf: SerializableHadoopConf,
                              violations: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)] = Nil,
                              bucket: Option[(Int, org.apache.spark.sql.types.DataType, Int)] = None,
                              day: Option[(Int, org.apache.spark.sql.types.DataType, String, String)] = None,
                              genProjs: Seq[(String, Int, org.apache.spark.sql.catalyst.expressions.Expression, org.apache.spark.sql.types.DataType)] = Nil,
                              idGen: Option[GraftIdentity.WriteGen] = None,
                              rowGen: Option[GraftIdentity.WriteGen] = None,
                              metaRowIdIdx: Int = -1)
  extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new GraftDeltaWriter(stagingDir, physicalSchema, rowSchema, proj,
      partFields, partIdx, fileIdx, posIdx, partitionId, taskId, conf,
      violations, bucket, day, genProjs,
      idGen.map(GraftIdentity.taskGen(_, partitionId)),
      rowGen.map(GraftIdentity.taskGen(_, partitionId)), metaRowIdIdx)
}

/** Accumulates delete positions per data file in Roaring bitmaps and
  * appends inserted rows through the same parquet writer the batch path
  * uses. `update` is never called (updates are represented as
  * delete+insert) — it throws rather than silently half-applying.
  */
class GraftDeltaWriter(stagingDir: String, physicalSchema: StructType,
                       rowSchema: StructType, proj: Array[Int],
                       partFields: Seq[org.apache.spark.sql.types.StructField],
                       partIdx: Array[Int],
                       fileIdx: Int, posIdx: Int,
                       partitionId: Int, taskId: Long,
                       conf: SerializableHadoopConf,
                       violations: Seq[(String, org.apache.spark.sql.catalyst.expressions.Expression)] = Nil,
                       bucket: Option[(Int, org.apache.spark.sql.types.DataType, Int)] = None,
                       day: Option[(Int, org.apache.spark.sql.types.DataType, String, String)] = None,
                       genProjs: Seq[(String, Int, org.apache.spark.sql.catalyst.expressions.Expression, org.apache.spark.sql.types.DataType)] = Nil,
                       idGen: Option[GraftIdentity.TaskGen] = None,
                       rowGen: Option[GraftIdentity.TaskGen] = None,
                       metaRowIdIdx: Int = -1)
  extends DeltaWriter[InternalRow] {

  private val deletes = mutable.Map.empty[String, Roaring64Bitmap]
  private val inserts = new GraftDataWriter(stagingDir, physicalSchema,
    rowSchema, proj, partFields, partIdx, partitionId, taskId, conf,
    bucket, violations, day, idGen = idGen, genProjs = genProjs,
    rowGen = rowGen)

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    val file = id.getUTF8String(fileIdx).toString
    deletes.getOrElseUpdate(file, new Roaring64Bitmap).addLong(id.getLong(posIdx))
  }

  override def insert(row: InternalRow): Unit = inserts.write(row)

  /** Update-reinserted rows carry the pre-update GENERATED values — the
    * writer recomputes them instead of enforcing explicit equality — and
    * keep their IDENTITY value verbatim (a surrogate key survives its
    * row's update; idCarry bypasses both allocation and the GENERATED
    * ALWAYS explicit-value refusal for exactly this carrier path).
    */
  override def reinsert(meta: InternalRow, row: InternalRow): Unit = {
    inserts.genCheck = false
    inserts.idCarry = true
    // row lineage: the original row's id rides the METADATA row — pin it
    // for this one write so the reinsert keeps its identity instead of
    // minting (a NULL there would be a lineage bug, so fail loudly)
    if (metaRowIdIdx >= 0) {
      require(!meta.isNullAt(metaRowIdIdx),
        "row-lineage reinsert without a carried _row_id — the rewrite " +
          "plan lost the metadata column")
      inserts.rowCarry = Some(meta.getLong(metaRowIdIdx))
    }
    try inserts.write(row) finally {
      inserts.genCheck = true; inserts.idCarry = false
      inserts.rowCarry = None
    }
  }

  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit =
    throw new UnsupportedOperationException(
      "graft delta writer represents updates as delete+insert")

  override def commit(): WriterCommitMessage = {
    val (ins, insStats, idl, rl) = inserts.commit() match {
      case GraftCommit(files, st, l, _, r) => (files, st, l, r)
    }
    GraftDeltaCommit(ins, deletes.view.mapValues(GraftDv.toBytes).toMap,
      insStats, idl, rl)
  }

  override def abort(): Unit = inserts.abort()
  override def close(): Unit = inserts.close()
}
