package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType

/** Stream offset for a graft history table: "consumed through manifest
  * `version`". Manifest versions are the table's commit log, so they are
  * exactly the resume points a streaming read needs.
  */
case class GraftVersionOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

/** Structured Streaming SOURCE over a graft-catalog HISTORY table — the
  * "lakehouse table as a stream" half that pairs with
  * `StreamOps.catalogUpsertStream`'s sink half (Delta's streaming source /
  * Iceberg's incremental read shape): each micro-batch reads the data
  * files ADDED between two manifest versions, so a downstream pipeline
  * consumes a table's commits incrementally — no re-scan of history, and
  * checkpoint recovery restarts from a version number instead of
  * re-reading the table.
  *
  * Contract: APPEND capture only. A commit that REMOVES files from the
  * manifest (copy-on-write UPDATE/DELETE/MERGE, compaction, restore)
  * fails the stream loudly — silently re-emitting rewritten files would
  * double-count rows, and true change-data capture needs per-row change
  * metadata this format does not record. That is the same line Delta
  * draws (`ignoreChanges`/CDF); the failure message says which commit
  * broke append-only. Non-history tables have no commit log, hence no
  * offsets — the capability is only advertised with snapshots on.
  *
  * Scale shape: `latestOffset` is one directory listing; planning a batch
  * is two manifest reads + a set difference (O(files), metadata only);
  * the data read is exactly the appended files, each one task through the
  * same pruned parquet reader the batch scan uses.
  */
class GraftMicroBatchStream(table: GraftTable, required: StructType,
                            conf: SerializableHadoopConf)
  extends MicroBatchStream {

  private def dir = new Path(table.dir)
  private def fs = dir.getFileSystem(conf.value)

  private def versions: Seq[Long] = GraftTable.manifestVersions(fs, dir)

  /** Start at the CREATE manifest: the first batch delivers every file
    * added since table creation (snapshot-then-increments, Delta's
    * default starting position).
    */
  override def initialOffset(): Offset =
    GraftVersionOffset(versions.headOption.getOrElse(throw new IllegalStateException(
      s"streaming read of ${table.name()}: history table has no manifest")))

  override def latestOffset(): Offset = GraftVersionOffset(versions.last)

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[GraftVersionOffset].version
    val e = end.asInstanceOf[GraftVersionOffset].version
    if (e <= s) return Array.empty
    val before = GraftTable.readManifest(fs, dir, s)
      .map(f => new Path(f).getName).toSet
    val after = GraftTable.readManifest(fs, dir, e)
    val afterNames = after.map(f => new Path(f).getName).toSet
    val removed = before -- afterNames
    if (removed.nonEmpty) throw new IllegalStateException(
      s"streaming read of ${table.name()}: commit range ($s, $e] removed " +
        s"files ${removed.toSeq.sorted.take(3).mkString(", ")}… — only " +
        "append commits are streamable (copy-on-write rewrites need " +
        "change-data capture); stream from append-only tables or restart " +
        "from the current snapshot")
    after.filterNot(f => before.contains(new Path(f).getName))
      .map(GraftFilePartition(_)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required, table.physicalSchema, table.dir,
      table.partitionFields, Array.empty, conf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
