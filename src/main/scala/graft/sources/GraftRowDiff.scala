package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** ROW-ID CHANGE DIFF — "which rows changed between v1 and v2" as an ID
  * JOIN, the actual 100 TB payoff of row lineage ([[GraftRowId]]).
  *
  * The manifest diff bounds the read: a data file present in BOTH
  * snapshots with the SAME deletion-vector reference contributes
  * identical (id → row) pairs to both sides and can be skipped without
  * looking at it — only files added, removed, or re-masked between the
  * two versions are scanned (O(changed bytes), not O(table)). The two
  * bounded sides then full-outer-join on `_row_id`:
  *
  *   - id only in the newer side        → `insert`
  *   - id only in the older side        → `delete`
  *   - id in both, payload differs      → `update_preimage` +
  *                                        `update_postimage`
  *   - id in both, payload identical    → nothing (compaction / Z-order /
  *                                        DV materialization rewrites are
  *                                        change-free by construction)
  *
  * Because identity is the ROW ID (not position, not file), an UPDATE is
  * an update even though COW physically rewrote the row into a different
  * file — the thing the positional changes feed ([[GraftChanges]]) cannot
  * say without a full-column compare. Compare cost here is one struct
  * equality per id-matched row, only over the changed-file row set.
  *
  * Contract: lineage tables only; both versions must still be retained;
  * rename-history tables are refused (per-epoch name resolution does not
  * compose with the two-sided parquet read — compact to current-schema
  * files first, the [[GraftEqDelete.upsert]] rule).
  */
object GraftRowDiff {

  val ChangeCol = "_change_type"
  val Insert = "insert"
  val Delete = "delete"
  val UpdatePre = "update_preimage"
  val UpdatePost = "update_postimage"

  def diff(spark: SparkSession, t: GraftTable, vFrom: Long, vTo: Long): DataFrame = {
    require(t.rowLineage,
      s"graft_row_diff: ${t.name()} is not a row-lineage table — declare " +
        "TBLPROPERTIES('rowid'='true') at CREATE; without stable ids a " +
        "version diff needs the positional changes feed (`.changes`)")
    require(t.aliases.isEmpty,
      s"graft_row_diff: ${t.name()} carries rename history " +
        s"(${t.aliases.keys.mkString(",")}) — compact to current-schema " +
        "files first")
    require(vFrom <= vTo,
      s"graft_row_diff: from-version $vFrom must not exceed to-version $vTo")
    val dir = new Path(t.dir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val versions = GraftTable.manifestVersions(fs, dir)
    Seq(vFrom, vTo).foreach(v => require(versions.contains(v),
      s"graft_row_diff: version $v of ${t.name()} is not retained " +
        s"(have ${versions.headOption.getOrElse(0L)}..${versions.lastOption.getOrElse(0L)})"))
    val from = GraftTable.readFullEntries(fs, dir, vFrom)
    val to = GraftTable.readFullEntries(fs, dir, vTo)
    def key(e: GraftTable.GraftEntry) = new Path(e.file).getName
    val fromByName = from.map(e => key(e) -> e).toMap
    val toByName = to.map(e => key(e) -> e).toMap
    // unchanged (same file, same DV ref, same eq references) contributes
    // identical (id → row) pairs to both sides and cancels out UNREAD
    def sameMasks(a: GraftTable.GraftEntry, b: GraftTable.GraftEntry) =
      a.dv == b.dv && a.eqs.toSet == b.eqs.toSet
    val changedFrom = from.filterNot(e =>
      toByName.get(key(e)).exists(sameMasks(e, _)))
    val changedTo = to.filterNot(e =>
      fromByName.get(key(e)).exists(sameMasks(e, _)))

    val readSchema = StructType(t.schema().fields.toSeq :+
      StructField(GraftRowId.Col, org.apache.spark.sql.types.LongType))
    val cols = t.schema().fieldNames.toSeq

    // one bounded read per distinct equality-mask set (usually 1): eq
    // masks apply per FILE, so files sharing a reference set read and
    // anti-join together, exactly the materializeEqDeletes grouping. The
    // eq key sidecars are change-set-sized — they broadcast.
    def side(entries: Seq[GraftTable.GraftEntry]): DataFrame =
      entries.groupBy(_.eqs.toSet).toSeq.sortBy(_._1.toSeq.sorted.mkString)
        .map { case (eqSet, group) =>
          eqSet.toSeq.sorted.foldLeft(sideUnmasked(group)) { (df, eq) =>
            val keys = spark.read.parquet(eq)
            df.join(broadcast(keys), keys.columns.toSeq, "left_anti")
          }
        }
        .reduceOption(_ unionAll _)
        .getOrElse(spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          readSchema))

    def sideUnmasked(entries: Seq[GraftTable.GraftEntry]): DataFrame = {
      if (entries.isEmpty)
        return spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), readSchema)
      val df = spark.read.schema(readSchema).option("basePath", t.dir)
        .parquet(entries.map(_.file): _*)
      val dved = entries.filter(_.dv.isDefined)
      if (dved.isEmpty) df
      else {
        // DV anti-filter: bitmaps ride a broadcast (driver bytes bounded
        // by the CHANGED files, not the table), probed per row position
        import scala.jdk.CollectionConverters._
        val dvSchema = StructType(Seq(
          StructField("__graft_dv_name", org.apache.spark.sql.types.StringType,
            nullable = false),
          StructField("__graft_dv", org.apache.spark.sql.types.BinaryType,
            nullable = false)))
        val dvDf = spark.createDataFrame(
          dved.map { e =>
            val p = new Path(e.dv.get)
            org.apache.spark.sql.Row(new Path(e.file).getName,
              GraftDv.toBytes(GraftDv.read(fs, p)))
          }.asJava, dvSchema)
        val dead = org.apache.spark.sql.graftbridge.Bridge.column(
          graft.expressions.BitmapContains(
            org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute("__graft_dv"),
            org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute("__graft_pos")))
        df.withColumn("__graft_dv_name", col("_metadata.file_name"))
          .withColumn("__graft_pos", col("_metadata.row_index"))
          .join(broadcast(dvDf), Seq("__graft_dv_name"), "left")
          .where(col("__graft_dv").isNull || !dead)
          .select(readSchema.fieldNames.map(col).toSeq: _*)
      }
    }

    val before = side(changedFrom)
      .select(col(GraftRowId.Col).as("_rid"), struct(cols.map(col): _*).as("_b"))
    val after = side(changedTo)
      .select(col(GraftRowId.Col).as("_rid"), struct(cols.map(col): _*).as("_a"))
    val j = before.join(after, Seq("_rid"), "full_outer")
    def shape(img: String, change: String) =
      (cols.map(c => col(s"$img.$c")) :+ col("_rid").as(GraftRowId.Col) :+
        lit(change).as(ChangeCol))
    val ins = j.where(col("_b").isNull).select(shape("_a", Insert): _*)
    val del = j.where(col("_a").isNull).select(shape("_b", Delete): _*)
    val upd = j.where(col("_b").isNotNull && col("_a").isNotNull &&
      !(col("_b") <=> col("_a")))
    ins.unionAll(del)
      .unionAll(upd.select(shape("_b", UpdatePre): _*))
      .unionAll(upd.select(shape("_a", UpdatePost): _*))
  }
}
