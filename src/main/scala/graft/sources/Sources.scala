package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** File source/sink helpers. The reference's CSV sink (main.py:329-331)
  * plus the source formats a Spark-native engine provides out of the box.
  * Reads always take an explicit schema — schema inference is an extra
  * full pass over the data and is banned at scale.
  */
object Sources {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** CSV sink with a UTF-8 BOM — the reference's exact sink contract
    * (`utf-8-sig`, main.py:330; its implied consumer is Excel, which
    * needs the BOM to decode UTF-8). The BOM rides as the first character
    * of the first HEADER cell, so every part file starts with EF BB BF
    * without any post-pass file rewrite — the write scales exactly like
    * [[writeCsv]]. Read back with [[readCsv]]: header lines (BOM
    * included) are skipped under an explicit schema.
    */
  def writeCsvBom(df: DataFrame, path: String): Unit = {
    val first = df.columns.head
    writeCsv(df.withColumnRenamed(first, "\uFEFF" + first), path)
  }

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Line-oriented text sink/source (single string column). */
  def writeText(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").text(path)

  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Dynamic partition overwrite: rewrite ONLY the partitions present in
    * `df`, leaving every other partition untouched — the daily/hourly
    * incremental rewrite pattern (reprocess one day without touching the
    * other 3650). Static overwrite mode would delete the whole table
    * first; dynamic scopes the delete to the partitions being written.
    */
  def overwritePartitions(df: DataFrame, path: String,
                          partitionBy: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionBy: _*)
      .parquet(path)

  /** Malformed-tolerant CSV read (PERMISSIVE): fields that fail to parse
    * come back NULL and the raw line lands in `corruptCol` (which must be
    * a StringType field of `schema`). The ingest never aborts on a bad
    * row — quarantine `corruptCol IS NOT NULL` downstream. At 100 TB a
    * FAILFAST read of a feed with one bad line loses the whole job;
    * this is the robust-ingest default.
    */
  def readCsvPermissive(spark: SparkSession, path: String, schema: StructType,
                        corruptCol: String): DataFrame =
    spark.read
      .option("header", "false")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(schema)
      .csv(path)

  /** XML sink/source (Spark 4 native XML data source; one row per
    * `rowTag` element). Reads take an explicit schema like every other
    * source here — XML inference is a full extra pass.
    */
  def writeXml(df: DataFrame, path: String, rowTag: String): Unit =
    df.write.mode("overwrite").option("rowTag", rowTag).format("xml").save(path)

  def readXml(spark: SparkSession, path: String, rowTag: String,
              schema: StructType): DataFrame =
    spark.read.option("rowTag", rowTag).schema(schema).format("xml").load(path)

  /** Schema-evolution read: union the (compatible) schemas of every
    * parquet file under `path`, filling columns absent from older files
    * with NULL. Footer-merge is metadata work on the driver — no data
    * pass — so an evolving table keeps its full history readable without
    * a rewrite. recursiveFileLookup picks up non-partition subdirectories
    * (each ingest epoch writing its own dir is the common layout).
    */
  def readParquetMergeSchema(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("mergeSchema", "true")
      .option("recursiveFileLookup", "true")
      .parquet(path)

  /** Corrupt-file-tolerant parquet read: a table directory with one
    * truncated/garbage file (a killed writer, a bad disk) yields every
    * readable file's rows instead of failing the whole scan — the batch
    * sibling of PERMISSIVE CSV ingest. Scoped to THIS read via the
    * option, not the session-wide conf, so strict reads elsewhere still
    * fail fast; reconcile counts against the writer's manifest/observe
    * metrics downstream. The schema is explicit — inference would read
    * footers and can itself trip over the corrupt file (measured).
    */
  def readParquetLenient(spark: SparkSession, path: String,
                         schema: StructType): DataFrame =
    spark.read.option("ignoreCorruptFiles", "true").schema(schema).parquet(path)

  /** Fixed-width record sink: format every row to the `layout` spec
    * (name:width:type,... — numbers left-padded, strings right-padded,
    * NULL as all spaces) and write line-oriented text. A value wider than
    * its field raises rather than silently truncating — a fixed-width
    * feed with clipped keys is corrupt in the worst possible way
    * (plausible-looking wrong data). Read back with
    * `spark.read.format("fixedwidth").option("layout", ...)`.
    */
  def writeFixedWidth(df: DataFrame, path: String, layout: String): Unit = {
    import org.apache.spark.sql.functions._
    val fields = FixedWidth.parseLayout(layout).fields
    val line = concat(fields.map { f =>
      val s = coalesce(col(f.name).cast("string"), lit(""))
      val guarded = when(length(s) > f.width,
        raise_error(concat(lit(s"fixedwidth: ${f.name} overflows ${f.width} chars: "), s)))
        .otherwise(s)
      f.dataType match {
        case org.apache.spark.sql.types.StringType => rpad(guarded, f.width, " ")
        case _ => lpad(guarded, f.width, " ")
      }
    }: _*)
    writeText(df.select(line.as("value")), path)
  }

  /** Bucketed catalog table: rows hash-partitioned into `nBuckets` files
    * per partition by `bucketCols`, sorted within each bucket. Two tables
    * bucketed the same way equi-join on the bucket columns WITHOUT a
    * shuffle (SortMergeJoin reads co-located buckets directly) — the
    * pre-partitioning strategy for repeated fact-fact joins at 100 TB,
    * where one write-time shuffle amortizes over every downstream join.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .format("parquet").saveAsTable(table)
  }

  /** Compact a small-files parquet directory to ~`targetBytes` files: the
    * maintenance pass a 100 TB table needs after streaming/incremental
    * ingest, where thousands of KB-sized files per day make every
    * downstream scan driver- and metadata-bound. Sizing reads ONLY file
    * metadata (one driver listing, no data pass); the rewrite is one
    * round-robin shuffle to exactly the partition count that lands files
    * at the target size. Returns the output file count.
    *
    * Compaction and clustering compose: pass `sortCols` (e.g. the z-value
    * column) to keep the rewritten files range-clustered instead of
    * round-robin — repartitionByRange preserves min/max locality.
    */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
                     targetBytes: Long = 128L << 20,
                     sortCols: Seq[String] = Nil): Int = {
    require(targetBytes > 0)
    val hadoopPath = new org.apache.hadoop.fs.Path(inPath)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(hadoopPath)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inPath)
    val shaped =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nOut, sortCols.map(org.apache.spark.sql.functions.col): _*)
          .sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
      else df.repartition(nOut)
    shaped.write.mode("overwrite").parquet(outPath)
    nOut
  }
}
