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
}
