package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession

/** Rewrites the single-row-group testdata tables into multi-file chunked
  * copies (16 part files per table) so scan-stage parallelism is MEASURED
  * instead of argued: the driver's sf0.1 files are one row group each, so
  * every scan-fused stage (q1's partial agg, extraction scans) serializes
  * on one core — a layout artifact of the generator, not of the engine or
  * of any real ingest (write-sized ~128 MB files at 100 TB). Run Bench
  * with SPARK_GRAFT_SF_DIR pointed at the output to record the chunked
  * line next to the stock one (SURVEY §5).
  *
  *   java ... graft.tools.Rechunk [srcDir] [dstDir] [filesPerTable]
  */
object Rechunk {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf_chunked")
    val n = args.lift(2).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { t =>
      // round-robin repartition: uniform chunk sizes regardless of source
      // ordering; row order inside a table is immaterial to the queries
      // (every oracle-gated result is totally ordered at the end)
      spark.read.parquet(s"$src/$t.parquet").repartition(n)
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"rechunk $t -> $dst/$t.parquet ($n files)")
    }
    spark.stop()
  }
}
