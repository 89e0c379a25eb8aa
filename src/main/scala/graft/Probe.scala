package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: schema/read probe for the test tables. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.001"
    for (t <- Tables.names) {
      val df = Tables.load(spark, dir, t)
      println(s"== $t ==")
      df.printSchema()
      if (t == "events") df.show(3, truncate = false)
    }
    spark.stop()
  }
}
