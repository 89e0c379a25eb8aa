package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling/probe main — reshaped per investigation; not part
  * of the library surface. Current shape: stream_locf harness cost
  * breakdown + sim_ann_ivf stability.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.maxFields", "300")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args.head else "/root/testdata/sf0.1"
    import org.apache.spark.sql.functions._

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-32s min ${ts.min}%.3f s  all ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    Tables.events(spark, dir).count() // warm

    time("sim_ann_ivf") {
      noop(queries.SimilarityQueries.queries("sim_ann_ivf")(spark, dir))
    }

    // stream_locf breakdown: collect vs streaming fold
    locally {
      val t0 = System.nanoTime()
      val ev = Tables.events(spark, dir).where(col("event_id") % 5 === 0).select(
          col("event_id"), floor(unix_timestamp(col("ts"))).cast("long").as("sec"),
          col("user_id"),
          when(col("event_id") % 4 === 0, col("value")).as("reading"))
        .collect()
      println(f"locf collect ${ev.length} rows      ${(System.nanoTime() - t0) / 1e9}%.3f s")
      val users = ev.map(_.getLong(2)).distinct.length
      println(s"locf distinct users $users")
    }
    time("stream_locf full") {
      noop(queries.StreamingQueries.queries("stream_locf")(spark, dir))
    }
    spark.stop()
  }
}
