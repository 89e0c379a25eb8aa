package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling/probe main — reshaped per investigation; not part
  * of the library surface. Current shape: fixed-width columnar vs row
  * read on a widened layout.
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
    import org.apache.spark.sql.functions._

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-32s ${ts.min}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // widened layout: 12 fields, ~1M rows
    val layout = (1 to 4).flatMap(i => Seq(
      s"k$i:10:long", s"s$i:16:string", s"v$i:12:double")).mkString(",")
    val dir = sys.props("java.io.tmpdir") + "/graft_probe_fw"
    val df = spark.range(1000000).select(
      (1 to 4).flatMap(i => Seq(
        (col("id") * i).as(s"k$i"),
        concat(lit(s"name$i"), col("id") % 1000).as(s"s$i"),
        (col("id") * 0.5 + i).as(s"v$i"))): _*)
    graft.sources.Sources.writeFixedWidth(df, dir, layout)

    def read(columnar: Boolean) = spark.read.format("fixedwidth")
      .option("layout", layout).option("splitSize", 4L << 20)
      .option("columnar", columnar.toString).load(dir)

    for (c <- Seq(true, false, true, false)) {
      time(s"full scan agg columnar=$c") {
        noop(read(c).agg(sum(col("k1")), sum(col("v2")), max(col("s3"))))
      }
      time(s"2-col projection columnar=$c") {
        noop(read(c).select(col("k1"), col("v1")))
      }
      time(s"selective filter columnar=$c") {
        noop(read(c).where(col("k2") % 997 === 0))
      }
    }
    spark.stop()
  }
}
