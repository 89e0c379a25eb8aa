package graft.tools

import org.apache.spark.sql.SparkSession

/** Input-layout probe: reports scan partition counts for the testdata
  * tables and measures a scan-bound aggregate before/after an in-memory
  * repartition — quantifying how much the single-row-group test files
  * serialize scan-side work (a layout artifact real ingests don't have).
  */
object LayoutProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    println("layoutprobe lineitem scan partitions: " + li.rdd.getNumPartitions)
    def t(label: String)(body: => Unit): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"layoutprobe $label: min=${times.min}%.2f s")
    }
    t("1-rowgroup-scan-agg") {
      li.selectExpr("sum(l_extendedprice * (1 - l_discount))").collect()
    }
    val re = li.repartition(32).cache()
    re.count()
    t("32-partition-cached-agg") {
      re.selectExpr("sum(l_extendedprice * (1 - l_discount))").collect()
    }
    // the q1 shape: grouped 8-aggregate — partial agg fuses into the scan
    // stage, so single-row-group input serializes ALL the per-row decimal
    // work onto one core
    val q1Aggs = Seq(
      "sum(l_quantity)", "sum(l_extendedprice)",
      "sum(cast(l_extendedprice as decimal(8,2)) * cast(1 - l_discount as decimal(4,2)))",
      "avg(l_quantity)", "avg(l_extendedprice)", "avg(l_discount)", "count(1)")
    val aggCols = q1Aggs.map(org.apache.spark.sql.functions.expr)
    t("q1-shape-1-rowgroup") {
      li.where("l_shipdate <= date'1998-09-02'")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(aggCols.head, aggCols.tail: _*).collect()
    }
    t("q1-shape-32-partition") {
      re.where("l_shipdate <= date'1998-09-02'")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(aggCols.head, aggCols.tail: _*).collect()
    }
    spark.stop()
  }
}
