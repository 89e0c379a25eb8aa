package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileDd {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.maxFields", "300")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(label: String)(body: => Unit): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body
        spark.sharedState.cacheManager.clearCache(); System.gc()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"profile $label: min=${times.min}%.2f")
    }
    def noop(df: org.apache.spark.sql.DataFrame) =
      df.write.format("noop").mode("overwrite").save()
    val q = graft.queries.Etl.queries("etl_danish_date")
    t("full-query")(noop(q(spark, dir)))
    val orders = graft.Tables.orders(spark, dir)
    t("scan-only")(noop(orders.select(col("o_orderkey"), col("o_orderdate"))))
    t("scan-sort")(noop(orders.select(col("o_orderkey"), col("o_orderdate")).orderBy("o_orderkey")))
    val monthNames = Seq("januar","februar","marts","april","maj","juni","juli","august","september","oktober","november","december")
    val mon = element_at(array(monthNames.map(lit): _*), month(col("o_orderdate")))
    val txt = when(col("o_orderkey") % 7 === 0, "ingen dato")
      .otherwise(concat(lit("Godkendt den "), dayofmonth(col("o_orderdate")).cast("string"), lit(". "), mon, lit(" "), year(col("o_orderdate")).cast("string")))
    t("construct-nosort")(noop(orders.select(col("o_orderkey"), txt.as("t"))))
    t("parse-nosort")(noop(orders.select(col("o_orderkey"), graft.functions.Text.parseDanishDate(txt).as("d"))))
    t("parse-sorted")(noop(orders.select(col("o_orderkey"), col("o_orderdate")).orderBy("o_orderkey")
      .select(col("o_orderkey"), graft.functions.Text.parseDanishDate(txt).as("d"))))
    t("full-query-again")(noop(q(spark, dir)))
    val df = q(spark, dir)
    df.write.format("noop").mode("overwrite").save()
    println("profile plan sorts: " + df.queryExecution.executedPlan.toString.split("\n").count(_.contains("Sort ")))
    spark.stop()
  }
}
