package graft

import org.apache.spark.sql.SparkSession

/** Throwaway profiling/probe main — reshaped per investigation; not part
  * of the library surface. Current shape: plan + timing audit of the
  * round-5 additions (semdedup, recall audit, lm score, token budget,
  * bpe step, referential sweep).
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

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-24s min ${ts.min}%.3f s  all ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val targets = Seq("dd_semdedup", "sim_recall_audit", "pipe_lm_score",
      "pipe_token_budget", "pipe_bpe_step", "dq_referential")
    Tables.names.foreach(t => Tables.load(spark, dir, t).count()) // warm

    targets.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      if (args.contains("--explain")) {
        println(s"===== $n ====="); df.explain("formatted")
      }
      time(n) { noop(df) }
      spark.sharedState.cacheManager.clearCache()
      System.gc()
    }
  }
}
