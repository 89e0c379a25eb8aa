package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Throwaway profiling/probe main — reshaped per investigation; not part
  * of the library surface. Current shape (round 13 optimization): run the
  * named queries once each under a job listener and print a per-job
  * breakdown — duration, task count, shuffle bytes, and the first
  * graft-frame call site — to find where a slow query's wall-clock goes.
  *
  * usage: graft.Probe [--sf dir] query [query ...]
  */
object Probe {
  private case class JobRec(id: Int, desc: String, site: String,
                            var ms: Long = -1, var tasks: Int = 0,
                            var shufR: Long = 0, var shufW: Long = 0,
                            var started: Long = 0)

  def main(args: Array[String]): Unit = {
    val (flags, names) = args.partition(_.startsWith("--"))
    val dir = flags.find(_.startsWith("--sf=")).map(_.drop(5))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.sorting.enabled", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.maxFields", "300")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
        val r = JobRec(e.jobId, desc, site)
        r.started = e.time
        jobs.put(e.jobId, r)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val r = jobs.get(e.jobId)
        if (r != null) r.ms = e.time - r.started
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        // charge stage metrics to the newest job that contains it (approx)
        val m = e.stageInfo.taskMetrics
        val it = jobs.values().iterator()
        var best: JobRec = null
        while (it.hasNext) {
          val r = it.next()
          if (r.ms < 0 && (best == null || r.id > best.id)) best = r
        }
        if (best != null && m != null) {
          best.tasks += e.stageInfo.numTasks
          best.shufR += m.shuffleReadMetrics.totalBytesRead
          best.shufW += m.shuffleWriteMetrics.bytesWritten
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    Tables.names.foreach(t => Tables.load(spark, dir, t).count()) // warm
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    names.foreach { n =>
      // run 1: warm (JIT/codegen); run 2: profiled
      noop(SparkEntry.queries(n)(spark, dir))
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      jobs.clear()
      val t0 = System.nanoTime()
      noop(SparkEntry.queries(n)(spark, dir))
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      System.gc()
      import scala.jdk.CollectionConverters._
      val rs = jobs.values().asScala.toSeq.sortBy(_.id)
      val sumMs = rs.map(_.ms.max(0)).sum
      println(f"\n===== $n  wall=$wall%.2f s  jobs=${rs.size}  jobSum=${sumMs / 1e3}%.2f s =====")
      rs.foreach { r =>
        println(f"job ${r.id}%4d ${r.ms}%6d ms tasks=${r.tasks}%4d shufW=${r.shufW}%9d  ${r.site.take(70)}")
      }
    }
    spark.stop()
  }
}
