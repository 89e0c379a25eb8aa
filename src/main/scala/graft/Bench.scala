package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every SparkEntry query at SPARK_GRAFT_SF_DIR,
  * prints one JSON line. Optional args restrict to the named queries
  * (local profiling aid; the driver passes none).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // the 128-aggregate minhash signature row must stay in codegen
      .config("spark.sql.codegen.maxFields", "300")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/JIT/parquet footers so the first timed query isn't
    // charged for session initialization
    Tables.names.foreach(t => Tables.load(spark, sfDir, t).count())
    // 3 iterations: this VM shares cores with the round driver (ambient
    // load 4-7), and the first run of a heavy query pays planning + JIT
    // under contention — min-of-3 reproduces isolation-level timings
    // (minhash: 8-10s min-of-2 in-suite vs 2.3s min-of-3)
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val sel = SparkEntry.queries.filter { case (n, _) => args.isEmpty || args.contains(n) }
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    val results = sel.toSeq.sortBy(_._1).map { case (name, fn) =>
      // min over iterations: JIT/code-cache state across the suite makes
      // single shots noisy by multiples
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        // noop sink, NOT count(): count() lets Catalyst prune every
        // projection-only column, so extraction/hash/quantize queries
        // would measure a parquet metadata count instead of their work
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          // a failure must be VISIBLE, not a suspiciously fast timing
          failed += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // drop operator-internal persists plus references to finished
        // shuffles/broadcasts so the ContextCleaner reclaims them; without
        // this, state from 40+ queries accumulates and later queries
        // measure 5-20x slower
        spark.sharedState.cacheManager.clearCache()
        System.gc()
        dt
      }
      name -> times.min
    }
    // 10ms precision: the driver captures only the last 2000 chars of
    // output (incl. sbt's ~75-char success trailer) and parses the JSON
    // line out of that window — at 9-decimal precision a 67-query line is
    // ~2600 chars and the parse silently fails; at 3 decimals 78 queries
    // already reach ~1890
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}"""
    if (line.length > 1800)
      System.err.println(s"[bench] WARNING: JSON line ${line.length} chars — may overflow the driver's 2000-char tail")
    println(line)
    spark.stop()
  }
}
