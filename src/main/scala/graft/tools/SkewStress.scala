package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew-stress micro-benchmark (SURVEY §5/§7): one hot key carrying 90% of
  * an N-row fact side joined against a 100k-key dim, under three plans:
  *
  *   plain   — AQE off: the hot key lands in ONE shuffle partition; its
  *             task is the straggler that bounds the stage.
  *   aqe     — AQE skew-join split (graft's default session config): the
  *             oversized partition is split at runtime, no code changes.
  *   salted  — [[graft.operators.SkewJoin.saltedEquiJoin]]: explicit
  *             (key, salt) spreading for the pathological case AQE can't
  *             fix (e.g. the hot key exceeds every split threshold or the
  *             join is inside an operator AQE won't re-plan).
  *
  * usage: runMain graft.tools.SkewStress [nRows] — prints one timing line
  * per variant (median of 3) plus the matched row counts.
  */
object SkewStress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // 90% of fact rows on key 7, the tail uniform over 100k keys
    val fact = spark.range(n)
      .select(when($"id" % 10 =!= 0, lit(7L))
        .otherwise($"id" % 100000).as("k"), $"id".as("v"))
    val dim = spark.range(100000).select($"id".as("k"), ($"id" * 2).as("w"))

    def time(label: String)(body: => Long): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val rows = body
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, rows)
      }
      val med = times.map(_._1).sorted.apply(1)
      println(f"skewstress $label%-7s n=$n rows=${times.head._2} median=$med%.2f s")
    }

    def run(): Long =
      fact.join(dim, "k").agg(count(lit(1)), sum($"v" + $"w")).collect()
        .head.getLong(0)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("plain")(run())

    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    time("aqe")(run())

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("salted") {
      graft.operators.SkewJoin.saltedEquiJoin(fact, dim, "k", salt = 32)
        .agg(count(lit(1)), sum($"v" + $"w")).collect().head.getLong(0)
    }
    spark.stop()
  }
}
