package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: stage-level profiling for hot operators. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.maxFields", "300")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
      System.gc()
    }

    val docs = Tables.documents(spark, dir)
    import graft.operators.Dedup
    // warm up
    docs.count()

    time("shingleRows") { Dedup.shingleRows(docs, "doc_id", "text", 3).count() }
    time("shingleRows(2)") { Dedup.shingleRows(docs, "doc_id", "text", 3).count() }

    val posts = Dedup.shingleRows(docs, "doc_id", "text", 3)
    val k = 128; val bands = 32; val r = 4
    val m54 = lit((1L << 54) - 1)
    val hashed = posts.select(col("id"),
      xxhash64(col("s")).bitwiseAND(m54).as("h1"),
      xxhash64(lit(1), col("s")).bitwiseAND(m54).bitwiseOR(lit(1L)).as("h2"))
    val sig = hashed
      .groupBy(col("id"))
      .agg(min(col("h1")).as("m0"),
        (1 until k).map(i => min(col("h1") + lit(i.toLong) * col("h2")).as(s"m$i")) :+
          count(lit(1)).as("sz"): _*)
    time("signatures") { sig.count() }
    time("signatures(2)") { sig.count() }

    val bandRows = sig.select(col("id"),
      explode(array((0 until bands).map { j =>
        struct(lit(j).as("band"),
          xxhash64((j * r until (j + 1) * r).map(i => col(s"m$i")): _*).as("bh"))
      }: _*)).as("b"))
      .select(col("id"), col("b.band"), col("b.bh"))
    time("bandRows") { bandRows.count() }

    val candA = bandRows.select(col("band").as("a_band"), col("bh").as("a_bh"), col("id").as("a_id"))
    val candB = bandRows.select(col("band").as("b_band"), col("bh").as("b_bh"), col("id").as("b_id"))
    val cand = candA.join(candB,
        col("a_band") === col("b_band") && col("a_bh") === col("b_bh") &&
          col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    time("candidates") { cand.count() }

    time("full minhashLshPairs") {
      Dedup.minhashLshPairs(docs, "doc_id", "text", tau = 0.8).count()
    }
    time("full minhashLshPairs(2)") {
      Dedup.minhashLshPairs(docs, "doc_id", "text", tau = 0.8).count()
    }

    spark.stop()
  }
}
