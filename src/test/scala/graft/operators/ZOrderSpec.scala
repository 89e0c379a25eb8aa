package graft.operators

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Z-order layout: exact Morton math, and the property the layout exists
  * for — multi-dimension min/max skipping on the files actually written.
  */
class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  private def mortonRef(bt: Long, bu: Long, bits: Int): Long = {
    var z = 0L
    for (b <- 0 until bits) {
      z |= ((bt >> b) & 1L) << (b * 2)
      z |= ((bu >> b) & 1L) << (b * 2 + 1)
    }
    z
  }

  test("interleave matches a reference Morton implementation") {
    val rows = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val df = rows.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.interleave(Seq(col("x"), col("y")), bits = 4).as("z"))
    df.collect().foreach { r =>
      assert(r.getLong(2) === mortonRef(r.getLong(0), r.getLong(1), 4),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("bucketization is exact integer math over the full [min,max] domain") {
    // 0..999 into 2^4 = 16 buckets of ((x-0)*16)//1000
    val df = (0L until 1000L).toDF("x")
      .select(col("x"),
        ZOrder.bucket(col("x"), lit(0L), lit(999L), bits = 4).as("b"))
    df.collect().foreach { r =>
      assert(r.getLong(1) === (r.getLong(0) * 16) / 1000, s"x=${r.getLong(0)}")
    }
    // degenerate domain (min == max) maps to bucket 0, never divides by 0
    val one = Seq(7L).toDF("x")
      .select(ZOrder.bucket(col("x"), lit(7L), lit(7L), bits = 8))
    assert(one.head().getLong(0) === 0L)
  }

  test("z-ordered files prune a second-dimension predicate; linear sort cannot") {
    // uniform 64x64 grid — under a linear sort by x, every file spans the
    // whole y domain (y stats are useless); under z-order each file covers
    // a compact (x, y) rectangle
    val n = 64
    val grid = (for (x <- 0 until n; y <- 0 until n)
      yield (x.toLong, y.toLong, x * n + y)).toDF("x", "y", "payload")

    def fileStats(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = {
      val out = Files.createTempDirectory("zorder").toString + "/t"
      df.coalesce(1) // single writer task; maxRecordsPerFile splits files
        .write.option("maxRecordsPerFile", 256).parquet(out)
      val files = new java.io.File(out).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getPath).toSeq
      assert(files.size >= 8, s"expected >=8 files, got ${files.size}")
      files.map { f =>
        val r = spark.read.parquet(f).agg(min("y"), max("y")).head()
        (r.getLong(0), r.getLong(1))
      }
    }

    // files whose [min,max] y-range intersects the selective y predicate —
    // exactly what parquet row-group / file skipping reads
    def touched(stats: Seq[(Long, Long)], lo: Long, hi: Long): Int =
      stats.count { case (mn, mx) => mx >= lo && mn <= hi }

    val zStats = fileStats(
      ZOrder.zorderBy(grid, Seq("x" -> col("x"), "y" -> col("y")), bits = 6))
    val linStats = fileStats(grid.orderBy("x", "y"))

    val (lo, hi) = (8L, 15L) // 1/8 of the y domain
    val zTouched = touched(zStats, lo, hi)
    val linTouched = touched(linStats, lo, hi)
    // linear-by-x: every 256-row file holds 4 full x-columns => spans all
    // of y => nothing skips. z-order: only curve segments near the y band.
    assert(linTouched === linStats.size,
      s"linear layout unexpectedly skipped files ($linTouched/${linStats.size})")
    assert(zTouched <= zStats.size / 2,
      s"z-order should touch <=half the files, got $zTouched/${zStats.size}")
  }

  test("zorderBy preserves rows exactly and drops the helper column") {
    val df = spark.range(1000)
      .select(col("id").as("x"), (col("id") * 7 % 1000).as("y"))
    val z = ZOrder.zorderBy(df, Seq("x" -> col("x"), "y" -> col("y")), bits = 5)
    assert(z.columns.toSeq === Seq("x", "y"))
    assert(z.count() === 1000)
    assert(z.select(sum("x"), sum("y")).head() ===
      df.select(sum("x"), sum("y")).head())
  }
}
