package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

class FixedWidthSourceSpec extends SparkSpec {
  import spark.implicits._

  private val layout = "id:8:long,name:12:string,qty:6:int"

  private def write(df: DataFrame, dir: String): String = {
    Sources.writeFixedWidth(df, dir, layout)
    dir
  }

  private def read(dir: String, splitSize: Long = 1 << 20): DataFrame =
    spark.read.format("fixedwidth")
      .option("layout", layout).option("splitSize", splitSize).load(dir)

  test("fixedwidth: values round-trip, NULLs read back as NULL") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fw").toString
    val df = Seq((1L, Some("alpha"), Some(10)), (2L, None, Some(20)),
      (3L, Some("gamma"), None)).toDF("id", "name", "qty")
    write(df, dir)
    val back = read(dir).orderBy("id").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(back(0).getString(1) == "alpha" && back(1).isNullAt(1))
    assert(back(2).isNullAt(2) && back(1).getInt(2) == 20)
  }

  test("fixedwidth: column pruning reaches the scan's read schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fw").toString
    write(Seq((1L, Some("a"), Some(1))).toDF("id", "name", "qty"), dir)
    val q = read(dir).select("qty")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.getOrElse(fail("no BatchScanExec in plan"))
    assert(scan.readSchema().fieldNames.toSeq == Seq("qty"))
    assert(q.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("fixedwidth: record-aligned byte splits fan one file out to many tasks") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fw").toString
    val df = (1 to 500).map(i => (i.toLong, Some(s"row$i"), Some(i)))
      .toDF("id", "name", "qty").coalesce(1)
    write(df, dir)
    // recordLen = 8+12+6+1 = 27; splitSize 270 -> 10 records per split
    val back = read(dir, splitSize = 270)
    assert(back.rdd.getNumPartitions > 10)
    assert(back.count() == 500)
    assert(back.agg(sum("id")).head.getLong(0) == (1 to 500).map(_.toLong).sum)
    // a split-boundary record parses whole (no torn reads)
    assert(back.where($"id" === 11L).head.getString(1) == "row11")
  }

  test("fixedwidth: writer raises on field overflow instead of truncating") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fw").toString
    val bad = Seq((1L, Some("this name is far too long for 12"), Some(1)))
      .toDF("id", "name", "qty")
    val e = intercept[Exception] { write(bad, dir) }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("overflows")))
  }
}
