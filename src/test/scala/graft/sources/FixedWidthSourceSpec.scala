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

  test("fixedwidth: pushed filters drop rows in the reader, no post-scan Filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fw").toString
    val df = (1 to 100).map(i =>
      (i.toLong, Some(s"n$i"), if (i % 10 == 0) None else Some(i)))
      .toDF("id", "name", "qty")
    write(df, dir)
    val q = read(dir).where($"qty" > 50 && $"id" <= 90).select("id", "qty")
    // fully pushed -> Spark leaves no residual FilterExec above the scan
    val hasFilter = q.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.FilterExec])
    assert(!hasFilter, "expected all predicates pushed into the scan")
    val got = q.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val want = (51 to 90).filter(_ % 10 != 0).map(i => (i.toLong, i)).toSet
    assert(got == want) // NULL qty rows (every 10th) dropped by the comparison
  }

  test("fixedwidth: filter on a non-projected column still prunes the output schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fw").toString
    write((1 to 50).map(i => (i.toLong, Some(s"n$i"), Some(i)))
      .toDF("id", "name", "qty"), dir)
    val q = read(dir).where($"qty" === 7).select("name")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.get
    assert(scan.readSchema().fieldNames.toSeq == Seq("name"))
    assert(q.collect().map(_.getString(0)).toSeq == Seq("n7"))
  }

  test("fixedwidth: IS NULL / IS NOT NULL and IN push correctly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fw").toString
    write(Seq((1L, Some("a"), Some(1)), (2L, None, Some(2)), (3L, Some("c"), None))
      .toDF("id", "name", "qty"), dir)
    assert(read(dir).where($"name".isNull).collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(read(dir).where($"qty".isNotNull).count() == 2)
    assert(read(dir).where($"id".isin(1L, 3L)).count() == 2)
  }

  test("fixedwidth: columnar read is planned (ColumnarToRow) and equals the row path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fw").toString
    val df = (1 to 300).map(i => (i.toLong, if (i % 7 == 0) None else Some(s"row$i"),
      if (i % 5 == 0) None else Some(i))).toDF("id", "name", "qty")
    write(df, dir)
    // batches span splits and filters (27-byte records, 10 per split)
    val colQ = read(dir, splitSize = 270).where($"id" > 20)
    assert(colQ.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      "columnar path not planned")
    val rowQ = spark.read.format("fixedwidth")
      .option("layout", layout).option("splitSize", 270)
      .option("columnar", "false").load(dir).where($"id" > 20)
    assert(!rowQ.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    def canon(q: org.apache.spark.sql.DataFrame) = q.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2))).toSet
    val (c, w) = (canon(colQ), canon(rowQ))
    assert(c == w && c.size == 280)
    assert(c.exists(_._2 == null) && c.exists(_._3 == -1)) // NULLs survive both paths
  }

  test("fixedwidth: NOT IN with a NULL literal follows SQL three-valued logic") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fw").toString
    write(Seq((1L, Some("a"), Some(1)), (2L, Some("b"), Some(2)),
      (3L, Some("c"), None)).toDF("id", "name", "qty"), dir)
    // `qty NOT IN (1, NULL)` is UNKNOWN for every row (never true): SQL
    // returns ZERO rows. A pushed Not(In) that collapses UNKNOWN to false
    // would wrongly emit id=2 — the null-bearing IN list must stay a
    // residual for Spark to evaluate
    val q = read(dir).where(!$"qty".isin(1, null))
    assert(q.count() == 0, "x NOT IN (..., NULL) must drop every row")
    // and plain IN with a NULL literal matches only real hits
    assert(read(dir).where($"qty".isin(2, null)).collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("fixedwidth: a wrong-width layout fails the record-length integrity check") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fw").toString
    write(Seq((1L, Some("a"), Some(1))).toDF("id", "name", "qty"), dir)
    // 2 bytes narrower than the written records: every offset would be
    // torn — the reader must refuse loudly, not return shifted garbage
    val e = intercept[Exception] {
      spark.read.format("fixedwidth")
        .option("layout", "id:8:long,name:10:string,qty:6:int").load(dir).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("multiple of record length")))
  }

  test("fixedwidth: malformed layout specs error clearly") {
    intercept[IllegalArgumentException] { FixedWidth.parseLayout("a:b") }
    intercept[IllegalArgumentException] { FixedWidth.parseLayout("a:8:blob") }
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
