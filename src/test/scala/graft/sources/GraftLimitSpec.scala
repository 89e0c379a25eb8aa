package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** Pushed LIMIT as a bounded file plan: a bare `LIMIT n` keeps only the
  * file prefix whose stats-log row counts provably cover n; any filter,
  * masked file or missing stats disables the truncation (soundness).
  */
class GraftLimitSpec extends SparkSpec {

  private lazy val warehouse =
    Files.createTempDirectory("graft_lim2_wh").toFile.getAbsolutePath

  private def sql(q: String) = spark.sql(q)

  private def scanPartitions(df: org.apache.spark.sql.DataFrame): Int = {
    def unwrap(p: SparkPlan): SparkPlan = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    unwrap(df.queryExecution.executedPlan)
      .collectFirst { case b: BatchScanExec => b.inputPartitions.size }
      .getOrElse(fail("no BatchScanExec in plan"))
  }

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.graft_lm", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_lm.warehouse", warehouse)
    sql("CREATE NAMESPACE IF NOT EXISTS graft_lm.db")
  }

  test("bare LIMIT plans a provable file prefix, metadata-only") {
    sql("CREATE TABLE graft_lm.db.t (k BIGINT, v STRING)")
    // four single-task inserts -> four files of 100 recorded rows each
    (0 until 4).foreach { i =>
      spark.range(i * 100, i * 100 + 100, 1, 1)
        .selectExpr("id AS k", "concat('v', id) AS v")
        .writeTo("graft_lm.db.t").append()
    }
    val before = GraftParquetFilters.footerProbes.get()
    val df = spark.table("graft_lm.db.t").limit(150)
    // 100 + 100 >= 150: two files prove coverage
    assert(scanPartitions(df) == 2, "150 rows are proven by two files")
    assert(GraftParquetFilters.footerProbes.get() == before,
      "limit planning must not open footers")
    assert(df.count() == 150)
    // a limit beyond the table's total keeps every file and stays exact
    assert(spark.table("graft_lm.db.t").limit(1000).count() == 400)
    assert(scanPartitions(spark.table("graft_lm.db.t").limit(1000)) == 4)
  }

  test("a filter disables the truncation - matching rows may sit anywhere") {
    // non-pushable predicate: Filter stays above the scan, limit must
    // plan every file (k % 2 has no source translation)
    val df = spark.table("graft_lm.db.t").where("k % 2 = 0").limit(5)
    assert(scanPartitions(df) == 4)
    assert(df.count() == 5)
  }

  test("ORDER BY LIMIT on a declared-sort table plans only the range head/tail") {
    sql("CREATE TABLE graft_lm.db.s (k BIGINT, v STRING) " +
      s"TBLPROPERTIES('${GraftSort.SortColsProp}'='k')")
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    spark.conf.set(coalesceKey, "false")
    try {
      spark.range(0, 400).selectExpr(
          "CAST(id * 2654435761 % 400 AS BIGINT) AS k", "concat('v', id) AS v")
        .repartition(3)
        .writeTo("graft_lm.db.s").append()
    } finally spark.conf.unset(coalesceKey)
    val tdir = new org.apache.hadoop.fs.Path(s"$warehouse/db/s")
    val total = GraftTable.dataFiles(
      tdir.getFileSystem(spark.sessionState.newHadoopConf()), tdir).size
    assert(total > 1)
    val asc = spark.table("graft_lm.db.s").orderBy("k").limit(50)
    assert(scanPartitions(asc) < total,
      s"${scanPartitions(asc)} of $total planned for the ASC head")
    assert(asc.collect().map(_.getLong(0)).toSeq == (0L until 50L))
    val desc = spark.table("graft_lm.db.s")
      .orderBy(org.apache.spark.sql.functions.col("k").desc).limit(50)
    assert(scanPartitions(desc) < total,
      s"${scanPartitions(desc)} of $total planned for the DESC tail")
    assert(desc.collect().map(_.getLong(0)).toSeq ==
      (399L to 350L by -1L))
  }

  test("top-N keeps null-carrying files under ASC and overlapping tables stay exact") {
    sql("CREATE TABLE graft_lm.db.nl (k BIGINT, v STRING)")
    spark.range(0, 100, 1, 1).selectExpr("id AS k", "'a' AS v")
      .writeTo("graft_lm.db.nl").append()
    spark.range(0, 10, 1, 1).selectExpr("CAST(NULL AS BIGINT) AS k", "'n' AS v")
      .writeTo("graft_lm.db.nl").append()
    spark.range(50, 150, 1, 1).selectExpr("id AS k", "'b' AS v") // overlaps
      .writeTo("graft_lm.db.nl").append()
    // NULLS FIRST: the 10 nulls are the top of the ASC order
    val top = spark.table("graft_lm.db.nl").orderBy("k").limit(12)
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0))
    assert(top.count(_ == -1L) == 10 && top.sorted.toSeq.drop(10) == Seq(0L, 1L))
    // DESC over overlapping ranges: exact regardless of what was pruned
    val d = spark.table("graft_lm.db.nl")
      .orderBy(org.apache.spark.sql.functions.col("k").desc).limit(3)
      .collect().map(_.getLong(0)).toSeq
    assert(d == Seq(149L, 148L, 147L))
  }

  test("masked files guarantee nothing: MOR deletes keep the plan full and exact") {
    sql("CREATE TABLE graft_lm.db.m (k BIGINT, v STRING) " +
      "TBLPROPERTIES('history'='true', 'merge-on-read'='true')")
    (0 until 3).foreach { i =>
      spark.range(i * 100, i * 100 + 100, 1, 1)
        .selectExpr("id AS k", "concat('v', id) AS v")
        .writeTo("graft_lm.db.m").append()
    }
    sql("DELETE FROM graft_lm.db.m WHERE k < 150") // DVs mask files 1-2
    val df = spark.table("graft_lm.db.m").limit(120)
    // files with deletion vectors prove nothing; the un-masked file alone
    // holds 100 < 120, so the whole table is planned and the result exact
    assert(scanPartitions(df) == 3)
    assert(df.count() == 120)
  }
}
