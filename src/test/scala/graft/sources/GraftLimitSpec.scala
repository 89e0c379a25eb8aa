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
