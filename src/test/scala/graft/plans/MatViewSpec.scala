package graft.plans

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._

/** Materialized-view lifecycle: transparent rewrite fires only when it is
  * safe (fresh MV, grain-covered grouping/filters, derivable measures),
  * answers are ALWAYS identical to the base-scan answer, and refresh is
  * incremental exactly when the base only appended.
  */
class MatViewSpec extends SparkSpec {

  private lazy val warehouse =
    Files.createTempDirectory("graft_mv_wh").toFile.getAbsolutePath

  private def sql(q: String) = spark.sql(q)

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.graft_mv", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft_mv.warehouse", warehouse)
    sql("CREATE NAMESPACE IF NOT EXISTS graft_mv.db")
    MatView.install(spark)
    sql("DROP TABLE IF EXISTS graft_mv.db.sales")
    sql("""CREATE TABLE graft_mv.db.sales
          |(region STRING, status STRING, qty DECIMAL(8,2), cents BIGINT)
          |TBLPROPERTIES('history'='true')""".stripMargin)
    sql("""INSERT INTO graft_mv.db.sales VALUES
          |('EU','O',CAST(1.50 AS DECIMAL(8,2)),100),
          |('EU','O',CAST(2.25 AS DECIMAL(8,2)),250),
          |('EU','F',CAST(4.00 AS DECIMAL(8,2)),50),
          |('US','O',CAST(8.00 AS DECIMAL(8,2)),75),
          |('US','F',NULL,900),
          |(NULL,'F',CAST(3.00 AS DECIMAL(8,2)),10)""".stripMargin)
  }

  override def afterAll(): Unit = {
    MatView.clearRegistry()
    super.afterAll()
  }

  private def scansMv(df: DataFrame, mvName: String): Boolean =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation if r.scan.description().contains(mvName) => r
    }.nonEmpty

  private def freshMeta() = MatView.create(spark, "graft_mv", "db.sales",
    "db.sales_mv", Seq("region", "status"),
    Seq(MatView.Measure("sum_qty", "sum", "qty"),
      MatView.Measure("n_rows", "count", ""),
      MatView.Measure("n_qty", "countnn", "qty"),
      MatView.Measure("min_cents", "min", "cents"),
      MatView.Measure("max_cents", "max", "cents")))

  test("coarser aggregate rewrites to the MV and matches the base answer") {
    freshMeta()
    val q = spark.table("graft_mv.db.sales")
      .where(col("status") === "O")
      .groupBy(col("region"))
      .agg(sum(col("qty")).as("sq"), count(lit(1)).as("n"),
        min(col("cents")).as("mn"), max(col("cents")).as("mx"))
      .orderBy("region")
    assert(scansMv(q, "sales_mv"), "rewrite should read the MV")

    MatView.clearRegistry()
    val base = spark.table("graft_mv.db.sales")
      .where(col("status") === "O")
      .groupBy(col("region"))
      .agg(sum(col("qty")).as("sq"), count(lit(1)).as("n"),
        min(col("cents")).as("mn"), max(col("cents")).as("mx"))
      .orderBy("region")
    assert(!scansMv(base, "sales_mv"))
    assert(q.collect().toSeq == base.collect().toSeq)
    assert(q.schema == base.schema)
  }

  test("NULL group keys and all-NULL measure groups survive the rewrite") {
    freshMeta()
    val q = spark.table("graft_mv.db.sales")
      .groupBy(col("region"))
      .agg(sum(col("qty")).as("sq"), count(col("qty")).as("nq"))
      .orderBy(col("region").asc_nulls_first)
    assert(scansMv(q, "sales_mv"))
    val got = q.collect().map(r =>
      (Option(r.get(0)), Option(r.get(1)).map(_.toString), r.getLong(2)))
    MatView.clearRegistry()
    val want = spark.table("graft_mv.db.sales")
      .groupBy(col("region"))
      .agg(sum(col("qty")).as("sq"), count(col("qty")).as("nq"))
      .orderBy(col("region").asc_nulls_first)
      .collect().map(r =>
        (Option(r.get(0)), Option(r.get(1)).map(_.toString), r.getLong(2)))
    assert(got.toSeq == want.toSeq)
  }

  test("non-derivable or off-grain queries do NOT rewrite") {
    freshMeta()
    // filter on a non-grain column
    val q1 = spark.table("graft_mv.db.sales")
      .where(col("cents") > 60)
      .groupBy(col("region")).agg(sum(col("qty")).as("sq"))
    assert(!scansMv(q1, "sales_mv"))
    // grouping on a non-grain column
    val q2 = spark.table("graft_mv.db.sales")
      .groupBy(col("cents")).agg(count(lit(1)).as("n"))
    assert(!scansMv(q2, "sales_mv"))
    // AVG is not a registered measure shape
    val q3 = spark.table("graft_mv.db.sales")
      .groupBy(col("region")).agg(avg(col("qty")).as("a"))
    assert(!scansMv(q3, "sales_mv"))
    // DISTINCT aggregate
    val q4 = spark.table("graft_mv.db.sales")
      .groupBy(col("region")).agg(countDistinct(col("status")).as("d"))
    assert(!scansMv(q4, "sales_mv"))
  }

  test("stale MV falls back to the base scan until refresh; append refresh is incremental") {
    freshMeta()
    sql("""INSERT INTO graft_mv.db.sales VALUES
          |('EU','O',CAST(9.75 AS DECIMAL(8,2)),4000),
          |('AP','O',CAST(1.00 AS DECIMAL(8,2)),1)""".stripMargin)
    // a DataFrame's queryExecution is lazily CACHED — build it fresh per
    // staleness state, like a user re-running the same query text
    def q() = spark.table("graft_mv.db.sales")
      .groupBy(col("region")).agg(sum(col("qty")).as("sq"),
        count(lit(1)).as("n"), max(col("cents")).as("mx"))
      .orderBy(col("region").asc_nulls_first)
    assert(!scansMv(q(), "sales_mv"), "stale MV must not serve the query")
    val fromBase = q().collect().toSeq

    assert(MatView.refresh(spark, "graft_mv", "db.sales_mv") == "incremental")
    assert(scansMv(q(), "sales_mv"), "refreshed MV should serve the query again")
    assert(q().collect().toSeq == fromBase)
    assert(MatView.refresh(spark, "graft_mv", "db.sales_mv") == "noop")
  }

  test("rewrite-producing base change forces a FULL refresh and stays correct") {
    freshMeta()
    sql("DELETE FROM graft_mv.db.sales WHERE status = 'F' AND cents = 900")
    assert(MatView.refresh(spark, "graft_mv", "db.sales_mv") == "full")
    val q = spark.table("graft_mv.db.sales")
      .groupBy(col("status")).agg(count(lit(1)).as("n"), sum(col("qty")).as("sq"))
      .orderBy("status")
    assert(scansMv(q, "sales_mv"))
    MatView.clearRegistry()
    val want = spark.table("graft_mv.db.sales")
      .groupBy(col("status")).agg(count(lit(1)).as("n"), sum(col("qty")).as("sq"))
      .orderBy("status").collect().toSeq
    assert(q.collect().toSeq == want)
  }

  test("narrow-decimal SUM (DecimalAggregates MakeDecimal shape) still matches") {
    freshMeta()
    // decimal(8,2) SUM goes through Sum(UnscaledValue)/MakeDecimal in the
    // optimizer — the matcher must see through that rewrite
    val q = spark.table("graft_mv.db.sales")
      .groupBy(col("region"), col("status"))
      .agg(sum(col("qty")).as("sq"))
      .orderBy(col("region").asc_nulls_first, col("status"))
    assert(scansMv(q, "sales_mv"))
    MatView.clearRegistry()
    val want = spark.table("graft_mv.db.sales")
      .groupBy(col("region"), col("status"))
      .agg(sum(col("qty")).as("sq"))
      .orderBy(col("region").asc_nulls_first, col("status")).collect().toSeq
    assert(q.collect().toSeq == want)
  }

  test("MV over a HIDDEN-day-partitioned history base: rewrite + incremental refresh compose") {
    sql("DROP TABLE IF EXISTS graft_mv.db.dsales")
    sql("""CREATE TABLE graft_mv.db.dsales
          |(region STRING, ts TIMESTAMP, cents BIGINT)
          |PARTITIONED BY (days(ts))
          |TBLPROPERTIES('history'='true')""".stripMargin)
    sql("""INSERT INTO graft_mv.db.dsales VALUES
          |('EU', TIMESTAMP '2026-08-01 10:00:00', 100),
          |('US', TIMESTAMP '2026-08-02 10:00:00', 250)""".stripMargin)
    MatView.create(spark, "graft_mv", "db.dsales", "db.dsales_mv",
      Seq("region"), Seq(MatView.Measure("sum_cents", "sum", "cents"),
        MatView.Measure("n", "count", "")))
    // the base appends into its day layout; incremental refresh must read
    // ONLY the appended files (which carry all columns — hidden
    // partitioning keeps raw data in the bytes) and the rewrite resumes
    sql("""INSERT INTO graft_mv.db.dsales VALUES
          |('EU', TIMESTAMP '2026-08-03 10:00:00', 40)""".stripMargin)
    assert(MatView.refresh(spark, "graft_mv", "db.dsales_mv") == "incremental")
    def q() = spark.table("graft_mv.db.dsales")
      .groupBy(col("region")).agg(sum(col("cents")).as("sc"), count(lit(1)).as("n"))
      .orderBy("region")
    assert(scansMv(q(), "dsales_mv"))
    assert(q().collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq(("EU", 140L, 2L), ("US", 250L, 1L)))
  }

  test("ungrouped COUNT over an EMPTY base is 0 through the rewrite, not NULL") {
    sql("DROP TABLE IF EXISTS graft_mv.db.empty")
    sql("""CREATE TABLE graft_mv.db.empty (k STRING, v BIGINT)
          |TBLPROPERTIES('history'='true')""".stripMargin)
    MatView.create(spark, "graft_mv", "db.empty", "db.empty_mv", Seq("k"),
      Seq(MatView.Measure("n", "count", ""),
        MatView.Measure("nv", "countnn", "v"),
        MatView.Measure("sv", "sum", "v")))
    val q = spark.table("graft_mv.db.empty")
      .agg(count(lit(1)).as("n"), count(col("v")).as("nv"),
        sum(col("v")).as("sv"))
    assert(scansMv(q, "empty_mv"), "the global aggregate should rewrite to the MV")
    val r = q.collect().head
    // COUNT over an empty base is 0; SUM stays NULL (both match the base scan)
    assert(r.getLong(0) == 0L && r.getLong(1) == 0L && r.isNullAt(2))
    // grouped aggregates over the empty base return zero rows either way
    val grouped = spark.table("graft_mv.db.empty")
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
    assert(scansMv(grouped, "empty_mv") && grouped.count() == 0)
    MatView.clearRegistry()
  }

  test("COUNT over a grouped subquery (grouping keys pruned from output) stays per-group") {
    freshMeta()
    // Dataset.count() over a groupBy prunes every aggregate output — the
    // inner Aggregate keeps its grouping keys with NO output column, and
    // the rewrite must still group by them (a global regroup would return
    // 1 instead of the distinct-key count)
    val perRegion = spark.table("graft_mv.db.sales")
      .groupBy(col("region")).agg(sum(col("qty")).as("sq"))
    assert(scansMv(perRegion, "sales_mv"))
    val rewritten = perRegion.count()
    MatView.clearRegistry()
    val base = spark.table("graft_mv.db.sales")
      .groupBy(col("region")).agg(sum(col("qty")).as("sq")).count()
    assert(rewritten == base && base > 1,
      s"rewritten distinct-group count $rewritten must equal base $base")
  }

  test("registration survives a registry wipe via persisted table properties") {
    freshMeta()
    MatView.clearRegistry()
    val meta = MatView.register(spark, "graft_mv", "db.sales_mv")
    assert(meta.group == Seq("region", "status") && meta.measures.length == 5)
    val q = spark.table("graft_mv.db.sales")
      .groupBy(col("region")).agg(sum(col("qty")).as("sq"))
    assert(scansMv(q, "sales_mv"))
  }
}
