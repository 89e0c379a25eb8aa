package graft

import graft.queries.{DedupQueries, Etl, QualityQueries, Relational, SimilarityQueries, StreamingQueries, TextQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Every implemented operator family contributes its `queries` +
  * `oracleSql` entries from graft.queries.*; entries present in `queries`
  * but absent from `oracleSql` (sim_ann_lsh, streaming twins in tests) get
  * the driver's weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Etl.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ SimilarityQueries.queries ++
      QualityQueries.queries ++ StreamingQueries.queries

  def oracleSql: Map[String, String] =
    Relational.oracle ++ Etl.oracle ++ TextQueries.oracle ++
      DedupQueries.oracle ++ SimilarityQueries.oracle ++
      QualityQueries.oracle ++ StreamingQueries.oracle
}
