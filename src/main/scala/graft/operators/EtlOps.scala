package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema conformance: the reference's `to_dataframe` step (main.py:307-327)
  * — rename to target names, add missing columns with defaults, project in
  * target order.
  */
object EtlOps {

  /** target: (sourceCol | null, targetName, default). When sourceCol is
    * absent in `df` (or null per-row), `default` fills in.
    */
  def conformSchema(df: DataFrame, target: Seq[(String, String, Column)]): DataFrame = {
    val cols = target.map { case (src, name, default) =>
      if (src != null && df.columns.contains(src)) coalesce(col(src), default).as(name)
      else default.as(name)
    }
    df.select(cols: _*)
  }
}
