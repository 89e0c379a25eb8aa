package org.apache.spark.sql.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.spark.internal.config.ConfigEntry
import org.apache.spark.sql.internal.SQLConf

/** Pins the SQLConf keys Spark's parquet `WriteSupport`/`ReadSupport`
  * converters assert on (they read with a bare `.toBoolean` / `withName`,
  * so an absent key is an NPE, not a default). Lives in the bridge
  * package because `ConfigEntry` is `private[spark]`; referencing the
  * entries (instead of key strings) makes a renamed/removed key a COMPILE
  * error on a Spark upgrade rather than a runtime executor crash.
  */
object ParquetConfDefaults {

  private def pin(conf: Configuration, e: ConfigEntry[_], v: String = null): Unit =
    conf.set(e.key, if (v != null) v else e.defaultValueString)

  /** Everything `ParquetWriteSupport.init` + `SparkToParquetSchemaConverter`
    * read: standard (non-legacy) layout, TIMESTAMP_MICROS, CORRECTED
    * rebase — the Spark 4 defaults, pinned explicitly so executor-side
    * writers behave identically regardless of cluster conf.
    */
  def pinWrite(conf: Configuration): Unit = {
    import SQLConf._
    pin(conf, PARQUET_WRITE_LEGACY_FORMAT, "false")
    pin(conf, PARQUET_OUTPUT_TIMESTAMP_TYPE, "TIMESTAMP_MICROS")
    pin(conf, PARQUET_REBASE_MODE_IN_WRITE, "CORRECTED")
    pin(conf, PARQUET_INT96_REBASE_MODE_IN_WRITE, "CORRECTED")
    pin(conf, PARQUET_FIELD_ID_WRITE_ENABLED)
    pin(conf, PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE)
  }

  /** Everything the read-side `ParquetReadSupport.init` +
    * `ParquetToSparkSchemaConverter` read.
    */
  def pinRead(conf: Configuration): Unit = {
    import SQLConf._
    pin(conf, PARQUET_BINARY_AS_STRING, "false")
    pin(conf, PARQUET_INT96_AS_TIMESTAMP, "true")
    pin(conf, PARQUET_INFER_TIMESTAMP_NTZ_ENABLED, "true")
    pin(conf, CASE_SENSITIVE, "false")
    pin(conf, PARQUET_FIELD_ID_READ_ENABLED)
    pin(conf, IGNORE_MISSING_PARQUET_FIELD_ID)
    pin(conf, LEGACY_PARQUET_NANOS_AS_LONG, "false")
    pin(conf, NESTED_SCHEMA_PRUNING_ENABLED)
  }
}
