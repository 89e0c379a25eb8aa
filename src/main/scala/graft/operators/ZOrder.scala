package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout for multi-dimension data skipping.
  *
  * A table sorted on one column prunes scans on that column only: parquet
  * row-group min/max stats on every OTHER column span the whole domain, so
  * a 100 TB scan filtered on the second dimension reads everything. Writing
  * in z-value order clusters ALL participating dimensions at once — each
  * file/row-group covers a small hyper-rectangle, so min/max pruning (and
  * partition-level skipping above it) works for predicates on ANY dimension
  * or combination. This is the layout step Delta/Iceberg run as
  * `OPTIMIZE ... ZORDER BY`, expressed as a plain Spark plan:
  *
  *   1. one stats pass computes each dimension's global [min, max]
  *      (scalar row, broadcast — the q22 scalar-subquery shape);
  *   2. each dimension maps to a `bits`-bit bucket with pure integer
  *      arithmetic (exact, engine-portable — no float rounding);
  *   3. bucket bits interleave into the z-value (bit i of bucket d lands
  *      at position i*ndims+d) — a fold of shift/mask Columns, entirely
  *      inside whole-stage codegen;
  *   4. `zorderBy` range-partitions + sorts on the z-value: globally
  *      ordered output files, each covering one compact curve segment.
  *
  * The range shuffle is the same one a global ORDER BY uses — parallel
  * across the cluster, no single-task funnel. Skew in the z-value (hot
  * cells) is handled by the range partitioner's sampling like any sort key.
  *
  * Dimensions must be integral (cast timestamps to epoch seconds first);
  * fractional dims should be pre-scaled by the caller to the resolution
  * that matters — bucketization floors anyway, so sub-bucket precision is
  * never load-bearing.
  */
object ZOrder {

  /** Integer bucket of `x` in [0, 2^bits) given inclusive [mn, mx].
    * Exact integer division, oracle-portable (DuckDB `//`): the dividend is
    * reduced to an exact multiple with pmod first, so the one double
    * division is of k*b by b — exactly k, no float rounding anywhere.
    * A degenerate mn==mx domain maps everything to bucket 0.
    */
  def bucket(x: Column, mn: Column, mx: Column, bits: Int): Column = {
    val nb = lit(1L << bits)
    val a = (x - mn) * nb
    val b = mx - mn + lit(1L)
    ((a - pmod(a, b)) / b).cast("long")
  }

  /** Interleave `bits`-bit buckets into the Morton code: bit b of
    * dimension d lands at position b * ndims + d. A fixed fold of
    * shift/mask terms — stays in codegen, no UDF.
    */
  def interleave(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.length
    require(n >= 2, "z-order needs at least 2 dimensions")
    require(n * bits <= 62, s"$n dims x $bits bits overflows a long")
    val terms = for {
      b <- 0 until bits
      (c, d) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + d)
    terms.reduce(_ + _).cast("long")
  }

  /** Append bucket + z-value columns for `dims` (name -> integral Column).
    * One extra stats job (scalar row) + a broadcast join; the per-row math
    * is all codegen'd long arithmetic.
    */
  def withZValue(df: DataFrame, dims: Seq[(String, Column)], bits: Int = 8,
                 zCol: String = "zval"): DataFrame = {
    require(dims.nonEmpty)
    val statCols = dims.flatMap { case (name, c) =>
      Seq(min(c).as(s"__mn_$name"), max(c).as(s"__mx_$name"))
    }
    val stats = df.agg(statCols.head, statCols.tail: _*)
    val withStats = df.crossJoin(broadcast(stats))
    val bucketCols = dims.map { case (name, c) =>
      bucket(c, col(s"__mn_$name"), col(s"__mx_$name"), bits)
        .as(s"__zb_$name")
    }
    val bucketed = withStats.select(
      (df.columns.map(col).toSeq ++ bucketCols): _*)
    bucketed
      .withColumn(zCol,
        interleave(dims.map { case (name, _) => col(s"__zb_$name") }, bits))
      .drop(dims.map { case (name, _) => s"__zb_$name" }: _*)
  }

  /** Z-order the rows: range-partition + sort on the Morton code, then
    * drop it. `numPartitions` sizes output files (one curve segment each).
    */
  def zorderBy(df: DataFrame, dims: Seq[(String, Column)], bits: Int = 8,
               numPartitions: Int = 0): DataFrame = {
    val z = withZValue(df, dims, bits, zCol = "__zval")
    val parted =
      if (numPartitions > 0) z.repartitionByRange(numPartitions, col("__zval"))
      else z.repartitionByRange(col("__zval"))
    parted.sortWithinPartitions(col("__zval")).drop("__zval")
  }
}
