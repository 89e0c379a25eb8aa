package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** The graft catalog's `bucket(n, col)` transform: a Murmur3 hash bucket
  * id in `[0, n)`, served through the DSv2 `FunctionCatalog` so Catalyst
  * can PROVE two bucketed tables agree on row placement and plan a
  * storage-partitioned join — the zero-Exchange co-located join that, at
  * 100 TB, removes the single largest shuffle of a fact-fact join
  * (`spark.sql.sources.v2.bucketing.enabled`; both scans report
  * `KeyGroupedPartitioning` over this transform and Spark aligns the
  * bucket ids instead of hashing 100 TB twice).
  *
  * The hash must be STABLE across JVMs, sessions, and writers — it is part
  * of the on-disk contract (a re-written file must land rows in the same
  * bucket) — hence raw Murmur3 over the value bytes with a pinned seed,
  * not `Object.hashCode`.
  */
object GraftBucket {
  val FunctionName = "bucket"
  /** Pinned across JVMs/writers — part of the on-disk contract; the
    * native BucketId expression's codegen embeds the same constant. */
  private[graft] val Seed = 42

  /** File-name prefix carrying the bucket id (`b00003-part-....parquet`).
    * Encoding the bucket in the NAME (not a directory) keeps the directory
    * layout identical to an unbucketed table: manifests, deletion-vector
    * sidecars, and plain `spark.read.parquet` interop all see ordinary
    * top-level files with no phantom partition column.
    */
  private val FileRe = """^b(\d{5})-.*""".r

  def fileName(bucketId: Int, rest: String): String = f"b$bucketId%05d-$rest"

  def fileBucketId(fileName: String): Option[Int] = fileName match {
    case FileRe(b) => Some(b.toInt)
    case _ => None
  }

  def supportedKeyType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | StringType => true
    case _ => false
  }

  /** Bucket id of Spark-internal value `v` of type `dt`. A NULL key maps
    * to bucket 0 — placement of nulls is arbitrary but must be
    * deterministic (equi-join keys that are NULL never match, so any fixed
    * choice preserves storage-partitioned join correctness).
    */
  def bucket(dt: DataType, v: Any, n: Int): Int = {
    if (v == null) return 0
    val h = dt match {
      case LongType => Murmur3_x86_32.hashLong(v.asInstanceOf[Long], Seed)
      case IntegerType => Murmur3_x86_32.hashInt(v.asInstanceOf[Int], Seed)
      case StringType =>
        val s = v.asInstanceOf[UTF8String]
        Murmur3_x86_32.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes(), Seed)
      case other => throw new IllegalArgumentException(
        s"graft bucket: unsupported key type $other")
    }
    ((h % n) + n) % n
  }
}

/** `FunctionCatalog` entry. Binds against the transform's argument row
  * `(numBuckets INT, key)` — the exact shape Catalyst builds from
  * `bucket(n, col)` (`BucketTransform.arguments = numBuckets +: columns`).
  */
class GraftBucketFunction extends UnboundFunction {
  override def name(): String = GraftBucket.FunctionName
  override def description(): String =
    "bucket(n, col): stable murmur3 hash bucket id in [0, n)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"bucket(n, col) takes exactly one column, got ${inputType.length - 1}")
    require(inputType(0).dataType == IntegerType,
      s"bucket count must be INT, got ${inputType(0).dataType}")
    val keyType = inputType(1).dataType
    require(GraftBucket.supportedKeyType(keyType),
      s"bucket key must be BIGINT/INT/STRING, got $keyType")
    GraftBucketBound(keyType)
  }
}

/** The bound function. `canonicalName` is the cross-table equality token:
  * two scans' transforms are interchangeable for a storage-partitioned
  * join iff their canonical names (and bucket-count literals) match, so it
  * pins both the algorithm and the key type.
  */
case class GraftBucketBound(keyType: DataType) extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, keyType)
  override def resultType(): DataType = IntegerType
  override def name(): String = GraftBucket.FunctionName
  override def canonicalName(): String =
    s"graft.bucket(murmur3/${keyType.simpleString})"
  override def isResultNullable: Boolean = false
  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val v = if (input.isNullAt(1)) null else input.get(1, keyType)
    GraftBucket.bucket(keyType, v, n)
  }
}
