package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}

/** Native codegen'd twin of `GraftBucket.bucket`: the murmur3 bucket id
  * in `[0, n)` with the writer's pinned seed — bit-identical to the
  * bucketed write path, the storage-partitioned-join transform, and the
  * bucket-prefix file naming, because it IS the same hash (the codegen
  * emits the same `Murmur3_x86_32` calls `GraftBucket.bucket` makes).
  * NULL keys map to bucket 0, deterministically, like the write path.
  *
  * Exists so ROUTING rows to buckets (the eq-delete upsert's staging
  * write; any future bucket-pruned point lookup) stays inside
  * whole-stage codegen instead of a per-row Scala UDF.
  */
case class BucketId(child: Expression, numBuckets: Int)
    extends UnaryExpression {
  require(numBuckets > 0, "graft_bucket_id: numBuckets must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (graft.sources.GraftBucket.supportedKeyType(child.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bucket_id requires a BIGINT/INT/STRING key, got " +
        child.dataType.simpleString)

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false // NULL key -> bucket 0
  override def prettyName: String = "graft_bucket_id"

  override def eval(input: InternalRow): Any =
    graft.sources.GraftBucket.bucket(child.dataType,
      child.eval(input), numBuckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val h = ctx.freshName("bh")
    val seed = graft.sources.GraftBucket.Seed
    val m3 = "org.apache.spark.unsafe.hash.Murmur3_x86_32"
    val hashExpr = child.dataType match {
      case LongType => s"$m3.hashLong(${c.value}, $seed)"
      case IntegerType => s"$m3.hashInt(${c.value}, $seed)"
      case StringType =>
        s"$m3.hashUnsafeBytes(${c.value}.getBaseObject(), " +
          s"${c.value}.getBaseOffset(), ${c.value}.numBytes(), $seed)"
      case other => throw new IllegalStateException(
        s"graft_bucket_id: unexpected resolved key type $other")
    }
    val resultCode =
      code"""
        ${c.code}
        int ${ev.value} = 0;
        if (!${c.isNull}) {
          int $h = $hashExpr;
          ${ev.value} = (($h % $numBuckets) + $numBuckets) % $numBuckets;
        }
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
