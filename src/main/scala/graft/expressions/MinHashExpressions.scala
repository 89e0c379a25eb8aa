package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** The k-member two-hash family evaluated at once:
  * out[i] = h1 + i*h2, i in [0, k).
  *
  * Callers pre-mask h1/h2 (54 bits, h2 odd) so h1 + (k-1)*h2 stays well
  * under 2^63 — the loop is then plain wrapping-free long arithmetic.
  * One small codegen'd loop replaces k column expressions; with k=128
  * the column formulation made every downstream operator's generated
  * class enormous (120+ aggregate buffers), which left whole queries at
  * the mercy of JIT compile scheduling — measured 2.8s-53s for the SAME
  * minhash query depending on when the JIT got to the giant method.
  */
case class TwoHashFamily(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"two_hash_family requires (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "two_hash_family"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val h1 = a.asInstanceOf[Long]
    val h2 = b.asInstanceOf[Long]
    val out = new Array[Long](k)
    var i = 0
    while (i < k) { out(i) = h1 + i * h2; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h1, h2) => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      s"""
         |long[] $out = new long[$k];
         |for (int $i = 0; $i < $k; $i++) { $out[$i] = $h1 + $i * $h2; }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Element-wise min over array<long> rows — the MinHash signature
  * aggregate. The buffer is a primitive long[k]; update/merge are tight
  * JVM loops via ObjectHashAggregate, so no 128-buffer generated class
  * and partial (map-side) aggregation still applies.
  */
case class ArrayMinAgg(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "array_min_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = math.min(k, arr.numElements())
      var i = 0
      while (i < n) {
        val x = arr.getLong(i)
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(k * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](k)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArrayMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArrayMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** FUSED minhash signature aggregate: takes the two family seeds (h1, h2)
  * per shingle row and min-updates sig[i] with h1 + i*h2 directly — the
  * TwoHashFamily → ArrayMinAgg composition materializes a k-long array
  * (plus its GenericArrayData box) per input row only for the min-merge
  * to consume it once. Same buffer, serialization and map-side partial
  * aggregation as ArrayMinAgg; callers pre-mask the seeds exactly as for
  * TwoHashFamily (54 bits, h2 odd).
  */
case class MinHashAgg(h1: Expression, h2: Expression, k: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(h1, h2)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = h1.eval(input)
    val b = h2.eval(input)
    if (a != null && b != null) {
      val x = a.asInstanceOf[Long]
      val y = b.asInstanceOf[Long]
      var i = 0
      var v = x
      while (i < k) {
        if (v < buf(i)) buf(i) = v
        v += y
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) {
      if (other(i) < buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(k * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](k)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(h1 = newChildren(0), h2 = newChildren(1))
}

/** SimHash bit-vote aggregate: each input is a token hash; bit i of the
  * result is set when the count of inputs with bit i set exceeds the count
  * with it clear. Buffer is an int[bits] vote array with map-side partial
  * aggregation — the column-expression formulation re-evaluates the whole
  * token-hash array once PER BIT (60× the work, interpreted).
  */
case class SimHashAgg(child: Expression, bits: Int = 60,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  require(bits > 0 && bits <= 63)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](bits)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < bits) {
        if (((h >> i) & 1L) == 1L) buf(i) += 1 else buf(i) -= 1
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < bits) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Int]): Any = {
    var out = 0L
    var i = 0
    while (i < bits) { if (buf(i) > 0) out |= 1L << i; i += 1 }
    out
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bits * 4)
    bb.asIntBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](bits)
    java.nio.ByteBuffer.wrap(bytes).asIntBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Per-ROW minhash signature over an array<string> of shingles — the
  * stateless form for STREAMING, where the grouped-aggregate path
  * (shingle rows → MinHashAgg) isn't available without adding a second
  * stateful stage. Hashes match the batch operator bit-for-bit: h1 =
  * xxhash64(s) (seed 42), h2 = xxhash64(1, s) (int 1 then the bytes),
  * both masked to 54 bits with h2 forced odd, family h1 + i*h2.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  private val m54 = (1L << 54) - 1

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    val intOneSeed = XXH64.hashInt(1, 42L)
    var j = 0
    while (j < arr.numElements()) {
      val s = arr.getUTF8String(j)
      val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L) & m54
      val h2 = (XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, intOneSeed) & m54) | 1L
      var v = h1
      var i = 0
      while (i < k) {
        if (v < sig(i)) sig(i) = v
        v += h2
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashExpressions {
  /** Column wrapper: per-row minhash signature of an array<string>. */
  def minHashSignature(shingles: Column, k: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), k))

  /** The LSH band hashes of a k-long signature: bands slices of r, each
    * xxhash64'd. ONE definition — batch and streaming banding must agree
    * bit-for-bit or cross-path recall silently degrades.
    */
  def bandHashes(sig: Column, bands: Int, r: Int): Column =
    org.apache.spark.sql.functions.array((0 until bands).map { j =>
      org.apache.spark.sql.functions.xxhash64(
        org.apache.spark.sql.functions.slice(sig, j * r + 1, r))
    }: _*)

  /** Column wrapper: [h1 + i*h2 for i < k] (inputs pre-masked by caller). */
  def twoHashFamily(h1: Column, h2: Column, k: Int): Column =
    Bridge.column(TwoHashFamily(Bridge.expression(h1), Bridge.expression(h2), k))

  /** Column wrapper: element-wise min aggregate over array<long> rows. */
  def arrayMinAgg(values: Column, k: Int): Column =
    Bridge.column(ArrayMinAgg(Bridge.expression(values), k).toAggregateExpression())

  /** Column wrapper: fused minhash signature aggregate over (h1, h2) seed
    * rows (equals arrayMinAgg(twoHashFamily(h1, h2, k), k) without the
    * per-row array).
    */
  def minHashAgg(h1: Column, h2: Column, k: Int): Column =
    Bridge.column(MinHashAgg(Bridge.expression(h1), Bridge.expression(h2), k)
      .toAggregateExpression())

  /** Column wrapper: simhash bit-vote aggregate over token-hash rows. */
  def simHashAgg(tokenHash: Column, bits: Int = 60): Column =
    Bridge.column(SimHashAgg(Bridge.expression(tokenHash), bits).toAggregateExpression())
}
