package graft.expressions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketch aggregate (DataSketches theta family): mergeable DISTINCT
  * SETS with full set algebra — where HLL (`MergeHllUnion`) only unions,
  * theta sketches also INTERSECT and DIFFERENCE, which is what audience
  * overlap ("how many users did both A and B?") needs at 100 TB: computing
  * it exactly requires re-shuffling both raw key sets per question, while
  * stored theta sketches answer any pairwise (or k-way) overlap from
  * kilobytes of rollup state.
  *
  * Scale shape: map-side partials carry one O(k) sketch; the shuffle moves
  * sketches, not keys; union is associative/commutative over any merge
  * tree. Like KLL (and unlike HLL), a theta UNION is idempotent — the
  * same key re-delivered lands on the same hash slot — so replayed
  * batches do NOT double-count distinct members.
  *
  * EXACT regime (the value-oracle gate): below k retained entries the
  * sketch holds every hashed key (theta = 1.0), and estimates — including
  * intersection estimates — are exactly the true cardinalities.
  * dq_overlap_sketch runs there; approximation-regime error is
  * bounds-asserted in ThetaSketchSpec.
  */
case class ThetaSketchAgg(child: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] {

  require(k >= 16 && k <= (1 << 26) && (k & (k - 1)) == 0,
    s"nominal entries must be a power of 2 in [16, 2^26], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_sketch_agg requires a bigint/int/string key, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(k).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val raw = child.eval(input)
    if (raw != null) child.dataType match {
      case LongType => buf.update(raw.asInstanceOf[Long])
      case IntegerType => buf.update(raw.asInstanceOf[Int].toLong)
      case StringType => buf.update(raw.asInstanceOf[UTF8String].toString)
      case other => throw new IllegalStateException(s"unreachable: $other")
    }
    buf
  }

  override def merge(buf: Union, other: Union): Union = {
    buf.union(other.getResult)
    buf
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray

  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setNominalEntries(k).buildUnion()
    u.union(Sketches.heapifySketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Union of two serialized theta sketches (NULL passes the other side
  * through) — the scalar twin of the aggregate's merge, for folding a
  * delta rollup into stored state (idempotent: safe under replay).
  */
case class ThetaUnion(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable && right.nullable
  override def prettyName: String = "theta_union"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"theta_union requires two binary sketches, got $other")
    }

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null) r
    else if (r == null) l
    else {
      val u = SetOperation.builder().buildUnion()
      u.union(Sketches.heapifySketch(Memory.wrap(l.asInstanceOf[Array[Byte]])))
      u.union(Sketches.heapifySketch(Memory.wrap(r.asInstanceOf[Array[Byte]])))
      u.getResult.toByteArray
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Intersection cardinality of two serialized theta sketches, rounded to
  * a long — EXACT when both sides are in the exact regime (theta = 1).
  * Runs on rollup rows (one eval per group pair), not the per-key hot
  * path, so CodegenFallback costs nothing measurable.
  */
case class ThetaIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "theta_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"theta_intersect_count requires two binary sketches, got $other")
    }

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null || r == null) null
    else {
      val it = SetOperation.builder().buildIntersection()
      it.intersect(Sketches.heapifySketch(Memory.wrap(l.asInstanceOf[Array[Byte]])))
      it.intersect(Sketches.heapifySketch(Memory.wrap(r.asInstanceOf[Array[Byte]])))
      Math.round(it.getResult.getEstimate)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Distinct-count estimate of a serialized theta sketch, rounded to a
  * long (exact below k retained entries).
  */
case class ThetaCount(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "theta_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"theta_count requires a binary sketch, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val s = child.eval(input)
    if (s == null) null
    else Math.round(
      Sketches.heapifySketch(Memory.wrap(s.asInstanceOf[Array[Byte]])).getEstimate)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ThetaSketchAgg {
  /** Column wrapper: theta distinct-set sketch of a key column. */
  def thetaSketch(keys: Column, k: Int = 4096): Column =
    Bridge.column(ThetaSketchAgg(Bridge.expression(keys), k).toAggregateExpression())

  def thetaUnion(a: Column, b: Column): Column =
    Bridge.column(ThetaUnion(Bridge.expression(a), Bridge.expression(b)))

  def thetaIntersectCount(a: Column, b: Column): Column =
    Bridge.column(ThetaIntersectCount(Bridge.expression(a), Bridge.expression(b)))

  def thetaCount(sketch: Column): Column =
    Bridge.column(ThetaCount(Bridge.expression(sketch)))
}
