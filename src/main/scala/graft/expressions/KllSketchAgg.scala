package graft.expressions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** KLL quantile sketch aggregate (DataSketches `KllDoublesSketch`): the
  * mergeable-summaries answer to percentiles, the second statistic (next to
  * COUNT DISTINCT / `MergeHllUnion`) a naive rollup cannot maintain
  * incrementally — exact grouped percentiles need the full value multiset,
  * so a stored rollup would re-scan history every batch.
  *
  * Scale shape: each map-side partial carries one ~O(k log(n/k)) sketch,
  * the shuffle moves sketches (not values), and the merge is associative
  * and commutative over ANY merge tree with the KLL rank-error guarantee
  * (±~1.65%/~sqrt? — bound asserted empirically in KllSketchSpec at
  * k=200). Unlike HLL's register-max the merge is NOT idempotent: a
  * re-delivered batch double-counts, so incremental pipelines must feed
  * deltas exactly once (the catalogUpsertBatch marker discipline).
  *
  * EXACT regime (the value-oracle gate): while total n <= k the sketch has
  * never compacted — it still holds every value — and
  * `getQuantile(r, INCLUSIVE)` is exactly the order statistic at rank
  * ceil(r*n), replayable in SQL as a ROW_NUMBER pick. dq_quantile_rollup
  * runs there (k=8192 >= any group through sf1); the approximation regime
  * is bounds-asserted in the spec, mirroring dq_heavy_hitters' split.
  *
  * Output is the serialized sketch (binary) so it can be STORED as a
  * rollup measure column and re-merged later (IncrementalAgg.MergeKll);
  * read values out with `KllQuantile` / `KllCount`.
  */
case class KllSketchAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] {

  require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_sketch_agg requires a double input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val raw = child.eval(input)
    if (raw != null) buf.update(raw.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Merge two serialized KLL sketches (NULL passes the other side through) —
  * the scalar twin of the aggregate's merge, used by
  * `IncrementalAgg.MergeKll` to fold a delta rollup into stored state.
  * Runs on dim-sized rollup rows (one eval per group per batch), not the
  * per-value hot path, so CodegenFallback costs nothing measurable.
  */
case class KllMerge(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = left.nullable && right.nullable
  override def prettyName: String = "kll_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kll_merge requires two binary sketches, got $other")
    }

  override def eval(input: InternalRow): Any = {
    val l = left.eval(input)
    val r = right.eval(input)
    if (l == null) r
    else if (r == null) l
    else {
      val sk = KllDoublesSketch.heapify(Memory.wrap(l.asInstanceOf[Array[Byte]]))
      sk.merge(KllDoublesSketch.heapify(Memory.wrap(r.asInstanceOf[Array[Byte]])))
      sk.toByteArray
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Quantile read-out from a serialized KLL sketch at `rank` (0..1],
  * INCLUSIVE search: the smallest stored value whose cumulative weight
  * reaches ceil(rank*n) — in the exact (never-compacted) regime this IS
  * the order statistic a ROW_NUMBER pick returns.
  */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kll_quantile requires (binary sketch, double rank), got $other")
    }

  override def eval(input: InternalRow): Any = {
    val s = left.eval(input)
    val r = right.eval(input)
    if (s == null || r == null) null
    else {
      val sk = KllDoublesSketch.heapify(Memory.wrap(s.asInstanceOf[Array[Byte]]))
      if (sk.isEmpty) null
      else sk.getQuantile(r.asInstanceOf[Double], QuantileSearchCriteria.INCLUSIVE)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Total update count of a serialized KLL sketch (exact — n is carried in
  * the sketch header regardless of compaction).
  */
case class KllCount(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "kll_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kll_count requires a binary sketch, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val s = child.eval(input)
    if (s == null) null
    else KllDoublesSketch.heapify(Memory.wrap(s.asInstanceOf[Array[Byte]])).getN
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KllSketchAgg {
  /** Column wrapper: KLL quantile sketch of a double column. */
  def kllSketch(values: Column, k: Int): Column =
    Bridge.column(KllSketchAgg(Bridge.expression(values), k).toAggregateExpression())

  def kllMerge(a: Column, b: Column): Column =
    Bridge.column(KllMerge(Bridge.expression(a), Bridge.expression(b)))

  def kllQuantile(sketch: Column, rank: Double): Column =
    Bridge.column(KllQuantile(Bridge.expression(sketch),
      Bridge.expression(org.apache.spark.sql.functions.lit(rank))))

  def kllCount(sketch: Column): Column =
    Bridge.column(KllCount(Bridge.expression(sketch)))
}
