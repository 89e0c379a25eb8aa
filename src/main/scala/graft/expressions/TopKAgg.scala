package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Top-k largest long values per group, returned sorted descending.
  *
  * The scale story: a `row_number().over(Window.partitionBy(g).orderBy(v))`
  * top-k shuffles and sorts EVERY row; this aggregate keeps a bounded
  * k-element buffer per group and combines partially on the map side, so
  * the shuffle carries at most k values per (partition, group) — the
  * standard distributed top-k. Ties keep duplicates (multiset semantics).
  */
case class TopKAgg(child: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Long]] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "top_k_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"top_k_agg requires a bigint input, got ${other.simpleString}")
  }

  // min-heap of at most k elements: root is the smallest retained value
  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Long] =
    new java.util.PriorityQueue[java.lang.Long](k + 1)

  private def offer(heap: java.util.PriorityQueue[java.lang.Long], v: Long): Unit =
    if (heap.size < k) heap.offer(v)
    else if (heap.peek() < v) { heap.poll(); heap.offer(v) }

  override def update(heap: java.util.PriorityQueue[java.lang.Long],
                      input: InternalRow): java.util.PriorityQueue[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) offer(heap, v.asInstanceOf[Long])
    heap
  }

  override def merge(heap: java.util.PriorityQueue[java.lang.Long],
                     other: java.util.PriorityQueue[java.lang.Long]): java.util.PriorityQueue[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) offer(heap, it.next())
    heap
  }

  override def eval(heap: java.util.PriorityQueue[java.lang.Long]): Any = {
    val out = new Array[Long](heap.size)
    var i = heap.size - 1
    while (i >= 0) { out(i) = heap.poll(); i -= 1 } // ascending poll → desc array
    new GenericArrayData(out)
  }

  override def serialize(heap: java.util.PriorityQueue[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + heap.size * 8)
    bb.putInt(heap.size)
    val it = heap.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) { heap.offer(bb.getLong); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopKAgg {
  /** Column wrapper: top-k largest values of a bigint column, desc-sorted. */
  def topK(values: Column, k: Int): Column =
    Bridge.column(TopKAgg(Bridge.expression(values), k).toAggregateExpression())
}
