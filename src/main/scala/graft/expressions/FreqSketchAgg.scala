package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch over a string column: at most `k`
  * counters per aggregation buffer, mergeable (Agarwal et al., "Mergeable
  * Summaries"), with the classic guarantee after any merge tree:
  *
  *   true_count - N/(k+1)  <=  estimate  <=  true_count
  *
  * so every item with true frequency above N/(k+1) is guaranteed present.
  *
  * The scale story: exact top-k word counting shuffles the ENTIRE token
  * stream on token (the vocabulary — billions of keys at 100 TB). This
  * aggregate carries at most k counters per map-side partial, the shuffle
  * is k rows per partition regardless of data size, and the merge is
  * associative in any order. The trade is bounded error on counts near the
  * threshold — which is what a corpus-level "what are the dominant
  * tokens/domains/templates" question tolerates by definition.
  *
  * Output: array<struct<item string, est bigint>> sorted (est desc, item) —
  * deterministic FOR A GIVEN MERGE TREE; near-threshold membership can vary
  * with partitioning, so this is spec-verified (guarantee bounds), not
  * value-oracled against DuckDB.
  */
case class FreqSketchAgg(child: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[UTF8String, java.lang.Long]] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "freq_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_sketch_agg requires a string input, got ${other.simpleString}")
  }

  type Buf = java.util.HashMap[UTF8String, java.lang.Long]

  override def createAggregationBuffer(): Buf = new Buf(k * 2)

  /** Subtract `v` from every counter, dropping the ones that hit <= 0. */
  private def decrementAll(buf: Buf, v: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - v
      if (nv <= 0) it.remove() else e.setValue(nv)
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val raw = child.eval(input)
    if (raw != null) {
      val key = raw.asInstanceOf[UTF8String]
      val cur = buf.get(key)
      if (cur != null) buf.put(key, cur + 1L)
      // clone: the unsafe-row-backed UTF8String is a reused buffer view
      else if (buf.size < k) buf.put(key.clone(), 1L)
      else decrementAll(buf, 1L)
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(if (cur != null) e.getKey else e.getKey.clone(),
        if (cur != null) cur + e.getValue else e.getValue)
    }
    if (buf.size > k) {
      // spill to the (k+1)-th largest counter and subtract it everywhere —
      // one pass, keeps <= k counters, preserves the MG error bound
      val values = new Array[Long](buf.size)
      val vit = buf.values().iterator()
      var i = 0
      while (vit.hasNext) { values(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(values)
      val kth = values(values.length - k - 1)
      decrementAll(buf, kth)
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val entries = new Array[(UTF8String, Long)](buf.size)
    val it = buf.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortBy { case (item, est) => (-est, item.toString) }
    new GenericArrayData(sorted.map { case (item, est) =>
      new GenericInternalRow(Array[Any](item, est))
    })
  }

  override def serialize(buf: Buf): Array[Byte] = {
    var bytes = 4
    val it0 = buf.keySet().iterator()
    while (it0.hasNext) bytes += 4 + it0.next().numBytes() + 8
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes
      bb.putInt(b.length); bb.put(b); bb.putLong(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.put(UTF8String.fromBytes(b), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object FreqSketchAgg {
  /** Column wrapper: Misra–Gries top-frequency summary of a string column. */
  def freqSketch(items: Column, k: Int): Column =
    Bridge.column(FreqSketchAgg(Bridge.expression(items), k).toAggregateExpression())
}
