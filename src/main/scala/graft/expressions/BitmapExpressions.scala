package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.roaringbitmap.longlong.Roaring64Bitmap

/** Per-executor cache of deserialized Roaring64 bitmaps, keyed by the
  * serialized bytes (value equality via ByteBuffer). A deletion-vector
  * rewrite probes the SAME few bitmaps for millions of rows — the
  * deserialization must happen once per executor, not once per row. The
  * cache is a small synchronized LRU: a maintenance pass touches one
  * bitmap per DV'd file, and evicted entries just re-deserialize.
  */
object BitmapCache {
  private val MaxEntries = 64
  private val cache =
    new java.util.LinkedHashMap[ByteBuffer, Roaring64Bitmap](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[ByteBuffer, Roaring64Bitmap]): Boolean =
        size() > MaxEntries
    }

  def bitmap(bytes: Array[Byte]): Roaring64Bitmap = {
    val key = ByteBuffer.wrap(bytes)
    cache.synchronized {
      val hit = cache.get(key)
      if (hit != null) return hit
    }
    // deserialize OUTSIDE the lock (a big bitmap must not stall peers)
    val bm = new Roaring64Bitmap
    bm.deserialize(new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    cache.synchronized { cache.put(key, bm) }
    bm
  }

  /** Static entry point for both interpreted eval and codegen. */
  def contains(bytes: Array[Byte], pos: Long): Boolean =
    bitmap(bytes).contains(pos)
}

/** `bitmap_contains(dv_bytes, pos)` — membership probe of a row position
  * in a serialized Roaring64 deletion vector. This is what lets a
  * deletion-vector materialization run as ONE distributed job: the
  * serialized bitmap rides a broadcast join (kilobytes per file, never a
  * driver-side expansion to a position list), and each task probes its
  * cached deserialized bitmap per row — `NOT bitmap_contains(dv,
  * _metadata.row_index)` is the whole rewrite filter. Codegen'd: the
  * generated code calls the static cache probe, so the filter stays
  * inside WholeStageCodegen.
  */
case class BitmapContains(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bitmap_contains requires (binary, bigint), got " +
          s"(${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bitmap_contains"

  override def nullSafeEval(bytes: Any, pos: Any): Any =
    BitmapCache.contains(bytes.asInstanceOf[Array[Byte]],
      pos.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, p) =>
      s"graft.expressions.BitmapCache.contains($b, $p)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
