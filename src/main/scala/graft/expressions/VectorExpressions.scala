package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native dot product over two array<double> columns.
  *
  * The built-in route — `aggregate(zip_with(...))` — interprets its lambda
  * per element, and a dimension-unrolled `element_at` chain generates one
  * null-checked branch per term; both measured in the tens of µs per pair,
  * which dominates quadratic near-dup scans. This expression generates a
  * tight primitive loop (measured ~40ns per 64-dim pair).
  *
  * Summation is a sequential left fold from 0.0, matching the engine's
  * oracle convention, so results are bit-identical to the interpreted path.
  * Mismatched lengths yield NULL (matching `aggregate(zip_with(...))`) so
  * malformed embedding data surfaces as a visible null, not a plausible
  * partial sum.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<double> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // nullable even with non-null children: mismatched lengths produce NULL
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $x.getDouble($i) * $y.getDouble($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All random-hyperplane LSH bucket ids for one vector, every table at
  * once: output[t] has bit p set iff dot(vec, planes(t)(p)) >= 0.
  *
  * The composed-Column formulation (nTables × nPlanes DotProduct nodes,
  * each with a dim-length literal-array child) works but costs seconds of
  * analysis + codegen per query at 8×6×64 planes; here the plane matrix
  * rides along as a single flattened reference object and the generated
  * code is one three-level primitive loop.
  */
case class LshBuckets(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val nTables = planes.length
  private val nPlanes = if (nTables == 0) 0 else planes(0).length
  private val dim = if (nPlanes == 0) 0 else planes(0)(0).length
  require(nPlanes <= 63, s"bucket bits are packed into a long; got $nPlanes planes")
  // layout [t][p][d] — one flat array referenced from generated code
  private lazy val flat: Array[Double] = planes.flatten.flatten

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets requires array<double> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_buckets"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(dim, v.numElements())
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bits = 0L
      var p = 0
      while (p < nPlanes) {
        var acc = 0.0
        val base = (t * nPlanes + p) * dim
        var i = 0
        while (i < n) { acc += v.getDouble(i) * flat(base + i); i += 1 }
        if (acc >= 0) bits |= 1L << p
        p += 1
      }
      out(t) = bits
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("lshPlanes", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val bits = ctx.freshName("bits")
      val base = ctx.freshName("base")
      s"""
         |long[] $out = new long[$nTables];
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $bits = 0L;
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    double $acc = 0.0;
         |    int $base = ($t * $nPlanes + $p) * $dim;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += $v.getDouble($i) * $planesRef[$base + $i];
         |    }
         |    if ($acc >= 0.0) $bits |= 1L << $p;
         |  }
         |  $out[$t] = $bits;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column wrapper: dot product of two array<double> columns. */
  def vecDot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Column wrapper: per-table LSH bucket ids (array<long>) of a vector. */
  def lshBuckets(v: Column, planes: Array[Array[Array[Double]]]): Column =
    Bridge.column(LshBuckets(Bridge.expression(v), planes))
}
