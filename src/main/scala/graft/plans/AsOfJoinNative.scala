package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.LongType

/** Whole-operator extension tier (brief preference (c)): a NATIVE as-of
  * join — custom LogicalPlan node + Strategy + physical sort-merge
  * SparkPlan — as the deep-integration twin of the composed
  * `operators.AsOfJoin` (union + window).
  *
  * Physical shape: both sides hash-cluster on the key and sort by
  * (key, time) — exactly a SortMergeJoin's requirements, satisfied by
  * EnsureRequirements with one shuffle per side — then a single forward
  * merge pass per partition attaches the latest right values with
  * rightTime <= leftTime. No union row blow-up, no window state: O(1)
  * memory per partition beyond one buffered right row.
  *
  * Contract: key and time columns are non-null LongType (ids / epoch
  * seconds); `right` unique per (key, time); column names disjoint.
  */
object AsOfJoinNative {

  /** Logical node: output = left columns ++ nullable right value columns.
    *
    * Columns are referenced BY NAME, not as Attribute fields: analyzer
    * rules (DeduplicateRelations on self-joins in particular) regenerate
    * child exprIds wholesale, and attribute fields of a custom node go
    * stale when that happens — names re-resolve against whatever the
    * children currently expose.
    */
  case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                          keyCol: String, leftTimeCol: String,
                          rightTimeCol: String)
      extends BinaryNode {
    def rightVals: Seq[Attribute] = right.output
      .filterNot(a => a.name == keyCol || a.name == rightTimeCol)
    override def output: Seq[Attribute] =
      left.output ++ rightVals.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
      copy(left = newLeft, right = newRight)
  }

  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case p: AsOfJoinPlan =>
        def attr(out: Seq[Attribute], n: String) = out.find(_.name == n).get
        AsOfJoinExec(planLater(p.left), planLater(p.right),
          attr(p.left.output, p.keyCol), attr(p.left.output, p.leftTimeCol),
          attr(p.right.output, p.keyCol), attr(p.right.output, p.rightTimeCol),
          p.rightVals) :: Nil
      case _ => Nil
    }
  }

  case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                          leftKey: Attribute, leftTime: Attribute,
                          rightKey: Attribute, rightTime: Attribute,
                          rightVals: Seq[Attribute])
      extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ rightVals.map(_.withNullability(true))

    // same-key clustering both sides: EnsureRequirements co-partitions
    // (one hash shuffle per side unless already partitioned) ...
    override def requiredChildDistribution: Seq[Distribution] =
      Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

    // ... and (key, time) sort within partitions makes the merge a single
    // forward pass
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] = left.outputOrdering

    override protected def doExecute(): RDD[InternalRow] = {
      val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
      val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
      val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
      val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
      val rValsProjGen = () => UnsafeProjection.create(rightVals, right.output)
      // bind against NULLABLE right values: unmatched left rows get an
      // all-null row, and a non-nullable binding would elide the null
      // checks and read garbage
      val outProjGen = () =>
        UnsafeProjection.create(output, left.output ++ rightVals.map(_.withNullability(true)))
      val nVals = rightVals.size

      left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
        val rValsProj = rValsProjGen()
        val outProj = outProjGen()
        val nullRight = new GenericInternalRow(nVals)
        val joined = new JoinedRow
        val buffered = rIt.buffered

        // latest right values seen for the current key
        var heldKey = 0L
        var held: InternalRow = null

        lIt.map { lRow =>
          val k = lRow.getLong(lKeyIdx)
          val t = lRow.getLong(lTimeIdx)
          if (held != null && heldKey != k) held = null
          // advance the right side through every row with
          // (rKey, rTime) <= (k, t) in (key, time) order, keeping the last
          // row of OUR key — rows of smaller keys can never match again
          // because both inputs are key-major sorted
          var advancing = true
          while (advancing && buffered.hasNext) {
            val r = buffered.head
            val rk = r.getLong(rKeyIdx)
            if (rk < k || (rk == k && r.getLong(rTimeIdx) <= t)) {
              if (rk == k) { held = rValsProj(buffered.next()).copy(); heldKey = k }
              else buffered.next()
            } else advancing = false
          }
          outProj(joined(lRow, if (held != null) held else nullRight))
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Install the strategy once per session (idempotent). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** As-of join `left` with the latest `right` row (rightTime <= leftTime)
    * per key. Key/time columns must be LongType and non-null.
    */
  def asof(left: DataFrame, right: DataFrame, keyCol: String,
           leftTimeCol: String, rightTimeCol: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = Bridge.logicalPlan(left)
    val rPlan = Bridge.logicalPlan(right)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val (lk, lt) = (attr(lPlan, keyCol), attr(lPlan, leftTimeCol))
    val (rk, rt) = (attr(rPlan, keyCol), attr(rPlan, rightTimeCol))
    require(Seq(lk, lt, rk, rt).forall(_.dataType == LongType),
      "as-of key/time columns must be LongType")
    Bridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan, keyCol, leftTimeCol, rightTimeCol))
  }
}
