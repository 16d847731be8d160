package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}

/** AS-OF JOIN — the canonical "operator Spark lacks" (temporal lookup:
  * for each left row, the single most recent right row with
  * rightTime <= leftTime per key). The reference's SortedPositionLinks
  * (MAIN/operator/SortedPositionLinks.java:39) accelerates exactly this
  * class of inequality probes inside its hash join.
  *
  * Implemented as the full custom-operator stack (SURVEY §2.11 route c):
  * a resolved logical node, a planner strategy, and a physical operator
  * that declares hash-clustered distribution over the keys — Catalyst's
  * EnsureRequirements inserts the co-partitioning exchanges, so the merge
  * itself is a per-partition hash lookup + binary search with no
  * driver-side work. At 100 TB both sides shuffle once on the key
  * (identical to a shuffled hash join) and the right side builds an
  * in-partition index sorted by time.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides hash-partitioned on the join keys: EnsureRequirements
    * inserts compatible exchanges (the same contract a shuffled hash join
    * declares). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  private def timeToLong(e: Expression): Any => Long = e.dataType match {
    case DateType => v => v.asInstanceOf[Int].toLong
    case TimestampType | TimestampNTZType => v => v.asInstanceOf[Long]
    case _ => v => v.asInstanceOf[Number].longValue()
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyGen = () => UnsafeProjection.create(leftKeys, left.output)
    val rKeyGen = () => UnsafeProjection.create(rightKeys, right.output)
    val lTimeBound = BindReferences.bindReference(leftTime, left.output)
    val rTimeBound = BindReferences.bindReference(rightTime, right.output)
    val lTimeConv = timeToLong(leftTime)
    val rTimeConv = timeToLong(rightTime)
    val rightWidth = right.output.length
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // build: per-key time-sorted index of the right partition
      val rKey = rKeyGen()
      val index = new scala.collection.mutable.HashMap[
        UnsafeRow, scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]]()
      rIter.foreach { row =>
        val t = rTimeBound.eval(row)
        if (t != null) {
          val k = rKey(row).copy()
          index.getOrElseUpdate(k,
            new scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]())
            .append((rTimeConv(t), row.copy()))
        }
      }
      index.values.foreach(buf => buf.sortInPlaceBy(_._1))

      val lKey = lKeyGen()
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow()
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

      lIter.map { lRow =>
        val tv = lTimeBound.eval(lRow)
        val matched: InternalRow =
          if (tv == null) nullRight
          else index.get(lKey(lRow)) match {
            case None => nullRight
            case Some(buf) =>
              // greatest right time <= left time (binary search)
              val t = lTimeConv(tv)
              var lo = 0
              var hi = buf.length - 1
              var ans = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (buf(mid)._1 <= t) { ans = mid; lo = mid + 1 }
                else hi = mid - 1
              }
              if (ans < 0) nullRight else buf(ans)._2
          }
        resultProj(joined(lRow, matched))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public column-API entry point. */
object AsOf {
  /** asofJoin: for every left row, append the latest right row with
    * right.timeCol <= left.timeCol among rows sharing the join keys
    * (null-extended when none exists — ASOF LEFT semantics). */
  def join(leftDf: DataFrame, rightDf: DataFrame,
      keys: Seq[(String, String)],
      leftTimeCol: String, rightTimeCol: String): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(",")}"))
    val node = AsOfJoin(lPlan, rPlan,
      keys.map(k => attr(lPlan, k._1)), keys.map(k => attr(rPlan, k._2)),
      attr(lPlan, leftTimeCol), attr(rPlan, rightTimeCol))
    org.apache.spark.sql.classic.GraftPlanBridge.ofRows(spark, node)
  }
}
