package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSeq, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** AS-OF JOIN as a first-class operator (SURVEY §2 T3 `q_join_asof`,
  * §7.3.4): for each left row, the single latest right row with the same
  * key and `rightTime <= leftTime` (ties on time broken by the largest
  * `rightTie`). Inner semantics: unmatched left rows are dropped.
  *
  * Why a custom operator: the composable formulations (join-then-rank, or
  * join-then-max_by) materialize every (left, earlier-right) combination
  * before reducing — O(|L| × matches) intermediate rows. This node instead
  * asks Catalyst for co-partitioned children, each sorted by (key, time),
  * and streams a per-partition merge: each side is scanned exactly once,
  * O(1) state per key. That is the shape that survives 100 TB.
  *
  * The full custom-operator stack: [[AsOfJoinPlan]] (logical BinaryNode) →
  * [[AsOfJoinStrategy]] (SparkStrategy) → [[AsOfMergeJoinExec]] (physical
  * BinaryExecNode; distribution/ordering requirements make
  * EnsureRequirements insert the one hash shuffle + in-partition sorts).
  * Type restriction kept deliberate: key LongType, times TimestampType,
  * tie LongType.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression, isLeftOuter: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    if (isLeftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tie, outer) =>
      AsOfMergeJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tie, outer) :: Nil
    case _ => Nil
  }
}

case class AsOfMergeJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTie: Expression, isLeftOuter: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (isLeftOuter) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  // one hash shuffle per side on the join key (co-partitioned like SMJ)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // in-partition sort by (key, time[, tie]) — the merge's only precondition
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTie, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lkB = BindReferences.bindReference(leftKey, AttributeSeq(lOut))
    val ltB = BindReferences.bindReference(leftTime, AttributeSeq(lOut))
    val rkB = BindReferences.bindReference(rightKey, AttributeSeq(rOut))
    val rtB = BindReferences.bindReference(rightTime, AttributeSeq(rOut))
    val schema = output
    val rightArity = right.output.size
    val outer = isLeftOuter
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private val nullRight = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(rightArity)
        private val proj = UnsafeProjection.create(schema.map(_.dataType).toArray)
        private var cand: InternalRow = null
        private var candKey: Long = 0L
        private var nextOut: InternalRow = null

        private def rKey(r: InternalRow): Long = rkB.eval(r).asInstanceOf[Long]
        private def rTime(r: InternalRow): Long = rtB.eval(r).asInstanceOf[Long]

        // Null-keyed / null-timed right rows can never match any left row
        // (standard join semantics: NULL compares to nothing), so drop them
        // on the way in rather than letting eval(...).asInstanceOf[Long]
        // unbox null to 0L and join them as key 0 / epoch 0.
        private def nextRight(): InternalRow = {
          while (ri.hasNext) {
            val r = ri.next()
            if (rkB.eval(r) != null && rtB.eval(r) != null) return r
          }
          null
        }
        private var rHead: InternalRow = nextRight()

        private def advanceLeft(): Unit = {
          nextOut = null
          while (nextOut == null && li.hasNext) {
            val l = li.next()
            val kA = lkB.eval(l)
            val tA = ltB.eval(l)
            if (kA == null || tA == null) {
              // NULL key or time matches nothing: null-extend (outer) / drop (inner)
              if (outer) nextOut = proj(joined(l, nullRight))
            } else {
              val k = kA.asInstanceOf[Long]
              val t = tA.asInstanceOf[Long]
              // consume right rows usable for this (k, t): key < k (skip) or
              // key == k with time <= t (becomes the current candidate —
              // sorted input means later candidates are always "more recent")
              while (rHead != null &&
                (rKey(rHead) < k || (rKey(rHead) == k && rTime(rHead) <= t))) {
                if (rKey(rHead) == k) { cand = rHead.copy(); candKey = k }
                rHead = nextRight()
              }
              if (cand != null && candKey == k) {
                nextOut = proj(joined(l, cand))
              } else if (outer) {
                nextOut = proj(joined(l, nullRight)) // left-outer: null-extend
              } // else: inner semantics, skip unmatched left rows
            }
          }
        }

        override def hasNext: Boolean = {
          if (nextOut == null) advanceLeft()
          nextOut != null
        }
        override def next(): InternalRow = {
          if (nextOut == null) advanceLeft()
          val out = nextOut
          nextOut = null
          numOutputRows += 1
          out
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Public API: `AsOf.join(events, orders, "user_id", "o_custkey", "ts_s",
  * "o_orderdate", "o_orderkey")`. */
object AsOf {
  def join(leftDf: DataFrame, rightDf: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightTie: String, leftOuter: Boolean = false): DataFrame = {
    val spark = leftDf.sparkSession
    GraftBridge.addStrategy(spark, AsOfJoinStrategy)
    val lp = leftDf.queryExecution.analyzed
    val rp = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found in ${p.output.map(_.name)}"))
    def checked(a: Attribute, ok: Set[org.apache.spark.sql.types.DataType]): Attribute = {
      require(ok.contains(a.dataType), s"as-of join: unsupported type ${a.dataType} for ${a.name}")
      a
    }
    // both timestamp flavors carry micros-since-epoch Longs internally;
    // with the session pinned to UTC they compare identically
    val ts: Set[org.apache.spark.sql.types.DataType] = Set(TimestampType, TimestampNTZType)
    GraftBridge.ofRows(spark, AsOfJoinPlan(lp, rp,
      checked(attr(lp, leftKey), Set(LongType)),
      checked(attr(rp, rightKey), Set(LongType)),
      checked(attr(lp, leftTime), ts),
      checked(attr(rp, rightTime), ts),
      checked(attr(rp, rightTie), Set(LongType)), leftOuter))
  }
}
