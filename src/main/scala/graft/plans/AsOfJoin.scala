package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.PlanBridge

/** As-of join as a FIRST-CLASS operator — the tier-(c) extension path
  * (custom `LogicalPlan` + `Strategy` + `SparkPlan`) from SURVEY §2.5:
  * Spark has no native as-of join, and the composable forms all pay
  * something — q17 expands (purchase × preceding-click) pairs, q58 runs a
  * running-`last` window over the union. This operator executes the
  * textbook streaming-merge algorithm directly:
  *
  *   - both sides hash-partition on the user key (ClusteredDistribution —
  *     EnsureRequirements co-partitions them, exactly like a sort-merge
  *     join) and sort within partitions by (user, time);
  *   - one forward pass per partition zips the two sorted iterators: for
  *     each left row, right rows at or before its time are consumed once,
  *     retaining only the LATEST — O(|L| + |R|) per partition, no pair
  *     expansion, no window buffer, state = one retained row;
  *   - ties on right time resolve by the tie-break ordering column
  *     (largest wins), matching q17's `ORDER BY cts DESC, click_id DESC`.
  *
  * Inner semantics: left rows with no matching right row are dropped.
  * Keys/time/tie must be LongType or timestamp (internally long).
  *
  * Registration: config-built sessions get [[AsOfJoinStrategy]] from
  * `GraftExtensions` (`injectPlannerStrategy`); [[AsOf.join]] also
  * idempotently adds it to `spark.experimental.extraStrategies` — the
  * documented runtime hook — so the operator works on any live session.
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftUser: Expression, rightUser: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lu, ru, lt, rt, tb) =>
      AsOfJoinExec(lu, ru, lt, rt, tb, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftUser: Expression, rightUser: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTieBreak: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output
  override def outputPartitioning: Partitioning = left.outputPartitioning

  /** Same contract as SortMergeJoinExec: cluster both sides on the user
    * key (one co-partitioning shuffle each at most)... */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftUser)) :: ClusteredDistribution(Seq(rightUser)) :: Nil

  /** ...and sort within partitions — (user, time) left; (user, time,
    * tie-break) right so ascending overwrite retains the q17 winner. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftUser, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightUser, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTieBreak, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftUser, Ascending), SortOrder(leftTime, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val luB = BindReferences.bindReference(leftUser, left.output)
    val ltB = BindReferences.bindReference(leftTime, left.output)
    val ruB = BindReferences.bindReference(rightUser, right.output)
    val rtB = BindReferences.bindReference(rightTime, right.output)
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      // SparkPlan contract: exec nodes emit UnsafeRow. JoinedRow is only
      // the internal pairing view; project it out exactly like
      // SortMergeJoinExec's result projection does.
      val resultProj = UnsafeProjection.create(output, output)
      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private var nextRow: InternalRow = _
        private var click: InternalRow = if (rIt.hasNext) rIt.next() else null
        private var lastMatch: InternalRow = _ // latest right row for lastUser
        private var lastUser = 0L
        private var haveLast = false

        private def advance(): Unit = {
          nextRow = null
          while (nextRow == null && lIt.hasNext) {
            val l = lIt.next()
            val uAny = luB.eval(l)
            val tAny = ltB.eval(l)
            // SQL join semantics: null keys/times never match (they sort
            // NULLS FIRST, so skipping is also order-safe)
            if (uAny != null && tAny != null) {
              val u = uAny.asInstanceOf[Long]
              val t = tAny.asInstanceOf[Long]
              var scanning = click != null
              while (scanning) {
                val cuAny = ruB.eval(click)
                val ctAny = rtB.eval(click)
                if (cuAny == null || ctAny == null) {
                  // null-keyed right rows sort first; consume and drop
                  click = if (rIt.hasNext) rIt.next() else null
                  scanning = click != null
                } else {
                  val cu = cuAny.asInstanceOf[Long]
                  if (cu < u || (cu == u && ctAny.asInstanceOf[Long] <= t)) {
                    if (cu == u) {
                      // ascending (time, tie) ⇒ plain overwrite keeps the max
                      lastMatch = click.copy()
                      lastUser = cu
                      haveLast = true
                    }
                    click = if (rIt.hasNext) rIt.next() else null
                    scanning = click != null
                  } else scanning = false
                }
              }
              if (haveLast && lastUser == u) nextRow = joined(l, lastMatch)
            }
          }
        }

        override def hasNext: Boolean = {
          if (nextRow == null) advance()
          nextRow != null
        }
        override def next(): InternalRow = {
          if (nextRow == null) advance()
          val r = nextRow
          nextRow = null
          resultProj(r)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level API. */
object AsOf {
  /** Register the strategy on a live session (idempotent — the additive
    * `experimental.extraStrategies` hook, not a conf mutation). */
  def setup(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** For each left row, join the latest right row with the same user at or
    * before its time; left rows without one are dropped (inner as-of).
    * Columns are given by name and resolved HERE against each side's
    * analyzed output — the node is born fully resolved, so no analyzer
    * rule needs to understand it. Two things the post-analysis build must
    * do itself (the analyzer would have for a standard Join):
    *   - de-duplicate attribute ids when both sides share lineage
    *     (self-join): the right side is re-aliased with fresh ExprIds;
    *   - validate key/time/tie types up front — the merge pass reads them
    *     as longs, and a task-side ClassCastException is a terrible way to
    *     learn your key is an Int. */
  def join(left: DataFrame, right: DataFrame,
           leftUser: String, rightUser: String,
           leftTime: String, rightTime: String,
           rightTieBreak: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val spark = left.sparkSession
    setup(spark)
    val lp = PlanBridge.logicalPlan(left)
    val rp0 = PlanBridge.logicalPlan(right)
    val rp =
      if (lp.outputSet.intersect(rp0.outputSet).isEmpty) rp0
      else Project(rp0.output.map(a => Alias(a, a.name)()), rp0)
    def attr(p: LogicalPlan, side: String, n: String): Attribute =
      p.output.filter(_.name == n) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"as-of join: no column `$n` on the $side side (has ${p.output.map(_.name).mkString(", ")})")
        case many => throw new IllegalArgumentException(
          s"as-of join: column `$n` is ambiguous on the $side side " +
            s"(${many.size} matches) — mirror of the analyzer's ambiguous-reference error")
      }
    def longBacked(a: Attribute, role: String): Attribute = {
      val ok = a.dataType == LongType || a.dataType == TimestampType ||
        a.dataType == TimestampNTZType
      if (!ok) throw new IllegalArgumentException(
        s"as-of join: $role column `${a.name}` must be LongType or a timestamp " +
          s"(internally long); got ${a.dataType.simpleString}")
      a
    }
    PlanBridge.dataFrame(spark, AsOfJoin(lp, rp,
      longBacked(attr(lp, "left", leftUser), "left key"),
      longBacked(attr(rp, "right", rightUser), "right key"),
      longBacked(attr(lp, "left", leftTime), "left time"),
      longBacked(attr(rp, "right", rightTime), "right time"),
      longBacked(attr(rp, "right", rightTieBreak), "tie-break")))
  }
}
