package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Expression, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Whole-operator Catalyst extension (SURVEY §7.3 preference (c)): a
  * native sort-merge AS-OF JOIN — for each left row, the LAST right row
  * with the same key whose order tuple sorts strictly before the left
  * row's. q46 composes the same semantics from union + window built-ins
  * (two passes over the unioned stream); this operator does it in one
  * merge pass per co-partitioned, co-sorted partition pair, which is how
  * a dedicated engine would run it at 100 TB: one shuffle per side, no
  * union blow-up, O(1) state per key.
  *
  * The pieces, each the standard extension surface:
  *  - [[AsOfJoinPlan]]   — logical `BinaryNode`, built already-resolved
  *    from analyzed children.
  *  - [[AsOfJoinStrategy]] — `SparkStrategy` planning it to the exec.
  *  - [[AsOfJoinExec]]   — `BinaryExecNode` declaring clustered
  *    distribution + (key, order) child orderings, so EnsureRequirements
  *    inserts the exchanges/sorts, then zip-merging partitions.
  *  - [[GraftExtensions]] — `SparkSessionExtensions` injector for
  *    `spark.sql.extensions=graft.plans.GraftExtensions`; [[AsOf.join]]
  *    also self-registers via `experimental.extraStrategies` so an
  *    existing session needs no config.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftOrder: Seq[Attribute], rightOrder: Seq[Attribute],
    rightPayload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ rightPayload
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lo, ro, payload) =>
      AsOfJoinExec(lk, rk, lo, ro, payload, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftOrder: Seq[Expression], rightOrder: Seq[Expression],
    rightPayload: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ rightPayload

  /** Same declaration shape as SortMergeJoin: EnsureRequirements makes
    * the two children co-partitioned on the keys and co-sorted on
    * (key, order) — the operator itself never shuffles. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys ++ leftOrder).map(SortOrder(_, Ascending)),
    (rightKeys ++ rightOrder).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val ordTypes = leftOrder.map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = UnsafeProjection.create(leftKeys, left.output)
      val rKey = UnsafeProjection.create(rightKeys, right.output)
      val lOrd = UnsafeProjection.create(leftOrder, left.output)
      val rOrd = UnsafeProjection.create(rightOrder, right.output)
      val keyCmp = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val ordCmp = RowOrdering.createNaturalAscendingOrdering(ordTypes)
      val outProj = UnsafeProjection.create(output, left.output ++ right.output)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // Last right row seen for the key it belongs to. A consumed right
      // row whose key is already behind the left cursor can never match a
      // later left row (both streams ascend), so one (key, row) slot is
      // the operator's entire state — the O(1)-per-key property.
      var matchKey: InternalRow = null
      var matchRow: InternalRow = null
      lIter.flatMap { lrow =>
        val lk = lKey(lrow)
        val lo = lOrd(lrow)
        var scanning = true
        // lk is constant across this scan: copy it at most once per left
        // row (not once per consumed right row — a key with millions of
        // right rows would otherwise allocate a redundant copy for each)
        var lkCopy: InternalRow = null
        while (scanning && rBuf.hasNext) {
          val head = rBuf.head
          val c = keyCmp.compare(rKey(head), lk)
          if (c < 0 || (c == 0 && ordCmp.compare(rOrd(head), lo) < 0)) {
            if (c == 0) {
              if (lkCopy == null) lkCopy = lk.copy()
              matchKey = lkCopy; matchRow = head.copy()
            }
            rBuf.next()
          } else scanning = false
        }
        if (matchKey != null && keyCmp.compare(matchKey, lk) == 0)
          Iterator.single(outProj(joined(lrow, matchRow)))
        else Iterator.empty
      }
    }
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => RangeJoinRule)
  }
}

/** User-facing API: `AsOf.join(purchases, signups, Seq("user_id"),
  * Seq("ts","event_id"), Seq("ts","signup_id"), Seq("signup_id"))`.
  *
  * Preconditions (enforced/required by the merge's single-slot state):
  *  - NULL join keys never match: the merge compares keys with
  *    `RowOrdering`, which treats null == null (unlike SQL join
  *    equality), so `join` filters null-keyed rows from BOTH sides up
  *    front — same observable result as SQL inner-join-style semantics.
  *  - Right-side (key, order) tuples must be UNIQUE: the operator keeps
  *    one (key, row) slot, so among right rows tied on the full order
  *    tuple an arbitrary one survives. Include a unique id as the last
  *    order column (as q61 does with event_id) to make ties impossible.
  */
object AsOf {

  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  def join(left0: DataFrame, right0: DataFrame, keys: Seq[String],
      leftOrder: Seq[String], rightOrder: Seq[String],
      payload: Seq[String]): DataFrame = {
    val spark = left0.sparkSession
    register(spark)
    // SQL join semantics for NULLs (see object doc): drop null-keyed
    // rows AND null-ordered rows before the merge. RowOrdering would
    // otherwise match null keys, and a null order tuple sorts FIRST —
    // a null-timestamp right row would silently become every early
    // left row's "as-of" match, where SQL's strictly-before predicate
    // is never true for NULL.
    import org.apache.spark.sql.functions.col
    val left = left0.where(
      (keys ++ leftOrder).map(col(_).isNotNull).reduce(_ && _))
    val right = right0.where(
      (keys ++ rightOrder).map(col(_).isNotNull).reduce(_ && _))
    // The merge compares right-side projections with orderings built
    // from LEFT-side types (and hash-partitions each side by its own
    // type) — built-in joins coerce at analysis, this API must refuse.
    def types(df: DataFrame, names: Seq[String]) =
      names.map(n => df.schema(n).dataType)
    require(types(left, keys) == types(right, keys) &&
        types(left, leftOrder) == types(right, rightOrder),
      s"as-of join requires identical key/order column types on both sides: " +
        s"left=${types(left, keys ++ leftOrder)} " +
        s"right=${types(right, keys ++ rightOrder)}")
    val lPlan = left.queryExecution.analyzed
    // Re-alias the right side with FRESH expression ids: when both inputs
    // derive from the same base relation (the common as-of case), shared
    // ids would make the planner treat right-side columns as satisfied by
    // the left and prune them — the self-join dedup the analyzer does for
    // built-in joins, done here for the custom node.
    val rAnalyzed = right.queryExecution.analyzed
    val rPlan: LogicalPlan =
      Project(rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
    def attrs(plan: LogicalPlan, names: Seq[String]): Seq[Attribute] =
      names.map(n => plan.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in ${plan.output.map(_.name).mkString(",")}")))
    ColumnBridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      attrs(lPlan, keys), attrs(rPlan, keys),
      attrs(lPlan, leftOrder), attrs(rPlan, rightOrder),
      attrs(rPlan, payload)))
  }
}
