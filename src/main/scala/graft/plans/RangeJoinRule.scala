package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Optimizer `Rule[LogicalPlan]` (the third Catalyst extension tier in
  * this library, next to the AsOfJoin planner strategy and the
  * GraftExtensions function injections): an inner join whose condition
  * is a POINT-IN-INTERVAL range predicate —
  *
  *   L ⋈ R  ON  [eqs ∧] L.v ≥ R.lo ∧ L.v ≤ R.hi
  *
  * — has no equi key, so Spark can only plan it as a nested-loop join:
  * broadcast-able at toy scale, O(|L|·|R|) probes always, impossible
  * when neither side broadcasts. This rule rewrites it into the banded
  * form q147/q155 build BY HAND — explode each interval into the
  * fixed-width buckets it overlaps, join on `bucket(v) = bucket`, keep
  * the original range predicate as a residual — so the planner extracts
  * an equi key and runs a hash/merge join: shuffle-partitionable,
  * skew-handleable, AQE-eligible. The hand-built q147 proves the
  * technique; THIS makes it a session property (set
  * `spark.graft.rangeJoin.binSize` to the band width) that accelerates
  * any user's BETWEEN join untouched — the Catalyst way to ship an
  * optimization.
  *
  * Correctness: truncating division is monotone for a positive divisor,
  * so v ∈ [lo, hi] ⇒ v div W ∈ [lo div W, hi div W] — the exploded
  * bucket list covers every bucket a matching point can map to, each
  * point maps to exactly ONE bucket (no duplicate pairs), and the
  * retained original predicate removes same-bucket non-matches. The
  * rewrite is output-identical by construction; the q210 gate checks it
  * against DuckDB and Relational22Spec checks it against the un-rewritten
  * plan. Width is the knob: W ≈ typical interval length keeps the
  * explode factor near 2 while making bucket groups small.
  *
  * Scope guards: inner joins only, integral or timestamp point/bound
  * types (point and both bounds must agree in kind), a strictly
  * positive configured width, and a no-op when the right side already
  * carries a bucket column (idempotence under fixed-point rule
  * execution).
  *
  * Timestamp joins — the dominant real-world BETWEEN shape (validity
  * intervals, SCD2 lookups, as-of enrichment) — bucket on epoch
  * MICROSECONDS (`UnixMicros`; NTZ is re-tagged to the session zone
  * first, the same pure re-tag `Tables.normalizeTs` does), and the
  * configured width is read in SECONDS for them: `binSize = 3600` means
  * hour-wide bands whether the column is long-epoch-seconds or a real
  * timestamp. Monotonicity of truncating division is unit-independent,
  * so the coverage proof above carries over unchanged.
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {
  val BinSizeKey = "spark.graft.rangeJoin.binSize"
  private val BucketName = "__graft_bucket"

  /** Register on a live session (idempotent), AsOf.register's pattern. */
  def register(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(RangeJoinRule))
      spark.experimental.extraOptimizations = cur :+ RangeJoinRule
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = conf.getConfString(BinSizeKey, "0").toLong
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(_, right, Inner, Some(_), _)
          if j.resolved && !right.output.exists(_.name == BucketName) =>
        rewrite(j, w).getOrElse(j)
    }
  }

  private def isIntegral(t: DataType): Boolean =
    t == LongType || t == IntegerType
  private def isTimestamp(t: DataType): Boolean =
    t == TimestampType || t == TimestampNTZType
  private def isSupported(e: Expression): Boolean =
    isIntegral(e.dataType) || isTimestamp(e.dataType)
  /** Point and bounds must band in the same unit: both integral (native
    * units) or both timestamps (epoch micros). */
  private def sameKind(a: Expression, b: Expression): Boolean =
    (isIntegral(a.dataType) && isIntegral(b.dataType)) ||
      (isTimestamp(a.dataType) && isTimestamp(b.dataType))

  private def rewrite(j: Join, w: Long): Option[LogicalPlan] = {
    val Join(left, right, _, Some(cond), hint) = j
    val conjuncts = splitConjunctivePredicates(cond)
    def leftOnly(e: Expression) = e.references.subsetOf(left.outputSet)
    def rightOnly(e: Expression) = e.references.subsetOf(right.outputSet)
    // v ≥ lo with the point on the left, in either written order
    val lower = conjuncts.collectFirst {
      case GreaterThanOrEqual(v, lo)
          if leftOnly(v) && rightOnly(lo) && isSupported(v) && sameKind(v, lo) =>
        (v, lo)
      case LessThanOrEqual(lo, v)
          if leftOnly(v) && rightOnly(lo) && isSupported(v) && sameKind(v, lo) =>
        (v, lo)
    }
    val upper = conjuncts.collectFirst {
      case LessThanOrEqual(v, hi)
          if leftOnly(v) && rightOnly(hi) && isSupported(v) && sameKind(v, hi) =>
        (v, hi)
      case GreaterThanOrEqual(hi, v)
          if leftOnly(v) && rightOnly(hi) && isSupported(v) && sameKind(v, hi) =>
        (v, hi)
    }
    (lower, upper) match {
      case (Some((v1, lo)), Some((v2, hi))) if v1.semanticEquals(v2) =>
        val timestamps = isTimestamp(v1.dataType)
        // binSize is native units for integrals, SECONDS for timestamps
        // (banded internally in epoch micros)
        val wLit = Literal(if (timestamps) w * 1000000L else w)
        def toLong(e: Expression): Expression = e.dataType match {
          case TimestampType => UnixMicros(e)
          case TimestampNTZType =>
            UnixMicros(Cast(e, TimestampType, Some(conf.sessionLocalTimeZone)))
          case _ => Cast(e, LongType)
        }
        def bucketOf(e: Expression) = IntegralDivide(toLong(e), wLit)
        val bucketAttr = AttributeReference(BucketName, LongType)()
        // timeZoneId must be pinned by hand: Sequence is TimeZoneAware
        // and ResolveTimeZone only runs in the analyzer — without it the
        // optimizer batch would emit an unresolved plan
        val expanded = Generate(
          Explode(Sequence(bucketOf(lo), bucketOf(hi), Some(Literal(1L)),
            Some(conf.sessionLocalTimeZone))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(bucketAttr), child = right)
        val newCond = (EqualTo(bucketOf(v1), bucketAttr) +: conjuncts).reduce(And)
        Some(Project(j.output, Join(left, expanded, Inner, Some(newCond), hint)))
      case _ => None
    }
  }
}
