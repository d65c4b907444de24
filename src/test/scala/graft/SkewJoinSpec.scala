package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** In-suite twin of `tools.SkewProbe`'s measured evidence: AQE's skew
  * handling must actually FIRE on a hot-key join under carve-sized
  * thresholds, and — the round-10 finding — must stay INVISIBLE to a
  * join whose build side is a same-key final aggregate (the rule
  * matches only raw stage-boundary SMJ children, so that shape needs
  * salting, q409). Run in an isolated session: the thresholds and the
  * AQE/broadcast switches must not leak into other suites. */
class SkewJoinSpec extends SparkTestBase {

  private def smjsIn(p: SparkPlan): Seq[SortMergeJoinExec] = p.flatMap {
    case s: SortMergeJoinExec => Seq(s)
    case q: QueryStageExec => smjsIn(q.plan)
    case a: AdaptiveSparkPlanExec => smjsIn(a.executedPlan)
    case _ => Nil
  }

  test("AQE splits the hot partition of a raw-raw skewed join; an aggregated build side stays unsplit") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8k")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "32")
    import s.implicits._
    // 10 input partitions: skewed partitions split by MAPPER ranges, so
    // a single-mapper input would be unsplittable no matter how skewed
    def side(key: String, value: String) = s.range(0, 400000, 1, 10)
      .select(when($"id" < 100000, 99999L).otherwise($"id").as(key),
        $"id".as(value))
    val raw = side("k1", "v1").join(side("k2", "v2"), $"k1" === $"k2")
      .groupBy().agg(count(lit(1)).as("n"), sum($"v2").as("s"))
    assert(raw.collect().head.getLong(0) === 400000L - 100000L + 100000L * 100000L,
      "hot key fans out |hot|^2, the rest 1:1")
    val rawSmjs = smjsIn(raw.queryExecution.executedPlan)
    assert(rawSmjs.nonEmpty && rawSmjs.forall(_.isSkewJoin),
      "a raw-raw hot-key SMJ above thresholds must be skew-split")

    // same hot probe side, but the build side pre-aggregates on the
    // join key: the final HashAggregate between Sort and the shuffle
    // stage breaks OptimizeSkewedJoin's stage-boundary pattern
    val agg = side("k1", "v1")
      .join(side("k2", "v2").groupBy($"k2").agg(count(lit(1)).as("c")),
        $"k1" === $"k2")
      .groupBy().agg(count(lit(1)).as("n"), sum($"c").as("s"))
    agg.collect()
    val aggSmjs = smjsIn(agg.queryExecution.executedPlan)
    assert(aggSmjs.nonEmpty && aggSmjs.forall(!_.isSkewJoin),
      "an aggregated build side is invisible to AQE skew handling — " +
        "if this ever flips, Spark learned the shape and the q409 " +
        "salting guidance should be revisited")
  }
}
