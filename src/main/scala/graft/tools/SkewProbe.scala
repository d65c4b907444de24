package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Measured AQE skew-join evidence on a skewed carve (VERDICT r9
  * item 4 — the q409 salting frontier simulated the economics; this
  * OBSERVES Spark's own skew handling actually firing). Runs a
  * representative shuffle join on each deliberately-skewed key of the
  * `make_carve.py --skew` carve — events self-join on user_id and
  * lineitem ⋈ per-supplier aggregate on l_suppkey — under AQE with the
  * skew thresholds sized to the carve (the defaults target 256 MB
  * cluster partitions; a local carve is MBs, so the FACTORS are what
  * is under test, not the absolute bytes — exactly how a real job
  * tunes them to its shuffle sizes). Prints, per join, whether the
  * final adaptive SortMergeJoin reports `isSkewJoin` and how many
  * partitions the hot key was split into, plus the row counts proving
  * the join ran over the skewed data.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<skewedCarve> tools/run.sh graft.tools.SkewProbe
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_skew")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // carve-sized skew thresholds: flag a partition ≥5× the median
      // and ≥8 KB (the default FACTOR with the 256 MB byte floor scaled
      // ~32000× down, matching the carve being orders of magnitude
      // below cluster shuffle sizes); split to ~8 KB advisory chunks
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "5.0")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8k")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")
      // keep the probe joins out of the broadcast fast path — the
      // point is to watch the SHUFFLE join's skew handling
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // many map tasks per scan: AQE splits a skewed reduce partition
      // by MAPPER ranges, so a single-file carve read by one map task
      // is unsplittable no matter how skewed (at cluster scale the
      // thousands of input splits make this automatic)
      .config("spark.sql.files.maxPartitionBytes", "256k")
      .config("spark.sql.adaptive.forceOptimizeSkewedJoin",
        sys.env.getOrElse("SKEW_FORCE", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel(if (sys.env.get("SKEW_DEBUG").contains("1")) "DEBUG" else "ERROR")
    import spark.implicits._

    // AQE wraps executed stages in QueryStageExec LEAVES — a plain
    // collect stops at them, so recurse through stage boundaries
    def smjsIn(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[SortMergeJoinExec] = p.flatMap {
      case s: SortMergeJoinExec => Seq(s)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        smjsIn(q.plan)
      case a: AdaptiveSparkPlanExec => smjsIn(a.executedPlan)
      case _ => Nil
    }

    def probe(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      // collect() (not count()) so the SAME QueryExecution runs — count
      // builds a sibling plan and would leave this one un-finalized
      val rows = df.collect().length
      val plan = df.queryExecution.executedPlan
      val smjs = smjsIn(plan)
      val skewed = smjs.filter(_.isSkewJoin)
      // how many read-partitions the skew reader fanned the hot
      // partition(s) into: PartialReducerPartitionSpec entries per side
      val splits = skewed.flatMap(_.collect {
        case r: org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec =>
          r.partitionSpecs.count {
            case _: org.apache.spark.sql.execution.PartialReducerPartitionSpec => true
            case _ => false
          }
      })
      println(s"$name: rows=$rows smj=${smjs.size} " +
        s"skewJoins=${skewed.size} " +
        s"isSkewJoin=${smjs.map(_.isSkewJoin).mkString(",")} " +
        s"skewSplitPartitions=${splits.mkString("/")}")
      if (sys.env.get("SKEW_DEBUG").contains("1")) {
        def stages(p: org.apache.spark.sql.execution.SparkPlan)
            : Seq[org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec] =
          p.flatMap {
            case q: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec =>
              q +: stages(q.plan)
            case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
              stages(q.plan)
            case a: AdaptiveSparkPlanExec => stages(a.executedPlan)
            case _ => Nil
          }
        stages(plan).foreach { q =>
          val sizes = q.mapStats.map(_.bytesByPartitionId).getOrElse(Array.empty)
          val sorted = sizes.sorted
          val med = if (sorted.isEmpty) 0L else sorted(sorted.length / 2)
          println(s"  stage ${q.id}: partitions=${sizes.length} " +
            s"max=${sizes.maxOption.getOrElse(0L)} median=$med " +
            s"mappers=${q.mapStats.map(_ => q.shuffle.numMappers).getOrElse(-1)}")
        }
        println(plan.toString.linesIterator.take(40).mkString("\n"))
      }
    }

    if (sys.env.get("SKEW_SYNTH").contains("1")) {
      val s1 = spark.range(0, 1000000, 1, 10)
        .select(when($"id" < 250000, 249999L).otherwise($"id").as("key1"),
          $"id".as("value1"))
      val s2 = spark.range(0, 1000000, 1, 10)
        .select(when($"id" < 250000, 249999L).otherwise($"id").as("key2"),
          $"id".as("value2"))
      probe("synthetic",
        s1.join(s2, $"key1" === $"key2")
          .groupBy().agg(count(lit(1)).as("n"), sum($"value2").as("s")))
    }

    // Probe joins are RAW ⋈ RAW on the skewed keys (full-width rows so
    // the shuffle carries production-shaped bytes). This is load-bearing:
    // OptimizeSkewedJoin only matches SMJ children that are stage
    // boundaries — Sort(ShuffleQueryStage) directly — so a join whose
    // build side is a same-key FINAL AGGREGATE (HashAggregate between
    // the Sort and the stage) is invisible to AQE skew handling no
    // matter how skewed the probe side is (measured here in round 10;
    // the mitigation for that shape is the q409 salting family).
    val ev = graft.engine.Tables.events(spark, sfDir)
    // sparse raw dim: every 997th event's (user_id, value) — dup keys
    // just fan out, keeping both join inputs raw shuffle stages
    val evDim = ev.filter($"event_id" % 997 === 0)
      .select($"user_id", $"value".as("dim_v"))
    probe("events_join_user_id",
      ev.join(evDim, "user_id")
        .groupBy($"event_type").agg(count(lit(1)).as("n"),
          sum(length($"props")).as("bytes"), max($"ts").as("mx"),
          sum($"value" + $"dim_v").as("val")))

    val li = graft.engine.Tables.lineitem(spark, sfDir)
    val supp = graft.engine.Tables.supplier(spark, sfDir)
      .select($"s_suppkey".as("l_suppkey"), $"s_nationkey", $"s_acctbal")
    probe("lineitem_join_supplier",
      li.join(supp, "l_suppkey")
        .groupBy($"l_returnflag").agg(count(lit(1)).as("n"),
          sum($"l_extendedprice").as("px"), max($"l_shipdate").as("mx"),
          sum($"l_quantity" * $"s_acctbal").as("qd")))

    spark.stop()
  }
}
