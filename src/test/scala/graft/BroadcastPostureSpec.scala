package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** The corpus-proportional-broadcast discipline (round-13 audit): a
  * hand-pinned `broadcast()` freezes a size decision that is only valid
  * while the frame fits in one executor, so frames that GROW with the
  * corpus — q239's probe keys (Θ(n/101)), q145's per-document fold map
  * (Θ(n)) and cluster labels, q130's drop set (Θ(dup-rate·n)), q153's
  * FK-parent key sets (Θ(parent rows)) — must not carry one: AQE's runtime size check reproduces the broadcast
  * exactly while the side fits and degrades to a key-partitioned
  * shuffle when it doesn't. These specs pin BOTH halves of that
  * contract on the de-pinned queries:
  *
  *  1. the default path still broadcasts at gate SF (AQE's conversion
  *     replaces the deleted hint — the fix costs nothing where the old
  *     plan was right), and
  *  2. the shuffle path — what a 100 TB corpus would actually execute —
  *     produces byte-identical results with every auto-broadcast
  *     disabled, so the scale degradation is a measured slowdown, never
  *     a correctness event.
  */
class BroadcastPostureSpec extends SparkTestBase {

  /** Every join operator in the FINALIZED adaptive plan (post-execution,
    * so AQE's runtime broadcast/shuffle decisions are visible). */
  private def finalJoins(p: SparkPlan): Seq[String] = p.flatMap {
    case a: AdaptiveSparkPlanExec => finalJoins(a.executedPlan)
    case q: QueryStageExec => finalJoins(q.plan)
    case j: org.apache.spark.sql.execution.joins.BaseJoinExec =>
      Seq(j.nodeName)
    case _ => Nil
  }

  private val depinned: Seq[String] = Seq(
    "q130_dedup_apply", "q145_grouped_split", "q153_constraint_audit",
    "q239_containment_join")

  test("de-pinned dedup queries: AQE still broadcasts the small side at gate SF") {
    depinned.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect() // finalize the adaptive plan
      val joins = finalJoins(df.queryExecution.executedPlan)
      assert(joins.exists(_.contains("BroadcastHashJoin")),
        s"$name: deleting the static hint should have cost nothing at " +
          s"gate SF — AQE was expected to re-derive the broadcast, got " +
          s"joins: $joins")
    }
  }

  test("de-pinned dedup queries: the all-shuffle path (100 TB posture) is result-identical") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val expected = depinned.map { name =>
      name -> SparkEntry.queries(name)(spark, sf).collect()
        .map(_.toString).toSeq
    }
    try {
      // -1 disables static AND adaptive auto-broadcast (the adaptive
      // threshold falls back to this one), so every join in the query
      // must execute as a key-partitioned shuffle join — exactly the
      // plan a corpus too big to broadcast would get.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      expected.foreach { case (name, want) =>
        val df = SparkEntry.queries(name)(spark, sf)
        val got = df.collect().map(_.toString).toSeq
        val joins = finalJoins(df.queryExecution.executedPlan)
        assert(!joins.exists(_.contains("Broadcast")),
          s"$name: auto-broadcast disabled but the plan still " +
            s"broadcasts — a hand-pinned hint survives: $joins")
        assert(got == want,
          s"$name: shuffle path diverged from the broadcast path")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("q155 grid join pins its amplifying candidate join to a shuffled hash join") {
    val df = SparkEntry.queries("q155_grid_join")(spark, sf)
    df.collect()
    val joins = finalJoins(df.queryExecution.executedPlan)
    assert(joins.exists(_.contains("ShuffledHashJoin")),
      s"q155's cell join must take parallelism from the key shuffle at " +
        s"every scale (the candidateJoin discipline), got: $joins")
    assert(!joins.exists(_.contains("BroadcastHashJoin")),
      s"q155's cell join must never inherit the probe side's split " +
        s"count through a size-based broadcast, got: $joins")
  }
}
