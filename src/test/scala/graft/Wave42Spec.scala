package graft

import org.apache.spark.sql.functions._

import graft.engine.{Exact, Relational32, Tables}

/** Wave 42 (q275–q278): exact histogram quantiles, stream-static anti
  * join, and the Q21/Q22 decorrelation shapes. Invariants beyond the
  * hash gate: quantile rank-definition laws, semi/anti physical plan
  * shape, and anti-join set complementarity. */
class Wave42Spec extends SparkTestBase {

  test("q275 quantiles satisfy the type-1 rank definition and are ordered") {
    import spark.implicits._
    val q = Relational32.q275ExactQuantiles(spark, sf).collect()
    assert(q.nonEmpty)
    q.foreach { r =>
      assert(r.getLong(1) <= r.getLong(2) && r.getLong(2) <= r.getLong(3),
        s"p50 <= p90 <= p99 violated: $r")
    }
    val cents = Tables.events(spark, sf)
      .select($"event_type", Exact.cents($"value").as("c")).cache()
    q.foreach { r =>
      val t = r.getString(0)
      val vals = cents.filter($"event_type" === t)
      val n = vals.count()
      Seq((50, r.getLong(1)), (90, r.getLong(2)), (99, r.getLong(3)))
        .foreach { case (p, qc) =>
          val thr = (p * n + 99) / 100
          assert(vals.filter($"c" <= qc).count() >= thr,
            s"$t p$p=$qc: fewer than $thr values at or below")
          assert(vals.filter($"c" < qc).count() < thr,
            s"$t p$p=$qc is not the SMALLEST qualifying value")
          assert(vals.filter($"c" === qc).count() > 0,
            s"$t p$p=$qc must be an actual data value (type-1)")
        }
    }
    cents.unpersist()
  }

  test("q277 decorrelates to one LeftSemi and one LeftAnti join, no cartesian") {
    import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val df = Relational32.q277WaitingSuppliers(spark, sf)
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j.joinType }
    assert(joins.contains(LeftSemi) && joins.contains(LeftAnti),
      s"expected semi+anti membership joins, got $joins")
    val phys = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!phys.contains("CartesianProduct"))
  }

  test("q276 anti-join output is the exact complement of the early-signup cohort") {
    import spark.implicits._
    val out = graft.streaming.Streaming.q276StreamAntiJoin(spark, sf)
    val ev = Tables.events(spark, sf)
    val t0 = ev.agg(min($"ts")).head().getTimestamp(0)
    val cutoff = new java.sql.Timestamp(t0.getTime + 2L * 86400000L)
    val early = ev.filter($"event_type" === "signup" && $"ts" < lit(cutoff))
      .select($"user_id").distinct()
    val lateUsers = ev.select($"user_id").distinct().exceptAll(early)
    // totals conserve: anti rows = all events from non-cohort users
    val expect = ev.join(lateUsers, Seq("user_id"), "left_semi").count()
    val got = out.agg(sum($"n_events")).head().getLong(0)
    assert(got === expect, s"anti join must keep exactly the complement: $got vs $expect")
    assert(got > 0, "the cohort window must leave a non-empty anti set")
  }

  test("q278 admits exactly the above-average customers lacking a big-ticket order") {
    import spark.implicits._
    val out = Relational32.q278IdleRich(spark, sf)
    // independent reformulation: windowed average + except-based anti
    val cust = Tables.customer(spark, sf)
      .filter($"c_nationkey".isin(1, 5, 9, 13, 17, 21))
      .select($"c_custkey", $"c_nationkey", Exact.cents($"c_acctbal").as("bal"))
    val Seq(s, c) = cust.filter($"bal" > 0)
      .agg(sum($"bal"), count(lit(1))).head().toSeq.map(_.toString.toLong)
    val big = Tables.orders(spark, sf).filter($"o_totalprice" > 450000.0)
      .select($"o_custkey").distinct()
    val expect = cust.filter($"bal" * c > s)
      .join(big, $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"c_nationkey")
      .agg(count(lit(1)).as("numcust"), sum($"bal").as("totbal_cents"))
    assert(out.exceptAll(expect).isEmpty && expect.exceptAll(out).isEmpty)
    assert(out.count() > 0, "the threshold must leave a non-empty idle-rich set")
  }
}
