package graft

import org.apache.spark.sql.functions._

import graft.engine.Relational46

/** Wave 64 (q332–q333): grain alignment and A/B audit. Invariants:
  * day shares sum to ~1000 per (type, week) with exact mass
  * conservation, assignments are sticky, and the hash split is near
  * 50/50. */
class Wave64Spec extends SparkTestBase {

  test("q332 day mass is conserved within each week") {
    import spark.implicits._
    val d = Relational46.q332GrainAlignment(spark, sf).cache()
    try {
      val bad = d.groupBy($"event_type", $"week")
        .agg(sum($"n_day").as("s"), max($"n_week").as("w"))
        .filter($"s" =!= $"w")
      assert(bad.count() === 0, "day counts must sum exactly to their week")
      assert(d.filter($"share_permille" < 0 || $"share_permille" > 1000)
        .count() === 0)
      // weeks have at most 7 days
      val fat = d.groupBy($"event_type", $"week")
        .agg(count(lit(1)).as("nd")).filter($"nd" > 7)
      assert(fat.count() === 0)
    } finally d.unpersist()
  }

  test("q333 assignments are sticky and the split is near-even") {
    import spark.implicits._
    val d = Relational46.q333AbAudit(spark, sf).cache()
    try {
      assert(d.filter($"unsticky_users" =!= 0).count() === 0,
        "hash bucketing must be deterministic per user")
      // md5 first hex char < '8' is exactly a fair coin; at fixture user
      // counts the χ² should stay far below the extreme
      val worst = d.select(($"srm_x2_num" * 100) / $"srm_x2_den")
        .as[Double].collect().max
      assert(worst < 100 * 15, s"SRM chi2 unexpectedly large: $worst")
    } finally d.unpersist()
  }
}
